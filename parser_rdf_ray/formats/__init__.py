from parser_rdf_ray.formats import detect, jsonld, ntriples, rdfxml, turtle  # noqa: F401
