"""parser_rdf_ray — a Ray-Data-native RDF / knowledge-graph construction engine.

Re-realizes the detection → validation → parse → extraction semantics of the
reference RDF parser (see SURVEY.md) as distributed Ray Data pipelines over
Arrow batches of documents, plus KG-construction stages (skolemization,
canonicalization, entity merge, dedup, adjacency materialization) that the
reference performs only at single-document scope.

Layout:
    formats/    per-format sniffers + parsers emitting triple rows
    extract/    doc-scope entity extraction (classes/properties/prefixes/shapes)
    stages/     Ray Data map_batches stage functions and actor classes
    pipelines/  end-to-end pipeline builders (kg_build, dedup, text, similarity)
    sources/    document-table readers + deterministic synthetic generator
    state/      lineage / checkpoint-resume helpers
"""

from parser_rdf_ray.parser import (  # noqa: F401
    FormatDetectionError,
    ParseError,
    RdfParser,
    parse_document,
)

__version__ = "0.1.0"
