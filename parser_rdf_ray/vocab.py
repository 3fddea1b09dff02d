"""Vocabulary constants shared by parsers and extractors.

Mirrors the reference's constant sets (cited per constant) as immutable
module-level frozensets/dicts so Ray batch functions capture them by closure —
no global mutable registry (the reference's RdfNamespace side effect,
ShapeExtractor.php:70-71, is replaced by explicit constants).
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SH = "http://www.w3.org/ns/shacl#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
DC = "http://purl.org/dc/elements/1.1/"
DCTERMS = "http://purl.org/dc/terms/"
FOAF = "http://xmlns.com/foaf/0.1/"
SCHEMA = "https://schema.org/"

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_LANGSTRING = RDF + "langString"
RDFS_LABEL = RDFS + "label"
RDFS_COMMENT = RDFS + "comment"
RDFS_SUBCLASSOF = RDFS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
RDFS_SEEALSO = RDFS + "seeAlso"
RDFS_ISDEFINEDBY = RDFS + "isDefinedBy"
OWL_INVERSEOF = OWL + "inverseOf"
OWL_UNIONOF = OWL + "unionOf"
OWL_FUNCTIONAL_PROPERTY = OWL + "FunctionalProperty"
XSD_STRING = XSD + "string"

# ClassExtractor.php:28-34
CLASS_TYPE_URIS = frozenset(
    {
        RDFS + "Class",
        OWL + "Class",
        RDFS + "Datatype",
        RDFS + "Container",
        RDFS + "Literal",
    }
)

# PropertyExtractor.php:32-38
PROPERTY_TYPE_URIS = frozenset(
    {
        RDF + "Property",
        OWL + "DatatypeProperty",
        OWL + "ObjectProperty",
        OWL + "AnnotationProperty",
        OWL + "FunctionalProperty",
    }
)

# ShapeExtractor.php:27-30
SHAPE_TYPE_URIS = frozenset(
    {
        SH + "NodeShape",
        SH + "PropertyShape",
    }
)

# ShapeExtractor.php:33-47 — key in the constraints map is the name minus "sh:"
SHACL_CONSTRAINT_PROPERTIES = (
    "minCount",
    "maxCount",
    "minLength",
    "maxLength",
    "pattern",
    "datatype",
    "nodeKind",
    "class",
    "node",
    "minInclusive",
    "maxInclusive",
    "minExclusive",
    "maxExclusive",
)

# PrefixExtractor.php:198-211 — add-only defaults (never overwrite declared ones)
COMMON_PREFIXES = {
    "rdf": RDF,
    "rdfs": RDFS,
    "owl": OWL,
    "xsd": XSD,
    "dc": DC,
    "dcterms": DCTERMS,
    "dct": DCTERMS,
    "foaf": FOAF,
    "skos": SKOS,
    "sh": SH,
    "schema": SCHEMA,
}

# OWL predicates whose presence marks a resource as an anonymous class
# expression (skipped by extractors; ClassExtractor.php:80-82)
ANONYMOUS_OWL_PREDICATES = frozenset(
    {
        OWL + "unionOf",
        OWL + "intersectionOf",
        OWL + "complementOf",
        OWL + "oneOf",
        OWL + "onProperty",
    }
)
OWL_RESTRICTION = OWL + "Restriction"

# Predicates consumed by dedicated extractor fields — everything else on an
# entity becomes a custom annotation (ResourceHelperTrait behavior pinned by
# ClassExtractorTest.php:381-402).
CORE_ENTITY_PREDICATES = frozenset(
    {
        RDF_TYPE,
        RDFS_LABEL,
        RDFS_COMMENT,
        RDFS_SUBCLASSOF,
        RDFS_SUBPROPERTYOF,
        RDFS_DOMAIN,
        RDFS_RANGE,
        RDFS_SEEALSO,
        RDFS_ISDEFINEDBY,
        OWL_INVERSEOF,
    }
)

# Sentinel graph key for the default graph (RdfParser.php:140)
DEFAULT_GRAPH = "_:default"

FORMAT_JSONLD = "json-ld"
FORMAT_TURTLE = "turtle"
FORMAT_NTRIPLES = "n-triples"
FORMAT_NQUADS = "n-quads"
FORMAT_RDFXML = "rdf/xml"
FORMAT_UNKNOWN = "unknown"

# Detection priority: JSON-LD → Turtle → N-Triples → RDF/XML
# (RdfParser.php:219-227; rationale docs/spec-completeness.md:420)
FORMAT_PRIORITY = (
    FORMAT_JSONLD, FORMAT_TURTLE, FORMAT_NQUADS, FORMAT_NTRIPLES, FORMAT_RDFXML
)
