"""Doc-scope entity extraction: classes, properties, shapes, prefixes.

Graph-path extraction over a DocGraph (E1-E20, X1-X6 in SURVEY.md §2).
Record shapes mirror the reference exactly (keys always present):
ClassExtractor.php:84-98, PropertyExtractor.php:92-111,
ShapeExtractor.php:83-99, PrefixExtractor.php:28-53.

The RDF/XML fallback path lives in extract/xmlfallback.py.
"""

from __future__ import annotations

import re

from parser_rdf_ray.extract.docgraph import DocGraph
from parser_rdf_ray.model import BNODE, IRI
from parser_rdf_ray.vocab import (
    CLASS_TYPE_URIS,
    COMMON_PREFIXES,
    FORMAT_JSONLD,
    FORMAT_RDFXML,
    FORMAT_TURTLE,
    OWL_FUNCTIONAL_PROPERTY,
    OWL_INVERSEOF,
    OWL_UNIONOF,
    PROPERTY_TYPE_URIS,
    RDF_LANGSTRING,
    RDFS_DOMAIN,
    RDFS_ISDEFINEDBY,
    RDFS_RANGE,
    RDFS_SEEALSO,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    SH,
    SHACL_CONSTRAINT_PROPERTIES,
    SHAPE_TYPE_URIS,
    XSD,
)

# Range-from-comment regex cascade, in reference precedence order
# (PropertyExtractor.php:239-268; precedence pinned by
# PropertyExtractorTest.php:308-329). Applied to lowercased text.
_RANGE_COMMENT_RULES = (
    (re.compile(r"range.*(?:plain literal|rdf literal|language-tagged|lang.*string)"), RDF_LANGSTRING),
    (re.compile(r"range.*rdfs:literal"), XSD + "string"),
    (re.compile(r"range.*is.*literal"), XSD + "string"),
    (re.compile(r"range.*(?:xsd:string|string)"), XSD + "string"),
    (re.compile(r"range.*(?:xsd:datetime|datetime)"), XSD + "dateTime"),
    (re.compile(r"range.*(?:xsd:boolean|boolean)"), XSD + "boolean"),
    (re.compile(r"range.*(?:xsd:integer|integer)"), XSD + "integer"),
)


def _find_typed_resources(g: DocGraph, type_uris: frozenset) -> list[tuple[str, str]]:
    """Resources whose rdf:type intersects the given set (E1-E3 pattern;
    ClassExtractor.php:109-124)."""
    out = []
    for key, kind in g.resources():
        for t in g.types(key):
            if t in type_uris:
                out.append((key, kind))
                break
    return out


def _entity_uri(key: str, kind: str, include_skolemized: bool) -> str | None:
    """Blank-node filter / skolemizer (E4; ClassExtractor.php:75-79).
    Returns None to drop, else the (possibly skolemized) URI."""
    if kind == BNODE:
        if not include_skolemized:
            return None
        return "urn:bnode:" + key[2:]  # key is '_:label'
    return key


def extract_classes(
    g: DocGraph, prefixes: dict[str, str], include_skolemized: bool = False
) -> list[dict]:
    """E1 + E4-E10 (ClassExtractor.php:62-102)."""
    classes = []
    for key, kind in _find_typed_resources(g, CLASS_TYPE_URIS):
        uri = _entity_uri(key, kind, include_skolemized)
        if uri is None:
            continue
        if kind == IRI and g.is_anonymous_owl_expression(key):
            continue
        classes.append(
            {
                "uri": uri,
                "label": g.label(key),
                "labels": g.labels(key),
                "description": g.comment(key),
                "descriptions": g.comments(key),
                "parent_classes": g.iri_values(key, RDFS_SUBCLASSOF),
                "metadata": {
                    "source": "graph",
                    "types": g.types(key),
                    "see_also": g.named_values(key, RDFS_SEEALSO),
                    "is_defined_by": g.named_values(key, RDFS_ISDEFINEDBY),
                    "annotations": g.annotations(key, prefixes),
                },
            }
        )
    return classes


def _determine_property_type(types: list[str]) -> str:
    """First match wins: Object→object, Datatype→datatype,
    Annotation→annotation; default datatype (PropertyExtractor.php:140-153)."""
    for t in types:
        if "ObjectProperty" in t:
            return "object"
        if "DatatypeProperty" in t:
            return "datatype"
        if "AnnotationProperty" in t:
            return "annotation"
    return "datatype"


def _class_expression(g: DocGraph, key: str, pred: str) -> list[str]:
    """Domain/range values; named URIs direct, bnode values resolved through
    owl:unionOf RDF lists, bnode members filtered, deduped
    (PropertyExtractor.php:164-183)."""
    out: list[str] = []
    for t in g.objects(key, pred):
        if t.obj_kind == IRI:
            out.append(t.obj)
        elif t.obj_kind == BNODE:
            bkey = "_:" + t.obj
            for u in g.objects(bkey, OWL_UNIONOF):
                head = u.obj if u.obj_kind == IRI else "_:" + u.obj
                members = g.rdf_list_members(head)
                out.extend(m for m in members if not m.startswith("_:"))
    seen: set[str] = set()
    deduped = []
    for u in out:
        if u not in seen:
            seen.add(u)
            deduped.append(u)
    return deduped


def _range_from_comments(g: DocGraph, key: str) -> list[str]:
    """E15 — only-if-formal-range-empty fallback
    (PropertyExtractor.php:223-268)."""
    ranges = []
    for text in g.comment_texts(key):
        text = text.strip().lower()
        for rx, uri in _RANGE_COMMENT_RULES:
            if rx.search(text):
                if uri not in ranges:
                    ranges.append(uri)
                break
    return ranges


def extract_properties(
    g: DocGraph, prefixes: dict[str, str], include_skolemized: bool = False
) -> list[dict]:
    """E2 + E11-E15 (PropertyExtractor.php:60-115)."""
    properties = []
    for key, kind in _find_typed_resources(g, PROPERTY_TYPE_URIS):
        if kind == BNODE:
            # bnode properties additionally skip anonymous OWL expressions
            # even when skolemizing (PropertyExtractor.php:73-78)
            if g.is_anonymous_owl_expression(key):
                continue
        elif g.is_anonymous_owl_expression(key):
            continue
        uri = _entity_uri(key, kind, include_skolemized)
        if uri is None:
            continue
        types = g.types(key)
        rng = _class_expression(g, key, RDFS_RANGE)
        if not rng:
            rng = _range_from_comments(g, key)
        properties.append(
            {
                "uri": uri,
                "label": g.label(key),
                "labels": g.labels(key),
                "description": g.comment(key),
                "descriptions": g.comments(key),
                "property_type": _determine_property_type(types),
                "domain": _class_expression(g, key, RDFS_DOMAIN),
                "range": rng,
                "parent_properties": g.iri_values(key, RDFS_SUBPROPERTYOF),
                "inverse_of": g.iri_values(key, OWL_INVERSEOF),
                "is_functional": OWL_FUNCTIONAL_PROPERTY in types,
                "metadata": {
                    "source": "graph",
                    "types": types,
                    "see_also": g.named_values(key, RDFS_SEEALSO),
                    "is_defined_by": g.named_values(key, RDFS_ISDEFINEDBY),
                    "annotations": g.annotations(key, prefixes),
                },
            }
        )
    return properties


def extract_shapes(g: DocGraph, prefixes: dict[str, str], fmt: str) -> list[dict]:
    """E16-E19 (ShapeExtractor.php:54-181). RDF/XML → [] unconditionally
    (ShapeExtractor.php:56-58)."""
    if fmt == FORMAT_RDFXML:
        return []
    shapes = []
    for key, kind in g.resources():
        if not any(t in SHAPE_TYPE_URIS for t in g.types(key)):
            continue
        if kind == BNODE:
            continue  # shapes need a URI (ShapeExtractor.php:78-81)
        shapes.append(
            {
                "uri": key,
                "label": g.label(key),
                "description": g.comment(key),
                "target_class": g.first_value(key, SH + "targetClass"),
                "target_node": g.first_value(key, SH + "targetNode"),
                "target_subjects_of": g.first_value(key, SH + "targetSubjectsOf"),
                "target_objects_of": g.first_value(key, SH + "targetObjectsOf"),
                "target_property": g.first_value(key, SH + "path"),
                "property_shapes": _extract_property_shapes(g, key),
                "constraints": _extract_constraints(g, key),
                "metadata": {
                    "source": "graph",
                    "types": g.types(key),
                    "annotations": g.annotations(key, prefixes),
                },
            }
        )
    return shapes


def _extract_property_shapes(g: DocGraph, shape_key: str) -> list[dict]:
    """Nested sh:property (usually bnode) shape records; shapes without a
    path dropped; null entries removed (ShapeExtractor.php:121-163)."""
    out = []
    for t in g.objects(shape_key, SH + "property"):
        pkey = t.obj if t.obj_kind == IRI else "_:" + t.obj
        rec = {
            "path": g.first_value(pkey, SH + "path"),
            "label": g.label(pkey),
            "labels": g.labels(pkey),
            "datatype": g.first_value(pkey, SH + "datatype"),
            "nodeKind": g.first_value(pkey, SH + "nodeKind"),
            "minCount": g.first_value(pkey, SH + "minCount"),
            "maxCount": g.first_value(pkey, SH + "maxCount"),
            "minLength": g.first_value(pkey, SH + "minLength"),
            "maxLength": g.first_value(pkey, SH + "maxLength"),
            "pattern": g.first_value(pkey, SH + "pattern"),
            "class": g.first_value(pkey, SH + "class"),
            "message": g.first_value(pkey, SH + "message"),
            "name": g.first_value(pkey, SH + "name"),
            "description": g.first_value(pkey, SH + "description"),
            "descriptions": g.comments(pkey),
        }
        if rec["path"]:
            out.append({k: v for k, v in rec.items() if v})  # array_filter
    return out


def _extract_constraints(g: DocGraph, shape_key: str) -> dict[str, str]:
    """13 sh:* constraint predicates; key = name minus 'sh:'
    (ShapeExtractor.php:168-181)."""
    out = {}
    for name in SHACL_CONSTRAINT_PROPERTIES:
        v = g.first_value(shape_key, SH + name)
        if v is not None:
            out[name] = v
    return out


def extract_prefixes(
    g: DocGraph,
    fmt: str,
    content: str,
    parser_prefixes: dict[str, str] | None,
    xml_ns: dict[str, str] | None = None,
) -> dict[str, str]:
    """X1-X6 layered merge (PrefixExtractor.php:28-53): parser-recorded
    prefixes, then content regexes by format, then XML namespace map, then
    add-only common-prefix auto-detection."""
    prefixes: dict[str, str] = {}
    if parser_prefixes:
        prefixes.update(parser_prefixes)  # X1 analog (graph namespace map)
    prefixes.update(_prefixes_from_content(content, fmt))  # X2-X4
    if xml_ns:
        prefixes.update(xml_ns)  # X3 SimpleXML-namespaces analog
    # X5: add-only, and only when some resource URI lives in the namespace
    for pfx, ns in COMMON_PREFIXES.items():
        if pfx in prefixes:
            continue
        if any(u.startswith(ns) for u in g.resource_iris):
            prefixes[pfx] = ns
    return prefixes


_TURTLE_PREFIX_RE = re.compile(r"@prefix\s+([^:]+):\s*<([^>]+)>", re.I)
_SPARQL_PREFIX_RE = re.compile(r"PREFIX\s+([^:]+):\s*<([^>]+)>", re.I)


_FORMAT_ALIASES = {
    # PrefixExtractor.php:81-82 match arms accept these short names
    "ttl": FORMAT_TURTLE,
    "xml": FORMAT_RDFXML,
    "jsonld": FORMAT_JSONLD,
}


def _prefixes_from_content(content: str, fmt: str) -> dict[str, str]:
    """Format-dispatched raw-content prefix regexes
    (PrefixExtractor.php:78-173); accepts the reference's short aliases."""
    fmt = _FORMAT_ALIASES.get(fmt, fmt)
    out: dict[str, str] = {}
    if fmt == FORMAT_TURTLE:
        for rx in (_TURTLE_PREFIX_RE, _SPARQL_PREFIX_RE):
            for pfx, ns in rx.findall(content):
                pfx, ns = pfx.strip(), ns.strip()
                if pfx and ns:
                    out[pfx] = ns
    elif fmt == FORMAT_RDFXML:
        from parser_rdf_ray.formats.rdfxml import extract_xmlns_prefixes

        out.update(extract_xmlns_prefixes(content))
    elif fmt == FORMAT_JSONLD:
        from parser_rdf_ray.formats.jsonld import extract_context_prefixes

        out.update(extract_context_prefixes(content))
    return out
