"""RDF/XML fallback extraction path (E21).

Re-implements the reference's SimpleXML fallback over ElementTree:
ClassExtractor.php:131-255 (class elements by qualified tag name, rdf:about
URIs, lang-tagged label/comment texts, rdf:resource references) and
PropertyExtractor.php:273-483 (10 property element selectors, element-name /
rdf:type-based property typing, functional detection, range-from-comment).
The 'source' marker 'fallback_rdf_xml' is preserved (ClassExtractor.php:159).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from parser_rdf_ray.vocab import OWL, RDF, RDFS

_RDF_NS = "{" + RDF + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"

_CLASS_TAGS = (
    "{%s}Class" % RDFS,
    "{%s}Class" % OWL,
)
_PROPERTY_TAGS = (
    "{%s}Property" % RDF,
    "{%s}DatatypeProperty" % OWL,
    "{%s}ObjectProperty" % OWL,
    "{%s}AnnotationProperty" % OWL,
    "{%s}FunctionalProperty" % OWL,
)
_PROPERTY_TYPE_URIS = (
    RDF + "Property",
    OWL + "DatatypeProperty",
    OWL + "ObjectProperty",
    OWL + "AnnotationProperty",
    OWL + "FunctionalProperty",
)


def _local_name(tag: str) -> str:
    return tag.split("}", 1)[1] if tag.startswith("{") else tag


def _texts_with_lang(el: ET.Element, tag: str) -> dict[str, str]:
    """Lang-tagged child texts; untagged text fills 'en' if empty
    (ClassExtractor.php:187-210)."""
    texts: dict[str, str] = {}
    for child in el.findall(tag):
        lang = child.get(_XML_LANG, "")
        value = child.text or ""
        if lang:
            texts[lang] = value
        elif not texts.get("en"):
            texts["en"] = value
    return texts


def _first_text(el: ET.Element, tag: str) -> str | None:
    for child in el.findall(tag):
        return child.text or ""
    return None


def _resources(el: ET.Element, tag: str) -> list[str]:
    out = []
    for child in el.findall(tag):
        r = child.get(_RDF_NS + "resource", "")
        if r:
            out.append(r)
    return out


def _type_resource_uris(el: ET.Element) -> list[str]:
    return [
        t.get(_RDF_NS + "resource", "")
        for t in el.findall(_RDF_NS + "type")
    ]


def extract_classes_from_xml(root: ET.Element) -> list[dict]:
    classes = []
    for el in root.iter():
        if el.tag not in _CLASS_TAGS:
            continue
        uri = el.get(_RDF_NS + "about", "")
        if not uri:
            continue
        classes.append(
            {
                "uri": uri,
                "label": _first_text(el, "{%s}label" % RDFS),
                "labels": _texts_with_lang(el, "{%s}label" % RDFS),
                "description": _first_text(el, "{%s}comment" % RDFS),
                "descriptions": _texts_with_lang(el, "{%s}comment" % RDFS),
                "parent_classes": _resources(el, "{%s}subClassOf" % RDFS),
                "metadata": {
                    "source": "fallback_rdf_xml",
                    "element_name": _local_name(el.tag),
                },
            }
        )
    return classes


def _property_type_from_xml(el: ET.Element, element_name: str) -> str:
    # PropertyExtractor.php:332-359
    if "ObjectProperty" in element_name:
        return "object"
    if "AnnotationProperty" in element_name:
        return "annotation"
    for uri in _type_resource_uris(el):
        if "ObjectProperty" in uri:
            return "object"
        if "DatatypeProperty" in uri:
            return "datatype"
        if "AnnotationProperty" in uri:
            return "annotation"
    return "datatype"


def _is_functional_xml(el: ET.Element, element_name: str) -> bool:
    # PropertyExtractor.php:361-381
    if "FunctionalProperty" in element_name:
        return True
    return any("FunctionalProperty" in uri for uri in _type_resource_uris(el))


def _range_from_xml_comments(el: ET.Element) -> list[str]:
    from parser_rdf_ray.extract.entities import _RANGE_COMMENT_RULES

    ranges = []
    for child in el.findall("{%s}comment" % RDFS):
        text = (child.text or "").strip().lower()
        for rx, uri in _RANGE_COMMENT_RULES:
            if rx.search(text):
                if uri not in ranges:
                    ranges.append(uri)
                break
    return ranges


def extract_properties_from_xml(root: ET.Element) -> list[dict]:
    # element selection = tag-name matches ∪ rdf:type-attribute matches
    # (PropertyExtractor.php:279-290), deduped by element identity
    selected: list[ET.Element] = []
    seen: set[int] = set()
    for el in root.iter():
        match = el.tag in _PROPERTY_TAGS
        if not match and el.get(_RDF_NS + "about"):
            match = any(uri in _PROPERTY_TYPE_URIS for uri in _type_resource_uris(el))
        if match and id(el) not in seen:
            seen.add(id(el))
            selected.append(el)

    properties = []
    for el in selected:
        uri = el.get(_RDF_NS + "about", "")
        if not uri:
            continue
        element_name = _local_name(el.tag)
        rng = _resources(el, "{%s}range" % RDFS)
        if not rng:
            rng = _range_from_xml_comments(el)
        properties.append(
            {
                "uri": uri,
                "label": _first_text(el, "{%s}label" % RDFS),
                "labels": _texts_with_lang(el, "{%s}label" % RDFS),
                "description": _first_text(el, "{%s}comment" % RDFS),
                "descriptions": _texts_with_lang(el, "{%s}comment" % RDFS),
                "property_type": _property_type_from_xml(el, element_name),
                "domain": _resources(el, "{%s}domain" % RDFS),
                "range": rng,
                "parent_properties": _resources(el, "{%s}subPropertyOf" % RDFS),
                "inverse_of": _resources(el, "{%s}inverseOf" % OWL),
                "is_functional": _is_functional_xml(el, element_name),
                "metadata": {
                    "source": "fallback_rdf_xml",
                    "element_name": element_name,
                },
            }
        )
    return properties
