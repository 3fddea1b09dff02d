"""RDF/XML sniffer + parser (xml.etree based).

Reference scope (docs/spec-completeness.md:154-166): basic XML parsing,
``xmlns:`` declarations, ``rdf:about`` node identification, ``rdf:resource``
references, typed node elements. ``rdf:parseType=*``, ``rdf:ID`` and
``rdf:nodeID`` are intentionally NOT supported (matching the reference).

Besides triples, :func:`parse` returns the parsed element tree so the
extraction stage can run the reference's SimpleXML fallback path
(ClassExtractor.php:131-165, PropertyExtractor.php:273-330) — re-implemented
over ElementTree in extract/xmlfallback.py.
"""

from __future__ import annotations

import itertools
import re
import xml.etree.ElementTree as ET

from parser_rdf_ray.model import BNODE, IRI, LITERAL, ParseError, Triple
from parser_rdf_ray.vocab import RDF

_RDF_NS = "{" + RDF + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"

_DETECT_XMLDECL_RE = re.compile(r"^\s*<\?xml", re.S)
_DETECT_RDFTAG_RE = re.compile(r"<(?:\w+:)?RDF[\s>]")
_XMLNS_RE = re.compile(r'xmlns:([^=]+)="([^"]+)"', re.I)


def can_handle(content: str) -> bool:
    """RDF/XML detection: ``<?xml`` declaration or an ``<rdf:RDF>``-style root
    (docs/spec-completeness.md:295; tests/Unit/RdfParserTest.php:38-41)."""
    return bool(_DETECT_XMLDECL_RE.match(content)) or bool(_DETECT_RDFTAG_RE.search(content))


def extract_xmlns_prefixes(content: str) -> dict[str, str]:
    """Raw-content xmlns:prefix="uri" regex scan (PrefixExtractor.php:121-136)."""
    out: dict[str, str] = {}
    for prefix, ns in _XMLNS_RE.findall(content):
        prefix = prefix.strip()
        ns = ns.strip()
        if prefix and ns:
            out[prefix] = ns
    return out


def _split_qname(tag: str) -> str:
    """ElementTree tag '{ns}local' → full URI 'nslocal'."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class _XmlToTriples:
    def __init__(self):
        self.triples: list[Triple] = []
        self._bnode_ids = itertools.count(1)

    def _new_bnode(self) -> str:
        return f"xmlgenid{next(self._bnode_ids)}"

    def convert(self, root: ET.Element) -> list[Triple]:
        if _split_qname(root.tag) == RDF + "RDF":
            nodes = list(root)
        else:
            nodes = [root]  # single top-level typed node document
        for node in nodes:
            self._node_element(node)
        return self.triples

    def _node_element(self, el: ET.Element) -> tuple[str, str]:
        about = el.get(_RDF_NS + "about")
        if about is not None:
            subj_kind, subj = IRI, about
        else:
            subj_kind, subj = BNODE, self._new_bnode()

        type_uri = _split_qname(el.tag)
        if type_uri != RDF + "Description":
            self.triples.append(
                Triple(subj, subj_kind, RDF + "type", type_uri, IRI, "", "", 0)
            )

        for prop in el:
            self._property_element(subj_kind, subj, prop)
        return subj_kind, subj

    def _property_element(self, subj_kind: str, subj: str, prop: ET.Element) -> None:
        pred = _split_qname(prop.tag)
        resource = prop.get(_RDF_NS + "resource")
        datatype = prop.get(_RDF_NS + "datatype")
        lang = prop.get(_XML_LANG, "")

        if resource is not None:
            self.triples.append(Triple(subj, subj_kind, pred, resource, IRI, "", "", 0))
            return

        children = list(prop)
        if children:
            # nested node element → bnode/IRI object
            for child in children:
                o_kind, o_val = self._node_element(child)
                self.triples.append(Triple(subj, subj_kind, pred, o_val, o_kind, "", "", 0))
            return

        text = prop.text or ""
        self.triples.append(
            Triple(subj, subj_kind, pred, text, LITERAL, datatype or "", lang, 0)
        )


def parse(content: str) -> tuple[list[Triple], ET.Element]:
    """Parse RDF/XML → (triples, element tree root).

    Malformed XML raises ParseError (the reference wraps its handler failure
    as 'RDF parsing failed: ...', RdfParser.php:68-76).
    """
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        raise ParseError(f"RDF/XML parsing failed: {e}") from e
    return _XmlToTriples().convert(root), root
