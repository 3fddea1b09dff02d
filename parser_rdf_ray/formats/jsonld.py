"""JSON-LD sniffer + parser.

Reference scope (docs/spec-completeness.md:172-179): ``@context`` prefix
handling and graph extraction of flat node objects; remote contexts and
framing are NOT supported. The integration fixture (sample.jsonld) uses a
top-level ``@graph`` array with prefixed names, so that shape is in scope.

Supported node-object keys: ``@id``, ``@type``, ``@graph``; values may be
strings (IRIs or prefixed names for object properties), literal strings,
``{"@value": ..., "@language"/"@type": ...}`` objects, ``{"@id": ...}``
references, nested node objects, and arrays of any of those.
"""

from __future__ import annotations

import itertools
import json
import re

from parser_rdf_ray.model import BNODE, IRI, LITERAL, ParseError, Triple
from parser_rdf_ray.vocab import RDF_TYPE, XSD

_DETECT_RE = re.compile(r'^\s*[\[{]')
_URLISH_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://\S+$|^urn:\S+$")
_ABS_IRI_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def can_handle(content: str) -> bool:
    """JSON-LD detection: JSON-looking content containing "@context"
    (docs/spec-completeness.md:292; tests/Unit/RdfParserTest.php:43-45)."""
    return bool(_DETECT_RE.match(content)) and '"@context"' in content


def extract_context_prefixes(content: str) -> dict[str, str]:
    """@context prefix map with URL validation (PrefixExtractor.php:159-173)."""
    try:
        decoded = json.loads(content)
    except (ValueError, TypeError):
        return {}
    ctx = decoded.get("@context") if isinstance(decoded, dict) else None
    if not isinstance(ctx, dict):
        return {}
    out: dict[str, str] = {}
    for k, v in ctx.items():
        if isinstance(k, str) and isinstance(v, str) and _URLISH_RE.match(v):
            out[k] = v
    return out


class _JsonLdToTriples:
    def __init__(self, context: dict[str, str]):
        self.context = context
        self.triples: list[Triple] = []
        self._bnode_ids = itertools.count(1)
        # current named-graph IRI; "" = default graph. A node object with
        # BOTH @id and @graph names a graph: its members' triples carry
        # that IRI (the engine extension past the reference's
        # single-graph JSON-LD scope; keyed per RdfParser.php:136-154)
        self._graph = ""

    def _new_bnode(self) -> str:
        return f"jsongenid{next(self._bnode_ids)}"

    def _expand(self, term: str) -> str:
        """Prefixed name / context term → full IRI."""
        if term.startswith("_:"):
            return term
        prefix, sep, local = term.partition(":")
        if sep and prefix in self.context:
            return self.context[prefix] + local
        if term in self.context:
            return self.context[term]
        return term

    def _expand_pred(self, key: str) -> str | None:
        expanded = self._expand(key)
        if not _ABS_IRI_RE.match(expanded):
            return None  # non-IRI terms with no context mapping are dropped
        return expanded

    def node(self, obj: dict) -> tuple[str, str]:
        node_id = obj.get("@id")
        if isinstance(node_id, str) and node_id.startswith("_:"):
            subj_kind, subj = BNODE, node_id[2:]
        elif isinstance(node_id, str) and node_id:
            subj_kind, subj = IRI, self._expand(node_id)
        else:
            subj_kind, subj = BNODE, self._new_bnode()

        for key, value in obj.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                types = value if isinstance(value, list) else [value]
                for t in types:
                    if isinstance(t, str):
                        self.triples.append(
                            Triple(
                                subj, subj_kind, RDF_TYPE, self._expand(t), IRI,
                                "", "", 0, self._graph,
                            )
                        )
                continue
            if key == "@graph":
                # explicit @id on the container → NAMED graph for members;
                # no @id (e.g. the top-level {"@context", "@graph"} shape)
                # → members stay in the enclosing graph
                outer = self._graph
                if isinstance(node_id, str) and node_id and subj_kind == IRI:
                    self._graph = subj
                items = value if isinstance(value, list) else [value]
                for item in items:
                    if isinstance(item, dict):
                        self.node(item)
                self._graph = outer
                continue
            pred = self._expand_pred(key)
            if pred is None:
                continue
            values = value if isinstance(value, list) else [value]
            for v in values:
                self._value(subj_kind, subj, pred, v)
        return subj_kind, subj

    def _value(self, subj_kind: str, subj: str, pred: str, v) -> None:
        if isinstance(v, dict):
            if "@value" in v:
                val = v["@value"]
                lang = v.get("@language", "") or ""
                dt = v.get("@type", "") or ""
                if dt:
                    dt = self._expand(dt)
                if isinstance(val, bool):
                    val, dt = ("true" if val else "false"), dt or XSD + "boolean"
                elif isinstance(val, int):
                    val, dt = str(val), dt or XSD + "integer"
                elif isinstance(val, float):
                    val, dt = str(val), dt or XSD + "double"
                self.triples.append(
                    Triple(subj, subj_kind, pred, str(val), LITERAL, dt, lang, 0, self._graph)
                )
                return
            if set(v.keys()) == {"@id"} and isinstance(v["@id"], str):
                ref = v["@id"]
                if ref.startswith("_:"):
                    self.triples.append(Triple(subj, subj_kind, pred, ref[2:], BNODE, "", "", 0, self._graph))
                else:
                    self.triples.append(
                        Triple(subj, subj_kind, pred, self._expand(ref), IRI, "", "", 0, self._graph)
                    )
                return
            # nested node object
            o_kind, o_val = self.node(v)
            self.triples.append(Triple(subj, subj_kind, pred, o_val, o_kind, "", "", 0, self._graph))
            return
        if isinstance(v, bool):
            self.triples.append(
                Triple(subj, subj_kind, pred, "true" if v else "false", LITERAL, XSD + "boolean", "", 0, self._graph)
            )
            return
        if isinstance(v, int):
            self.triples.append(
                Triple(subj, subj_kind, pred, str(v), LITERAL, XSD + "integer", "", 0, self._graph)
            )
            return
        if isinstance(v, float):
            self.triples.append(
                Triple(subj, subj_kind, pred, str(v), LITERAL, XSD + "double", "", 0, self._graph)
            )
            return
        if isinstance(v, str):
            # string values: treat absolute-IRI-looking or prefixed-name values
            # that resolve via context as references, else plain literals
            expanded = self._expand(v)
            if expanded != v and _ABS_IRI_RE.match(expanded):
                self.triples.append(Triple(subj, subj_kind, pred, expanded, IRI, "", "", 0, self._graph))
            else:
                self.triples.append(Triple(subj, subj_kind, pred, v, LITERAL, "", "", 0, self._graph))
            return


def parse(content: str) -> tuple[list[Triple], dict[str, str]]:
    """Parse a JSON-LD document → (triples, context prefix map)."""
    try:
        doc = json.loads(content)
    except (ValueError, TypeError) as e:
        raise ParseError(f"JSON-LD parsing failed: {e}") from e

    if isinstance(doc, list):
        nodes = [n for n in doc if isinstance(n, dict)]
        context: dict[str, str] = {}
    elif isinstance(doc, dict):
        ctx = doc.get("@context")
        context = {k: v for k, v in ctx.items() if isinstance(k, str) and isinstance(v, str)} if isinstance(ctx, dict) else {}
        nodes = [doc]
    else:
        raise ParseError("JSON-LD parsing failed: document must be an object or array")

    conv = _JsonLdToTriples(context)
    for n in nodes:
        conv.node(n)
    return conv.triples, context
