"""N-Quads input handler (beyond-reference extension).

The reference parses four formats (JSON-LD/Turtle/N-Triples/RDF-XML,
RdfParser.php:219-227) and has no quad support; this engine already
EXPORTS N-Quads (sources/ntriples_sink.write_nquads, round-trip-pinned),
so the read side closes the loop: a pipeline can re-ingest its own
named-graph exports. Each line is the strict N-Triples grammar
(formats/ntriples.py — same validators, same reference-shaped error
messages, real line numbers) with an optional fourth `<graph-IRI>` term
split off before tokenizing; label-less lines land in the default graph
exactly as in N-Triples. Blank-node graph labels are out of scope (the
sink emits IRI graphs only; a `_:g` fourth term raises the underlying
N-Triples structure error).

Sniffing: a document claims N-Quads only if its first 10 data lines all
parse AND at least one carries a fourth term — pure N-Triples content
(a syntactic subset) stays with the N-Triples handler, so detection on
reference-scope inputs is unchanged.
"""

from __future__ import annotations

import re

from parser_rdf_ray.formats import ntriples
from parser_rdf_ray.model import ParseError, Triple

# trailing `<graph> .` of a 4-term line (applied only after the 3-term
# parse fails, so `<s> <p> <o> .` can never lose its object to it)
_GRAPH_RE = re.compile(r"^(.*\S)\s+<([^<>\s]+)>\s*\.\s*$")


def _parse_line(trimmed: str, line_no: int) -> Triple:
    cleaned = ntriples.validate_line(trimmed, line_no)
    return ntriples.tokenize_line(cleaned, line_no)


def _quad_line(trimmed: str, line_no: int) -> Triple:
    """One data line → Triple (graph set for 4-term lines)."""
    base = ntriples.strip_trailing_comment(trimmed).strip()
    try:
        return _parse_line(base, line_no)
    except ParseError:
        m = _GRAPH_RE.match(base)
        if m is None:
            raise
        t = _parse_line(m.group(1) + " .", line_no)
        return t._replace(graph=m.group(2))


def can_handle(content: str) -> bool:
    """First-10-data-lines sniff; requires ≥ 1 four-term line so plain
    N-Triples keeps its own handler. Never throws (S5/P17 contract)."""
    try:
        seen = 0
        any_graph = False
        for idx, raw in enumerate(content.split("\n")):
            trimmed = raw.strip()
            if not trimmed or trimmed.startswith("#"):
                continue
            t = _quad_line(trimmed, idx + 1)
            any_graph = any_graph or bool(t.graph)
            seen += 1
            if seen >= 10:
                break
        return seen > 0 and any_graph
    except Exception:
        return False


def parse(content: str):
    """Whole-document N-Quads parse → (triples, None). Mirrors
    formats/ntriples.parse line handling (blank/comment skip, 1 MiB
    max-line guard, real line numbers in every error)."""
    triples: list[Triple] = []
    for idx, raw in enumerate(content.split("\n")):
        line_no = idx + 1
        trimmed = raw.strip()
        if not trimmed or trimmed.startswith("#"):
            continue
        if len(raw) > ntriples.MAX_LINE_LENGTH:
            ntriples._fail(line_no, "line exceeds maximum length")
        triples.append(_quad_line(trimmed, line_no))
    return triples, None
