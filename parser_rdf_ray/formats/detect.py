"""Format auto-detection (S2-S5).

Fixed priority JSON-LD → Turtle → N-Triples → RDF/XML, first sniffer wins
(RdfParser.php:219-227,249-253; rationale docs/spec-completeness.md:420).
A format-plugin registry supports prepend-on-register custom formats, the
Ray equivalent of RdfParser::registerHandler (RdfParser.php:103-106).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

from parser_rdf_ray.formats import jsonld, nquads, ntriples, rdfxml, turtle
from parser_rdf_ray.vocab import (
    FORMAT_JSONLD,
    FORMAT_NQUADS,
    FORMAT_NTRIPLES,
    FORMAT_RDFXML,
    FORMAT_TURTLE,
    FORMAT_UNKNOWN,
)


class FormatPlugin(NamedTuple):
    name: str
    sniff: Callable[[str], bool]
    # parse(content) -> (triples, extras); extras format-specific
    parse: Callable[[str], tuple]


# N-Quads sits BEFORE N-Triples (its syntactic subset): the quad sniffer
# only claims content with a 4-term line, which the N-Triples sniffer
# rejects anyway, so detection on reference-scope inputs is unchanged —
# the reference's relative priority (S2) is preserved with one
# beyond-reference insertion (the read side of the N-Quads export).
DEFAULT_PLUGINS: tuple[FormatPlugin, ...] = (
    FormatPlugin(FORMAT_JSONLD, jsonld.can_handle, jsonld.parse),
    FormatPlugin(FORMAT_TURTLE, turtle.can_handle, turtle.parse),
    FormatPlugin(FORMAT_NQUADS, nquads.can_handle, nquads.parse),
    FormatPlugin(FORMAT_NTRIPLES, ntriples.can_handle, lambda c: (ntriples.parse(c), None)),
    FormatPlugin(FORMAT_RDFXML, rdfxml.can_handle, rdfxml.parse),
)


def supported_formats(plugins: tuple[FormatPlugin, ...] = DEFAULT_PLUGINS) -> list[str]:
    """Dynamic handler-name introspection (RdfParser.php:94-101)."""
    return [p.name for p in plugins]


def register_plugin(
    plugin: FormatPlugin, plugins: tuple[FormatPlugin, ...] = DEFAULT_PLUGINS
) -> tuple[FormatPlugin, ...]:
    """Prepend a custom plugin so it is checked before defaults
    (RdfParser.php:103-106)."""
    return (plugin,) + plugins


def detect_format(
    content: str, plugins: tuple[FormatPlugin, ...] = DEFAULT_PLUGINS
) -> str:
    """First-match sniffing; 'unknown' instead of raising (the dataset-scale
    analog of canParse, RdfParser.php:79-92 — never throws)."""
    for p in plugins:
        try:
            if p.sniff(content):
                return p.name
        except Exception:
            continue
    return FORMAT_UNKNOWN


def get_plugin(
    name: str, plugins: tuple[FormatPlugin, ...] = DEFAULT_PLUGINS
) -> FormatPlugin | None:
    for p in plugins:
        if p.name == name:
            return p
    return None
