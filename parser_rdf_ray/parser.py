"""Single-document parse orchestration — the RdfParser equivalent.

Pure Python (no Ray): this is the per-document function the Ray parse stage
maps over batches, and also the unit-testable entry point mirroring
RdfParser::parse (src/RdfParser.php:56-77). Pipeline:

    empty guard → format detection/override → format parse → triples
    → doc-scope extraction (classes/properties/prefixes/shapes)
    → metadata + graphs assembly

Raises ParseError / FormatDetectionError like the reference; the Ray stage
wrapper converts exceptions to error rows (one poison doc must not kill a
10^12-doc job — SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import Any

from parser_rdf_ray.extract import entities, xmlfallback
from parser_rdf_ray.extract.docgraph import DocGraph
from parser_rdf_ray.formats import detect as detect_mod
from parser_rdf_ray.formats.detect import DEFAULT_PLUGINS, FormatPlugin
from parser_rdf_ray.model import FormatDetectionError, ParseError, Triple
from parser_rdf_ray.vocab import (
    DEFAULT_GRAPH,
    FORMAT_JSONLD,
    FORMAT_RDFXML,
    FORMAT_TURTLE,
)


def parse_document(content: str, options: dict[str, Any] | None = None) -> dict[str, Any]:
    """Parse one RDF document into a ParsedOntology-shaped dict.

    Keys: classes, properties, prefixes, shapes, restrictions, metadata,
    raw_content, graphs, triples, format. classes/properties/shapes are
    keyed by uri with last-write-wins (RdfParser.php:169-211 — the implicit
    exact-dedup-by-key operator W1).
    """
    options = options or {}
    plugins = options.get("plugins", DEFAULT_PLUGINS)

    if not content.strip():
        raise ParseError("Cannot parse empty content")

    fmt, triples, extras = _parse_content(content, options, plugins)

    g = DocGraph(triples)
    include_skolemized = bool(options.get("includeSkolemizedBlankNodes", False))

    # extras double as the parser prefix map (X1); only string→string
    # entries are prefixes — plugin side-channels like 'additional_graphs'
    # (consumed by _build_graphs) must not leak into the prefix table
    parser_prefixes = (
        {k: v for k, v in extras.items() if isinstance(k, str) and isinstance(v, str)}
        if isinstance(extras, dict)
        else None
    )
    xml_root = extras if fmt == FORMAT_RDFXML else None

    prefixes = entities.extract_prefixes(g, fmt, content, parser_prefixes)

    if fmt == FORMAT_RDFXML and xml_root is not None:
        # dual extraction path: XML fallback for classes/properties
        # (ClassExtractor.php:47-55, PropertyExtractor.php:47-55)
        classes = xmlfallback.extract_classes_from_xml(xml_root)
        properties = xmlfallback.extract_properties_from_xml(xml_root)
    else:
        classes = entities.extract_classes(g, prefixes, include_skolemized)
        properties = entities.extract_properties(g, prefixes, include_skolemized)

    shapes = entities.extract_shapes(g, prefixes, fmt)

    return {
        "format": fmt,
        "triples": triples,
        "classes": {c["uri"]: c for c in classes},
        "properties": {p["uri"]: p for p in properties},
        "prefixes": prefixes,
        "shapes": {s["uri"]: s for s in shapes},
        "restrictions": {},  # base-class extractRestrictions (RdfParser.php:214-217)
        "metadata": {
            "format": fmt,
            "resource_count": g.resource_count(),
        },
        "raw_content": content,
        "graphs": _build_graphs(fmt, triples, extras),
    }


def _build_graphs(fmt: str, triples, extras) -> dict[str, dict]:
    """Graphs assembly (W3 full, RdfParser::buildGraphs, RdfParser.php:136-154):
    keyed by graph URI with the '_:default' sentinel for the default graph.
    Per-graph entries carry format + triple_count (our flat-table analog of
    the reference's per-graph ParsedRdf). Handlers may supply extra graphs
    via an 'additional_graphs' key in their extras dict (the reference's
    metadata['additional_graphs'] merge — later entries win on key clash,
    pinned by tests/Unit/NamedGraphSupportTest.php:60-77,145-157)."""
    counts: dict[str, int] = {}
    for t in triples:
        key = t.graph or DEFAULT_GRAPH
        counts[key] = counts.get(key, 0) + 1
    if not counts:
        counts[DEFAULT_GRAPH] = 0
    graphs = {g: {"format": fmt, "triple_count": n} for g, n in counts.items()}
    if isinstance(extras, dict):
        additional = extras.get("additional_graphs")
        if isinstance(additional, dict):
            for uri, meta in additional.items():
                if isinstance(meta, dict):
                    graphs[uri] = meta
    return graphs


def _parse_content(content: str, options: dict, plugins):
    """Handler selection + parse (RdfParser::getHandler, RdfParser.php:232-259)."""
    requested = options.get("format")
    if requested is not None:
        plugin = detect_mod.get_plugin(str(requested), plugins)
        if plugin is None:
            available = ", ".join(detect_mod.supported_formats(plugins))
            raise FormatDetectionError(
                f"No handler registered for format: {requested}. Available: {available}"
            )
    else:
        plugin = None
        for p in plugins:
            try:
                if p.sniff(content):
                    plugin = p
                    break
            except Exception:
                continue
        if plugin is None:
            available = ", ".join(detect_mod.supported_formats(plugins))
            raise FormatDetectionError(
                f"No handler could detect the format of the provided content. Tried: {available}"
            )

    try:
        triples, extras = plugin.parse(content)
    except ParseError:
        raise
    except Exception as e:  # wrap foreign errors (RdfParser.php:70-76)
        raise ParseError(f"RDF parsing failed: {e}") from e
    return plugin.name, triples, extras


def can_parse(content: str, plugins=DEFAULT_PLUGINS) -> bool:
    """canParse — MUST NOT throw (RdfParser.php:79-92)."""
    try:
        for p in plugins:
            if p.sniff(content):
                return True
    except Exception:
        pass
    return False


class RdfParser:
    """Object API mirroring the reference surface for tests and extension:
    parse / canParse / getSupportedFormats / registerHandler
    (src/RdfParser.php:31-106). Subclasses may override build hooks
    (extract_restrictions) like OwlParser/ShaclParser do."""

    def __init__(self):
        self.plugins = DEFAULT_PLUGINS

    def register_handler(self, plugin: FormatPlugin) -> None:
        self.plugins = (plugin,) + self.plugins

    def get_supported_formats(self) -> list[str]:
        return [p.name for p in self.plugins]

    def can_parse(self, content: str) -> bool:
        return can_parse(content, self.plugins)

    def parse(self, content: str, options: dict | None = None) -> dict:
        options = dict(options or {})
        options["plugins"] = self.plugins
        result = parse_document(content, options)
        extra = self.extract_restrictions(result)
        result["restrictions"] = extra
        return result

    def extract_restrictions(self, parsed: dict) -> dict:
        """Overridable hook; base returns {} (RdfParser.php:214-217)."""
        return {}


__all__ = [
    "FormatDetectionError",
    "ParseError",
    "RdfParser",
    "Triple",
    "can_parse",
    "parse_document",
    "FORMAT_TURTLE",
    "FORMAT_JSONLD",
]
