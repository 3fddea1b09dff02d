"""N-Triples serialization sink (the inverse of the parse path).

The reference library is parse-only; a KG engine also needs to EMIT its
graph. ``serialize_ntriples_batch`` turns adjacency rows into canonical
N-Triples lines with vectorized escaping (Arrow kernels for the common
escapes, per-value Python only for control characters, which never occur
in canonicalized IRIs and are rare in literals), and ``NTriplesDatasink``
streams them to one ``.nt`` file per block via Ray's file-datasink API —
a distributed write, one task per block, resumable layout like the
Parquet sinks.

Round-trip contract: ``parse(serialize(adjacency)) == adjacency``
(pinned by tests/test_ray_stages.py::TestNTriplesSink).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.block import BlockAccessor
from ray.data.datasource import BlockBasedFileDatasink

_CONTROL = {
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def _escape_literals(col: pa.Array) -> pa.Array:
    """N-Triples string-literal escaping. Backslash first, then quote,
    then control characters (vectorized replace per escape)."""
    col = pc.replace_substring(col, "\\", "\\\\")
    col = pc.replace_substring(col, '"', '\\"')
    for ch, esc in _CONTROL.items():
        col = pc.replace_substring(col, ch, esc)
    return col


def _s(batch: pa.Table, name: str) -> pa.Array:
    """Column as plain string (polars-sorted blocks arrive as
    large_string, which join kernels won't mix with string scalars)."""
    col = batch.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.string())
    return col


def _object_terms(batch: pa.Table) -> pa.Array:
    """Vectorized object-term serialization (shared by the .nt / .nq
    sinks): IRIs as <iri>, literals quoted+escaped with @lang / ^^<dt>."""
    obj = _s(batch, "obj")
    obj_kind = _s(batch, "obj_kind")
    dt = _s(batch, "obj_datatype")
    lang = _s(batch, "obj_lang")

    lit = _escape_literals(obj)
    quoted = pc.binary_join_element_wise('"', lit, '"', "")
    lang_suffix = pc.if_else(
        pc.not_equal(lang, ""), pc.binary_join_element_wise("@", lang, ""), ""
    )
    dt_suffix = pc.if_else(
        pc.and_(pc.not_equal(dt, ""), pc.equal(lang, "")),
        pc.binary_join_element_wise("^^<", dt, ">", ""),
        "",
    )
    literal_term = pc.binary_join_element_wise(quoted, lang_suffix, dt_suffix, "")
    iri_term = pc.binary_join_element_wise("<", obj, ">", "")
    return pc.if_else(pc.equal(obj_kind, "literal"), literal_term, iri_term)


def serialize_ntriples_batch(batch: pa.Table) -> pa.Table:
    """Adjacency rows → one 'line' string column of N-Triples statements."""
    line = pc.binary_join_element_wise(
        "<", _s(batch, "subj"), "> <", _s(batch, "pred"), "> ",
        _object_terms(batch), " .", "",
    )
    return pa.Table.from_arrays([line], names=["line"])


class NTriplesDatasink(BlockBasedFileDatasink):
    """One .nt file per block; input blocks must carry the 'line' column
    (serialize_ntriples_batch upstream)."""

    def __init__(self, path: str, **kwargs):
        super().__init__(path, file_format="nt", **kwargs)

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        table = block.to_arrow()
        lines = table.column("line")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array([0, len(lines)], pa.int32()), lines), "\n"
        )
        payload = (joined[0].as_py() + "\n") if len(lines) else ""
        file.write(payload.encode("utf-8"))


def write_ntriples(adjacency_ds, out_dir: str) -> None:
    """Distributed N-Triples export of a (subj, pred, obj, obj_kind,
    obj_datatype, obj_lang, ...) dataset."""
    lines = adjacency_ds.map_batches(
        serialize_ntriples_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    lines.write_datasink(NTriplesDatasink(out_dir))


# --- N-Quads export ---------------------------------------------------------


def serialize_nquads_batch(batch: pa.Table) -> pa.Table:
    """Adjacency rows → N-Quads lines: the N-Triples serialization plus a
    graph-label term for rows in a NAMED graph. Default-graph rows
    (graph == '_:default') are emitted as plain triples — the N-Quads
    default graph has no label. This is the export that round-trips the
    engine's full named-graph state (W3 full); plain .nt export flattens
    all graphs into one."""
    graph = _s(batch, "graph")
    named = pc.invert(pc.equal(graph, "_:default"))
    graph_part = pc.if_else(
        named, pc.binary_join_element_wise(" <", graph, ">", ""), ""
    )
    line = pc.binary_join_element_wise(
        "<", _s(batch, "subj"), "> <", _s(batch, "pred"), "> ",
        _object_terms(batch), graph_part, " .", "",
    )
    return pa.Table.from_arrays([line], names=["line"])


class NQuadsDatasink(NTriplesDatasink):
    """Same line-per-statement writer, .nq extension (the 'line' column
    upstream is serialize_nquads_batch's)."""

    def __init__(self, path: str, **kwargs):
        BlockBasedFileDatasink.__init__(self, path, file_format="nq", **kwargs)


def write_nquads(adjacency_ds, out_dir: str) -> None:
    """Distributed N-Quads export (graph column preserved)."""
    lines = adjacency_ds.map_batches(
        serialize_nquads_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    lines.write_datasink(NQuadsDatasink(out_dir))


_NQ_GRAPH_RE = None


def parse_nquads(content: str):
    """Inverse of serialize_nquads_batch (round-trip contract): each line
    is parsed with the strict N-Triples tokenizer; a 4-term line first has
    its graph label split off. Returns a list of (Triple, graph) with
    '_:default' for label-less lines."""
    global _NQ_GRAPH_RE
    if _NQ_GRAPH_RE is None:
        import re

        _NQ_GRAPH_RE = re.compile(r"^(.*\S)\s+<([^<>\s]+)>\s*\.\s*$")

    from parser_rdf_ray.formats import ntriples
    from parser_rdf_ray.model import ParseError

    out = []
    for raw in content.split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        try:
            triples = ntriples.parse(line)
            graph = "_:default"
        except ParseError:
            m = _NQ_GRAPH_RE.match(line)
            if not m:
                raise
            triples = ntriples.parse(m.group(1) + " .")
            graph = m.group(2)
        out.extend((t, graph) for t in triples)
    return out


# --- Turtle export ----------------------------------------------------------


def _compact(col: pa.Array, prefixes: dict[str, str]):
    """IRI column → prefixed-name column where a namespace matches (longest
    namespace first), else `<iri>`. Vectorized per namespace: one
    starts_with mask + one replace per prefix."""
    term = pc.binary_join_element_wise("<", col, ">", "")
    done = pa.array([False] * len(col))
    for prefix, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        mask = pc.starts_with(col, ns)
        local = pc.utf8_slice_codeunits(col, len(ns))
        # PN_LOCAL-safe locals only (conservative: word chars, '-', '.')
        ok = pc.and_(mask, pc.match_substring_regex(local, r"^[\w\-.]*$"))
        ok = pc.and_(ok, pc.invert(pc.match_substring_regex(local, r"^\.|\.$")))
        ok = pc.and_(ok, pc.invert(done))  # longest namespace wins
        qname = pc.binary_join_element_wise(prefix, ":", local, "")
        term = pc.if_else(ok, qname, term)
        done = pc.or_(done, ok)
    return term


DEFAULT_EXPORT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "sh": "http://www.w3.org/ns/shacl#",
}


def make_turtle_serializer(prefixes: dict[str, str] | None = None):
    """Returns a map_batches fn: adjacency rows → 'line' column of Turtle
    statements with prefix-compacted terms (X1-X6 machinery in reverse).
    The @prefix header is written once per file by TurtleDatasink."""
    pfx = dict(DEFAULT_EXPORT_PREFIXES if prefixes is None else prefixes)

    def serialize_turtle_batch(batch: pa.Table) -> pa.Table:
        subj = _compact(_s(batch, "subj"), pfx)
        pred = _compact(_s(batch, "pred"), pfx)
        obj = _s(batch, "obj")
        obj_kind = _s(batch, "obj_kind")
        dt = _s(batch, "obj_datatype")
        lang = _s(batch, "obj_lang")

        lit = _escape_literals(obj)
        quoted = pc.binary_join_element_wise('"', lit, '"', "")
        lang_suffix = pc.if_else(
            pc.not_equal(lang, ""), pc.binary_join_element_wise("@", lang, ""), ""
        )
        dt_suffix = pc.if_else(
            pc.and_(pc.not_equal(dt, ""), pc.equal(lang, "")),
            pc.binary_join_element_wise("^^", _compact(dt, pfx), ""),
            "",
        )
        literal_term = pc.binary_join_element_wise(quoted, lang_suffix, dt_suffix, "")
        obj_term = pc.if_else(
            pc.equal(obj_kind, "literal"), literal_term, _compact(obj, pfx)
        )
        # rdf:type → 'a'
        pred = pc.if_else(pc.equal(pred, "rdf:type"), "a", pred)
        line = pc.binary_join_element_wise(subj, " ", pred, " ", obj_term, " .", "")
        return pa.Table.from_arrays([line], names=["line"])

    serialize_turtle_batch.prefixes = pfx
    return serialize_turtle_batch


class TurtleDatasink(BlockBasedFileDatasink):
    """One .ttl file per block, each self-contained with its @prefix header."""

    def __init__(self, path: str, prefixes: dict[str, str] | None = None, **kwargs):
        super().__init__(path, file_format="ttl", **kwargs)
        self._prefixes = dict(DEFAULT_EXPORT_PREFIXES if prefixes is None else prefixes)

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        table = block.to_arrow()
        lines = table.column("line")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        header = "".join(
            f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(self._prefixes.items())
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array([0, len(lines)], pa.int32()), lines), "\n"
        )
        body = (joined[0].as_py() + "\n") if len(lines) else ""
        file.write((header + body).encode("utf-8"))


def write_turtle(adjacency_ds, out_dir: str, prefixes: dict[str, str] | None = None) -> None:
    """Distributed Turtle export with prefix compaction."""
    fn = make_turtle_serializer(prefixes)
    lines = adjacency_ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    lines.write_datasink(TurtleDatasink(out_dir, prefixes))


# --- JSON-LD export ---------------------------------------------------------


def serialize_jsonld_batch(batch: pa.Table) -> pa.Table:
    """Adjacency rows → one JSON node-object string per SUBJECT RUN
    (blocks from dedup_triples_sorted are subject-sorted, so consecutive
    rows group without a shuffle). The sort range-partitions on the FULL
    triple tuple, so a subject whose rows straddle two blocks yields one
    node object per block — duplicate "@id" across output files. That is
    valid JSON-LD by design: a dataset is the GRAPH UNION of its node
    objects, and objects sharing an @id merge (our own parser and any
    conforming processor union their properties; pinned by the round-trip
    test). Forcing one object per subject would cost a second shuffle for
    zero semantic gain. Values: {"@id"} for IRIs, {"@value"} with
    @language/@type for literals; multi-valued predicates become lists.
    JSON assembly is per-subject Python — nested-document serialization
    has no Arrow kernel; the grouping itself is the vectorized part."""
    import json

    subj = _s(batch, "subj").to_pylist()
    pred = _s(batch, "pred").to_pylist()
    obj = _s(batch, "obj").to_pylist()
    kind = _s(batch, "obj_kind").to_pylist()
    dt = _s(batch, "obj_datatype").to_pylist()
    lang = _s(batch, "obj_lang").to_pylist()

    lines: list[str] = []
    node: dict | None = None
    for s, p, o, k, d, lg in zip(subj, pred, obj, kind, dt, lang):
        if node is None or node["@id"] != s:
            if node is not None:
                lines.append(json.dumps(node, sort_keys=True))
            node = {"@id": s}
        if k == "literal":
            val: object = {"@value": o}
            if lg:
                val["@language"] = lg
            elif d:
                val["@type"] = d
        else:
            val = {"@id": o}
        cur = node.get(p)
        if cur is None:
            node[p] = val
        elif isinstance(cur, list):
            cur.append(val)
        else:
            node[p] = [cur, val]
    if node is not None:
        lines.append(json.dumps(node, sort_keys=True))
    return pa.Table.from_arrays([pa.array(lines, pa.string())], names=["line"])


class JsonLdDatasink(BlockBasedFileDatasink):
    """One .jsonld file per block: a top-level array of node objects (the
    shape formats/jsonld.py parses)."""

    def __init__(self, path: str, **kwargs):
        super().__init__(path, file_format="jsonld", **kwargs)

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        table = block.to_arrow()
        lines = [v.as_py() for v in table.column("line")]
        file.write(("[\n" + ",\n".join(lines) + "\n]\n").encode("utf-8"))


def write_jsonld(adjacency_ds, out_dir: str) -> None:
    """Distributed JSON-LD export (top-level node-object arrays)."""
    lines = adjacency_ds.map_batches(
        serialize_jsonld_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    lines.write_datasink(JsonLdDatasink(out_dir))


# --- RDF/XML export ---------------------------------------------------------

_NCNAME_RE = None


def _split_pred(pred: str) -> tuple[str, str]:
    """Predicate IRI → (namespace, NCName local). RDF/XML can only express
    predicates whose local part is a valid element name — a limitation of
    the format, not the engine; offenders raise with a clear message."""
    global _NCNAME_RE
    if _NCNAME_RE is None:
        import re

        _NCNAME_RE = re.compile(r"^[A-Za-z_][\w\-.]*$")
    for sep in ("#", "/"):
        idx = pred.rfind(sep)
        if idx > 0 and _NCNAME_RE.match(pred[idx + 1 :] or ""):
            return pred[: idx + 1], pred[idx + 1 :]
    raise ValueError(f"predicate {pred!r} has no NCName local part (RDF/XML limit)")


class RdfXmlDatasink(BlockBasedFileDatasink):
    """One .rdf file per block: rdf:Description per subject, property
    elements with rdf:resource / rdf:datatype / xml:lang (the scope
    formats/rdfxml.py parses). Consumes adjacency blocks directly."""

    _RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def __init__(self, path: str, **kwargs):
        super().__init__(path, file_format="rdf", **kwargs)

    def write_block_to_file(self, block: BlockAccessor, file) -> None:
        import xml.etree.ElementTree as ET

        t = block.to_arrow()
        cols = {
            n: (_s(t, n).to_pylist() if n in t.column_names else None)
            for n in ("subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang")
        }
        root = ET.Element(f"{{{self._RDF}}}RDF")
        nodes: dict[str, ET.Element] = {}
        for s, p, o, k, d, lg in zip(
            cols["subj"], cols["pred"], cols["obj"], cols["obj_kind"],
            cols["obj_datatype"], cols["obj_lang"],
        ):
            desc = nodes.get(s)
            if desc is None:
                desc = ET.SubElement(root, f"{{{self._RDF}}}Description")
                desc.set(f"{{{self._RDF}}}about", s)
                nodes[s] = desc
            ns, local = _split_pred(p)
            prop = ET.SubElement(desc, f"{{{ns}}}{local}")
            if k == "literal":
                prop.text = o
                if lg:
                    prop.set("{http://www.w3.org/XML/1998/namespace}lang", lg)
                elif d:
                    prop.set(f"{{{self._RDF}}}datatype", d)
            else:
                prop.set(f"{{{self._RDF}}}resource", o)
        file.write(ET.tostring(root, encoding="utf-8", xml_declaration=True))


def write_rdfxml(adjacency_ds, out_dir: str) -> None:
    """Distributed RDF/XML export."""
    adjacency_ds.write_datasink(RdfXmlDatasink(out_dir))
