"""Doc-scope entity extraction stages (E1-E21, X1-X6) and the global
entity-merge shuffle (W1/W4 scale path).

Per-document extraction runs inside the same map_batches pass that parses
(parse once, extract in-memory — no second scan of the raw documents).
Nested record parts (labels maps, annotations) are serialized as JSON
string columns; scalar/list fields stay Arrow-native.

Global merge: ``groupby(uri)`` with optional two-phase salting for
head-entity skew (north rule): phase 1 groups on (uri, salt=h(doc_id)%K)
and partially merges, phase 2 groups the K partials per uri. The merge
function is associative + commutative + idempotent (field-wise set-union,
en-preferred label recomputation), so salted partial merges are safe to
retry and resume.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

from parser_rdf_ray.extract import entities as ent
from parser_rdf_ray.extract import xmlfallback
from parser_rdf_ray.extract.docgraph import DocGraph
from parser_rdf_ray.formats.detect import DEFAULT_PLUGINS
from parser_rdf_ray.model import ParseError
from parser_rdf_ray.vocab import FORMAT_RDFXML

CLASSES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("uri", pa.string()),
        ("label", pa.string()),
        ("labels_json", pa.string()),
        ("description", pa.string()),
        ("descriptions_json", pa.string()),
        ("parent_classes", pa.list_(pa.string())),
        ("types", pa.list_(pa.string())),
        ("see_also", pa.list_(pa.string())),
        ("is_defined_by", pa.list_(pa.string())),
        ("annotations_json", pa.string()),
        ("source", pa.string()),
    ]
)

PROPERTIES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("uri", pa.string()),
        ("label", pa.string()),
        ("labels_json", pa.string()),
        ("description", pa.string()),
        ("descriptions_json", pa.string()),
        ("property_type", pa.string()),
        ("domain", pa.list_(pa.string())),
        ("range", pa.list_(pa.string())),
        ("parent_properties", pa.list_(pa.string())),
        ("inverse_of", pa.list_(pa.string())),
        ("is_functional", pa.bool_()),
        ("types", pa.list_(pa.string())),
        ("annotations_json", pa.string()),
        ("source", pa.string()),
    ]
)

SHAPES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("uri", pa.string()),
        ("label", pa.string()),
        ("description", pa.string()),
        ("target_class", pa.string()),
        ("target_node", pa.string()),
        ("target_subjects_of", pa.string()),
        ("target_objects_of", pa.string()),
        ("target_property", pa.string()),
        ("property_shapes_json", pa.string()),
        ("constraints_json", pa.string()),
    ]
)

PREFIXES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("prefix", pa.string()),
        ("namespace", pa.string()),
    ]
)


class _ExtractBase:
    """Shared parse-then-extract plumbing for the entity stages."""

    def __init__(self, include_skolemized: bool = False, plugins=DEFAULT_PLUGINS):
        self.include_skolemized = include_skolemized
        self.plugins = plugins

    def _parse(self, text: str):
        """→ (format, DocGraph, prefixes, xml_root) or None on any failure
        (error accounting belongs to the parse stage; extraction pipelines
        simply skip unparseable docs)."""
        if not text.strip():
            return None
        plugin = None
        for p in self.plugins:
            try:
                if p.sniff(text):
                    plugin = p
                    break
            except Exception:
                continue
        if plugin is None:
            return None
        try:
            triples, extras = plugin.parse(text)
        except (ParseError, Exception):
            return None
        g = DocGraph(triples)
        parser_prefixes = extras if isinstance(extras, dict) else None
        xml_root = extras if plugin.name == FORMAT_RDFXML else None
        prefixes = ent.extract_prefixes(g, plugin.name, text, parser_prefixes)
        return plugin.name, g, prefixes, xml_root


class ExtractClasses(_ExtractBase):
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in CLASSES_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("rdf_text").to_pylist()
        ):
            parsed = self._parse(text)
            if parsed is None:
                continue
            fmt, g, prefixes, xml_root = parsed
            if fmt == FORMAT_RDFXML and xml_root is not None:
                classes = xmlfallback.extract_classes_from_xml(xml_root)
            else:
                classes = ent.extract_classes(g, prefixes, self.include_skolemized)
            for c in classes:
                rows["doc_id"].append(doc_id)
                rows["uri"].append(c["uri"])
                rows["label"].append(c["label"])
                rows["labels_json"].append(json.dumps(c["labels"], sort_keys=True))
                rows["description"].append(c["description"])
                rows["descriptions_json"].append(json.dumps(c["descriptions"], sort_keys=True))
                rows["parent_classes"].append(c["parent_classes"])
                rows["types"].append(c["metadata"].get("types", []))
                rows["see_also"].append(c["metadata"].get("see_also", []))
                rows["is_defined_by"].append(c["metadata"].get("is_defined_by", []))
                rows["annotations_json"].append(
                    json.dumps(c["metadata"].get("annotations", []), sort_keys=True)
                )
                rows["source"].append(c["metadata"]["source"])
        return pa.Table.from_arrays(
            [pa.array(rows[n], CLASSES_SCHEMA.field(n).type) for n in CLASSES_SCHEMA.names],
            schema=CLASSES_SCHEMA,
        )


class ExtractProperties(_ExtractBase):
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in PROPERTIES_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("rdf_text").to_pylist()
        ):
            parsed = self._parse(text)
            if parsed is None:
                continue
            fmt, g, prefixes, xml_root = parsed
            if fmt == FORMAT_RDFXML and xml_root is not None:
                props = xmlfallback.extract_properties_from_xml(xml_root)
            else:
                props = ent.extract_properties(g, prefixes, self.include_skolemized)
            for p in props:
                rows["doc_id"].append(doc_id)
                rows["uri"].append(p["uri"])
                rows["label"].append(p["label"])
                rows["labels_json"].append(json.dumps(p["labels"], sort_keys=True))
                rows["description"].append(p["description"])
                rows["descriptions_json"].append(json.dumps(p["descriptions"], sort_keys=True))
                rows["property_type"].append(p["property_type"])
                rows["domain"].append(p["domain"])
                rows["range"].append(p["range"])
                rows["parent_properties"].append(p["parent_properties"])
                rows["inverse_of"].append(p["inverse_of"])
                rows["is_functional"].append(p["is_functional"])
                rows["types"].append(p["metadata"].get("types", []))
                rows["annotations_json"].append(
                    json.dumps(p["metadata"].get("annotations", []), sort_keys=True)
                )
                rows["source"].append(p["metadata"]["source"])
        return pa.Table.from_arrays(
            [
                pa.array(rows[n], PROPERTIES_SCHEMA.field(n).type)
                for n in PROPERTIES_SCHEMA.names
            ],
            schema=PROPERTIES_SCHEMA,
        )


class ExtractShapes(_ExtractBase):
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in SHAPES_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("rdf_text").to_pylist()
        ):
            parsed = self._parse(text)
            if parsed is None:
                continue
            fmt, g, prefixes, _ = parsed
            for s in ent.extract_shapes(g, prefixes, fmt):
                rows["doc_id"].append(doc_id)
                rows["uri"].append(s["uri"])
                rows["label"].append(s["label"])
                rows["description"].append(s["description"])
                rows["target_class"].append(s["target_class"])
                rows["target_node"].append(s["target_node"])
                rows["target_subjects_of"].append(s["target_subjects_of"])
                rows["target_objects_of"].append(s["target_objects_of"])
                rows["target_property"].append(s["target_property"])
                rows["property_shapes_json"].append(
                    json.dumps(s["property_shapes"], sort_keys=True)
                )
                rows["constraints_json"].append(json.dumps(s["constraints"], sort_keys=True))
        return pa.Table.from_arrays(
            [pa.array(rows[n], SHAPES_SCHEMA.field(n).type) for n in SHAPES_SCHEMA.names],
            schema=SHAPES_SCHEMA,
        )


class ExtractPrefixes(_ExtractBase):
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in PREFIXES_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("rdf_text").to_pylist()
        ):
            parsed = self._parse(text)
            if parsed is None:
                continue
            _, _, prefixes, _ = parsed
            for pfx, ns in prefixes.items():
                rows["doc_id"].append(doc_id)
                rows["prefix"].append(pfx)
                rows["namespace"].append(ns)
        return pa.Table.from_arrays(
            [pa.array(rows[n], PREFIXES_SCHEMA.field(n).type) for n in PREFIXES_SCHEMA.names],
            schema=PREFIXES_SCHEMA,
        )


# --- global entity merge (W1 at dataset scope) -----------------------------
#
# All three merges run as ONE range-partitioned sort on the key (equal keys
# co-partitioned — the same engine pin stages/canonicalize.py rests on)
# followed by a per-BLOCK polars group_by. Every scalar/list field merges
# inside the polars kernel; per-group Python touches only the nested-JSON
# payloads (label maps, annotations, constraints), whose merge is inherently
# a dict operation. The merge stays associative + commutative + idempotent
# (field-wise set-union, en-preferred label recomputation), so salted
# partial merges remain safe to retry and resume.


def _sorted_block_merge(ds, key_cols, block_fn, schema):
    """groupby(key_cols) → vectorized per-block merge: one sort
    co-partitions every key, then block_fn collapses a whole block's groups
    in a single polars group_by (no per-group pandas frames, no map_groups
    dispatch)."""
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    ds = ds.sort(key_cols)

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return schema.empty_table()
        return block_fn(batch)

    return ds.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


class _JsonShapeFallback(Exception):
    """Decoded JSON column isn't a plain string->string map / annotation-
    record list — the block merge reverts to the per-group Python path."""


# printable ASCII minus '"' and '\' — exactly the characters json.dumps
# (default ensure_ascii=True) emits verbatim inside a string literal
_JSON_PLAIN_RE = re.compile(r"^[ !#-\[\]-~]*$")
_JSON_UNSAFE_PAT = r"[^ !#-\[\]-~]"


def _merged_map_frame(df, keys, col, expected_keys):
    """Group-wise JSON-map union, fully vectorized (the W1 hot path —
    entity cardinality is corpus-scale, so per-group Python here was the
    engine's last row-bound loop on a hot shuffle).

    ONE vectorized ``json_decode`` over the unique (key, map) pairs, a
    per-lang struct-field merge inside a polars ``group_by``, and JSON
    re-assembly by string fragments — byte-identical to
    ``json.dumps(m, sort_keys=True)`` (pinned by the equivalence test) —
    with a per-group ``json.dumps`` fallback when any merged value needs
    JSON escaping (non-ASCII, quotes, backslashes).

    Conflict rule: per-lang MAX value. The former rule (value from the
    lexicographically-last JSON source string) was not phase-stable under
    the salted two-phase merge — a conflicting lang could resolve
    differently depending on salt bucketing, because phase 2 compared
    phase-1 MERGED strings, not the original sources. Max is associative,
    commutative, idempotent and bucketing-independent, and agrees with
    the old rule on conflict-free corpora (any real vocabulary).

    Returns (merged_json, display) polars Series aligned to
    ``group_by(keys, maintain_order=True)`` over the keys-sorted input;
    ``display`` is the en-preferred value ('' counts as missing), null
    when the merged map is empty (caller coalesces with the scalar min).
    Raises _JsonShapeFallback when the maps aren't string->string.
    """
    import polars as pl

    # input blocks arrive keys-sorted (ds.sort in _sorted_block_merge);
    # maintain_order unique keeps that order, so no re-sort is needed and
    # group order lines up with the main agg's
    sub = df.select(keys + [col]).unique(maintain_order=True)
    dec = sub[col].str.json_decode(infer_schema_length=None)
    dt = dec.dtype
    if not isinstance(dt, pl.Struct):
        raise _JsonShapeFallback(col)
    fields = []
    for f in dt.fields:
        if f.dtype == pl.Null:
            continue  # key only ever mapped to JSON null: contributes nothing
        if f.dtype != pl.String:
            raise _JsonShapeFallback(col)
        fields.append(f.name)
    fields.sort()  # json.dumps(sort_keys=True) emission order
    fcols = {n: f"_f_{n}" for n in fields}
    base = sub.drop(col)
    if fields:
        base = base.with_columns(
            [dec.struct.field(n).alias(a) for n, a in fcols.items()]
        )
    # plain .max() already skips nulls; drop_nulls().max() forces a slower
    # per-group path. rechunk(): group_by output is per-group chunked, which
    # makes every downstream expression ~40x slower until compacted.
    g = base.group_by(keys, maintain_order=True).agg(
        [pl.col(a).max() for a in fcols.values()]
    ).rechunk()
    # explicit raise, not assert: this is a data-integrity check that must
    # survive python -O (a silent drift would misalign merged JSON per entity)
    if not g.select(keys).equals(expected_keys):
        raise RuntimeError("map-merge group order drift")
    n = g.height
    if not fields:
        return (
            pl.Series(col, ["{}"] * n, dtype=pl.String),
            pl.Series("_d", [None] * n, dtype=pl.String),
        )
    if "en" in fcols:
        en = (
            pl.when(pl.col(fcols["en"]) == "")
            .then(pl.lit(None, pl.String))
            .otherwise(pl.col(fcols["en"]))
        )
    else:
        en = pl.lit(None, dtype=pl.String)
    display = g.select(
        pl.coalesce([en, pl.min_horizontal([pl.col(a) for a in fcols.values()])])
        .alias("_d")
    )["_d"]
    plain = all(_JSON_PLAIN_RE.match(x) for x in fields) and not g.select(
        pl.any_horizontal(
            [
                pl.col(a).str.contains(_JSON_UNSAFE_PAT).fill_null(False)
                for a in fcols.values()
            ]
        ).any()
    ).item()
    if plain:
        frags = [
            pl.when(pl.col(a).is_null())
            .then(pl.lit(None, pl.String))
            .otherwise(pl.lit(f'"{x}": "') + pl.col(a) + pl.lit('"'))
            for x, a in fcols.items()
        ]
        merged = g.select(
            (
                pl.lit("{")
                + pl.concat_str(frags, separator=", ", ignore_nulls=True).fill_null("")
                + pl.lit("}")
            ).alias(col)
        )[col]
    else:
        rows = zip(*[g[a].to_list() for a in fcols.values()])
        merged = pl.Series(
            col,
            [
                json.dumps(
                    {x: v for x, v in zip(fields, row) if v is not None},
                    sort_keys=True,
                )
                for row in rows
            ],
            dtype=pl.String,
        )
    return merged, display


def _merged_annotations_frame(df, keys, col, expected_keys):
    """Group-wise annotation-record dedup, fully vectorized. Records
    dedup by (property, value, lang) and emit in CANONICAL
    (property, value, lang) sort order, nulls last — annotations are a
    set; the former first-seen-in-source-string-order emission was an
    artifact that made the salted two-phase merge order-unstable across
    bucketings (phase 2 sorted MERGED phase-1 strings, not sources).
    The Python fallback (_merge_annotation_lists) sorts identically, so
    both paths emit byte-equal JSON (pinned by the equivalence test).
    Serialization by fragments (json.dumps(..., sort_keys=True) byte
    format) with a per-group dumps fallback for values needing JSON
    escaping."""
    import polars as pl

    sub = df.select(keys + [col]).unique(maintain_order=True)
    dec = sub[col].str.json_decode(infer_schema_length=None)
    dt = dec.dtype
    if not (isinstance(dt, pl.List) and isinstance(dt.inner, pl.Struct)):
        if isinstance(dt, pl.List) and dt.inner == pl.Null:
            # every list empty
            n = expected_keys.height
            return pl.Series(col, ["[]"] * n, dtype=pl.String)
        raise _JsonShapeFallback(col)
    fdt = {f.name: f.dtype for f in dt.inner.fields}
    if not set(fdt) <= {"property", "value", "lang"} or any(
        t not in (pl.String, pl.Null) for t in fdt.values()
    ):
        raise _JsonShapeFallback(col)
    # empty_as_null=True is load-bearing: empty source lists must explode to a
    # null-struct placeholder row so their group survives the group_by (polars
    # 2.0 flips the default to False, which would DROP those groups and trip
    # the group-order check); _rec masks the placeholders out downstream
    ex = sub.drop(col).with_columns(dec.alias("_a")).explode("_a", empty_as_null=True)
    parts = {}
    for name, alias in (("property", "_p"), ("value", "_v"), ("lang", "_l")):
        if name in fdt and fdt[name] == pl.String:
            parts[alias] = pl.col("_a").struct.field(name)
        else:
            parts[alias] = pl.lit(None, dtype=pl.String)
    ex = ex.with_columns(
        [e.alias(a) for a, e in parts.items()]
        + [pl.col("_a").is_not_null().alias("_rec")]
    ).drop("_a")
    # _rec MUST be in the dedup subset: a genuine all-null annotation record
    # shares the (null, null, null) key tuple with the empty-list placeholder,
    # and keep="any" on the narrower subset could nondeterministically keep the
    # placeholder and drop the record (the Python fallback keeps it). With _rec
    # included both rows survive; the placeholder's null frag is skipped by
    # str.join / the `if r` filter, so output stays byte-equal to the fallback.
    ex = ex.unique(subset=keys + ["_p", "_v", "_l", "_rec"], keep="any").sort(
        keys + ["_p", "_v", "_l"], nulls_last=True
    )
    plain = not ex.select(
        pl.any_horizontal(
            [
                pl.col(a).str.contains(_JSON_UNSAFE_PAT).fill_null(False)
                for a in ("_p", "_v", "_l")
            ]
        ).any()
    ).item()
    if plain:

        def _q(c):
            return (
                pl.when(pl.col(c).is_null())
                .then(pl.lit("null"))
                .otherwise(pl.lit('"') + pl.col(c) + pl.lit('"'))
            )

        frag = (
            pl.when(pl.col("_rec"))
            .then(
                pl.lit('{"lang": ')
                + _q("_l")
                + pl.lit(', "property": ')
                + _q("_p")
                + pl.lit(', "value": ')
                + _q("_v")
                + pl.lit("}")
            )
            .otherwise(pl.lit(None, pl.String))
        )
        g = ex.with_columns(frag.alias("_frag")).group_by(
            keys, maintain_order=True
        ).agg(pl.col("_frag").str.join(", ").alias("_j")).rechunk()
        if not g.select(keys).equals(expected_keys):
            raise RuntimeError("annotation group order drift")
        return g.select(
            (pl.lit("[") + pl.col("_j").fill_null("") + pl.lit("]")).alias(col)
        )[col]
    g = ex.group_by(keys, maintain_order=True).agg(
        [pl.col("_p"), pl.col("_v"), pl.col("_l"), pl.col("_rec")]
    ).rechunk()
    if not g.select(keys).equals(expected_keys):
        raise RuntimeError("annotation group order drift")
    out = []
    for ps, vs, ls, recs in zip(
        g["_p"].to_list(), g["_v"].to_list(), g["_l"].to_list(), g["_rec"].to_list()
    ):
        anns = [
            {"lang": l, "property": p, "value": v}
            for p, v, l, r in zip(ps, vs, ls, recs)
            if r
        ]
        out.append(json.dumps(anns, sort_keys=True))
    return pl.Series(col, out, dtype=pl.String)


def _merge_json_maps(json_lists, fallback_mins):
    """Per group: merge unique-sorted JSON maps (later keys override in
    json-string sort order — identical to the former row-at-a-time
    dict.update over sorted rows) and compute the en-preferred display
    value, falling back to min merged value, then min scalar.
    FALLBACK PATH: used only when _merged_map_frame rejects the decoded
    shape (non-string map values)."""
    merged_out, display_out = [], []
    for js, fmin in zip(json_lists, fallback_mins):
        m: dict = {}
        for j in js:
            m.update(json.loads(j))
        merged_out.append(json.dumps(m, sort_keys=True))
        display_out.append(m.get("en") or (min(m.values()) if m else fmin))
    return merged_out, display_out


def _ann_sort_key(a):
    # canonical (property, value, lang) order, nulls last — must match the
    # polars sort in _merged_annotations_frame (nulls_last=True)
    return tuple(
        (v is None, v if v is not None else "")
        for v in (a.get("property"), a.get("value"), a.get("lang"))
    )


def _merge_annotation_lists(json_lists):
    """Per group: dedup of annotation records by (property, value, lang),
    emitted in canonical (property, value, lang) sort order, nulls last.
    FALLBACK PATH for _merged_annotations_frame (odd record shapes);
    byte-equal to it by the shared sort contract."""
    out = []
    for js in json_lists:
        anns, seen = [], set()
        for j in js:
            for a in json.loads(j):
                key = (a.get("property"), a.get("value"), a.get("lang"))
                if key not in seen:
                    seen.add(key)
                    anns.append(a)
        anns.sort(key=_ann_sort_key)
        out.append(json.dumps(anns, sort_keys=True))
    return out


_CLASS_LIST_COLS = ["parent_classes", "types", "see_also", "is_defined_by"]


def _class_merge_block(mode: str):
    """Per-block class merge. mode: 'plain' (n_docs = distinct doc_id),
    'partial' (adds representative doc_id + n_docs_partial for phase 2),
    'final' (n_docs = sum of phase-1 partial counts)."""
    schema = PARTIAL_CLASSES_SCHEMA if mode == "partial" else MERGED_CLASSES_SCHEMA
    keys = ["uri", "salt"] if mode == "partial" else ["uri"]

    def block(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b)
        aggs = [
            pl.col("label").drop_nulls().min().alias("_lmin"),
            pl.col("description").drop_nulls().min().alias("_dmin"),
        ] + [
            pl.col(c).explode(empty_as_null=True).drop_nulls().unique().sort().alias(c)
            for c in _CLASS_LIST_COLS
        ]
        if mode == "final":
            aggs.append(pl.col("n_docs_partial").sum().alias("n_docs"))
        else:
            aggs.append(pl.col("doc_id").n_unique().alias("n_docs"))
        if mode == "partial":
            aggs.append(pl.col("doc_id").min().alias("_docrep"))
        agg = df.group_by(keys, maintain_order=True).agg(aggs).rechunk()
        gkeys = agg.select(keys)
        try:
            lj, ldisp = _merged_map_frame(df, keys, "labels_json", gkeys)
            dj, ddisp = _merged_map_frame(df, keys, "descriptions_json", gkeys)
            aj = _merged_annotations_frame(df, keys, "annotations_json", gkeys)
            labels_json = pc.cast(lj.to_arrow(), pa.string())
            descs_json = pc.cast(dj.to_arrow(), pa.string())
            anns_json = pc.cast(aj.to_arrow(), pa.string())
            label = pc.coalesce(
                pc.cast(ldisp.to_arrow(), pa.string()),
                pc.cast(agg["_lmin"].to_arrow(), pa.string()),
            )
            desc = pc.coalesce(
                pc.cast(ddisp.to_arrow(), pa.string()),
                pc.cast(agg["_dmin"].to_arrow(), pa.string()),
            )
        except _JsonShapeFallback:
            agg2 = df.group_by(keys, maintain_order=True).agg(
                pl.col("labels_json").unique().sort().alias("_ljs"),
                pl.col("descriptions_json").unique().sort().alias("_djs"),
                pl.col("annotations_json").unique().sort().alias("_ajs"),
            )
            labels_py, label_py = _merge_json_maps(
                agg2["_ljs"].to_list(), agg["_lmin"].to_list()
            )
            descs_py, desc_py = _merge_json_maps(
                agg2["_djs"].to_list(), agg["_dmin"].to_list()
            )
            anns_py = _merge_annotation_lists(agg2["_ajs"].to_list())
            labels_json = pa.array(labels_py, pa.string())
            descs_json = pa.array(descs_py, pa.string())
            anns_json = pa.array(anns_py, pa.string())
            label = pa.array(label_py, pa.string())
            desc = pa.array(desc_py, pa.string())
        t = agg.to_arrow()
        cols = {
            "uri": pc.cast(t.column("uri").combine_chunks(), pa.string()),
            "label": label,
            "labels_json": labels_json,
            "description": desc,
            "descriptions_json": descs_json,
            "annotations_json": anns_json,
            "n_docs": pc.cast(t.column("n_docs").combine_chunks(), pa.int64()),
        }
        for c in _CLASS_LIST_COLS:
            cols[c] = pc.cast(t.column(c).combine_chunks(), pa.list_(pa.string()))
        if mode == "partial":
            cols["doc_id"] = pc.cast(t.column("_docrep").combine_chunks(), pa.string())
            cols["n_docs_partial"] = cols["n_docs"]
        return pa.Table.from_arrays([cols[f.name] for f in schema], schema=schema)

    return block


_MERGED_CLASS_FIELDS = [
    ("uri", pa.string()),
    ("label", pa.string()),
    ("labels_json", pa.string()),
    ("description", pa.string()),
    ("descriptions_json", pa.string()),
    ("parent_classes", pa.list_(pa.string())),
    ("types", pa.list_(pa.string())),
    ("see_also", pa.list_(pa.string())),
    ("is_defined_by", pa.list_(pa.string())),
    ("annotations_json", pa.string()),
    ("n_docs", pa.int64()),
]
MERGED_CLASSES_SCHEMA = pa.schema(_MERGED_CLASS_FIELDS)
PARTIAL_CLASSES_SCHEMA = pa.schema(
    _MERGED_CLASS_FIELDS + [("doc_id", pa.string()), ("n_docs_partial", pa.int64())]
)


def merge_classes_global(ds, salt_buckets: int = 0):
    """Cross-document class canonicalization: groupby(uri) → field-wise merge.

    With salt_buckets=K, runs two-phase (salted partial merges → final
    merge) to split head-entity hot keys across K reducers — SIZE-ADAPTIVE:
    below tuning.salted_merge_min() rows the table takes the single-phase
    plain merge instead (the second exchange's session floor dwarfs any
    skew win at that size; bit-equal outputs pinned by
    TestSaltedMergePhaseStability). The materialize() is not wasted work:
    the sort that follows materializes its input internally anyway, and
    the pinned blocks make count() metadata-only.
    """
    if salt_buckets and salt_buckets > 1:
        from parser_rdf_ray.tuning import salted_merge_min

        ds = ds.materialize()
        if ds.count() < salted_merge_min():
            return _sorted_block_merge(
                ds, ["uri"], _class_merge_block("plain"), MERGED_CLASSES_SCHEMA
            )

        def add_salt(batch: pa.Table) -> pa.Table:
            # vectorized doc_id → bucket hash; only within-run determinism
            # is required (same contract as MinHashBands). Salt is a pure
            # function of doc_id, so one doc's rows land in ONE bucket and
            # the phase-1 distinct-doc counts sum exactly in phase 2.
            import polars as pl

            salt = (
                pl.from_arrow(batch.select(["doc_id"]))
                .with_columns(
                    (pl.col("doc_id").hash(seed=17) % salt_buckets)
                    .cast(pl.Int32)
                    .alias("salt")
                )["salt"]
                .to_arrow()
            )
            return batch.append_column("salt", pc.cast(salt, pa.int32()))

        ds = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        ds = _sorted_block_merge(
            ds, ["uri", "salt"], _class_merge_block("partial"), PARTIAL_CLASSES_SCHEMA
        )
        return _sorted_block_merge(
            ds, ["uri"], _class_merge_block("final"), MERGED_CLASSES_SCHEMA
        )

    return _sorted_block_merge(
        ds, ["uri"], _class_merge_block("plain"), MERGED_CLASSES_SCHEMA
    )


_PROP_LIST_COLS = ["domain", "range", "parent_properties", "inverse_of"]
_PTYPE_RANK = {"object": 0, "annotation": 1, "datatype": 2}
_PTYPE_FROM_RANK = {0: "object", 1: "annotation", 2: "datatype"}


def merge_properties_global(ds):
    """Cross-document property canonicalization (W1): field-wise merge
    per uri. property_type resolution order object > annotation > datatype
    mirrors the reference's first-match semantics, vectorized as a rank-min
    (unknown types rank as datatype, matching the former else-branch)."""
    schema = pa.schema(
        [
            ("uri", pa.string()),
            ("label", pa.string()),
            ("labels_json", pa.string()),
            ("property_type", pa.string()),
            ("domain", pa.list_(pa.string())),
            ("range", pa.list_(pa.string())),
            ("parent_properties", pa.list_(pa.string())),
            ("inverse_of", pa.list_(pa.string())),
            ("is_functional", pa.bool_()),
            ("n_docs", pa.int64()),
        ]
    )

    def block(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b)
        aggs = [
            pl.col("label").drop_nulls().min().alias("_lmin"),
            pl.col("property_type")
            .replace_strict(_PTYPE_RANK, default=2, return_dtype=pl.Int32)
            .min()
            .alias("_pt"),
            pl.col("is_functional").any().alias("is_functional"),
            pl.col("doc_id").n_unique().alias("n_docs"),
        ] + [
            pl.col(c).explode(empty_as_null=True).drop_nulls().unique().sort().alias(c)
            for c in _PROP_LIST_COLS
        ]
        agg = df.group_by("uri", maintain_order=True).agg(aggs).rechunk()
        try:
            lj, ldisp = _merged_map_frame(df, ["uri"], "labels_json", agg.select("uri"))
            labels_json = pc.cast(lj.to_arrow(), pa.string())
            label = pc.coalesce(
                pc.cast(ldisp.to_arrow(), pa.string()),
                pc.cast(agg["_lmin"].to_arrow(), pa.string()),
            )
        except _JsonShapeFallback:
            agg2 = df.group_by("uri", maintain_order=True).agg(
                pl.col("labels_json").unique().sort().alias("_ljs")
            )
            labels_py, label_py = _merge_json_maps(
                agg2["_ljs"].to_list(), agg["_lmin"].to_list()
            )
            labels_json = pa.array(labels_py, pa.string())
            label = pa.array(label_py, pa.string())
        ptype = pa.array(
            [_PTYPE_FROM_RANK[r] for r in agg["_pt"].to_list()], pa.string()
        )
        t = agg.to_arrow()
        cols = {
            "uri": pc.cast(t.column("uri").combine_chunks(), pa.string()),
            "label": label,
            "labels_json": labels_json,
            "property_type": ptype,
            "is_functional": pc.cast(
                t.column("is_functional").combine_chunks(), pa.bool_()
            ),
            "n_docs": pc.cast(t.column("n_docs").combine_chunks(), pa.int64()),
        }
        for c in _PROP_LIST_COLS:
            cols[c] = pc.cast(t.column(c).combine_chunks(), pa.list_(pa.string()))
        return pa.Table.from_arrays([cols[f.name] for f in schema], schema=schema)

    return _sorted_block_merge(ds, ["uri"], block, schema)


def merge_shapes_global(ds):
    """Cross-document shape canonicalization: first-non-null scalars
    (deterministic via doc_id ordering), constraint-map key-union.

    Constraints keep the per-group Python merge deliberately: constraint
    values are heterogeneous JSON (ints, lists, nested maps — rejected by
    _merged_map_frame's string-map gate) and the override contract is
    doc_id order, not lang-wise max. Shape cardinality is vocabulary-
    scale (SHACL shapes per ontology), not corpus-scale, so this is not
    a hot loop — unlike the label merges above."""
    schema = pa.schema(
        [
            ("uri", pa.string()),
            ("label", pa.string()),
            ("target_class", pa.string()),
            ("target_property", pa.string()),
            ("constraints_json", pa.string()),
            ("n_docs", pa.int64()),
        ]
    )

    def block(b: pa.Table) -> pa.Table:
        import polars as pl

        # stable (uri, doc_id) sort so first-non-null and the constraint
        # dict.update order are doc_id-deterministic within each group
        b = b.sort_by([("uri", "ascending"), ("doc_id", "ascending")])
        df = pl.from_arrow(b)
        agg = df.group_by("uri", maintain_order=True).agg(
            pl.col("label").drop_nulls().first().alias("label"),
            pl.col("target_class").drop_nulls().first().alias("target_class"),
            pl.col("target_property").drop_nulls().first().alias("target_property"),
            pl.col("constraints_json").alias("_cjs"),
            pl.col("doc_id").n_unique().alias("n_docs"),
        )
        constraints = []
        for js in agg["_cjs"].to_list():
            m: dict = {}
            for j in js:
                m.update(json.loads(j))
            constraints.append(json.dumps(m, sort_keys=True))
        t = agg.to_arrow()
        cols = {
            "uri": pc.cast(t.column("uri").combine_chunks(), pa.string()),
            "label": pc.cast(t.column("label").combine_chunks(), pa.string()),
            "target_class": pc.cast(
                t.column("target_class").combine_chunks(), pa.string()
            ),
            "target_property": pc.cast(
                t.column("target_property").combine_chunks(), pa.string()
            ),
            "constraints_json": pa.array(constraints, pa.string()),
            "n_docs": pc.cast(t.column("n_docs").combine_chunks(), pa.int64()),
        }
        return pa.Table.from_arrays([cols[f.name] for f in schema], schema=schema)

    return _sorted_block_merge(ds, ["uri"], block, schema)


ENTITIES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("entity_kind", pa.string()),  # class | property | shape
        ("uri", pa.string()),
        ("label", pa.string()),
    ]
)


class ExtractEntities(_ExtractBase):
    """Fused extraction: ONE parse per document feeding class, property
    and shape extraction together — the scale path when a pipeline needs
    more than one entity table (the per-kind stages each pay a full parse;
    this pays it once). Emits the compact union row shape; the per-kind
    stages remain the source of the full-fidelity columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in ENTITIES_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("rdf_text").to_pylist()
        ):
            parsed = self._parse(text)
            if parsed is None:
                continue
            fmt, g, prefixes, xml_root = parsed
            if fmt == FORMAT_RDFXML and xml_root is not None:
                classes = xmlfallback.extract_classes_from_xml(xml_root)
                props = xmlfallback.extract_properties_from_xml(xml_root)
            else:
                classes = ent.extract_classes(g, prefixes, self.include_skolemized)
                props = ent.extract_properties(g, prefixes, self.include_skolemized)
            shapes = ent.extract_shapes(g, prefixes, fmt)
            for kind, items in (("class", classes), ("property", props), ("shape", shapes)):
                for it in items:
                    rows["doc_id"].append(doc_id)
                    rows["entity_kind"].append(kind)
                    rows["uri"].append(it["uri"])
                    rows["label"].append(it.get("label"))
        return pa.Table.from_arrays(
            [pa.array(rows[n], ENTITIES_SCHEMA.field(n).type) for n in ENTITIES_SCHEMA.names],
            schema=ENTITIES_SCHEMA,
        )


def merge_entities_global(ds):
    """(entity_kind, uri) → n_docs + en-preferred first label (labels are
    already best-match per doc; min() keeps determinism)."""
    from ray.data.aggregate import Count, Min

    agg = ds.groupby(["entity_kind", "uri"]).aggregate(Count(), Min("label"))

    def project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [
                b.column("entity_kind"),
                b.column("uri"),
                b.column("min(label)"),
                pc.cast(b.column("count()"), pa.int64()),
            ],
            names=["entity_kind", "uri", "label", "n_docs"],
        )

    return agg.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
