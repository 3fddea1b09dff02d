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


def _merge_json_maps(json_lists, fallback_mins):
    """Per group: merge unique-sorted JSON maps (later keys override in
    json-string sort order — identical to the former row-at-a-time
    dict.update over sorted rows) and compute the en-preferred display
    value, falling back to min merged value, then min scalar."""
    merged_out, display_out = [], []
    for js, fmin in zip(json_lists, fallback_mins):
        m: dict = {}
        for j in js:
            m.update(json.loads(j))
        merged_out.append(json.dumps(m, sort_keys=True))
        display_out.append(m.get("en") or (min(m.values()) if m else fmin))
    return merged_out, display_out


def _merge_annotation_lists(json_lists):
    """Per group: first-seen dedup of annotation records by
    (property, value, lang) across the unique-sorted JSON lists."""
    out = []
    for js in json_lists:
        anns, seen = [], set()
        for j in js:
            for a in json.loads(j):
                key = (a.get("property"), a.get("value"), a.get("lang"))
                if key not in seen:
                    seen.add(key)
                    anns.append(a)
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
            pl.col("labels_json").unique().sort().alias("_ljs"),
            pl.col("descriptions_json").unique().sort().alias("_djs"),
            pl.col("annotations_json").unique().sort().alias("_ajs"),
            pl.col("label").drop_nulls().min().alias("_lmin"),
            pl.col("description").drop_nulls().min().alias("_dmin"),
        ] + [
            pl.col(c).explode().drop_nulls().unique().sort().alias(c)
            for c in _CLASS_LIST_COLS
        ]
        if mode == "final":
            aggs.append(pl.col("n_docs_partial").sum().alias("n_docs"))
        else:
            aggs.append(pl.col("doc_id").n_unique().alias("n_docs"))
        if mode == "partial":
            aggs.append(pl.col("doc_id").min().alias("_docrep"))
        agg = df.group_by(keys, maintain_order=True).agg(aggs)
        labels_json, label = _merge_json_maps(
            agg["_ljs"].to_list(), agg["_lmin"].to_list()
        )
        descs_json, desc = _merge_json_maps(
            agg["_djs"].to_list(), agg["_dmin"].to_list()
        )
        anns_json = _merge_annotation_lists(agg["_ajs"].to_list())
        t = agg.to_arrow()
        cols = {
            "uri": pc.cast(t.column("uri").combine_chunks(), pa.string()),
            "label": pa.array(label, pa.string()),
            "labels_json": pa.array(labels_json, pa.string()),
            "description": pa.array(desc, pa.string()),
            "descriptions_json": pa.array(descs_json, pa.string()),
            "annotations_json": pa.array(anns_json, pa.string()),
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
    merge) to split head-entity hot keys across K reducers.
    """
    if salt_buckets and salt_buckets > 1:

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
            pl.col("labels_json").unique().sort().alias("_ljs"),
            pl.col("label").drop_nulls().min().alias("_lmin"),
            pl.col("property_type")
            .replace_strict(_PTYPE_RANK, default=2, return_dtype=pl.Int32)
            .min()
            .alias("_pt"),
            pl.col("is_functional").any().alias("is_functional"),
            pl.col("doc_id").n_unique().alias("n_docs"),
        ] + [
            pl.col(c).explode().drop_nulls().unique().sort().alias(c)
            for c in _PROP_LIST_COLS
        ]
        agg = df.group_by("uri", maintain_order=True).agg(aggs)
        labels_json, label = _merge_json_maps(
            agg["_ljs"].to_list(), agg["_lmin"].to_list()
        )
        ptype = [_PTYPE_FROM_RANK[r] for r in agg["_pt"].to_list()]
        t = agg.to_arrow()
        cols = {
            "uri": pc.cast(t.column("uri").combine_chunks(), pa.string()),
            "label": pa.array(label, pa.string()),
            "labels_json": pa.array(labels_json, pa.string()),
            "property_type": pa.array(ptype, pa.string()),
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
    (deterministic via doc_id ordering), constraint-map key-union."""
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
