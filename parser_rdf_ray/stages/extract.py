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


def _merge_class_group(df):
    """Associative/commutative/idempotent merge of one uri's class rows
    (pandas group). Field-wise: labels/descriptions key-union (sorted for
    determinism), list fields sorted set-union, label recomputed
    en-preferred from the merged labels map."""
    import pandas as pd

    uri = df["uri"].iloc[0]
    labels: dict = {}
    descriptions: dict = {}
    for j in sorted(df["labels_json"]):
        labels.update(json.loads(j))
    for j in sorted(df["descriptions_json"]):
        descriptions.update(json.loads(j))

    def union(col):
        out = set()
        for v in df[col]:
            out.update(v if v is not None else [])
        return sorted(out)

    anns = []
    seen = set()
    for j in sorted(set(df["annotations_json"])):
        for a in json.loads(j):
            key = (a.get("property"), a.get("value"), a.get("lang"))
            if key not in seen:
                seen.add(key)
                anns.append(a)

    scalar_labels = sorted(v for v in df["label"] if v is not None)
    label = labels.get("en") or (
        sorted(labels.values())[0] if labels else (scalar_labels[0] if scalar_labels else None)
    )
    scalar_descs = sorted(v for v in df["description"] if v is not None)
    description = descriptions.get("en") or (
        sorted(descriptions.values())[0]
        if descriptions
        else (scalar_descs[0] if scalar_descs else None)
    )
    return pd.DataFrame(
        [
            {
                "uri": uri,
                "label": label,
                "labels_json": json.dumps(labels, sort_keys=True),
                "description": description,
                "descriptions_json": json.dumps(descriptions, sort_keys=True),
                "parent_classes": union("parent_classes"),
                "types": union("types"),
                "see_also": union("see_also"),
                "is_defined_by": union("is_defined_by"),
                "annotations_json": json.dumps(anns, sort_keys=True),
                "n_docs": int(df["doc_id"].nunique()),
            }
        ]
    )


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


def _run_map_pandas(ds, key_cols, fn, schema):
    """groupby(key_cols) → per-group pandas merge, executed as ONE
    range-partitioned sort + per-run calls (stages/groups.py) instead of
    Ray's map_groups per-group dispatch — same result, one fewer internal
    exchange, and no per-group pandas-subframe machinery."""
    from parser_rdf_ray.stages.groups import grouped_run_map

    def run_fn(run: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(fn(run.to_pandas()), schema=schema, preserve_index=False)

    return grouped_run_map(ds, key_cols, run_fn, schema=schema, min_run=1)


def merge_classes_global(ds, salt_buckets: int = 0):
    """Cross-document class canonicalization: groupby(uri) → field-wise merge.

    With salt_buckets=K, runs two-phase (salted partial merges → final
    merge) to split head-entity hot keys across K reducers.
    """
    if salt_buckets and salt_buckets > 1:

        def add_salt(batch: pa.Table) -> pa.Table:
            import hashlib

            salts = [
                int(hashlib.blake2b(d.encode(), digest_size=2).hexdigest(), 16)
                % salt_buckets
                for d in batch.column("doc_id").to_pylist()
            ]
            return batch.append_column("salt", pa.array(salts, pa.int32()))

        def partial(df):
            out = _merge_class_group(df)
            out["doc_id"] = df["doc_id"].iloc[0]  # representative for n_docs pass
            out["n_docs_partial"] = int(df["doc_id"].nunique())
            return out

        ds = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        ds = _run_map_pandas(ds, ["uri", "salt"], partial, PARTIAL_CLASSES_SCHEMA)

        def final(df):
            out = _merge_class_group(df)
            out["n_docs"] = int(df["n_docs_partial"].sum())
            return out

        return _run_map_pandas(ds, ["uri"], final, MERGED_CLASSES_SCHEMA)

    return _run_map_pandas(ds, ["uri"], _merge_class_group, MERGED_CLASSES_SCHEMA)


def merge_properties_global(ds):
    """Cross-document property canonicalization (W1): field-wise merge
    per uri. property_type resolution order object > annotation > datatype
    mirrors the reference's first-match semantics deterministically."""
    import pandas as pd

    def merge(df):
        labels: dict = {}
        for j in sorted(df["labels_json"]):
            labels.update(json.loads(j))

        def union(col):
            out = set()
            for v in df[col]:
                out.update(v if v is not None else [])
            return sorted(out)

        ptypes = set(df["property_type"])
        ptype = (
            "object" if "object" in ptypes else
            "annotation" if "annotation" in ptypes else
            "datatype"
        )
        scalar_labels = sorted(v for v in df["label"] if v is not None)
        label = labels.get("en") or (
            sorted(labels.values())[0] if labels else (scalar_labels[0] if scalar_labels else None)
        )
        return pd.DataFrame(
            [
                {
                    "uri": df["uri"].iloc[0],
                    "label": label,
                    "labels_json": json.dumps(labels, sort_keys=True),
                    "property_type": ptype,
                    "domain": union("domain"),
                    "range": union("range"),
                    "parent_properties": union("parent_properties"),
                    "inverse_of": union("inverse_of"),
                    "is_functional": bool(df["is_functional"].any()),
                    "n_docs": int(df["doc_id"].nunique()),
                }
            ]
        )

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
    return _run_map_pandas(ds, ["uri"], merge, schema)


def merge_shapes_global(ds):
    """Cross-document shape canonicalization: first-non-null scalars
    (deterministic via doc_id ordering), constraint-map key-union."""
    import pandas as pd

    def merge(df):
        df = df.sort_values("doc_id")
        constraints: dict = {}
        for j in df["constraints_json"]:
            constraints.update(json.loads(j))

        def first_non_null(col):
            for v in df[col]:
                if v is not None:
                    return v
            return None

        return pd.DataFrame(
            [
                {
                    "uri": df["uri"].iloc[0],
                    "label": first_non_null("label"),
                    "target_class": first_non_null("target_class"),
                    "target_property": first_non_null("target_property"),
                    "constraints_json": json.dumps(constraints, sort_keys=True),
                    "n_docs": int(df["doc_id"].nunique()),
                }
            ]
        )

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
    return _run_map_pandas(ds, ["uri"], merge, schema)


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
