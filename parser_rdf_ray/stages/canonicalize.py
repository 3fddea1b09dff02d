"""Canonicalization stages (E4 global, W1, W5, W6 support).

- Global blank-node skolemization: bnode labels are per-document, so the
  distributed build rewrites them as ``urn:bnode:{h(doc_id)}:{label}``
  (doc-scoped hashing per the north rule) — bnodes from different documents
  can never collide, and re-running a partition yields identical IRIs
  (deterministic → retry/resume-safe).
- IRI normalization: NFC unicode normalization via the Arrow kernel
  (zero-copy batch in, vectorized kernel, no Python loop).
- Exact triple dedup: local per-batch dedup (combiner) then a global
  hash-key groupby — the set semantics of an RDF graph (W5).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

_DEDUP_KEY_COLS = ("graph", "subj", "pred", "obj", "obj_kind", "obj_datatype", "obj_lang")


def _doc_hash(doc_id: str) -> str:
    return hashlib.blake2b(doc_id.encode(), digest_size=6).hexdigest()


def skolemize_batch(batch: pa.Table) -> pa.Table:
    """Rewrite bnode subj/obj to urn:bnode:{doc_hash}:{label} and flip their
    kind to iri. Only bnode rows pay the Python cost (masked rewrite)."""
    subj_kind = batch.column("subj_kind")
    obj_kind = batch.column("obj_kind")
    any_subj = pc.any(pc.equal(subj_kind, "bnode")).as_py()
    any_obj = pc.any(pc.equal(obj_kind, "bnode")).as_py()
    if not any_subj and not any_obj:
        return batch

    doc_ids = batch.column("doc_id").to_pylist()
    hashes: dict[str, str] = {}

    def h(d: str) -> str:
        v = hashes.get(d)
        if v is None:
            v = _doc_hash(d)
            hashes[d] = v
        return v

    out = batch
    for val_col, kind_col, any_flag in (
        ("subj", "subj_kind", any_subj),
        ("obj", "obj_kind", any_obj),
    ):
        if not any_flag:
            continue
        kinds = out.column(kind_col).to_pylist()
        vals = out.column(val_col).to_pylist()
        new_vals = [
            f"urn:bnode:{h(d)}:{v}" if k == "bnode" else v
            for v, k, d in zip(vals, kinds, doc_ids)
        ]
        new_kinds = ["iri" if k == "bnode" else k for k in kinds]
        out = out.set_column(
            out.column_names.index(val_col), val_col, pa.array(new_vals, pa.string())
        )
        out = out.set_column(
            out.column_names.index(kind_col), kind_col, pa.array(new_kinds, pa.string())
        )
    return out


def normalize_iris_batch(batch: pa.Table) -> pa.Table:
    """NFC-normalize IRI columns with the vectorized Arrow kernel."""
    for col in ("subj", "pred", "obj"):
        idx = batch.column_names.index(col)
        batch = batch.set_column(idx, col, pc.utf8_normalize(batch.column(col), form="NFC"))
    return batch


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    return normalize_iris_batch(skolemize_batch(batch))


# identity columns in final adjacency order: the groupby key tuple leads
# with (subj, pred, obj), so the sort-based shuffle's key-sorted output IS
# the sorted adjacency ordering (W5+W6 fused into ONE all-to-all exchange).
ADJACENCY_IDENTITY_COLS = [
    "subj",
    "pred",
    "obj",
    "obj_kind",
    "obj_datatype",
    "obj_lang",
    "graph",
]


def local_distinct_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: project to the identity columns and drop duplicate
    triples BEFORE the shuffle (Arrow-native hash groupby, no Python loop).
    Cuts shuffle bytes twice over: fewer rows, and the per-doc provenance
    columns (doc_id, line_no, format, ...) never enter the exchange."""
    cols = [c for c in ADJACENCY_IDENTITY_COLS if c in batch.column_names]
    return batch.select(cols).group_by(cols).aggregate([])


def drop_consecutive_dup_rows(batch: pa.Table) -> pa.Table:
    """Sorted-input dedup: drop row i when it equals row i-1 on every
    identity column (vectorized slice-compare, no hash table). On the
    range-partitioned output of ``ds.sort(identity)``, consecutive equality
    IS global equality, so this finishes an exact global distinct.

    Null safety: parse/canonicalize emit '' (never null) for absent fields;
    if a null ever slips in, fill_null(True) keeps the row — conservative
    (may retain a dup, never drops a distinct row)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    if n <= 1:
        return batch
    keep = None
    for name in ADJACENCY_IDENTITY_COLS:
        col = batch.column(name).combine_chunks()
        neq = pc.fill_null(pc.not_equal(col.slice(1), col.slice(0, n - 1)), True)
        keep = neq if keep is None else pc.or_(keep, neq)
    if isinstance(keep, pa.ChunkedArray):
        keep = keep.combine_chunks()
    mask = pa.concat_arrays([pa.array([True]), keep])
    return batch.filter(mask)


def dedup_triples_sorted(ds, num_partitions: int | None = None):
    """Exact global dedup (set semantics of an RDF graph, W5) + sorted
    adjacency order (W6) in ONE all-to-all.

    Plan: local combiner (per-batch Arrow distinct — cuts shuffle rows and
    strips provenance columns) → global ``sort`` on the identity columns →
    per-block consecutive-row dedup. Correctness rests on Ray's
    range-partitioned sort assigning EQUAL key tuples to the SAME output
    partition (searchsorted against sampled boundaries is deterministic on
    ties), so duplicates are always adjacent within one block; pinned by
    test_ray_stages.py. A previous two-exchange plan (hash-partition
    groupby + final sort) did the same work with an extra all-to-all and
    measured ~2× slower at num_cpus=32. Triple-identity values are
    near-uniform after the local combiner, so no salting is needed here
    (unlike entity merge, where real-world IRI frequencies are zipfian)."""
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    # batch_size=None → whole-block batches: these kernels are fully
    # vectorized, so per-batch fixed cost (Python call + Arrow slice) is the
    # only thing batch splitting adds (measured 2.5x on the map side).
    ds = ds.map_batches(
        local_distinct_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    ds = ds.sort(ADJACENCY_IDENTITY_COLS)
    return ds.map_batches(
        drop_consecutive_dup_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
