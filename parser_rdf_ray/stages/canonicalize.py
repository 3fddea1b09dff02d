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


def add_triple_key(batch: pa.Table) -> pa.Table:
    """64-bit-ish dedup key from the identity columns. Concatenation via the
    Arrow kernel, then a fixed-width hash so the shuffle moves 16-byte keys
    rather than full triple strings."""
    parts = []
    for c in _DEDUP_KEY_COLS:
        parts.append(batch.column(c))
        parts.append(pa.array(["\x1f"] * len(batch), pa.string()))
    joined = pc.binary_join_element_wise(*parts, "")
    keys = [hashlib.blake2b(s.encode(), digest_size=8).hexdigest() for s in joined.to_pylist()]
    return batch.append_column("tkey", pa.array(keys, pa.string()))


def local_dedup_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: drop duplicate triples before the shuffle."""
    if "tkey" not in batch.column_names:
        batch = add_triple_key(batch)
    # group-by key, take first row index per key
    df = batch.to_pandas()
    df = df.drop_duplicates(subset="tkey", keep="first")
    return pa.Table.from_pandas(df, preserve_index=False)


def dedup_triples(ds):
    """Exact global dedup: local combiner → hash-key groupby → first row.
    The tkey hash distributes uniformly, so no salting is needed here
    (unlike the entity merge, where real-world IRIs are zipfian)."""
    ds = ds.map_batches(local_dedup_batch, batch_format="pyarrow", zero_copy_batch=True)

    def first_per_key(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return ds.groupby("tkey").map_groups(first_per_key, batch_format="pyarrow")


def drop_key(ds):
    return ds.drop_columns(["tkey"])
