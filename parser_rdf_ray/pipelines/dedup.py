"""Deduplication operators over a text corpus (training-data pipeline ops).

All operate on the driver documents table (doc_id, text, ...) and are
designed for 100 TB scale:

- exact_dedup: hash-partition on content digest → per-group min(doc_id).
  One uniform-key shuffle of (digest, doc_id) pairs — never the text.
- minhash_lsh_dedup: shingle → minhash signature (vectorized numpy) →
  band buckets → groupby(bucket) emits candidate pairs → Jaccard verify.
  Only signatures and candidate pairs shuffle; the full text never does.
- simhash_dedup: 64-bit simhash, 4×16-bit band blocking, Hamming verify.
- ngram_jaccard_pairs: banded exact n-gram Jaccard (verification path of
  minhash, exposed standalone).
- embedding near-dup lives in pipelines/similarity.py.
"""

from __future__ import annotations

import hashlib
import logging
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_log = logging.getLogger(__name__)

_TOKEN_RE = re.compile(r"\W+")

# Quadratic guard: a bucket with more docs than this has its PAIR
# ENUMERATION truncated (a mega-bucket's full pair set is Θ(n²) output —
# no engine should emit it). NEVER silent: every truncation logs the
# dropped-pair count (no-silent-caps rule). Exactness contract: the pair
# oracles (dedup_minhash / dedup_simhash) are exact while every bucket is
# ≤ the cap — always true on the driver corpora. Beyond the cap, pair
# enumeration is partial; over-cap buckets additionally emit consecutive
# chain edges over the tail, which keeps EXACT-duplicate mega-buckets one
# connected component (every chain pair verifies at jaccard 1 / hamming
# 0), so exact duplicates can never leak through curation. For
# NEAR-duplicate over-cap buckets the chain pairs may fail verification
# (consecutive docs below threshold) and a cluster can split — inherent
# to any sub-quadratic emission, and logged.
BUCKET_CAP = 1000


def _capped_ids(ids: np.ndarray, what: str, cap: int) -> np.ndarray:
    if len(ids) > cap:
        dropped = len(ids) * (len(ids) - 1) // 2 - cap * (cap - 1) // 2
        _log.warning(
            "%s bucket of %d docs truncated to %d (dropping %d of the quadratic "
            "candidate pairs; tail chain edges keep exact-duplicate buckets "
            "connected, near-dup clusters may split)",
            what, len(ids), cap, dropped,
        )
    return ids[:cap]


def _chain_index_pairs(n: int, cap: int) -> np.ndarray:
    """Start indices i of consecutive (i, i+1) tail edges for an n-doc
    bucket truncated at cap (from the last capped doc onward) — the ONE
    definition both the minhash and simhash emitters derive from."""
    return np.arange(cap - 1, n - 1)

# minhash parameters: 128 permutations, 32 bands × 4 rows
N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.uint64)


# --- exact dedup -----------------------------------------------------------


_HEX_CHARS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def text_digest(texts) -> pa.Array:
    """128-bit content digest of a string column, fully vectorized.

    Two independently-seeded xxhash64 passes (polars' C hash kernel over
    the whole column) give 128 effective bits — the same
    collision-negligible equality contract as the per-row blake2b-128 it
    replaced, with zero per-row Python. The digest is an INTERNAL
    equality key only: the SQL oracles group by the text itself, so the
    hash function is free to change (it is NOT stable across polars
    versions — persist text or re-digest on ingest, never ship digests
    between engine versions). Hex encoding is a numpy nibble-table
    gather, and the result is built zero-copy from the flat byte buffer.
    """
    import polars as pl

    s = pl.from_arrow(texts) if not isinstance(texts, pl.Series) else texts
    h1 = s.hash(seed=0x9E3779B9).to_numpy()
    h2 = s.hash(seed=0x85EBCA77).to_numpy()
    n = len(h1)
    raw = np.empty((n, 16), dtype=np.uint8)
    raw[:, :8] = h1.astype(">u8").view(np.uint8).reshape(n, 8)
    raw[:, 8:] = h2.astype(">u8").view(np.uint8).reshape(n, 8)
    hexed = np.empty((n, 32), dtype=np.uint8)
    hexed[:, ::2] = _HEX_CHARS[raw >> 4]
    hexed[:, 1::2] = _HEX_CHARS[raw & 0xF]
    offsets = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hexed.tobytes())
    )


def add_digest(batch: pa.Table) -> pa.Table:
    return pa.Table.from_arrays(
        [batch.column("doc_id"), text_digest(batch.column("text"))],
        names=["doc_id", "digest"],
    )


def exact_dedup(documents_ds):
    """Distinct-content survivors: min(doc_id) per content digest.
    Shuffles only (digest, doc_id) pairs; aggregation (not map_groups)
    keeps the reduce side a tiny combiner tree."""
    ds = documents_ds.map_batches(add_digest, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("digest").min("doc_id")


# --- shingling / minhash ---------------------------------------------------


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64)."""
    tokens = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else [""]
    else:
        grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
        )
    return out


class MinHashBands:
    """map_batches fn: documents → (band_id, bucket, doc_id) rows.

    Whole-batch vectorization: gram construction is the only per-doc
    Python (string joins); gram hashing is ONE vectorized xxhash over the
    batch's flattened gram list (polars), signatures are a slab-wise
    (grams × N_PERM) broadcast reduced per doc with minimum.reduceat, and
    band buckets are one hash_rows over the (docs·bands × rows) matrix.
    Hash choice only needs within-run determinism (LSH candidates are
    verified by exact Jaccard), so the vectorized hashes are free to
    differ from the blake2b used by the shingle-set verifier."""

    _SLAB_GRAMS = 32_000  # slab of (N_PERM x 32k) uint64 = 32MB, L3-friendly

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        n = len(texts)
        if n == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int32()),
                    pa.array([], pa.uint64()),
                    pa.array([], pa.int64()),
                ],
                names=["band_id", "bucket", "doc_id"],
            )

        all_grams: list[str] = []
        counts = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            tokens = [x for x in _TOKEN_RE.split(t.lower()) if x]
            if len(tokens) < 3:
                grams = [" ".join(tokens)] if tokens else [""]
            else:
                grams = [" ".join(tokens[j : j + 3]) for j in range(len(tokens) - 2)]
            all_grams.extend(grams)
            counts[i] = len(grams)

        hashed = pl.Series(all_grams).hash(seed=42).to_numpy().astype(np.uint64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])

        # (N_PERM, grams) layout so reduceat runs along the contiguous
        # axis, and multiply-shift hashing mod 2^64 (implicit overflow) —
        # the explicit Mersenne modulo was 5x the cost of the multiply and
        # buys nothing for LSH bucketing.
        sig = np.empty((N_PERM, n), dtype=np.uint64)
        a_col = _PERM_A.reshape(-1, 1)
        b_col = _PERM_B.reshape(-1, 1)
        doc_lo = 0
        with np.errstate(over="ignore"):
            while doc_lo < n:
                doc_hi = doc_lo
                while (
                    doc_hi < n and offsets[doc_hi + 1] - offsets[doc_lo] <= self._SLAB_GRAMS
                ):
                    doc_hi += 1
                doc_hi = max(doc_hi, doc_lo + 1)  # at least one doc per slab
                lo, hi = offsets[doc_lo], offsets[doc_hi]
                slab = a_col * hashed[lo:hi]
                slab += b_col
                sig[:, doc_lo:doc_hi] = np.minimum.reduceat(
                    slab, offsets[doc_lo:doc_hi] - lo, axis=1
                )
                doc_lo = doc_hi

        bm = sig.T.reshape(-1, ROWS_PER_BAND)  # (docs · N_BANDS, ROWS_PER_BAND)
        buckets = (
            pl.DataFrame({f"c{k}": bm[:, k] for k in range(ROWS_PER_BAND)})
            .hash_rows(seed=7)
            .to_numpy()
        )
        return pa.Table.from_arrays(
            [
                pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n), pa.int32()),
                pa.array(buckets, pa.uint64()),
                pa.array(np.repeat(doc_ids, N_BANDS), pa.int64()),
            ],
            names=["band_id", "bucket", "doc_id"],
        )


_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _make_bucket_pairs(cap: int):
    """Candidate-pair emitter for one (band, bucket) run: full quadratic
    pairs up to ``cap`` docs (logged truncation beyond), plus O(n) chain
    edges over the over-cap tail (exact-dup connectivity). The cap is a
    closure value so it serializes to workers with the function — a
    module-global would be re-imported worker-side at its default."""

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids_all = np.sort(group.column("doc_id").to_numpy())
        ids = _capped_ids(ids_all, "minhash", cap)
        ii, jj = np.triu_indices(len(ids), k=1)
        a, b = ids[ii], ids[jj]
        if len(ids_all) > cap:
            ci = _chain_index_pairs(len(ids_all), cap)
            a = np.concatenate([a, ids_all[ci]])
            b = np.concatenate([b, ids_all[ci + 1]])
        return pa.Table.from_arrays(
            [pa.array(a, pa.int64()), pa.array(b, pa.int64())],
            names=["doc_a", "doc_b"],
        )

    return bucket_pairs


def minhash_candidate_pairs(documents_ds, bucket_cap: int = BUCKET_CAP):
    """documents → deduped candidate pairs (doc_a < doc_b).

    Two exchanges total, no per-group Python dispatch: one sorted-run scan
    emits pairs per multi-doc bucket (singleton buckets — the vast
    majority — never reach Python), one sorted-run scan distincts pairs
    that multiple bands both surfaced (stages/groups.py)."""
    from parser_rdf_ray.stages.groups import grouped_run_map, sorted_distinct

    bands = documents_ds.map_batches(
        MinHashBands(), batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = grouped_run_map(
        bands, ["band_id", "bucket"], _make_bucket_pairs(bucket_cap), schema=_PAIR_SCHEMA
    )
    return sorted_distinct(pairs, ["doc_a", "doc_b"])


_AUDIT_SCHEMA = pa.schema(
    [
        ("n_buckets", pa.int64()),
        ("max_bucket", pa.int64()),
        ("overcap_buckets", pa.int64()),
        ("dropped_pairs", pa.int64()),
    ]
)


def minhash_bucket_audit(documents_ds, bucket_cap: int = BUCKET_CAP) -> dict:
    """Global LSH bucket-size audit — the quadratic-guard truncation as
    pipeline-level numbers instead of worker-log lines.

    The dedup_minhash pair set (and everything composed on it: clusters,
    curation) is EXACT only while ``overcap_buckets == 0``; this audit is
    how a corpus/scale change gets re-validated (see the dedup_minhash
    oracle comment in __ray_entry__.py). Opt-in extra exchange: one
    (band, bucket) sort of the band table, per-block vectorized run
    lengths (equal keys are co-partitioned by the sort), one tiny partial
    stats row per block, summed on the driver. ``dropped_pairs`` uses the
    same quad-minus-cap-quad formula _capped_ids logs.
    """
    from parser_rdf_ray.collect import bounded_take_all
    from parser_rdf_ray.stages.groups import run_spans
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    bands = documents_ds.map_batches(
        MinHashBands(), batch_format="pyarrow", zero_copy_batch=True
    )
    srt = bands.sort(["band_id", "bucket"])

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _AUDIT_SCHEMA.empty_table()
        starts, ends = run_spans(batch, ["band_id", "bucket"])
        lens = (ends - starts).astype(np.int64)
        over = lens[lens > bucket_cap]
        dropped = int(
            (over * (over - 1) // 2 - bucket_cap * (bucket_cap - 1) // 2).sum()
        )
        return pa.Table.from_pydict(
            {
                "n_buckets": [len(lens)],
                "max_bucket": [int(lens.max())],
                "overcap_buckets": [len(over)],
                "dropped_pairs": [dropped],
            },
            schema=_AUDIT_SCHEMA,
        )

    stats = srt.map_batches(
        per_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    rows = bounded_take_all(stats, what="minhash bucket-audit partials", ceiling=1_000_000)
    return {
        "n_buckets": sum(r["n_buckets"] for r in rows),
        "max_bucket": max((r["max_bucket"] for r in rows), default=0),
        "overcap_buckets": sum(r["overcap_buckets"] for r in rows),
        "dropped_pairs": sum(r["dropped_pairs"] for r in rows),
        "bucket_cap": bucket_cap,
    }


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingles(text_a, k)), set(_shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def _attach_texts(pairs_ds, documents_ds, key_col: str, out_col: str,
                  carry: dict[str, pa.DataType]):
    """Distributed text lookup in ONE exchange: union text rows (kind=0,
    keyed by doc_id) with pair rows (kind=1, keyed by ``key_col``), sort
    by key, then a sorted-run scan attaches each run's text row to the
    pair rows sharing its key. No driver-side pair/text collection; the
    text side streams through the same range-partitioned sort the rest of
    the engine uses (stages/groups.py co-partitioning guarantee).

    carry: explicit {column: arrow type} mapping of pair-side columns to
    thread through (nothing is inferred from column names)."""
    from parser_rdf_ray.stages.groups import grouped_run_map

    carry_types = dict(carry)
    carry = list(carry_types)
    union_fields = (
        [("key", pa.int64()), ("kind", pa.int8())]
        + [(c, carry_types[c]) for c in carry]
        + [("text", pa.string())]
    )
    union_schema = pa.schema(union_fields)

    def text_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [
            pc.cast(batch.column("doc_id"), pa.int64()),
            pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
        ]
        for c in carry:
            arrays.append(pa.nulls(n, carry_types[c]))
        arrays.append(pc.cast(batch.column("text"), pa.string()))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def pair_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arrays = [
            pc.cast(batch.column(key_col), pa.int64()),
            pa.array(np.ones(n, dtype=np.int8), pa.int8()),
        ]
        for c in carry:
            arrays.append(pc.cast(batch.column(c), carry_types[c]))
        arrays.append(pa.nulls(n, pa.string()))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    unioned = documents_ds.map_batches(
        text_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(pairs_ds.map_batches(pair_side, batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema([(c, carry_types[c]) for c in carry] + [(out_col, pa.string())])

    def attach(run: pa.Table) -> pa.Table:
        # run = all rows for one key (order within the run is arbitrary —
        # the sort key is `key` alone so equal keys are co-partitioned;
        # adding kind to the sort key would NOT co-partition a key's run)
        kinds = run.column("kind")
        text_rows = run.filter(pc.equal(kinds, 0))
        if text_rows.num_rows == 0:  # pair rows whose doc has no text: drop
            return out_schema.empty_table()
        text_val = text_rows.column("text")[0].as_py()
        prs = run.filter(pc.equal(kinds, 1))
        arrays = [prs.column(c) for c in carry]
        arrays.append(pa.array([text_val] * prs.num_rows, pa.string()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    # min_run=2: a doc with no pair rows is a singleton (text-only) run and
    # never reaches Python
    return grouped_run_map(unioned, ["key"], attach, schema=out_schema, min_run=2)


def minhash_lsh_dedup(documents_ds, threshold: float = 0.8,
                      broadcast_max_docs: int = 100_000,
                      bucket_cap: int = BUCKET_CAP):
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify.

    Verification needs each pair's two texts. Fast path (candidate doc set
    ≤ ``broadcast_max_docs``): broadcast a {doc_id: text} dict via ray.put
    and score pairs in a task pool. Scale path (near-dup-heavy corpora
    where the candidate set is a large corpus fraction): two sorted-run
    text-attachment exchanges (_attach_texts) — pairs and texts co-sorted
    by doc key, texts picked up in-stream, never collected to the driver.
    Returns (doc_a, doc_b, jaccard) rows with jaccard ≥ threshold.
    """
    import ray
    import ray.data

    empty = pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
        names=["doc_a", "doc_b", "jaccard"],
    )

    # candidate pairs are tiny vs the corpus: materialize so count + reuse
    # don't re-run the banding stage
    pairs = (
        minhash_candidate_pairs(documents_ds, bucket_cap=bucket_cap)
        .select_columns(["doc_a", "doc_b"])
        .materialize()
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(empty)

    def verify_batch(batch: pa.Table, texts: dict | None = None) -> pa.Table:
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        if texts is not None:
            ta = [texts.get(x, "") for x in a]
            tb = [texts.get(y, "") for y in b]
        else:
            ta = batch.column("text_a").to_pylist()
            tb = batch.column("text_b").to_pylist()
        scores = [jaccard(x, y) for x, y in zip(ta, tb)]
        out = pa.Table.from_arrays(
            [
                pa.array(a, pa.int64()),
                pa.array(b, pa.int64()),
                pa.array(scores, pa.float64()),
            ],
            names=["doc_a", "doc_b", "jaccard"],
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    if 2 * n_pairs <= broadcast_max_docs:
        # fast path: collect the (small) needed-text dict, broadcast once
        needed: set[int] = set()
        for r in pairs.take_all():
            needed.add(r["doc_a"])
            needed.add(r["doc_b"])

        def keep_needed(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(
                batch.column("doc_id"), value_set=pa.array(list(needed), pa.int64())
            )
            return batch.filter(mask).select(["doc_id", "text"])

        texts = {}
        small = documents_ds.map_batches(
            keep_needed, batch_format="pyarrow", zero_copy_batch=True
        )
        for r in small.take_all():
            texts[r["doc_id"]] = r["text"]
        text_ref = ray.put(texts)

        class Verify:
            """Lazy-deref task instance (BruteForceScorer pattern): the
            candidate-text dict — small by the fast-path precondition — is
            fetched once per worker; an autoscaling actor pool here costs
            ~2s of cold start to score a few hundred pairs."""

            def __init__(self):
                self.texts = None

            def __call__(self, batch: pa.Table) -> pa.Table:
                if self.texts is None:
                    self.texts = ray.get(text_ref)
                return verify_batch(batch, self.texts)

        return pairs.map_batches(Verify(), batch_format="pyarrow", zero_copy_batch=True)

    # scale path: two sorted-run text joins, then verify in-stream
    with_a = _attach_texts(
        pairs, documents_ds, "doc_a", "text_a",
        {"doc_a": pa.int64(), "doc_b": pa.int64()},
    )
    with_ab = _attach_texts(
        with_a, documents_ds, "doc_b", "text_b",
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "text_a": pa.string()},
    )
    return with_ab.map_batches(verify_batch, batch_format="pyarrow", zero_copy_batch=True)


def near_dup_clusters(documents_ds, threshold: float = 0.8,
                      bucket_cap: int = BUCKET_CAP):
    """Cluster assignment over the near-duplicate graph: every document →
    the MIN doc_id of its connected component (cluster representative);
    docs with no near-dup edges map to themselves. The canonical
    keep-one-per-cluster filter for a training corpus is then simply
    ``cluster_rep == doc_id``.

    Plan (scale-honest): the verified near-dup pair set (minhash_lsh_dedup
    — jaccard ≥ threshold) is TINY relative to the corpus by definition,
    so components are solved driver-side with union-find over the
    collected edge list (the same small-side pattern as the W4 coreference
    merge), then the doc_id→rep map is broadcast and applied in one
    vectorized map_batches pass (index_in/take — no per-row Python). For
    an adversarial corpus whose edge set itself is huge, swap the driver
    union-find for iterative min-label propagation (groupby-min over edge
    endpoints until fixpoint) — O(diameter) shuffles of edge-sized data.
    """
    import ray

    pairs = minhash_lsh_dedup(documents_ds, threshold=threshold, bucket_cap=bucket_cap)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    # bounded: the docstring's smallness argument, asserted — beyond the
    # ceiling, switch to the iterative min-label propagation named above
    from parser_rdf_ray.collect import bounded_take_all

    for r in bounded_take_all(pairs, what="verified near-dup pair collect", ceiling=5_000_000):
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            winner, loser = (ra, rb) if ra < rb else (rb, ra)
            parent[loser] = winner

    rename = {x: find(x) for x in list(parent)}
    keys = pa.array(list(rename.keys()), pa.int64())
    vals = pa.array(list(rename.values()), pa.int64())
    ref = ray.put((keys, vals))

    class Assign:
        """Lazy-deref task instance; the rename arrays are one plasma read
        per worker."""

        def __init__(self):
            self.keys = None
            self.vals = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.keys is None:
                self.keys, self.vals = ray.get(ref)
            ids = pc.cast(batch.column("doc_id").combine_chunks(), pa.int64())
            idx = pc.index_in(ids, value_set=self.keys)
            rep = pc.if_else(pc.is_valid(idx), pc.take(self.vals, idx), ids)
            return pa.Table.from_arrays([ids, rep], names=["doc_id", "cluster_rep"])

    return documents_ds.map_batches(Assign(), batch_format="pyarrow", zero_copy_batch=True)


# --- simhash ---------------------------------------------------------------


# The DuckDB expression rebuilding a 64-bit simhash from per-token hashes
# in a column `hv` (= md5_number_lower(token), the _md5_low64 contract):
# 64 sign-of-weighted-bit-sum aggregates. Single source of truth for the
# driver oracle (__ray_entry__.py) and the SQL-contract property tests.
SIMHASH_SQL_BITS = " + ".join(
    f"(CASE WHEN SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
    f"THEN CAST({1 << b} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
    for b in range(64)
)


def _md5_low64(token: str) -> int:
    """Token hash = low 64 bits of md5, little-endian — bit-for-bit equal
    to DuckDB's ``md5_number_lower``, so the SQL oracle can recompute
    simhashes exactly (verified: md5_number_lower('hello') ==
    int.from_bytes(md5('hello').digest()[8:16], 'little'))."""
    return int.from_bytes(hashlib.md5(token.encode()).digest()[8:16], "little")


def simhash64(text: str) -> int:
    """64-bit simhash over md5-low64 token hashes (SQL-reproducible)."""
    from parser_rdf_ray.md5vec import md5_low64

    tokens = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if not tokens:
        return 0
    hashes = md5_low64(pa.array(tokens, pa.string()))
    bits = ((hashes.reshape(-1, 1) >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)


class SimHashBands:
    """documents → (band_id, band16, doc_id, simhash) rows; 4×16-bit bands
    guarantee a bucket collision for Hamming distance ≤ 3 (pigeonhole:
    ≤ 3 differing bits cannot touch all 4 disjoint bands), which makes
    simhash_dedup(max_hamming=3) EXACT — the SQL oracle is the full
    all-pairs Hamming join over recomputed simhashes.

    Token hashes are md5-low64 (== DuckDB md5_number_lower) hashed once
    per *distinct* token per batch (np.unique gather), then a
    (tokens × 64) ±1 bit matrix summed per doc with add.reduceat in
    slabs, sign-packed back into uint64."""

    _SLAB_TOKENS = 65_536  # (64 × slab) int8 bit matrix = 4MB

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        n = len(texts)
        all_tokens: list[str] = []
        counts = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [x for x in _TOKEN_RE.split(t.lower()) if x]
            all_tokens.extend(toks)
            counts[i] = len(toks)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])

        acc = np.zeros((n, 64), dtype=np.int64)
        if all_tokens:
            from parser_rdf_ray.md5vec import md5_low64

            uniq, inv = np.unique(np.array(all_tokens, dtype=object), return_inverse=True)
            uniq_hashes = md5_low64(pa.array(uniq, pa.string()))
            hashed = uniq_hashes[inv]
            shifts = np.arange(64, dtype=np.uint64)
            doc_lo = 0
            while doc_lo < n:
                doc_hi = doc_lo
                while (
                    doc_hi < n and offsets[doc_hi + 1] - offsets[doc_lo] <= self._SLAB_TOKENS
                ):
                    doc_hi += 1
                doc_hi = max(doc_hi, doc_lo + 1)
                lo, hi = offsets[doc_lo], offsets[doc_hi]
                if hi > lo:
                    bits = ((hashed[lo:hi].reshape(-1, 1) >> shifts) & 1).astype(np.int8)
                    # clip: reduceat rejects index == len (zero-token doc at
                    # the slab tail); clipped rows are garbage, zeroed below
                    idx = np.minimum(offsets[doc_lo:doc_hi] - lo, hi - lo - 1)
                    sums = np.add.reduceat(bits, idx, axis=0)
                    # handle empty docs inside the slab: reduceat on equal
                    # offsets copies the next row — zero them below via counts
                    acc[doc_lo:doc_hi] = 2 * sums - counts[doc_lo:doc_hi, None]
                doc_lo = doc_hi
            acc[counts == 0] = 0

        sim = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        band16 = np.empty(n * 4, dtype=np.int32)
        for b in range(4):
            band16[b::4] = ((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
                pa.array(band16, pa.int32()),
                pa.array(np.repeat(doc_ids, 4), pa.int64()),
                pa.array(np.repeat(sim, 4), pa.uint64()),
            ],
            names=["band_id", "band16", "doc_id", "simhash"],
        )


_HAM_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int32())]
)


def simhash_dedup(documents_ds, max_hamming: int = 3, bucket_cap: int = BUCKET_CAP):
    """Near-dup pairs by simhash banding + Hamming verify. Same
    sorted-run plan as minhash_candidate_pairs (stages/groups.py)."""
    from parser_rdf_ray.stages.groups import grouped_run_map, sorted_distinct

    def band_pairs(group: pa.Table) -> pa.Table:
        order_all = np.argsort(group.column("doc_id").to_numpy())
        ids_all = group.column("doc_id").to_numpy()[order_all]
        hashes_all = group.column("simhash").to_numpy()[order_all]
        order = _capped_ids(np.arange(len(ids_all)), "simhash", bucket_cap)
        ids, hashes = ids_all[order], hashes_all[order]
        ii, jj = np.triu_indices(len(ids), k=1)
        a, b = ids[ii], ids[jj]
        ha, hb = hashes[ii], hashes[jj]
        if len(ids_all) > bucket_cap:
            ci = _chain_index_pairs(len(ids_all), bucket_cap)
            a = np.concatenate([a, ids_all[ci]])
            b = np.concatenate([b, ids_all[ci + 1]])
            ha = np.concatenate([ha, hashes_all[ci]])
            hb = np.concatenate([hb, hashes_all[ci + 1]])
        xor = ha ^ hb
        ham = np.array([bin(int(x)).count("1") for x in xor], dtype=np.int32)
        keep = (ham <= max_hamming) & (a != b)
        return pa.Table.from_arrays(
            [
                pa.array(a[keep], pa.int64()),
                pa.array(b[keep], pa.int64()),
                pa.array(ham[keep], pa.int32()),
            ],
            names=["doc_a", "doc_b", "hamming"],
        )

    bands = documents_ds.map_batches(
        SimHashBands(), batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = grouped_run_map(bands, ["band_id", "band16"], band_pairs, schema=_HAM_SCHEMA)
    return sorted_distinct(pairs, ["doc_a", "doc_b"])


# --- exact n-gram Jaccard ---------------------------------------------------
#
# Training-data op with exact set semantics (the verification baseline the
# approximate sketches — minhash/simhash — are judged against; at corpus
# scale the LSH pipelines above are the production path, since a globally
# frequent n-gram makes the inverted-index self-join quadratic in that
# gram's document frequency).


def _word_ngram_hashes(text: str, n: int = 2) -> np.ndarray:
    """Distinct word n-gram hashes (uint64). Tokens = non-empty pieces of
    lower(text) split on \\W+ — the exact semantics DuckDB reproduces with
    string_split_regex(lower(text), '\\W+'), so the SQL oracle can rebuild
    identical gram sets. Fewer than n tokens → one gram of all tokens."""
    tokens = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < n:
        grams = {" ".join(tokens)}
    else:
        grams = {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
    return out


class NgramGramRows:
    """documents → (gram, doc_id, n_grams, part) inverted-index rows.
    part = gram % P routes every occurrence of a gram to one partition;
    n_grams (the doc's gram-set size) rides along so the pair stage can
    compute Jaccard without a separate sizes join."""

    def __init__(self, n: int = 2, num_partitions: int = 32):
        self.n = n
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        grams_out: list[np.ndarray] = []
        ids_out: list[np.ndarray] = []
        sizes_out: list[np.ndarray] = []
        for doc_id, text in zip(doc_ids, texts):
            g = _word_ngram_hashes(text, self.n)
            if not len(g):
                continue
            grams_out.append(g)
            ids_out.append(np.full(len(g), doc_id, dtype=np.int64))
            sizes_out.append(np.full(len(g), len(g), dtype=np.int32))
        if grams_out:
            grams = np.concatenate(grams_out)
            ids = np.concatenate(ids_out)
            sizes = np.concatenate(sizes_out)
        else:
            grams = np.empty(0, dtype=np.uint64)
            ids = np.empty(0, dtype=np.int64)
            sizes = np.empty(0, dtype=np.int32)
        part = (grams % np.uint64(self.num_partitions)).astype(np.int32)
        return pa.Table.from_arrays(
            [
                pa.array(grams, pa.uint64()),
                pa.array(ids, pa.int64()),
                pa.array(sizes, pa.int32()),
                pa.array(part, pa.int32()),
            ],
            names=["gram", "doc_id", "n_grams", "part"],
        )


def _gram_pairs_in_partition(group: pa.Table) -> pa.Table:
    """Vectorized per-partition co-occurrence counting: polars self-join on
    gram → (doc_a, doc_b) partial counts. One call per partition, not per
    gram."""
    import polars as pl

    df = pl.from_arrow(group.select(["gram", "doc_id", "n_grams"]))
    j = df.join(df, on="gram", suffix="_b")
    j = j.filter(pl.col("doc_id") < pl.col("doc_id_b"))
    co = (
        j.group_by(["doc_id", "doc_id_b", "n_grams", "n_grams_b"])
        .len(name="c")
        .rename({"doc_id": "doc_a", "doc_id_b": "doc_b", "n_grams": "na", "n_grams_b": "nb"})
    )
    t = co.to_arrow()
    return pa.Table.from_arrays(
        [
            t.column("doc_a").cast(pa.int64()),
            t.column("doc_b").cast(pa.int64()),
            t.column("na").cast(pa.int32()),
            t.column("nb").cast(pa.int32()),
            t.column("c").cast(pa.int64()),
        ],
        names=["doc_a", "doc_b", "na", "nb", "c"],
    )


def ngram_jaccard_dedup(documents_ds, threshold: float = 0.5, n: int = 2,
                        num_partitions: int | None = None):
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard ≥ t).

    Plan: explode distinct word-n-gram hashes (inverted index) →
    hash-partition by gram → vectorized per-partition self-join (partial
    pair counts; a pair sharing grams in several partitions is summed by
    the small groupby that follows) → jaccard = c / (na + nb - c), filter.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from parser_rdf_ray.tuning import shuffle_parallelism, tune_data_context

    tune_data_context()
    p = num_partitions or shuffle_parallelism()
    grams = documents_ds.map_batches(
        NgramGramRows(n, p), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    pairs = grams.groupby("part").map_groups(_gram_pairs_in_partition, batch_format="pyarrow")
    agg = pairs.groupby(["doc_a", "doc_b"]).aggregate(Sum("c"), Max("na"), Max("nb"))

    def finish(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("sum(c)"), pa.float64())
        na = pc.cast(batch.column("max(na)"), pa.float64())
        nb = pc.cast(batch.column("max(nb)"), pa.float64())
        jac = pc.divide(c, pc.subtract(pc.add(na, nb), c))
        t = pa.Table.from_arrays(
            [batch.column("doc_a"), batch.column("doc_b"), jac],
            names=["doc_a", "doc_b", "jaccard"],
        )
        t = t.filter(pc.greater_equal(t.column("jaccard"), threshold))
        return t.set_column(2, "jaccard", pc.round(t.column("jaccard"), ndigits=6))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


CROSS_CORPUS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("is_dup", pa.int64())])


def cross_corpus_dedup(documents_ds, existing_pct: int = 80):
    """Incremental-ingest exact dedup: is each NEW document a duplicate of
    anything in the EXISTING corpus? Membership is the deterministic
    hash_split contract (md5-low64(doc_id) % 100 < existing_pct →
    existing), so the op is self-contained over one table and the SQL
    oracle can recompute it; in production the existing side is the
    already-ingested corpus's digest column.

    Scale plan: ONE digest-keyed exchange, no driver state and no
    broadcast — existing rows tag (digest, kind=0), new rows
    (digest, doc_id, kind=1), a digest sort co-partitions each digest's
    run, and a vectorized run scan (cumsum-reduceat per block, zero
    per-run Python calls) marks each new row dup iff its run contains an
    existing row. The existing side moves as 16-byte digests, never
    text."""
    from parser_rdf_ray.stages.groups import run_spans
    from parser_rdf_ray.tuning import tune_data_context

    union_schema = pa.schema(
        [("digest", pa.string()), ("doc_id", pa.int64()), ("kind", pa.int8())]
    )

    def tag(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        from parser_rdf_ray.md5vec import md5_low64_ids

        digests = text_digest(batch.column("text"))
        # SQL-replayable split-membership contract (md5-low64 of the
        # decimal id), computed by the vectorized lane-parallel MD5
        existing = pa.array(md5_low64_ids(ids) % 100 < existing_pct)
        kind = pc.cast(
            pc.if_else(existing, pa.scalar(0, pa.int8()), pa.scalar(1, pa.int8())),
            pa.int8(),
        )
        return pa.Table.from_arrays([digests, ids, kind], schema=union_schema)

    tagged = documents_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tune_data_context()
    srt = tagged.sort("digest")

    def mark_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return CROSS_CORPUS_SCHEMA.empty_table()
        starts, _ = run_spans(batch, ["digest"])
        kinds = batch.column("kind").to_numpy()
        existing_per_run = np.add.reduceat(
            (kinds == 0).astype(np.int64), starts
        )
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        is_dup = (existing_per_run > 0).astype(np.int64)[run_ids]
        new_mask = kinds == 1
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").filter(pa.array(new_mask)),
                pa.array(is_dup[new_mask]),
            ],
            schema=CROSS_CORPUS_SCHEMA,
        )

    return srt.map_batches(
        mark_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
