"""Similarity search over the embeddings table (vec_id, embedding, label).

- knn_brute_force: exact cosine top-k. The query matrix is broadcast once
  (ray.put → actor __init__), each batch does one numpy matmul against it,
  and per-batch partial top-k rows (num_queries × k per block — tiny) are
  reduced by a final groupby-free sort/limit per query on the driver side
  of a small dataset. Scale path: data side streams, query side is the
  broadcast small side — no shuffle of the corpus.
- lsh_knn: random-hyperplane LSH bucketing (signed projections) so at
  10^12 scale only same-bucket vectors are scored; brute-force fallback
  inside buckets.
- embedding_near_dup: cosine ≥ threshold near-duplicate pairs via bucketed
  blocking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(col) -> np.ndarray:
    """Arrow (fixed_size_)list<float> column → (n, dim) float64 ndarray
    with NO per-row Python lists: flatten() exposes the value buffer,
    to_numpy reads it zero-copy (floats, no nulls), one reshape. The
    former to_pylist() materialized n × dim Python floats per batch."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    return vals.astype(np.float64, copy=False).reshape(n, -1)


def _i64(col) -> np.ndarray:
    """Arrow int column → int64 ndarray without to_pylist."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


class BruteForceScorer:
    """Broadcast-scoring stage. Lazy dereference: the instance ships to
    each task holding only the ObjectRef; the first batch in a worker does
    one ZERO-COPY plasma read of the query matrix. Task pool rather than
    actor pool — numpy plasma gets are mmap-zero-copy, so per-task state
    costs nothing while an autoscaling actor pool pays seconds of
    cold-start per pipeline."""

    def __init__(self, query_ref, k: int):
        self._query_ref = query_ref
        self.k = k
        self.query_ids = None
        self.query_mat = None

    def _ensure(self):
        if self.query_ids is not None:
            return
        import ray

        q = self._query_ref
        queries = q if isinstance(q, dict) else ray.get(q)
        self.query_ids = np.array(list(queries.keys()), dtype=np.int64)
        self.query_mat = _normalize(np.array(list(queries.values()), dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        vec_ids = _i64(batch.column("vec_id"))
        emb = _emb_matrix(batch.column("embedding"))
        if emb.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["query_id", "vec_id", "cosine"],
            )
        emb = _normalize(emb)
        sims = self.query_mat @ emb.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            for j in idx[qi]:
                out_q.append(int(qid))
                out_v.append(int(vec_ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.Table.from_arrays(
            [
                pa.array(out_q, pa.int64()),
                pa.array(out_v, pa.int64()),
                pa.array(out_s, pa.float64()),
            ],
            names=["query_id", "vec_id", "cosine"],
        )


def knn_brute_force(embeddings_ds, queries: dict[int, list[float]], k: int = 10):
    """Exact top-k per query. Returns (query_id, vec_id, cosine) rows,
    k per query, cosine-descending deterministic (ties → lower vec_id)."""
    import ray

    query_ref = ray.put(queries)
    partials = embeddings_ds.map_batches(
        BruteForceScorer(query_ref, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # final reduce: partials are tiny (n_queries × k × n_blocks)
    def topk_per_query(group: pa.Table) -> pa.Table:
        order = group.sort_by(
            [("cosine", "descending"), ("vec_id", "ascending")]
        )
        return order.slice(0, min(k, order.num_rows))

    return partials.groupby("query_id").map_groups(topk_per_query, batch_format="pyarrow")


_HYPERPLANE_SEED = 1234


def _hyperplanes(dim: int, n_bits: int = 12) -> np.ndarray:
    rng = np.random.RandomState(_HYPERPLANE_SEED)
    return rng.normal(size=(n_bits, dim)).astype(np.float32)


class LshBucketer:
    def __init__(self, dim: int, n_bits: int = 12):
        self.planes = _hyperplanes(dim, n_bits)

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch.column("embedding"))
        buckets = self.bucket_of(emb) if emb.size else np.array([], dtype=np.int64)
        return batch.append_column("bucket", pa.array(buckets, pa.int64()))


def embedding_near_dup(embeddings_ds, threshold: float = 0.95, dim: int = 64):
    """(vec_a, vec_b, cosine) pairs with cosine ≥ threshold. LSH-bucketed
    blocking → in-bucket exact cosine (near-identical vectors collide in
    all-bits buckets with high probability)."""
    bucketed = embeddings_ds.map_batches(
        LshBucketer(dim), batch_format="pyarrow", zero_copy_batch=True
    )

    def in_bucket_pairs(group: pa.Table) -> pa.Table:
        ids = _i64(group.column("vec_id"))
        emb = _normalize(_emb_matrix(group.column("embedding")))
        order = np.argsort(ids)
        ids, emb = ids[order], emb[order]
        n = len(ids)
        a, b, s = [], [], []
        if n > 1:
            sims = emb @ emb.T
            ii, jj = np.triu_indices(n, k=1)
            keep = sims[ii, jj] >= threshold
            for i, j in zip(ii[keep], jj[keep]):
                a.append(int(ids[i]))
                b.append(int(ids[j]))
                s.append(float(sims[i, j]))
        return pa.Table.from_arrays(
            [pa.array(a, pa.int64()), pa.array(b, pa.int64()), pa.array(s, pa.float64())],
            names=["vec_a", "vec_b", "cosine"],
        )

    from parser_rdf_ray.stages.groups import grouped_run_map

    schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cosine", pa.float64())])
    return grouped_run_map(bucketed, ["bucket"], in_bucket_pairs, schema=schema)


def embedding_near_dup_exact(embeddings_ds, threshold: float = 0.4):
    """Exact cosine-threshold similarity join as a distributed tiled
    block-pair sweep — NO driver materialization.

    The driver collects only block *references*; one prep task per block
    decodes + L2-normalizes it into an (ids, matrix) pair held in plasma,
    then one score task per unordered block pair (B·(B+1)/2 tasks) does a
    single matmul tile and emits (vec_a < vec_b) rows with cosine ≥
    threshold. Each task touches exactly two bounded blocks (zero-copy
    plasma reads), so memory stays flat while the cluster schedules tiles
    anywhere. The work is inherently O(n²) — it is an *exact* similarity
    join; at corpus scale use embedding_near_dup (LSH) when the threshold
    is high enough for hyperplane bucketing to have recall (cosine ≳ 0.9).
    At low thresholds (the oracle's 0.4 — angle ≈ 66°) no LSH family has
    usable recall, so only this exact sweep is deterministic-recall-1.

    Raw Ray tasks (not Dataset ops) are the documented last resort here:
    a block cross-product is not expressible as a Dataset transform.
    """
    import ray
    import ray.data

    proj = embeddings_ds.select_columns(["vec_id", "embedding"])
    block_refs = [
        br for bundle in proj.iter_internal_ref_bundles() for br in bundle.block_refs
    ]

    @ray.remote
    def prep(block: pa.Table):
        ids = _i64(block.column("vec_id"))
        mat = _normalize(_emb_matrix(block.column("embedding")))
        return ids, mat

    preps = [prep.remote(r) for r in block_refs]

    @ray.remote
    def score_tile(tile_a, tile_b, same_block: bool) -> pa.Table:
        (ia, ma), (ib, mb) = tile_a, tile_b
        a_out = np.empty(0, dtype=np.int64)
        b_out = a_out
        if len(ia) and len(ib):
            sims = ma @ mb.T
            ii, jj = np.nonzero(sims >= threshold)
            a, b = ia[ii], ib[jj]
            if same_block:
                keep = a < b
                a_out, b_out = a[keep], b[keep]
            else:
                # blocks are disjoint (unique vec_ids): each unordered pair
                # appears in exactly one (i<j) tile — just normalize order
                a_out, b_out = np.minimum(a, b), np.maximum(a, b)
        return pa.Table.from_arrays(
            [pa.array(a_out, pa.int64()), pa.array(b_out, pa.int64())],
            names=["vec_a", "vec_b"],
        )

    tiles = [
        score_tile.remote(preps[i], preps[j], i == j)
        for i in range(len(preps))
        for j in range(i, len(preps))
    ]
    if not tiles:
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["vec_a", "vec_b"],
            )
        )
    return ray.data.from_arrow_refs(tiles)


def label_centroids(embeddings_ds, dim: int = 64, round_to: int = 6):
    """Per-label mean embedding (the k-means M-step / class-prototype
    aggregate), emitted LONG-form as (label, dim, value) rows so the SQL
    oracle can recompute it with a plain AVG.

    Plan: one vectorized map_batches computes per-(batch, label) partial
    (sum-vector, count) via np.add.reduceat over label-sorted rows — the
    combiner — then a groupby over the SMALL label set merges partials
    (map_groups is fine here: group count == label cardinality, not row
    count). Only (labels × dim) doubles ever shuffle, never the vectors.
    """
    scale = 10 ** round_to

    def partials(batch: pa.Table) -> pa.Table:
        labels = _i64(batch.column("label"))
        emb = _emb_matrix(batch.column("embedding"))
        if emb.size == 0:
            return pa.Table.from_arrays(
                [
                    pa.array([], pa.int64()),
                    pa.array([], pa.list_(pa.int64())),
                    pa.array([], pa.int64()),
                ],
                names=["label", "vec_sum", "n"],
            )
        # Per-element quantization to 10^-round_to units BEFORE summing.
        # Each element's round is a pure function of that element (both
        # sides compute the identical float64 product and half-away round),
        # and int64 sums are exactly associative — so the whole aggregate
        # is order-free and the float-SUM+ROUND flake class (CLAUDE.md) is
        # designed out, at the cost of defining the centroid over 1e-6-
        # quantized inputs (≤5e-7 per-element difference from the true mean).
        q = (np.sign(emb) * np.floor(np.abs(emb) * scale + 0.5)).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        labels, q = labels[order], q[order]
        starts = np.flatnonzero(np.diff(labels, prepend=labels[0] - 1))
        sums = np.add.reduceat(q, starts, axis=0)
        counts = np.diff(np.append(starts, len(labels)))
        return pa.Table.from_arrays(
            [
                pa.array(labels[starts], pa.int64()),
                pa.array(list(sums), pa.list_(pa.int64())),
                pa.array(counts, pa.int64()),
            ],
            names=["label", "vec_sum", "n"],
        )

    part = embeddings_ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)

    def combine(group: pa.Table) -> pa.Table:
        label = group.column("label")[0].as_py()
        arr = group.column("vec_sum")
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        sums = arr.flatten().to_numpy(zero_copy_only=False).reshape(len(arr), -1)
        s = sums.astype(np.int64, copy=False).sum(axis=0)
        n = int(np.sum(group.column("n").to_numpy()))
        # integer half-away rounding of s/n: (2|s|+n) // (2n), re-signed —
        # no float enters until the final exact /scale (units < 2^53)
        units = np.where(s >= 0, (2 * s + n) // (2 * n), -((-2 * s + n) // (2 * n)))
        mean = units / float(scale)
        dims = np.arange(1, len(mean) + 1)
        return pa.Table.from_arrays(
            [
                pa.array([label] * len(mean), pa.int64()),
                pa.array(dims, pa.int64()),
                pa.array(mean, pa.float64()),
            ],
            names=["label", "dim", "value"],
        )

    return part.groupby("label").map_groups(combine, batch_format="pyarrow")


def knn_ivf(embeddings_ds, queries: dict[int, list[float]], k: int = 10, n_bits: int = 8):
    """IVF/LSH-bucketed ANN: score only the buckets the queries fall in
    (plus 1-bit-flip neighbors for recall). The scale path when brute force
    over the full corpus is too expensive.

    Recall is data-dependent: on clustered corpora same-cluster neighbors
    collide and recall is high; on ISOTROPIC data (the sandbox gaussians)
    neighbors sit at ~60° where hyperplane buckets have little gradient,
    so recall is bounded by concentration, not by this implementation —
    measured ~9× better than a random scan of the same candidate fraction
    (pinned by TestKnnIvf::test_recall_vs_brute_force). The driver oracle
    verifies the bucketing/probing/scoring EXACTLY in SQL regardless."""
    dim = len(next(iter(queries.values())))
    bucketer = LshBucketer(dim, n_bits)
    qmat = _normalize(np.array(list(queries.values()), dtype=np.float64))
    qbuckets = set(bucketer.bucket_of(qmat).tolist())
    probe = set(qbuckets)
    for b in qbuckets:
        for bit in range(n_bits):
            probe.add(b ^ (1 << bit))

    bucketed = embeddings_ds.map_batches(
        LshBucketer(dim, n_bits), batch_format="pyarrow", zero_copy_batch=True
    )
    probe_arr = pa.array(sorted(probe), pa.int64())

    def keep_probed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("bucket"), value_set=probe_arr))

    candidates = bucketed.map_batches(keep_probed, batch_format="pyarrow", zero_copy_batch=True)
    return knn_brute_force(candidates, queries, k)


KMEANS_SCHEMA = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64())])


def _quant_units(emb: np.ndarray, scale: int) -> np.ndarray:
    """Half-away 1e-6 quantization — the label_centroids contract
    (== DuckDB ROUND(CAST(e AS DOUBLE)·scale))."""
    return (np.sign(emb) * np.floor(np.abs(emb) * scale + 0.5)).astype(np.int64)


def kmeans_embeddings(embeddings_ds, k: int = 8, n_iter: int = 3,
                      round_to: int = 6):
    """Lloyd's k-means over the embedding corpus — the engine's iterative
    clustering primitive (semantic dedup blocking, corpus bucketing).
    ``n_iter`` assignment rounds with an M-step between consecutive
    rounds; returns (vec_id, cluster) from the final round.

    EXACT integer semantics (the kg_pagerank design, applied to vectors):
    embeddings are 1e-6-quantized to int64 units per element (half-away,
    the label_centroids contract), squared-L2 distances are exact int64
    (u² + c² − 2·u·c via int64 matmul; max |term| ≈ 64·4e12 ≪ 2⁶³), the
    argmin tie-breaks to the lowest centroid id, and the M-step mean is
    exact integer floor(sum/count) (sign-decomposed, since DuckDB's //
    truncates). Every step is order-independent, so the unrolled SQL
    oracle matches bit-for-bit.

    Plan: quantized (vec_id, units) is materialized ONCE (blocks stay in
    plasma, spillable); per round the k×dim int64 centroid matrix ships
    as a task closure (~4 KB), each batch does one matmul + reduceat
    partial-sum — only k×(dim+2) int64 rows per block ever shuffle, via a
    groupby over the k-sized cid set (map_groups justified: group count
    == k). The driver holds exactly the k×dim centroid state between
    rounds — the same bounded-state shape as knn queries. An emptied
    cluster keeps its previous centroid (deterministic; the SQL oracle
    omits empty clusters instead, so oracle equality additionally
    witnesses that no cluster empties on the driver corpora).

    Seeding: centroids 0..k-1 are the embeddings with vec_id < k —
    deterministic and SQL-reproducible (no RNG in the contract).
    """
    import pyarrow.compute as pc
    import ray.data

    from parser_rdf_ray.collect import bounded_take_all
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    scale = 10 ** round_to

    def to_units(batch: pa.Table) -> pa.Table:
        ids = _i64(batch.column("vec_id"))
        emb = _emb_matrix(batch.column("embedding"))
        units = _quant_units(emb, scale) if emb.size else np.empty((0, 0), np.int64)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(list(units), pa.list_(pa.int64()))],
            names=["vec_id", "units"],
        )

    base = embeddings_ds.map_batches(
        to_units, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def units_matrix(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if len(arr) == 0:
            return np.empty((0, 0), dtype=np.int64)
        vals = arr.flatten().to_numpy(zero_copy_only=False)
        return vals.astype(np.int64, copy=False).reshape(len(arr), -1)

    def seed_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.less(pc.cast(batch.column("vec_id"), pa.int64()), pa.scalar(k))
        )

    seeds = bounded_take_all(
        base.map_batches(seed_rows, batch_format="pyarrow", zero_copy_batch=True),
        what="kmeans seed centroids",
        ceiling=max(4 * k, 1024),
    )
    seeds.sort(key=lambda r: r["vec_id"])
    C = np.array([np.asarray(r["units"], dtype=np.int64) for r in seeds])
    if len(C) < k:
        raise ValueError(f"kmeans seeding needs vec_ids 0..{k-1}; found {len(C)}")

    def assign_of(U: np.ndarray, Cm: np.ndarray) -> np.ndarray:
        c2 = (Cm * Cm).sum(axis=1)
        u2 = (U * U).sum(axis=1)
        dist = u2[:, None] + c2[None, :] - 2 * (U @ Cm.T)
        return np.argmin(dist, axis=1).astype(np.int64)  # ties → lowest cid

    partial_schema = pa.schema(
        [("cid", pa.int64()), ("vec_sum", pa.list_(pa.int64())), ("n", pa.int64())]
    )

    def make_partials(Cm: np.ndarray):
        def partials(batch: pa.Table) -> pa.Table:
            U = units_matrix(batch.column("units"))
            if U.size == 0:
                return partial_schema.empty_table()
            assign = assign_of(U, Cm)
            order = np.argsort(assign, kind="stable")
            a_s, U_s = assign[order], U[order]
            starts = np.flatnonzero(np.diff(a_s, prepend=a_s[0] - 1))
            sums = np.add.reduceat(U_s, starts, axis=0)
            cnts = np.diff(np.append(starts, len(a_s)))
            return pa.Table.from_arrays(
                [
                    pa.array(a_s[starts], pa.int64()),
                    pa.array(list(sums), pa.list_(pa.int64())),
                    pa.array(cnts, pa.int64()),
                ],
                schema=partial_schema,
            )

        return partials

    def combine(group: pa.Table) -> pa.Table:
        cid = group.column("cid")[0].as_py()
        sums = units_matrix(group.column("vec_sum"))
        s = sums.sum(axis=0)
        n = int(group.column("n").to_numpy().sum())
        units = s // n  # numpy int64 // is FLOOR — the oracle's contract
        return pa.Table.from_arrays(
            [pa.array([cid], pa.int64()), pa.array([list(units)], pa.list_(pa.int64()))],
            names=["cid", "units"],
        )

    for _ in range(n_iter - 1):
        part = base.map_batches(
            make_partials(C), batch_format="pyarrow", zero_copy_batch=True
        )
        rows = bounded_take_all(
            part.groupby("cid").map_groups(combine, batch_format="pyarrow"),
            what="kmeans centroid update",
            ceiling=max(4 * k, 1024),
        )
        C = C.copy()
        for r in rows:  # emptied clusters keep their previous centroid
            C[int(r["cid"])] = np.asarray(r["units"], dtype=np.int64)

    Cf = C

    def label_batch(batch: pa.Table) -> pa.Table:
        U = units_matrix(batch.column("units"))
        if U.size == 0:
            return KMEANS_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [batch.column("vec_id"), pa.array(assign_of(U, Cf), pa.int64())],
            schema=KMEANS_SCHEMA,
        )

    return base.map_batches(label_batch, batch_format="pyarrow", zero_copy_batch=True)
