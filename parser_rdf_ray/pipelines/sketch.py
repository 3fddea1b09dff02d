"""Distributed cardinality sketch: HyperLogLog with a DETERMINISTIC
integer estimator, so the sketch itself — registers, harmonic sum and
estimate — is reproducible bit-for-bit by the DuckDB oracle.

Standard HLL layout (Flajolet et al. 2007): h = md5-low64 of the key
(the engine's DuckDB-parity hash), top p bits pick the register, and the
register keeps max(rho) where rho = 1 + leading-zeros of the remaining
64-p bits. Everything downstream of the hash is small-integer exact:

    bit_length(v)  = searchsorted(powers_of_two, v)   (numpy)
                   = length(bin(v))                   (DuckDB, v > 0)
    harmonic sum   = Σ 2^(64-p-reg)  as exact integers (HUGEINT in SQL)
    estimate       = (α_num · m² · 2^(64-p)) // (α_den · hsum)

with α_m = 0.7213/(1 + 1.079/m) carried as the exact rational
(7213·1000·m) / (10000·(1000·m + 1079)) — no float ever enters, so the
distributed merge order cannot move the estimate. The small-range
linear-counting correction is intentionally omitted (it needs ln());
the op documents its valid range n ≳ 2.5·m instead.

Scale shape: one vectorized register table per batch (≤ m rows), a
Max-aggregate exchange over the m-sized register keyspace, and an
m-row bounded driver collect for the final fold — the corpus itself
never moves.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HLL_SCHEMA = pa.schema(
    [
        ("m", pa.int64()),
        ("estimate", pa.int64()),
        ("nonzero_registers", pa.int64()),
    ]
)


def _md5_low64(token: str) -> int:
    # same contract as pipelines/dedup._md5_low64 (== md5_number_lower)
    return int.from_bytes(hashlib.md5(token.encode()).digest()[8:16], "little")


def hll_estimate_from_registers(regs: np.ndarray, p: int) -> int:
    """Exact-integer HLL fold: registers (length 2^p) → estimate."""
    m = 1 << p
    rest_bits = 64 - p
    # Σ 2^(rest_bits - reg) in arbitrary-precision ints — exactly what the
    # SQL HUGEINT sum computes (reg ≤ rest_bits + 1 keeps terms ≥ 1/2;
    # scale by 2 to stay integral for the reg == rest_bits + 1 edge)
    hsum2 = sum(1 << (rest_bits - int(r) + 1) for r in regs)
    a_num = 7213 * 1000 * m
    a_den = 10000 * (1000 * m + 1079)
    return (a_num * m * m * (1 << (rest_bits + 1))) // (a_den * hsum2)


def approx_distinct(ds, key_col: str, p: int = 8):
    """HyperLogLog distinct-count over ``ds[key_col]`` → one-row Dataset
    (m, estimate, nonzero_registers). Valid range n ≳ 2.5·2^p (the
    linear-counting small-range correction is omitted by design — see
    module docstring)."""
    import ray.data

    from parser_rdf_ray.collect import bounded_take_all

    m = 1 << p
    rest_bits = 64 - p
    pows = 1 << np.arange(rest_bits, dtype=np.uint64)  # for bit_length

    partial_schema = pa.schema([("bucket", pa.int64()), ("reg", pa.int64())])

    def partials(batch: pa.Table) -> pa.Table:
        from parser_rdf_ray.md5vec import md5_low64

        col = batch.column(key_col)
        t = col.type
        # str(v) of an int equals pyarrow's decimal cast; strings hash
        # as-is — both take the vectorized path.  Nulls hash as the string
        # "None" (the historical str(None) contract — md5_low64 itself
        # rejects nulls, so fill first).  Other types keep the per-row
        # str() fallback (no current caller hits it).
        if pa.types.is_integer(t) or pa.types.is_string(t) or pa.types.is_large_string(t):
            s = col if pa.types.is_string(t) or pa.types.is_large_string(t) else pc.cast(
                pc.cast(col, pa.int64()), pa.string()
            )
            if s.null_count:
                s = pc.fill_null(s, "None")
            hashes = md5_low64(s)
        else:
            hashes = np.fromiter(
                (_md5_low64(str(v)) for v in col.to_pylist()),
                dtype=np.uint64,
                count=batch.num_rows,
            )
        if len(hashes) == 0:
            return partial_schema.empty_table()
        bucket = (hashes >> np.uint64(rest_bits)).astype(np.int64)
        v = hashes & np.uint64((1 << rest_bits) - 1)
        # bit_length(v) = #powers of two ≤ v — one searchsorted, exact
        bl = np.searchsorted(pows, v, side="right")
        rho = (rest_bits + 1 - bl).astype(np.int64)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.Table.from_arrays(
            [pa.array(nz.astype(np.int64)), pa.array(regs[nz])],
            schema=partial_schema,
        )

    from ray.data.aggregate import Max

    merged = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("reg"))
    )
    rows = bounded_take_all(
        merged, what="HLL register table", ceiling=4 * m
    )
    regs = np.zeros(m, dtype=np.int64)
    for r in rows:
        regs[int(r["bucket"])] = int(r["max(reg)"])
    est = hll_estimate_from_registers(regs, p)
    return ray.data.from_arrow(
        pa.Table.from_arrays(
            [
                pa.array([m], pa.int64()),
                pa.array([est], pa.int64()),
                pa.array([int((regs > 0).sum())], pa.int64()),
            ],
            schema=HLL_SCHEMA,
        )
    )


CM_SCHEMA = pa.schema([("term", pa.string()), ("est_count", pa.int64())])


def heavy_hitters(documents_ds, d: int = 4, w: int = 1024, k: int = 10):
    """Count-min-sketch heavy hitters over word occurrences — the
    frequency-estimation sketch (top-k terms without a vocabulary-sized
    exact count). Same determinism contract as approx_distinct: row
    hashes are md5-low64 of ``f"{j}:{term}"`` (== DuckDB
    md5_number_lower(concat(j, ':', term))), counters are exact int64,
    the estimate is min over the d counters, and ties rank (count desc,
    term asc) — the SQL oracle replays the sketch bit-for-bit,
    overcounts from hash collisions included.

    Tokenization matches top_ngrams (lower, split \\W+, drop empties).

    Scale shape: each batch folds its tokens into a LOCAL d×w counter
    matrix (np.add.at) and emits only nonzero cells, so the exchange is
    sketch-sized (≤ d·w rows per block), never token-stream-sized; the
    merged d×w matrix (a bounded driver collect) ships back into a
    closure for the vectorized estimate pass over the distinct-term set.
    """
    import re

    import ray.data
    from ray.data.aggregate import Sum

    from parser_rdf_ray.collect import bounded_take_all
    from parser_rdf_ray.stages.groups import sorted_distinct
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    token_re = re.compile(r"\W+")

    def tokens_of(batch: pa.Table) -> list[str]:
        out: list[str] = []
        for t in batch.column("text").to_pylist():
            out.extend(x for x in token_re.split(t.lower()) if x)
        return out

    cell_schema = pa.schema(
        [("j", pa.int64()), ("col", pa.int64()), ("cnt", pa.int64())]
    )

    def partial_cells(batch: pa.Table) -> pa.Table:
        toks = tokens_of(batch)
        if not toks:
            return cell_schema.empty_table()
        cm = np.zeros((d, w), dtype=np.int64)
        from parser_rdf_ray.md5vec import md5_low64_prefixed

        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        uniq_arr = pa.array(uniq, pa.string())
        for j in range(d):
            cols = (md5_low64_prefixed(f"{j}:", uniq_arr) % np.uint64(w)).astype(np.int64)
            np.add.at(cm[j], cols, counts)
        jj, cc = np.nonzero(cm)
        return pa.Table.from_arrays(
            [
                pa.array(jj.astype(np.int64)),
                pa.array(cc.astype(np.int64)),
                pa.array(cm[jj, cc]),
            ],
            schema=cell_schema,
        )

    merged = (
        documents_ds.map_batches(
            partial_cells, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["j", "col"])
        .aggregate(Sum("cnt"))
    )
    rows = bounded_take_all(merged, what="count-min sketch cells", ceiling=4 * d * w)
    cm = np.zeros((d, w), dtype=np.int64)
    for r in rows:
        cm[int(r["j"]), int(r["col"])] = int(r["sum(cnt)"])

    def term_rows(batch: pa.Table) -> pa.Table:
        toks = tokens_of(batch)
        return pa.Table.from_arrays(
            [pa.array(sorted(set(toks)), pa.string())], names=["term"]
        )

    cand = sorted_distinct(
        documents_ds.map_batches(
            term_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["term"],
    )

    def estimate(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        if not terms:
            return CM_SCHEMA.empty_table()
        from parser_rdf_ray.md5vec import md5_low64_prefixed

        est = np.full(len(terms), np.iinfo(np.int64).max, dtype=np.int64)
        terms_arr = pa.array(terms, pa.string())
        for j in range(d):
            cols = (md5_low64_prefixed(f"{j}:", terms_arr) % np.uint64(w)).astype(np.int64)
            est = np.minimum(est, cm[j, cols])
        return pa.Table.from_arrays(
            [pa.array(terms, pa.string()), pa.array(est)], schema=CM_SCHEMA
        )

    ests = cand.map_batches(estimate, batch_format="pyarrow", zero_copy_batch=True)

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(
            batch, sort_keys=[("est_count", "descending"), ("term", "ascending")]
        )
        return batch.take(idx[: min(k, len(idx))])

    partial = ests.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return partial.sort(["est_count", "term"], descending=[True, False]).limit(k)


QSKETCH_SCHEMA = pa.schema(
    [("quantile", pa.float64()), ("est_price", pa.float64()), ("n_orders", pa.int64())]
)


def approx_quantiles_sketch(sf_dir: str, width_cents: int = 10_000,
                            qs=(0.5, 0.9, 0.99)):
    """APPROXIMATE quantiles via a fixed-width histogram sketch — the
    scale path next to the exact rank-location quantiles
    (relational.group_quantiles): the exchange carries only
    (bucket, count) cells (domain/width buckets, not rows), so the sketch
    size is independent of row count. Estimate = upper bound of the first
    bucket whose cumulative count reaches ceil(q·n) — deterministic,
    integer-exact arithmetic replayed verbatim by the SQL oracle, with
    error bounded by the bucket width ($100 default on o_totalprice).
    Per-block combiner: one polars group_by per block, then a
    sketch-sized groupby(bucket).sum; the final cumulative scan runs in
    one task over the tiny histogram."""
    import numpy as np
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        df = pl.DataFrame({"b": pl.from_arrow(cents) // width_cents})
        agg = df.group_by("b").agg(pl.len().alias("cnt"))
        out = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(out.column("b"), pa.int64()),
                pc.cast(out.column("cnt"), pa.int64()),
            ],
            names=["b", "cnt"],
        )

    hist = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .sum("cnt")
    )

    def estimate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return QSKETCH_SCHEMA.empty_table()
        b = batch.column("b").to_numpy()
        cnt = batch.column("sum(cnt)").to_numpy()
        order = np.argsort(b)
        b, cnt = b[order], cnt[order]
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        rows = []
        for q in qs:
            rank = int(np.ceil(q * n))
            i = int(np.searchsorted(cum, rank))
            # upper bound of the first bucket reaching the rank
            rows.append((float(q), (int(b[i]) + 1) * width_cents / 100.0, n))
        return pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.float64()),
                pa.array([r[1] for r in rows], pa.float64()),
                pa.array([r[2] for r in rows], pa.int64()),
            ],
            schema=QSKETCH_SCHEMA,
        )

    # the histogram is sketch-sized: one task sees it all
    return hist.repartition(1).map_batches(
        estimate, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
