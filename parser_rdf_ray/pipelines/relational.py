"""Generic wide-operator pipelines over the TPC-H-ish tables — the engine's
groupby/aggregate, broadcast-join, and sort/limit building blocks, each
DuckDB-oracle-verifiable.

Design notes (100 TB):
- Aggregations pre-combine inside map_batches where possible; the groupby
  shuffle then moves partial aggregates, not raw rows.
- Joins broadcast the small side (ray.put once, dict lookup per batch) —
  never a two-sided shuffle when one side fits in memory.
- Top-k runs as per-block partial top-k (map_batches) then a final tiny
  reduce — no global sort of the full table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def lineitem_agg(sf_dir: str):
    """Q1-style: per (returnflag, linestatus) aggregate with a map-side
    combiner so the shuffle carries one partial row per (group × block)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    # Money columns are fixed-point decimals stored as floats (TPC-H
    # semantics: extendedprice = exact cents, discount = exact percent,
    # quantity integral — verified on the driver tables). Summing in
    # INTEGER units makes every partial sum exactly associative, so the
    # result is independent of distributed summation order — float sums
    # rounded to 3 dp flipped a final digit run-to-run when a group's sum
    # landed on a rounding boundary (observed at sf0.001). The SQL oracle
    # uses the same integer units.
    def partial(batch: pa.Table) -> pa.Table:
        ep_cents = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        disc_pct = pc.cast(
            pc.round(pc.multiply(batch.column("l_discount"), pa.scalar(100.0))),
            pa.int64(),
        )
        # disc_price in 1e-4 units: cents × (100 - pct)
        disc_u = pc.multiply(ep_cents, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        qty = pc.cast(pc.round(batch.column("l_quantity")), pa.int64())
        t = pa.Table.from_arrays(
            [
                batch.column("l_returnflag"),
                batch.column("l_linestatus"),
                qty,
                ep_cents,
                disc_u,
            ],
            names=["l_returnflag", "l_linestatus", "qty", "ep_cents", "disc_u"],
        )
        grouped = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("ep_cents", "sum"), ("disc_u", "sum"), ("qty", "count")]
        )
        return grouped.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "ep_cents", "disc_u", "count_order"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(group: pa.Table) -> pa.Table:
        agg = group.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("ep_cents", "sum"), ("disc_u", "sum"), ("count_order", "sum")]
        )
        agg = agg.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "ep_cents", "disc_u", "count_order"]
        )
        # 3 dp half-away rounding IN INTEGERS ((u + 5) // 10 on 1e-4
        # units): the tie rule then never touches floats — arrow's
        # half-to-even vs DuckDB's half-away diverged on a real .xxx5 tie
        disc_3dp = pc.divide(
            pc.add(agg.column("disc_u"), pa.scalar(5, pa.int64())),
            pa.scalar(10, pa.int64()),
        )
        return pa.Table.from_arrays(
            [
                agg.column("l_returnflag"),
                agg.column("l_linestatus"),
                pc.cast(agg.column("qty"), pa.float64()),
                pc.divide(pc.cast(agg.column("ep_cents"), pa.float64()), pa.scalar(100.0)),
                pc.divide(pc.cast(disc_3dp, pa.float64()), pa.scalar(1000.0)),
                agg.column("count_order"),
            ],
            names=[
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "count_order",
            ],
        )

    return partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        final, batch_format="pyarrow"
    )


def orders_join_topk(sf_dir: str, k: int = 10):
    """Broadcast join orders←customer + global top-k by totalprice.
    The customer (small-side) dict is built IN A TASK and only its
    ObjectRef reaches the driver — the rows never transit driver memory,
    so a GB-scale small side only has to fit in one worker. Orders stream.
    Top-k: per-block partial top-k → final sort of ≤ k × n_blocks rows."""
    import ray
    import ray.data

    @ray.remote
    def build_customer_dict() -> dict:
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
        )
        return {
            ck: (nm, seg)
            for ck, nm, seg in zip(
                t.column("c_custkey").to_pylist(),
                t.column("c_name").to_pylist(),
                t.column("c_mktsegment").to_pylist(),
            )
        }

    cust_ref = build_customer_dict.remote()

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    class JoinTopK:
        """Lazy-deref task stage: the customer dict is fetched once per
        worker on first use. At a scale where the small side is GBs, flip
        this back to an actor pool (map_batches(JoinTopK, concurrency=N))
        so deserialization happens once per actor instead of per worker."""

        def __init__(self):
            self.customers = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.customers is None:
                self.customers = ray.get(cust_ref)
            idx = pc.sort_indices(
                batch,
                sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
            )
            batch = batch.take(idx[: min(k, len(idx))])
            names, segs = [], []
            lookup = self.customers
            for ck in batch.column("o_custkey").to_pylist():
                name, seg = lookup.get(ck, (None, None))
                names.append(name)
                segs.append(seg)
            batch = batch.append_column("c_name", pa.array(names, pa.string()))
            return batch.append_column("c_mktsegment", pa.array(segs, pa.string()))

    partials = orders.map_batches(JoinTopK(), batch_format="pyarrow")
    final = partials.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    return final


def topk_orders_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (the distributed window function): top-k orders by
    totalprice per customer market segment. Broadcast join for the
    segment column, then stages/groups.grouped_topk — a vectorized
    per-batch combiner bounds what shuffles to k × n_blocks rows per
    segment before ONE key sort finishes. Deterministic ties by
    o_orderkey ascending."""
    import ray
    import ray.data

    from parser_rdf_ray.stages.groups import grouped_topk

    @ray.remote
    def seg_dict() -> dict:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
        return dict(zip(t.column("c_custkey").to_pylist(), t.column("c_mktsegment").to_pylist()))

    ref = seg_dict.remote()

    class AttachSegment:
        def __init__(self):
            self.keys = None
            self.vals = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.keys is None:
                import ray as _ray

                segs = _ray.get(ref)
                self.keys = pa.array(list(segs.keys()), pa.int64())
                self.vals = pa.array(list(segs.values()), pa.string())
            idx = pc.index_in(pc.cast(batch.column("o_custkey"), pa.int64()), value_set=self.keys)
            seg = pc.take(self.vals, idx)
            return batch.append_column("c_mktsegment", seg)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    with_seg = orders.map_batches(AttachSegment(), batch_format="pyarrow", zero_copy_batch=True)
    top = grouped_topk(
        with_seg, ["c_mktsegment"], "o_totalprice", k, tie_cols=["o_orderkey"]
    )
    return top.select_columns(["c_mktsegment", "o_orderkey", "o_custkey", "o_totalprice"])


def events_window_agg(sf_dir: str):
    """Windowed/streaming-style aggregate: per (event_type, hour-of-day)
    count + value sum — event-time bucketing as a vectorized map + groupby
    combiner (the batch-semantics analog of a tumbling window)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    # value is a fixed-point decimal stored as float (exact at 1e6 units,
    # verified); summing integer micro-units makes the partial sums
    # exactly associative — order-independent like rel_lineitem_agg
    def bucket(batch: pa.Table) -> pa.Table:
        hours = pc.hour(batch.column("ts"))
        value_u = pc.cast(
            pc.round(pc.multiply(batch.column("value"), pa.scalar(1_000_000.0))),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [batch.column("event_type"), pc.cast(hours, pa.int32()), value_u],
            names=["event_type", "hour", "value_u"],
        )
        grouped = t.group_by(["event_type", "hour"]).aggregate(
            [("value_u", "sum"), ("value_u", "count")]
        )
        return grouped.rename_columns(["event_type", "hour", "value_u", "n_events"])

    partials = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)

    def final(group: pa.Table) -> pa.Table:
        agg = group.group_by(["event_type", "hour"]).aggregate(
            [("value_u", "sum"), ("n_events", "sum")]
        )
        agg = agg.rename_columns(["event_type", "hour", "value_u", "n_events"])
        # 3 dp half-away in integers ((u + 500) // 1000 on 1e-6 units)
        v3 = pc.divide(
            pc.add(agg.column("value_u"), pa.scalar(500, pa.int64())),
            pa.scalar(1000, pa.int64()),
        )
        return pa.Table.from_arrays(
            [
                agg.column("event_type"),
                agg.column("hour"),
                pc.divide(pc.cast(v3, pa.float64()), pa.scalar(1000.0)),
                agg.column("n_events"),
            ],
            names=["event_type", "hour", "sum_value", "n_events"],
        )

    return partials.groupby(["event_type", "hour"]).map_groups(final, batch_format="pyarrow")


SESSIONS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_idx", pa.int64()),
        ("session_start", pa.timestamp("us")),
        ("n_events", pa.int64()),
        ("sum_value", pa.float64()),
    ]
)


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization (the batch analog of session windows):
    events sorted so each user's rows are contiguous in ONE partition
    (stages/groups.py sorted-run machinery — sorting by user_id alone
    co-partitions equal keys, unlike sorting by (user_id, ts), where a
    range boundary could split one user's rows), then per-user vectorized
    gap detection + reduceat session aggregates."""
    import numpy as np
    import ray.data

    from parser_rdf_ray.stages.groups import grouped_run_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value", "event_id"]
    )
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def user_sessions(run: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            run, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        run = run.take(order)
        ts = run.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        # integer micro-units: the session sum is then exact, so the final
        # /1e6 value is identical to the oracle's regardless of row order
        val = np.round(run.column("value").to_numpy() * 1e6).astype(np.int64)
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], len(ts))
        uid = run.column("user_id")[0].as_py()
        return pa.Table.from_arrays(
            [
                pa.array([uid] * len(starts), pa.int64()),
                pa.array(np.arange(1, len(starts) + 1), pa.int64()),
                pa.array(ts[starts].astype("datetime64[us]"), pa.timestamp("us")),
                pa.array(ends - starts, pa.int64()),
                pa.array(
                    np.add.reduceat(val, starts) / 1e6, pa.float64()
                ),
            ],
            schema=SESSIONS_SCHEMA,
        )

    return grouped_run_map(ds, ["user_id"], user_sessions, schema=SESSIONS_SCHEMA, min_run=1)


ASOF_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("matched_event_id", pa.int64()),
        ("matched_value", pa.float64()),
    ]
)


def asof_join_events(sf_dir: str):
    """AS-OF join — the time-series lookup Ray Data has no operator for:
    for every LEFT event (odd event_id) attach the latest RIGHT event
    (even event_id) of the SAME user with right.ts <= left.ts, or nulls
    when none precedes it.

    Plan: one key-only sort co-partitions each user's rows (left and
    right tagged in a union — the engine's merge-join pattern), then a
    per-run numpy searchsorted matches every left timestamp against the
    user's sorted right timestamps at once: vectorized within runs, no
    per-row Python, ONE exchange total. Right-side (user, ts) ties keep
    the max event_id (deterministic; the oracle dedupes identically
    before DuckDB's native ASOF JOIN).
    """
    import numpy as np
    import ray.data

    from parser_rdf_ray.stages.groups import grouped_run_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def tag(batch: pa.Table) -> pa.Table:
        side = pc.cast(
            pc.bit_wise_and(pc.cast(batch.column("event_id"), pa.int64()), 1), pa.int8()
        )  # 1 = left (odd), 0 = right (even)
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("user_id"), pa.int64()),
                side,
                pc.cast(batch.column("event_id"), pa.int64()),
                batch.column("ts"),
                pc.cast(batch.column("value"), pa.float64()),
            ],
            names=["user_id", "side", "event_id", "ts", "value"],
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(run: pa.Table) -> pa.Table:
        sides = run.column("side").to_numpy(zero_copy_only=False)
        ts = run.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = run.column("event_id").to_numpy(zero_copy_only=False)
        val = run.column("value").to_numpy(zero_copy_only=False)
        uid = run.column("user_id")[0].as_py()

        lmask = sides == 1
        l_ts, l_eid = ts[lmask], eid[lmask]
        if not len(l_ts):
            return ASOF_SCHEMA.empty_table()
        r_ts, r_eid, r_val = ts[~lmask], eid[~lmask], val[~lmask]
        if len(r_ts):
            # sort rights by (ts, event_id); equal-ts ties then resolve to
            # the LAST row = max event_id, matching the oracle's dedup rule
            order = np.lexsort((r_eid, r_ts))
            r_ts, r_eid, r_val = r_ts[order], r_eid[order], r_val[order]
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            hit = idx >= 0
            m_eid = np.where(hit, r_eid[np.clip(idx, 0, None)], -1)
            m_val = np.where(hit, r_val[np.clip(idx, 0, None)], np.nan)
        else:
            hit = np.zeros(len(l_ts), dtype=bool)
            m_eid = np.full(len(l_ts), -1, dtype=np.int64)
            m_val = np.full(len(l_ts), np.nan)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(l_ts), uid, dtype=np.int64), pa.int64()),
                pa.array(l_eid, pa.int64()),
                pa.array(l_ts.astype("datetime64[us]"), pa.timestamp("us")),
                pa.array([int(e) if h else None for e, h in zip(m_eid, hit)], pa.int64()),
                pa.array([float(v) if h else None for v, h in zip(m_val, hit)], pa.float64()),
            ],
            schema=ASOF_SCHEMA,
        )

    return grouped_run_map(tagged, ["user_id"], per_user, schema=ASOF_SCHEMA, min_run=1)


RANGE_JOIN_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("n_following", pa.int64()),
    ]
)


def range_join_events(sf_dir: str, window_minutes: int = 5):
    """Range (interval) join — the band-join Ray Data has no operator for:
    for every LEFT event (odd event_id) count the RIGHT events (even
    event_id) of the SAME user falling in the half-open time window
    (ts, ts + window]. The general pattern for interval containment /
    proximity joins (each left row matches a right-side RANGE, not a key).

    Same single-exchange plan as the as-of join: key-only sort
    co-partitions each user's tagged rows, then per run TWO vectorized
    searchsorted calls bound every left row's window in the user's sorted
    right timestamps — counts are upper-lower index differences, no
    per-row work, no quadratic pairing.
    """
    import numpy as np
    import ray.data

    from parser_rdf_ray.stages.groups import grouped_run_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    window_us = np.int64(window_minutes * 60 * 1_000_000)

    def tag(batch: pa.Table) -> pa.Table:
        side = pc.cast(
            pc.bit_wise_and(pc.cast(batch.column("event_id"), pa.int64()), 1), pa.int8()
        )
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("user_id"), pa.int64()),
                side,
                pc.cast(batch.column("event_id"), pa.int64()),
                batch.column("ts"),
            ],
            names=["user_id", "side", "event_id", "ts"],
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(run: pa.Table) -> pa.Table:
        sides = run.column("side").to_numpy(zero_copy_only=False)
        ts = run.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = run.column("event_id").to_numpy(zero_copy_only=False)
        uid = run.column("user_id")[0].as_py()

        lmask = sides == 1
        l_ts, l_eid = ts[lmask], eid[lmask]
        if not len(l_ts):
            return RANGE_JOIN_SCHEMA.empty_table()
        r_ts = np.sort(ts[~lmask])
        if len(r_ts):
            lo = np.searchsorted(r_ts, l_ts, side="right")          # > ts
            hi = np.searchsorted(r_ts, l_ts + window_us, side="right")  # <= ts+w
            counts = (hi - lo).astype(np.int64)
        else:
            counts = np.zeros(len(l_ts), dtype=np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(np.full(len(l_ts), uid, dtype=np.int64), pa.int64()),
                pa.array(l_eid, pa.int64()),
                pa.array(l_ts.astype("datetime64[us]"), pa.timestamp("us")),
                pa.array(counts, pa.int64()),
            ],
            schema=RANGE_JOIN_SCHEMA,
        )

    return grouped_run_map(tagged, ["user_id"], per_user, schema=RANGE_JOIN_SCHEMA, min_run=1)


QUANTILES_SCHEMA = pa.schema(
    [
        ("o_orderpriority", pa.string()),
        ("n_orders", pa.int64()),
        ("p50", pa.float64()),
        ("p90", pa.float64()),
        ("p99", pa.float64()),
    ]
)


def group_quantiles(sf_dir: str, quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
                    names: tuple[str, ...] | None = None):
    """EXACT per-group quantiles (percentile_disc semantics: the element
    at 1-based rank ceil(q·n) of the sorted group) of o_totalprice per
    o_orderpriority — the distributed window/rank primitive Ray Data has
    no operator for.

    Plan (scale-honest — a group is a constant fraction of the table, so
    no single task may ever hold one): ONE distributed sort by
    (group, price_cents); the sorted materialized blocks are contiguous
    range partitions, so per-block PER-GROUP COUNTS (a tiny groups×blocks
    table fetched like stages/edgejoin.pin_sorted_blocks pins first keys)
    let the driver locate, for each (group, q), exactly which block holds
    the target rank and at which local offset; only those ≤ groups×|q|
    blocks are then read back. Driver state and reads are metadata-sized;
    the data moves once, in the sort. Prices are fixed-point cents in
    float clothing (CLAUDE.md) — compared/selected as int64 cents, never
    summed, so no float-order hazard exists at all here.
    """
    import numpy as np
    import ray
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [batch.column("o_orderpriority"), cents], names=["grp", "cents"]
        )

    srt = (
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["grp", "cents"])
        .materialize()
    )
    refs = [
        br for bundle in srt.iter_internal_ref_bundles() for br in bundle.block_refs
    ]

    @ray.remote
    def block_group_counts(block: pa.Table):
        import polars as pl

        if block.num_rows == 0:
            return None, []
        agg = pl.from_arrow(block).group_by("grp").len().sort("grp")
        first = (block.column("grp")[0].as_py(), block.column("cents")[0].as_py())
        return first, list(zip(agg["grp"].to_list(), agg["len"].to_list()))

    stats = ray.get([block_group_counts.remote(r) for r in refs])
    # rank targeting prefix-sums per-block counts IN LIST ORDER, which
    # assumes the materialized blocks arrive in logical (sorted) order —
    # true today but undocumented executor behavior, so assert it loudly
    # (first-row (grp, cents) tuples must be non-decreasing)
    firsts = [f for f, _ in stats if f is not None]
    if firsts != sorted(firsts):
        raise RuntimeError("materialized block order drift (quantiles)")
    per_block = [c for _, c in stats]

    # group totals + (block, local-offset) location of each target rank
    totals: dict[str, int] = {}
    for counts in per_block:
        for g, n in counts:
            totals[g] = totals.get(g, 0) + n
    # wanted[(block_idx)] -> list of (grp, q_idx, local_rank)
    import math

    wanted: dict[int, list[tuple[str, int, int]]] = {}
    seen: dict[str, int] = {}
    # percentile_disc rank = ceil(q·n) 1-based (smallest r with r/n ≥ q),
    # floored at 1 — validated against DuckDB at both sf scales
    targets = {
        g: [max(1, math.ceil(q * n)) for q in quantiles] for g, n in totals.items()
    }
    remaining = {g: set(range(len(quantiles))) for g in totals}
    for bi, counts in enumerate(per_block):
        for g, n in counts:
            before = seen.get(g, 0)
            for qi in sorted(remaining[g]):
                r = targets[g][qi]
                if before < r <= before + n:
                    wanted.setdefault(bi, []).append((g, qi, r - before - 1))
            remaining[g] -= {qi for qi in remaining[g]
                             if before < targets[g][qi] <= before + n}
            seen[g] = before + n

    @ray.remote
    def pick(block: pa.Table, picks: list[tuple[str, int, int]]):
        import polars as pl

        df = pl.from_arrow(block)
        out = []
        for g, qi, local in picks:
            sub = df.filter(pl.col("grp") == g)
            out.append((g, qi, int(sub["cents"][local])))
        return out

    picked = ray.get([pick.remote(refs[bi], ps) for bi, ps in wanted.items()])
    values: dict[str, dict[int, int]] = {g: {} for g in totals}
    for chunk in picked:
        for g, qi, cents in chunk:
            values[g][qi] = cents

    groups = sorted(totals)
    cols = [
        pa.array(groups, pa.string()),
        pa.array([totals[g] for g in groups], pa.int64()),
    ]
    for qi in range(len(quantiles)):
        cols.append(
            pa.array([values[g][qi] / 100.0 for g in groups], pa.float64())
        )
    if names is None:
        schema = QUANTILES_SCHEMA
    else:
        schema = pa.schema(
            [("o_orderpriority", pa.string()), ("n_orders", pa.int64())]
            + [(n, pa.float64()) for n in names]
        )
    return ray.data.from_arrow(pa.Table.from_arrays(cols, schema=schema))


DENSE_RANK_SCHEMA = pa.schema(
    [
        ("c_custkey", pa.int64()),
        ("c_nationkey", pa.int64()),
        ("c_acctbal", pa.float64()),
        ("balance_rank", pa.int64()),
    ]
)


def dense_rank_customers(sf_dir: str):
    """DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
    DESC) — the global ranking window as a distributed two-pass plan.

    ONE sort by (nation asc, balance-cents desc) range-partitions the
    table; equal (nation, cents) keys are co-partitioned (the engine's
    pinned sort guarantee), so a distinct balance value never spans
    blocks and per-block DISTINCT-VALUE COUNTS per nation (tiny,
    blocks×nations) prefix-sum on the driver into each block's starting
    rank offset. A second pass over the pinned block refs assigns
    local dense ranks vectorized (numpy neighbor-compare cumsum) plus the
    block's offset. Data moves once; Ray Data alone cannot express the
    cross-block prefix, hence the raw-ref tail (same pattern as
    stages/edgejoin.py)."""
    import numpy as np
    import ray
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("c_acctbal"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("c_custkey"), pa.int64()),
                pc.cast(batch.column("c_nationkey"), pa.int64()),
                cents,
            ],
            names=["c_custkey", "nation", "cents"],
        )

    srt = (
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["nation", "cents"], descending=[False, True])
        .materialize()
    )
    refs = [
        br for bundle in srt.iter_internal_ref_bundles() for br in bundle.block_refs
    ]

    @ray.remote
    def distinct_counts(block: pa.Table):
        import polars as pl

        if block.num_rows == 0:
            return None, []
        agg = (
            pl.from_arrow(block)
            .group_by("nation")
            .agg(pl.col("cents").n_unique().alias("d"))
            .sort("nation")
        )
        first = (block.column("nation")[0].as_py(), block.column("cents")[0].as_py())
        return first, list(zip(agg["nation"].to_list(), agg["d"].to_list()))

    stats = ray.get([distinct_counts.remote(r) for r in refs])
    # the prefix accumulation below assumes logical (sorted) block order —
    # assert it (sort was nation asc, cents desc → compare (nation, -cents))
    firsts = [(f[0], -f[1]) for f, _ in stats if f is not None]
    if firsts != sorted(firsts):
        raise RuntimeError("materialized block order drift (dense_rank)")
    per_block = [c for _, c in stats]
    offsets: list[dict[int, int]] = []
    running: dict[int, int] = {}
    for counts in per_block:
        offsets.append(dict(running))
        for nat, d in counts:
            running[nat] = running.get(nat, 0) + d

    @ray.remote
    def rank_block(block: pa.Table, offset: dict[int, int]):
        if block.num_rows == 0:
            return DENSE_RANK_SCHEMA.empty_table()
        nation = block.column("nation").to_numpy()
        cents = block.column("cents").to_numpy()
        n = len(nation)
        # local dense rank: +1 at every (nation, cents) change, restart per
        # nation; rows arrive sorted by (nation asc, cents desc)
        new_val = np.ones(n, dtype=np.int64)
        new_val[1:] = (nation[1:] != nation[:-1]) | (cents[1:] != cents[:-1])
        new_nat = np.ones(n, dtype=bool)
        new_nat[1:] = nation[1:] != nation[:-1]
        cum = np.cumsum(new_val)
        nat_starts = np.flatnonzero(new_nat)
        nat_base = np.zeros(n, dtype=np.int64)
        nat_base[nat_starts] = cum[nat_starts] - 1
        nat_base = np.maximum.accumulate(nat_base)  # cum is nondecreasing
        local = cum - nat_base
        # per-nation-run constant offset, repeated across each run (a
        # later nation's offset may be SMALLER than an earlier one's, so
        # no accumulate trick — plain repeat)
        off = np.array([offset.get(int(x), 0) for x in nation[nat_starts]],
                       dtype=np.int64)
        run_lengths = np.diff(np.append(nat_starts, n))
        glob_off = np.repeat(off, run_lengths)
        return pa.Table.from_arrays(
            [
                block.column("c_custkey"),
                pa.array(nation, pa.int64()),
                pa.array(cents / 100.0, pa.float64()),
                pa.array(local + glob_off, pa.int64()),
            ],
            schema=DENSE_RANK_SCHEMA,
        )

    out_refs = [rank_block.remote(r, offsets[i]) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out_refs)


EVENT_GAPS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_events", pa.int64()),
        ("max_gap_us", pa.int64()),
        ("total_gap_us", pa.int64()),
    ]
)


def user_event_gaps(sf_dir: str):
    """Per-user inter-event gap stats — the LAG() window function as a
    sorted-run scan: one user-key sort co-partitions each user's events,
    then vectorized np.diff per run. Gap sums are int64 microseconds, so
    every output column is integer-exact (no float anywhere)."""
    import numpy as np
    import ray.data

    from parser_rdf_ray.stages.groups import grouped_run_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def per_user(run: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            run, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        run = run.take(order)
        ts = run.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(ts)
        uid = run.column("user_id")[0].as_py()
        return pa.Table.from_arrays(
            [
                pa.array([uid], pa.int64()),
                pa.array([len(ts)], pa.int64()),
                pa.array([int(gaps.max()) if len(gaps) else 0], pa.int64()),
                pa.array([int(gaps.sum()) if len(gaps) else 0], pa.int64()),
            ],
            schema=EVENT_GAPS_SCHEMA,
        )

    return grouped_run_map(ds, ["user_id"], per_user, schema=EVENT_GAPS_SCHEMA, min_run=1)


MERGE_JOIN_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_totalprice", pa.float64()),
        ("c_name", pa.string()),
        ("c_mktsegment", pa.string()),
    ]
)


def merge_join_pairing(batch: pa.Table, run_key_cols, how: str):
    """The generalized sort-merge pairing over one co-partitioned block:
    rows tagged kind 0 (build) / kind 1 (probe), locally re-ordered by
    (run keys, kind) so each run is [build rows..., probe rows...].

    MANY-TO-MANY: every probe row pairs with EVERY build row of its run
    (B×P outputs per run) via a vectorized ragged tile (repeat/cumsum
    arithmetic, zero per-key Python) — a unique build side (B≤1) reduces
    exactly to the classic first-row broadcast. ``how``: "inner" drops
    unmatched probes; "left" keeps them once with a null build index
    (Arrow take-through-null semantics downstream).

    Returns (probe_take, build_take): Arrow index arrays into the
    re-sorted batch (build_take null where unmatched), plus the re-sorted
    batch itself — callers .take() their own column selections.
    """
    import numpy as np

    from parser_rdf_ray.stages.groups import run_spans

    batch = batch.sort_by(
        [(c, "ascending") for c in run_key_cols] + [("kind", "ascending")]
    )
    starts, _ = run_spans(batch, list(run_key_cols))
    kinds = batch.column("kind").to_numpy()
    run_marks = np.zeros(batch.num_rows, dtype=np.int64)
    run_marks[starts] = 1
    run_ids = np.cumsum(run_marks) - 1
    b_counts = np.add.reduceat((kinds == 0).astype(np.int64), starts)
    probe_idx = np.flatnonzero(kinds == 1)
    pb = b_counts[run_ids[probe_idx]]  # build rows available per probe row
    if how == "inner":
        keep = pb > 0
        probe_idx, pb = probe_idx[keep], pb[keep]
        reps = pb
    else:  # left: unmatched probe emits once with a null build
        reps = np.maximum(pb, 1)
    if len(probe_idx) == 0:
        empty = pa.array([], pa.int64())
        return batch, empty, empty
    out_probe = np.repeat(probe_idx, reps)
    # ragged tile: for probe j with reps_j outputs, local index 0..reps_j-1
    tot = int(reps.sum())
    off = np.repeat(np.cumsum(reps) - reps, reps)
    local = np.arange(tot, dtype=np.int64) - off
    src_build = np.repeat(starts[run_ids[probe_idx]], reps) + local
    matched_out = np.repeat(pb > 0, reps)
    return (
        batch,
        pa.array(out_probe),
        pa.array(src_build, mask=~matched_out),
    )


def orders_customer_merge_join(
    sf_dir: str, how: str = "inner", salt_buckets: int = 0
):
    """Large-×-large equi-join (orders ⋈ customer on custkey) as a
    distributed SORT-MERGE JOIN — the shuffle-join primitive for when
    NEITHER side fits a broadcast (orders_join_topk covers the small-side
    case; this is the general one). ``how`` ∈ {"inner", "left"}: left
    keeps unmatched orders with null customer attrs (Arrow take through a
    null index — no per-row branching).

    Plan: both sides project to a COMMON tagged schema (kind 0 = build /
    customer, kind 1 = probe / orders) and union — each side moves
    exactly once, through ONE key sort that co-partitions every custkey's
    rows (the engine's pinned co-partition guarantee). Each output block
    is then locally re-ordered by (key, kind) and merge_join_pairing
    fans every probe row out to every build row of its run — the build
    side need NOT be unique on the join key (many-to-many is exact;
    pinned by TestMergeJoinManyToMany).

    SKEW: with ``salt_buckets=K`` the probe side salts on a per-row
    attribute (hash(o_orderkey) % K) and every build row replicates K
    times (one per salt), so one hot key's probe rows range-partition
    across up to K blocks instead of one — the standard salted-join
    trade (K× build replication buys K-way probe parallelism). Output is
    bit-equal to the unsalted plan (pinned by TestMergeJoinSalting).
    Money stays in int64 cents through the exchange (no float hazard).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    import numpy as np
    import ray
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    k_salt = max(int(salt_buckets), 1)
    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("salt", pa.int32()),
            ("kind", pa.int8()),
            ("o_orderkey", pa.int64()),
            ("cents", pa.int64()),
            ("c_name", pa.string()),
            ("c_mktsegment", pa.string()),
        ]
    )

    def tag_customer(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if k_salt > 1:
            # replicate each build row once per salt bucket
            idx = np.repeat(np.arange(n, dtype=np.int64), k_salt)
            b = b.take(pa.array(idx))
            salt = np.tile(np.arange(k_salt, dtype=np.int32), n)
            n = b.num_rows
        else:
            salt = np.zeros(n, dtype=np.int32)
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("c_custkey"), pa.int64()),
                pa.array(salt),
                pa.array(np.zeros(n, dtype=np.int8)),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pc.cast(b.column("c_name"), pa.string()),
                pc.cast(b.column("c_mktsegment"), pa.string()),
            ],
            schema=union_schema,
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cents = pc.cast(
            pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        if k_salt > 1:
            # salt on a per-row attribute so a hot KEY's rows spread;
            # within-run determinism only (the MinHashBands contract)
            import polars as pl

            salt = (
                pl.from_arrow(pc.cast(b.column("o_orderkey"), pa.int64()))
                .hash(seed=29)
                .to_numpy()
                % k_salt
            ).astype(np.int32)
        else:
            salt = np.zeros(n, dtype=np.int32)
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("o_custkey"), pa.int64()),
                pa.array(salt),
                pa.array(np.ones(n, dtype=np.int8)),
                pc.cast(b.column("o_orderkey"), pa.int64()),
                cents,
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
            ],
            schema=union_schema,
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).map_batches(tag_customer, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)

    srt = cust.union(orders).sort(["key", "salt"])

    def join_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return MERGE_JOIN_SCHEMA.empty_table()
        batch, probe_take, build_take = merge_join_pairing(
            batch, ["key", "salt"], how
        )
        if len(probe_take) == 0:
            return MERGE_JOIN_SCHEMA.empty_table()
        probe = batch.take(probe_take)
        return pa.Table.from_arrays(
            [
                probe.column("o_orderkey"),
                probe.column("key"),
                pc.divide(
                    pc.cast(probe.column("cents"), pa.float64()), pa.scalar(100.0)
                ),
                batch.column("c_name").take(build_take),
                batch.column("c_mktsegment").take(build_take),
            ],
            schema=MERGE_JOIN_SCHEMA,
        )

    return srt.map_batches(
        join_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


EXISTENCE_SCHEMA = pa.schema(
    [("c_custkey", pa.int64()), ("c_name", pa.string()), ("c_mktsegment", pa.string())]
)


def customers_by_order_existence(sf_dir: str, mode: str = "anti",
                                 priority: str | None = None):
    """Distributed SEMI / ANTI join: customers WITH ("semi") or WITHOUT
    ("anti") at least one order (optionally restricted to
    ``o_orderpriority == priority``) — the EXISTS / NOT EXISTS primitive
    (blocklist enforcement, orphan detection) when the probe side is too
    large to broadcast.

    Same one-exchange shape as the sort-merge join, with the probe side
    reduced to BARE KEYS before it moves: orders project to (key) only
    and pre-dedup per batch (a key's order count doesn't matter, only
    existence), so the exchange carries ≤ distinct-keys×blocks probe
    rows. After the key sort co-partitions runs, a vectorized scan keeps
    each customer row iff its run does (semi) / does not (anti) contain a
    probe row."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    import numpy as np
    import ray.data

    from parser_rdf_ray.stages.groups import run_spans
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("kind", pa.int8()),
            ("c_name", pa.string()),
            ("c_mktsegment", pa.string()),
        ]
    )

    def tag_customer(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("c_custkey"), pa.int64()),
                pa.array(np.zeros(n, dtype=np.int8)),
                pc.cast(b.column("c_name"), pa.string()),
                pc.cast(b.column("c_mktsegment"), pa.string()),
            ],
            schema=union_schema,
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        if priority is not None:
            b = b.filter(pc.equal(b.column("o_orderpriority"), priority))
        keys = pc.unique(pc.cast(b.column("o_custkey"), pa.int64()))
        n = len(keys)
        return pa.Table.from_arrays(
            [
                keys,
                pa.array(np.ones(n, dtype=np.int8)),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
            ],
            schema=union_schema,
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(tag_customer, batch_format="pyarrow", zero_copy_batch=True)
    order_cols = ["o_custkey"] + ([] if priority is None else ["o_orderpriority"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=order_cols
    ).map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)

    srt = cust.union(orders).sort("key")
    want_probe = mode == "semi"

    def scan_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return EXISTENCE_SCHEMA.empty_table()
        starts, _ = run_spans(batch, ["key"])
        kinds = batch.column("kind").to_numpy()
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        probes_per_run = np.add.reduceat((kinds == 1).astype(np.int64), starts)
        run_has_probe = probes_per_run > 0
        keep = (kinds == 0) & (run_has_probe[run_ids] == want_probe)
        kept = batch.filter(pa.array(keep))
        return pa.Table.from_arrays(
            [
                kept.column("key"),
                kept.column("c_name"),
                kept.column("c_mktsegment"),
            ],
            schema=EXISTENCE_SCHEMA,
        )

    return srt.map_batches(
        scan_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


MOVING_WINDOW_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("mov_sum3", pa.float64()),
        ("n_window", pa.int64()),
    ]
)


def moving_window_sum(sf_dir: str, frame: int = 3):
    """ROWS-frame moving aggregate: per user, the sum of `value` over the
    last ``frame`` events (ROWS BETWEEN frame-1 PRECEDING AND CURRENT
    ROW, ordered by ts then event_id) — the frame-based window class the
    engine lacked (events_window is tumbling, sessionize is gap-based).

    One user-key sort co-partitions each user's events (the sessionize
    plan shape); per run, values are 1e-6-quantized to int64 (the
    rel_sessions money contract) and the window sums come from a single
    cumsum difference — exact integer arithmetic, vectorized, O(run).
    """
    import numpy as np
    import ray.data

    from parser_rdf_ray.stages.groups import grouped_run_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def per_user(run: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            run, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        run = run.take(order)
        u = pc.cast(
            pc.round(pc.multiply(run.column("value"), pa.scalar(1_000_000.0))),
            pa.int64(),
        ).to_numpy()
        n = len(u)
        csum = np.concatenate([[0], np.cumsum(u)])
        lo = np.maximum(np.arange(n) - (frame - 1), 0)
        win = csum[1:] - csum[lo]
        n_win = np.arange(n) - lo + 1
        uid = run.column("user_id")[0].as_py()
        return pa.Table.from_arrays(
            [
                pa.array(np.full(n, uid, dtype=np.int64)),
                pc.cast(run.column("event_id"), pa.int64()),
                pa.array(win / 1_000_000.0, pa.float64()),
                pa.array(n_win.astype(np.int64)),
            ],
            schema=MOVING_WINDOW_SCHEMA,
        )

    return grouped_run_map(
        ds, ["user_id"], per_user, schema=MOVING_WINDOW_SCHEMA, min_run=1
    )


WINSORIZE_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_orderpriority", pa.string()),
        ("o_totalprice", pa.float64()),
        ("clipped", pa.float64()),
    ]
)


def winsorize_orders(sf_dir: str, lo: float = 0.05, hi: float = 0.95):
    """Per-group winsorization (outlier clipping to the group's [lo, hi]
    percentile_disc bounds) — the feature-cleaning transform, composed
    from the exact group-quantile machinery: bounds come from
    group_quantiles (ONE sort + metadata-sized driver rank location),
    the tiny group→bounds table ships as a closure (groups are
    enum-scale), and the clip pass is one vectorized searchsorted +
    clip per batch over int64 cents — no second exchange, no floats
    until the exact final /100."""
    import numpy as np
    import ray.data

    from parser_rdf_ray.collect import bounded_take_all

    bounds_ds = group_quantiles(sf_dir, quantiles=(lo, hi), names=("lo", "hi"))
    rows = bounded_take_all(
        bounds_ds, what="winsorize group bounds", ceiling=100_000
    )
    groups = np.array(sorted(r["o_orderpriority"] for r in rows), dtype=object)
    by = {r["o_orderpriority"]: r for r in rows}
    lo_c = np.array(
        [round(by[g]["lo"] * 100) for g in groups], dtype=np.int64
    )
    hi_c = np.array(
        [round(by[g]["hi"] * 100) for g in groups], dtype=np.int64
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def clip(batch: pa.Table) -> pa.Table:
        grp = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        cents = (
            pc.cast(
                pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0))),
                pa.int64(),
            ).to_numpy()
        )
        gi = np.searchsorted(groups, grp)
        clipped = np.minimum(np.maximum(cents, lo_c[gi]), hi_c[gi])
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("o_orderkey"), pa.int64()),
                pc.cast(batch.column("o_orderpriority"), pa.string()),
                pa.array(cents / 100.0, pa.float64()),
                pa.array(clipped / 100.0, pa.float64()),
            ],
            schema=WINSORIZE_SCHEMA,
        )

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


def orders_customer_bloom_join(sf_dir: str, m_bits: int = 1 << 17, k: int = 4):
    """Sort-merge join with a BLOOM-FILTER SEMI-JOIN REDUCTION: a bloom
    filter over the build side's keys (built in ONE task, ~16 KiB for
    m=2^17) is broadcast via plasma, and probe batches drop non-member
    keys BEFORE the all-to-all — the classic shuffle-pruning move when
    the probe side is much larger than its matching subset.

    Correctness is UNCONDITIONAL on the filter: blooms have no false
    negatives (no matching row is ever dropped) and the join itself
    drops false positives, so the result is bit-identical to the plain
    sort-merge join at ANY false-positive rate — the oracle is simply
    the JOIN. Hashes are the engine's md5-low64 contract, k derived
    slices of one digest per key."""
    import numpy as np
    import ray
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()

    def key_hashes(keys) -> np.ndarray:
        """(n, k) bit positions: k slices of one md5-low64 per key."""
        from parser_rdf_ray.md5vec import md5_low64_ids

        h = md5_low64_ids(np.asarray(keys, dtype=np.int64))
        # k independent-ish positions from one 64-bit digest: h rotated
        # by 16*i bits, mod m (m a power of two)
        pos = np.empty((len(h), k), dtype=np.int64)
        for i in range(k):
            if i == 0:
                rot = h  # shift-by-64 is undefined for uint64
            else:
                rot = (h >> np.uint64(16 * i)) | (h << np.uint64(64 - 16 * i))
            pos[:, i] = (rot % np.uint64(m_bits)).astype(np.int64)
        return pos

    @ray.remote
    def build_filter() -> np.ndarray:
        import pyarrow.parquet as pq

        keys = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        ).column("c_custkey").to_numpy()
        bits = np.zeros(m_bits, dtype=bool)
        bits[key_hashes(keys).ravel()] = True
        return bits

    bits_ref = build_filter.remote()

    class BloomPrune:
        """Lazy plasma deref (the BruteForceScorer pattern): the bit
        array is mmap-zero-copy per task; membership is k vectorized
        gathers per batch."""

        def __init__(self):
            self.bits = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.bits is None:
                import ray as _ray

                self.bits = _ray.get(bits_ref)
            keys = pc.cast(batch.column("o_custkey"), pa.int64()).to_numpy()
            if len(keys) == 0:
                return batch
            member = self.bits[key_hashes(keys)].all(axis=1)
            return batch.filter(pa.array(member))

    pruned_orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(BloomPrune(), batch_format="pyarrow")

    # the pruned probe side feeds the same tagged-union merge join —
    # reuse orders_customer_merge_join's machinery by inlining its tag +
    # join (the probe source differs, everything else is identical)
    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("kind", pa.int8()),
            ("o_orderkey", pa.int64()),
            ("cents", pa.int64()),
            ("c_name", pa.string()),
            ("c_mktsegment", pa.string()),
        ]
    )

    def tag_customer(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("c_custkey"), pa.int64()),
                pa.array(np.zeros(n, dtype=np.int8)),
                pa.nulls(n, pa.int64()),
                pa.nulls(n, pa.int64()),
                pc.cast(b.column("c_name"), pa.string()),
                pc.cast(b.column("c_mktsegment"), pa.string()),
            ],
            schema=union_schema,
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cents = pc.cast(
            pc.round(pc.multiply(b.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("o_custkey"), pa.int64()),
                pa.array(np.ones(n, dtype=np.int8)),
                pc.cast(b.column("o_orderkey"), pa.int64()),
                cents,
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
            ],
            schema=union_schema,
        )

    from parser_rdf_ray.stages.groups import run_spans

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).map_batches(tag_customer, batch_format="pyarrow", zero_copy_batch=True)
    srt = cust.union(
        pruned_orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    ).sort("key")

    def join_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return MERGE_JOIN_SCHEMA.empty_table()
        batch = batch.sort_by([("key", "ascending"), ("kind", "ascending")])
        starts, _ = run_spans(batch, ["key"])
        kinds = batch.column("kind").to_numpy()
        marks = np.zeros(batch.num_rows, dtype=np.int64)
        marks[starts] = 1
        run_ids = np.cumsum(marks) - 1
        has_build = kinds[starts] == 0
        probe = (kinds == 1) & has_build[run_ids]
        if not probe.any():
            return MERGE_JOIN_SCHEMA.empty_table()
        idx = np.flatnonzero(probe)
        src = pa.array(starts[run_ids[idx]])
        rows = batch.take(pa.array(idx))
        return pa.Table.from_arrays(
            [
                rows.column("o_orderkey"),
                rows.column("key"),
                pc.divide(pc.cast(rows.column("cents"), pa.float64()), pa.scalar(100.0)),
                batch.column("c_name").take(src),
                batch.column("c_mktsegment").take(src),
            ],
            schema=MERGE_JOIN_SCHEMA,
        )

    return srt.map_batches(
        join_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


COVAR_SCHEMA = pa.schema(
    [
        ("l_returnflag", pa.string()),
        ("n", pa.int64()),
        ("covar_qty_price", pa.float64()),
    ]
)


def lineitem_covar(sf_dir: str, round_to: int = 6):
    """Population covariance of (quantity, extendedprice) per returnflag —
    the SECOND-MOMENT aggregate family, in EXACT integer arithmetic so
    the distributed combine order cannot move a digit:

        covar_pop = (n·Σxy − Σx·Σy) / n²   with x = qty (integral),
                    y = price cents (fixed-point)

    Per-block partials (n, Σx, Σy, Σxy) are int64 (Σxy ≤ rows·50·10⁷ ≪
    2⁶³); the per-group final combine runs in PYTHON ints (map_groups —
    group count is the 3-value returnflag enum), where n·Σxy − Σx·Σy may
    exceed int64 exactly as HUGEINT does in the oracle. The quotient is
    floored at 10^-round_to dollar·qty units in INTEGERS, so the float
    output is exact on both sides."""
    import numpy as np
    import ray.data

    scale = 10 ** round_to

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("n", pa.int64()),
            ("sx", pa.int64()),
            ("sy", pa.int64()),
            ("sxy", pa.int64()),
        ]
    )

    def partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        qty = pc.cast(pc.round(batch.column("l_quantity")), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("l_extendedprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [
                batch.column("l_returnflag"),
                qty,
                cents,
                pc.multiply(qty, cents),
            ],
            names=["l_returnflag", "x", "y", "xy"],
        )
        agg = (
            pl.from_arrow(t)
            .group_by("l_returnflag")
            .agg(
                pl.len().alias("n"),
                pl.col("x").sum().alias("sx"),
                pl.col("y").sum().alias("sy"),
                pl.col("xy").sum().alias("sxy"),
            )
        )
        out = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(out.column("l_returnflag").combine_chunks(), pa.string()),
                pc.cast(out.column("n").combine_chunks(), pa.int64()),
                pc.cast(out.column("sx").combine_chunks(), pa.int64()),
                pc.cast(out.column("sy").combine_chunks(), pa.int64()),
                pc.cast(out.column("sxy").combine_chunks(), pa.int64()),
            ],
            schema=partial_schema,
        )

    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)

    def combine(group: pa.Table) -> pa.Table:
        flag = group.column("l_returnflag")[0].as_py()
        n = int(np.sum(group.column("n").to_numpy()))
        sx = int(np.sum(group.column("sx").to_numpy()))
        sy = int(np.sum(group.column("sy").to_numpy()))
        sxy = int(np.sum(group.column("sxy").to_numpy()))
        # exact big-int numerator in (qty · cent) units; floor at
        # 10^-round_to dollar·qty units: // is Python floor, matched by
        # the oracle's sign-decomposed HUGEINT floor
        num = n * sxy - sx * sy
        units = (num * scale) // (n * n * 100)
        return pa.Table.from_arrays(
            [
                pa.array([flag], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([units / scale], pa.float64()),
            ],
            schema=COVAR_SCHEMA,
        )

    return part.groupby("l_returnflag").map_groups(combine, batch_format="pyarrow")


NTILE_SCHEMA = pa.schema(
    [
        ("c_custkey", pa.int64()),
        ("c_nationkey", pa.int64()),
        ("c_acctbal", pa.float64()),
        ("tile", pa.int64()),
    ]
)


def ntile_customers(sf_dir: str, k: int = 4):
    """NTILE(k) OVER (PARTITION BY nation ORDER BY balance DESC,
    custkey) — the tiling window, as the dense-rank two-pass plan with
    ROW counts instead of distinct counts: ONE sort on the UNIQUE total
    order (nation, cents desc, custkey) range-partitions the table;
    per-block per-nation row counts (metadata-sized) prefix-sum on the
    driver into each block's starting row offset; a second pass assigns
    tiles from the global 0-based row index with SQL NTILE's exact
    fill rule (the first n mod k tiles take one extra row)."""
    import numpy as np
    import ray
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("c_acctbal"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("c_custkey"), pa.int64()),
                pc.cast(batch.column("c_nationkey"), pa.int64()),
                cents,
            ],
            names=["c_custkey", "nation", "cents"],
        )

    srt = (
        ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["nation", "cents", "c_custkey"], descending=[False, True, False])
        .materialize()
    )
    refs = [
        br for bundle in srt.iter_internal_ref_bundles() for br in bundle.block_refs
    ]

    @ray.remote
    def nation_counts(block: pa.Table):
        import polars as pl

        if block.num_rows == 0:
            return None, []
        agg = pl.from_arrow(block).group_by("nation").len().sort("nation")
        first = (
            block.column("nation")[0].as_py(),
            block.column("cents")[0].as_py(),
            block.column("c_custkey")[0].as_py(),
        )
        return first, list(zip(agg["nation"].to_list(), agg["len"].to_list()))

    stats = ray.get([nation_counts.remote(r) for r in refs])
    # the per-block offset prefix assumes logical (sorted) block order —
    # assert it (nation asc, cents desc, custkey asc)
    firsts = [(f[0], -f[1], f[2]) for f, _ in stats if f is not None]
    if firsts != sorted(firsts):
        raise RuntimeError("materialized block order drift (ntile)")
    per_block = [c for _, c in stats]
    offsets: list[dict[int, int]] = []
    running: dict[int, int] = {}
    for counts in per_block:
        offsets.append(dict(running))
        for nat, c in counts:
            running[nat] = running.get(nat, 0) + c
    totals = dict(running)

    @ray.remote
    def tile_block(block: pa.Table, offset: dict[int, int], totals: dict[int, int]):
        import numpy as np

        if block.num_rows == 0:
            return NTILE_SCHEMA.empty_table()
        nation = block.column("nation").to_numpy()
        n_rows = block.num_rows
        new_nat = np.ones(n_rows, dtype=bool)
        new_nat[1:] = nation[1:] != nation[:-1]
        nat_starts = np.flatnonzero(new_nat)
        run_lengths = np.diff(np.append(nat_starts, n_rows))
        local = np.arange(n_rows) - np.repeat(nat_starts, run_lengths)
        glob = local + np.repeat(
            np.array([offset.get(int(x), 0) for x in nation[nat_starts]], dtype=np.int64),
            run_lengths,
        )
        n_of = np.repeat(
            np.array([totals[int(x)] for x in nation[nat_starts]], dtype=np.int64),
            run_lengths,
        )
        # SQL NTILE fill rule: first (n mod k) tiles take ceil(n/k) rows
        big = n_of % k
        size_small = n_of // k
        size_big = size_small + 1
        cut = big * size_big  # rows covered by the big tiles
        tile = np.where(
            glob < cut,
            glob // np.maximum(size_big, 1),
            big + (glob - cut) // np.maximum(size_small, 1),
        ) + 1
        return pa.Table.from_arrays(
            [
                block.column("c_custkey"),
                pa.array(nation, pa.int64()),
                pa.array(block.column("cents").to_numpy() / 100.0, pa.float64()),
                pa.array(tile.astype(np.int64)),
            ],
            schema=NTILE_SCHEMA,
        )

    out_refs = [tile_block.remote(r, offsets[i], totals) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out_refs)


ROLLUP_SCHEMA = pa.schema(
    [
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("sum_qty", pa.int64()),
        ("n_rows", pa.int64()),
    ]
)


def lineitem_rollup(sf_dir: str, mode: str = "rollup"):
    """GROUP BY ROLLUP / CUBE (l_returnflag, l_linestatus): the
    multi-level subtotal aggregate (finest groups + per-returnflag
    subtotals + grand total, rolled columns NULL — DuckDB semantics
    exactly; mode="cube" adds the per-linestatus level).

    Scale plan: lineitem is scanned ONCE with a per-block polars combiner
    (int64 quantity units — l_quantity is integral in TPC-H, so the sum
    is exact and order-independent); the groupby reduces blocks×groups
    partial rows; the coarser rollup levels then re-aggregate the BASE
    table, which is bounded by group cardinality (a few rows), inside one
    task — never a second scan of the fact table."""
    import numpy as np
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    if mode not in ("rollup", "cube"):
        raise ValueError(f"mode must be 'rollup' or 'cube', got {mode!r}")
    tune_data_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        qty = pc.cast(pc.round(batch.column("l_quantity")), pa.int64())
        df = pl.from_arrow(
            pa.Table.from_arrays(
                [
                    pc.cast(batch.column("l_returnflag"), pa.string()),
                    pc.cast(batch.column("l_linestatus"), pa.string()),
                    qty,
                ],
                names=["l_returnflag", "l_linestatus", "q"],
            )
        )
        import polars as _pl

        agg = df.group_by(["l_returnflag", "l_linestatus"]).agg(
            _pl.col("q").sum().alias("qty_sum"), _pl.len().alias("n")
        )
        return agg.to_arrow()

    base = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["qty_sum", "n"])
    )

    def levels(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return ROLLUP_SCHEMA.empty_table()
        df = pl.from_arrow(batch).rename(
            {"sum(qty_sum)": "sum_qty", "sum(n)": "n_rows"}
        )
        fine = df.select(["l_returnflag", "l_linestatus", "sum_qty", "n_rows"])
        per_flag = (
            df.group_by("l_returnflag")
            .agg(pl.col("sum_qty").sum(), pl.col("n_rows").sum())
            .with_columns(pl.lit(None, pl.String).alias("l_linestatus"))
            .select(["l_returnflag", "l_linestatus", "sum_qty", "n_rows"])
        )
        grand = df.select(
            pl.lit(None, pl.String).alias("l_returnflag"),
            pl.lit(None, pl.String).alias("l_linestatus"),
            pl.col("sum_qty").sum(),
            pl.col("n_rows").sum(),
        )
        levels_out = [fine, per_flag, grand]
        if mode == "cube":
            per_status = (
                df.group_by("l_linestatus")
                .agg(pl.col("sum_qty").sum(), pl.col("n_rows").sum())
                .with_columns(pl.lit(None, pl.String).alias("l_returnflag"))
                .select(["l_returnflag", "l_linestatus", "sum_qty", "n_rows"])
            )
            levels_out.insert(2, per_status)
        out = pl.concat(levels_out).to_arrow()
        return pa.Table.from_arrays(
            [pc.cast(out.column(f.name), f.type) for f in ROLLUP_SCHEMA],
            schema=ROLLUP_SCHEMA,
        )

    # the base aggregate is group-cardinality-sized: one task sees it all
    return base.repartition(1).map_batches(
        levels, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
