"""Execution tuning for Ray Data shuffles (single place, called by the
pipeline builders — never calls ray.init).

Why this exists: Ray Data's ``DataContext.min_parallelism`` defaults to 200,
so every sort/groupby emits 200 output partitions regardless of data size.
The all-to-all transfer count scales with input_blocks × output_partitions,
which at sandbox scale (tens of small blocks) makes object-store overhead —
not compute — the cost of every shuffle (measured: a 1.5M-row sort dropped
6.2s → 2.1s, a partition-groupby 17.7s → 3.2s). On a real multi-node
cluster the same knob should instead be sized to total cluster cores ×2;
the CPU-derived default below does exactly that via ``cluster_resources``.

``use_polars_sort`` swaps Ray's in-block pyarrow sort for the faster polars
implementation (pure local optimization, no semantic change).
"""

from __future__ import annotations


def shuffle_parallelism() -> int:
    """2 partitions per cluster CPU, floor 16. GRAFT_SHUFFLE_PARTITIONS pins
    the count for fair strong-scaling comparisons (see
    sources/documents.py:_default_read_blocks)."""
    import os

    env = os.environ.get("GRAFT_SHUFFLE_PARTITIONS")
    if env:
        return int(env)
    try:
        import ray

        if ray.is_initialized():
            return max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        pass
    return 16


def state_parallelism(n_rows: int, rows_per_block: int = 100_000) -> int:
    """Data-aware block count for ITERATION STATE (pagerank ranks,
    component labels): ``clamp(ceil(n_rows / rows_per_block), 4,
    shuffle_parallelism())``.

    Why not shuffle_parallelism() directly: every per-iteration sort
    emits as many partitions as its input has blocks, and the all-to-all
    cost scales with in_blocks × out_partitions. A loop whose state is a
    few thousand rows spread over 64 blocks pays 64×64 tiny-object
    transfers per round — measured 3.9s wall per sort at ~500ms of
    actual compute. Sizing to the data (≈100k string-keyed rows ≈ 5–10MB
    per block) keeps sandbox loops overhead-free while the
    shuffle_parallelism() cap means corpus-scale state still fans out to
    the whole cluster; the floor of 4 preserves pipelining on tiny
    graphs."""
    return max(4, min(shuffle_parallelism(), -(-n_rows // rows_per_block)))


def tune_data_context() -> None:
    """Idempotent; call at pipeline-build time (Ray must be initialised for
    CPU-based sizing, else a safe floor is used)."""
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.min_parallelism = shuffle_parallelism()
    # polars beats the arrow in-block sort in every measured config
    # (capped/uncapped rayon threads alike, quiet-machine A/B on the LSH
    # band sorts); POLARS_MAX_THREADS=1 (bench.py / job.py) is still worth
    # another ~10% by avoiding per-worker rayon pools.
    try:
        ctx.use_polars_sort = True
    except Exception:
        pass


def small_graph_max() -> int:
    """Edge-count threshold below which iterative graph ops (pagerank,
    connected components) run their SIZE-ADAPTIVE single-task path: the
    whole edge set fits one worker's heap, so N iterations of exact
    integer arithmetic cost one task instead of N distributed exchanges
    (each exchange has a ~0.5–1 s session floor that dwarfs compute at
    this size — the stages/link.py SMALL_STATE_MAX_ENTRIES principle).
    The distributed path is bit-identical (order-independent integer
    arithmetic on both) and remains the path for corpus-scale graphs.

    MEMORY BOUND behind the 2M default: the single task holds the
    dictionary-encoded edge set plus rank/label arrays — ~2M edges ×
    (2 × ~40B URI + 3 × 8B int) ≈ 250–400 MB peak, comfortably inside a
    2–4 GB worker heap. On a REAL CLUSTER the single task pins one node;
    below the bound that is the correct trade (each distributed iteration
    pays a ~0.5–1 s exchange floor that dwarfs sub-bound compute), and
    above it the distributed loop engages automatically — pinned by
    TestIterativeSmallGraphPath.test_distributed_engages_above_positive_bound.
    Raise it only with measured per-worker heap headroom.

    GRAFT_SMALL_GRAPH_MAX overrides; 0 forces the distributed path
    (tests use this to pin both)."""
    import os

    env = os.environ.get("GRAFT_SMALL_GRAPH_MAX")
    if env is not None:
        return int(env)
    return 2_000_000


def salted_merge_min() -> int:
    """Row-count threshold below which the two-phase SALTED entity merge
    (merge_classes_global salt_buckets>1) collapses to the single-phase
    plain merge: salting exists to split head-entity hot keys across
    reducers, which matters only when the extracted entity table is large
    — below the bound the second exchange's ~0.5-1 s session floor is
    pure overhead (measured: kg_classes merge leg 2.0 s two-phase vs
    ~1.0 s single at sf0.1). Outputs are bit-equal either way (the merge
    is associative/commutative/idempotent; pinned by
    TestSaltedMergePhaseStability). GRAFT_SALTED_MERGE_MIN overrides;
    0 forces the salted path (tests use this to pin both)."""
    import os

    env = os.environ.get("GRAFT_SALTED_MERGE_MIN")
    if env is not None:
        return int(env)
    return 1_000_000


def gram_df_cap() -> int:
    """Stop-gram guard bound for decontaminate: a gram whose sorted run
    (global document frequency — the sort co-partitions full runs)
    exceeds this is treated as a stop-gram, skipped and logged (the
    minhash BUCKET_CAP pattern), bounding one range partition's run at
    cap × ~16-byte rows. Must never fire at oracle scale (sf corpus max
    df ≈ 5k ≪ 1M). GRAFT_GRAM_DF_CAP overrides (tests force it low to
    pin the guard)."""
    import os

    # `if env` (not `is not None`): an EMPTY string — the shell idiom
    # `GRAFT_GRAM_DF_CAP= cmd` for clearing an override — falls back to
    # the default instead of crashing int('')
    env = os.environ.get("GRAFT_GRAM_DF_CAP")
    if env:
        return int(env)
    return 1_000_000


def coalesce_blocks(ds, target_rows: int = 1 << 20):
    """Streaming block coalescer: an identity map_batches whose
    batch_size makes Ray BUNDLE many small input blocks into one task
    (and thus one output block) — no all-to-all, no barrier, unlike
    Dataset.repartition(n).

    Why it exists: ``union`` STACKS its branches' block counts, and a Ray
    sort emits one output partition per input block, so the exchange's
    tiny-object transfer count (in_blocks × out_partitions) grows
    quadratically with each stacked union (measured: decontaminate's
    train-side union drove its gram sort 3.7 s → 5.3 s, the training_set
    tail sort to ~320×320 transfers). Coalescing id-sized or gram-sized
    rows first costs one local memcpy pass and restores the sort fan-out
    to data-proportional block counts: at 100 TB, total_rows/target_rows
    blocks; in the sandbox, a handful."""

    def identity(b):
        return b

    return ds.map_batches(
        identity,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=target_rows,
    )
