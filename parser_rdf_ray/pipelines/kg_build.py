"""The flagship KG-construction pipeline (SURVEY.md §3.1 Ray realization):

    documents(spans) → assemble → parse → triples(+errors)
    → canonicalize (skolemize + NFC) → [entity link] → [sameAs union-find]
    → exact dedup → sort(subj,pred,obj) → adjacency

Every stage is a map_batches transform over zero-copy Arrow batches; the
only all-to-all is the single fused dedup+sort exchange
(stages/canonicalize.py). All stages stream — nothing materializes the
full dataset except optional stage checkpoints (state/lineage.py) or the
pre-linking block pin, and the union-find edge set, which is tiny by
construction, is the single deliberate driver-side collect.
"""

from __future__ import annotations

from parser_rdf_ray.stages import canonicalize as canon
from parser_rdf_ray.stages import link as link_mod
from parser_rdf_ray.stages.assemble import assemble_spans
from parser_rdf_ray.stages.parse import ParseToTriples

ADJACENCY_COLS = [
    "subj",
    "pred",
    "obj",
    "obj_kind",
    "obj_datatype",
    "obj_lang",
    "graph",
]


def documents_to_raw_triples(documents_ds, format_override: str | None = None):
    """documents(spans) → triples+errors union table (streaming, no shuffle)."""
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    ds = documents_ds.map_batches(
        assemble_spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return ds.map_batches(
        ParseToTriples(format_override=format_override),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def split_errors(raw):
    """(ok_triples, error_rows) — vectorized Arrow filters."""
    import pyarrow.compute as pc

    def keep_ok(b):
        return b.filter(pc.equal(b.column("error_type"), ""))

    def keep_err(b):
        return b.filter(pc.not_equal(b.column("error_type"), ""))

    ok = raw.map_batches(keep_ok, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    err = raw.map_batches(keep_err, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return ok, err


def build_kg(
    documents_ds,
    *,
    alias_dict: dict | None = None,
    resolve_sameas: bool = False,
    dedup: bool = True,
    sort: bool = True,
    checkpoint_dir: str | None = None,
    run_id: str = "run0",
):
    """Full KG build. Returns (adjacency_ds, errors_ds).

    alias_dict: optional surface→canonical map for the linking actor pool.
    resolve_sameas: collect owl:sameAs edges, union-find on the driver,
    broadcast the rename map back (W4).
    checkpoint_dir: when set, the triples stage is checkpointed with a
    lineage manifest and skipped on re-run (resume).
    """
    raw = documents_to_raw_triples(documents_ds)
    triples, errors = split_errors(raw)
    triples = triples.map_batches(
        canon.canonicalize_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    if checkpoint_dir:
        from parser_rdf_ray.state import lineage

        triples, _resumed = lineage.checkpoint_stage(
            triples, checkpoint_dir, "triples", fingerprint=run_id, run_id=run_id
        )
    elif alias_dict or resolve_sameas:
        # Linking consumes the triples stream once (edge collection) and the
        # rename pass consumes it again — without a checkpoint, pin the
        # blocks so the parse doesn't execute twice (measured 8.5s → ~5s on
        # the kg_resolved pipeline at sf0.1).
        triples = triples.materialize()

    from parser_rdf_ray.collect import bounded_take_all

    edges: list[tuple[str, str]] = []
    if alias_dict:
        # bounded: link pairs ≤ |alias_dict| distinct mentions × their
        # matched URIs — dictionary-scale, not corpus-scale
        links = link_mod.linker_stage(triples, alias_dict)
        rows = bounded_take_all(links, what="entity-link pair collect", ceiling=5_000_000)
        edges.extend((r["mention_uri"], r["canonical_uri"]) for r in rows)
    if resolve_sameas:
        edges.extend(link_mod.sameas_edges(triples))
    if edges:
        rename = link_mod.build_rename_map(edges)
        triples = link_mod.apply_rename(triples, rename)

    if dedup:
        # one fused shuffle: exact dedup + key-sorted output (W5+W6)
        adjacency = canon.dedup_triples_sorted(triples)
        return adjacency, errors

    adjacency = triples
    if sort:
        adjacency = adjacency.sort(["subj", "pred", "obj"])
    return adjacency, errors


def write_adjacency(adjacency_ds, out_dir: str, fmt: str = "auto"):
    """Sorted adjacency materialization (W6/S7) — Lance when the package is
    available (the north-rule sink format), else partitioned Parquet with
    one file per block (resumable output layout either way)."""
    if fmt in ("auto", "lance"):
        try:
            import lance  # noqa: F401

            adjacency_ds.write_lance(out_dir)
            return
        except ImportError:
            if fmt == "lance":
                raise
    adjacency_ds.write_parquet(out_dir)


def incremental_update(existing_adjacency_ds, new_documents_ds):
    """Incremental KG maintenance: parse ONLY the delta corpus, project it
    to the adjacency identity columns, and run one fused dedup+sort over
    existing ∪ delta. Parsing cost is proportional to the delta, not the
    graph. At real scale the existing side is already sorted and
    range-partitioned on disk, so the exchange can be narrowed to a
    range-bucketed merge of each delta partition with its matching existing
    key range (partition pruning via the lineage manifest's per-file key
    bounds); the full re-exchange here is the sandbox-size path — correct
    at any scale, optimal at small scale."""
    raw = documents_to_raw_triples(new_documents_ds)
    ok, _errors = split_errors(raw)
    delta = ok.map_batches(
        canon.canonicalize_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    delta = delta.map_batches(
        canon.local_distinct_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    merged = existing_adjacency_ds.union(delta)
    return canon.dedup_triples_sorted(merged)


def two_hop_path_counts(adjacency_ds, num_partitions: int | None = None):
    """Graph traversal primitive: count 2-hop paths per (pred_a, pred_b)
    via a distributed hash self-join of the IRI edge set on
    edge1.obj == edge2.subj (Ray Data hash join — both sides large, so
    this is a genuine co-partitioned shuffle join, not a broadcast)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from parser_rdf_ray.tuning import shuffle_parallelism

    def iri_edges_left(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("obj_kind"), "iri"))
        return pa.Table.from_arrays(
            [b.column("pred"), b.column("obj")], names=["pred_a", "mid"]
        )

    def iri_edges_right(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("obj_kind"), "iri"))
        return pa.Table.from_arrays(
            [b.column("subj"), b.column("pred")], names=["mid", "pred_b"]
        )

    left = adjacency_ds.map_batches(
        iri_edges_left, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    right = adjacency_ds.map_batches(
        iri_edges_right, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    if left.count() == 0 or right.count() == 0:
        # Ray's hash join can't resolve key schemas over zero matching
        # blocks; an empty edge set trivially has no paths
        import ray.data

        return ray.data.from_arrow(
            pa.schema(
                [("pred_a", pa.string()), ("pred_b", pa.string()), ("n_paths", pa.int64())]
            ).empty_table()
        )
    joined = left.join(
        right,
        "inner",
        num_partitions=num_partitions or shuffle_parallelism(),
        on=("mid",),
    )
    counts = joined.groupby(["pred_a", "pred_b"]).count()

    def project(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("pred_a"),
                b.column("pred_b"),
                pc.cast(b.column("count()"), pa.int64()),
            ],
            names=["pred_a", "pred_b", "n_paths"],
        )

    return counts.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def _graph_block_refs(edges):
    """ObjectRefs of a materialized edge Dataset's blocks — refs only on
    the driver; the blocks themselves stay in plasma."""
    return [
        br for bundle in edges.iter_internal_ref_bundles() for br in bundle.block_refs
    ]


def _pagerank_small(edges, n_iter: int, dnum: int, scale: int):
    """SIZE-ADAPTIVE single-task PageRank (edge count ≤
    tuning.small_graph_max): the identical fixed-point int64 recurrence
    as the distributed loop — integer arithmetic is order-independent, so
    the two paths are bit-identical (pinned by
    TestIterativeSmallGraphPath) — run in ONE Ray task instead of
    n_iter × 2 exchanges, each of which has a ~0.5–1 s session floor that
    dwarfs compute at this size. Blocks travel plasma→task, never the
    driver."""
    import ray
    import ray.data

    @ray.remote
    def solve(*blocks):
        import numpy as np
        import pyarrow as pa

        # polars-sorted blocks may arrive as large_string next to
        # string blocks (CLAUDE.md hazard) — permissive promote unifies
        t = pa.concat_tables(list(blocks), promote_options="permissive")
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        n = len(nodes)
        # local distinct-(src,dst): the distributed path's sorted_distinct
        pid = np.unique(inv[: len(src)].astype(np.int64) * n + inv[len(src):])
        s = (pid // n).astype(np.int64)
        d = (pid % n).astype(np.int64)
        outdeg = np.bincount(s, minlength=n).astype(np.int64)
        ranks = np.full(n, scale, dtype=np.int64)
        base = ((100 - dnum) * scale) // 100
        for _ in range(n_iter):
            w = np.where(outdeg > 0, ranks // np.maximum(outdeg, 1), 0)
            contrib = np.zeros(n, dtype=np.int64)
            np.add.at(contrib, d, w[s])  # exact int64 — no float ever
            ranks = base + (dnum * contrib) // 100
        return pa.Table.from_arrays(
            [pa.array(nodes, pa.string()), pa.array(ranks / scale, pa.float64())],
            names=["node", "rank"],
        )

    return ray.data.from_arrow_refs([solve.remote(*_graph_block_refs(edges))])


def _components_small(edges):
    """SIZE-ADAPTIVE single-task connected components: vectorized
    min-label propagation with pointer jumping over int codes. Any
    correct algorithm yields the same output (node → lexicographic-min
    component member, nodes sorted so min index == min IRI), so this is
    exactly the distributed fixpoint's answer in one task."""
    import ray
    import ray.data

    @ray.remote
    def solve(*blocks):
        import numpy as np
        import pyarrow as pa

        # polars-sorted blocks may arrive as large_string next to
        # string blocks (CLAUDE.md hazard) — permissive promote unifies
        t = pa.concat_tables(list(blocks), promote_options="permissive")
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        nodes = np.unique(src)  # both directions present → src covers all
        s = np.searchsorted(nodes, src)
        d = np.searchsorted(nodes, dst)
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            old = lab.copy()
            np.minimum.at(lab, d, lab[s])
            while True:  # pointer jumping to idempotence
                nl = lab[lab]
                if np.array_equal(nl, lab):
                    break
                lab = nl
            if np.array_equal(lab, old):
                break
        return pa.Table.from_arrays(
            [pa.array(nodes, pa.string()), pa.array(nodes[lab], pa.string())],
            names=["node", "component"],
        )

    return ray.data.from_arrow_refs([solve.remote(*_graph_block_refs(edges))])


def pagerank(adjacency_ds, n_iter: int = 5, damping: float = 0.85,
             round_to: int = 6):
    """Iterative PageRank over the KG's IRI edge set — the engine's
    iterative-convergence primitive (power iteration as n_iter rounds of
    Dataset joins, nothing ever on the driver).

    Semantics (matched EXACTLY by the SQL oracle, which unrolls the same
    iterations): nodes = IRIs appearing as src or dst of a distinct
    (subj, obj) IRI edge; ranks live in FIXED-POINT int64 micro-units
    (scale = 10^round_to): rank_0 = scale (i.e. 1.0), and with
    d = round(damping·100),

        rank_{t+1}(v) = ((100-d)·scale)//100
                        + (d · Σ_{u→v} rank_t(u)//outdeg(u)) // 100

    Dangling mass is dropped (standard simplification — both sides
    agree). Integer arithmetic makes every iteration ORDER-INDEPENDENT:
    int64 sums are exactly associative, so distributed summation order
    cannot flip a digit. (Float accumulation + per-iteration rounding was
    tried first and FLAKED: a heavy accumulator node's sum landed within
    1 ulp of a rounding boundary and the last digit differed run-to-run —
    observed on rdfs:Class at sf0.01 at BOTH 9 and 6 dp.) Output rank =
    rank_u / scale as float64, computed identically on both sides.

    Plan: the iteration-invariant edge relation is pinned ONCE as
    src-range partitions (stages/edgejoin.py — the src-sorted blocks stay
    in plasma; only refs + first keys sit on the driver). Per iteration,
    each rank batch hash-joins onto the few edge partitions overlapping
    its node range and pre-sums contributions per dst (map-side combine),
    then ONE node-sized sort aggregates contributions ∪ zero-base rows —
    the union trick gives no-in-edge nodes their (1-d) base without an
    outer join, and Max(outdeg) rides along so the next iteration needs
    no extra join. 1 exchange per iteration, node-sized only; edges never
    re-shuffle. (ds.join was measured and rejected here: its hash-shuffle
    aggregators choke on the schema-less empty blocks aggregate stages
    emit, and they hang at low CPU counts — see BASELINE.md.)
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Max, Sum

    from parser_rdf_ray.stages.groups import sorted_distinct

    def iri_edges(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("obj_kind"), "iri"))
        src = pc.cast(b.column("subj").combine_chunks(), pa.string())
        dst = pc.cast(b.column("obj").combine_chunks(), pa.string())
        return pa.Table.from_arrays([src, dst], names=["src", "dst"])

    edges_raw = adjacency_ds.map_batches(
        iri_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()

    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.float64())],
        names=["node", "rank"],
    )
    n_edge_rows = edges_raw.count()
    if n_edge_rows == 0:
        return ray.data.from_arrow(empty)

    from parser_rdf_ray.tuning import small_graph_max

    if n_edge_rows <= small_graph_max():
        # raw (pre-distinct) rows go straight to the task — the pair
        # dedup happens locally, skipping the sorted_distinct exchange
        return _pagerank_small(
            edges_raw, n_iter, round(damping * 100), 10 ** round_to
        )

    edges = sorted_distinct(edges_raw, ["src", "dst"]).materialize()

    def explode_nodes(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [b.column("src").combine_chunks(), b.column("dst").combine_chunks()]
        )
        return pa.Table.from_arrays([both], names=["node"])

    nodes = sorted_distinct(
        edges.map_batches(explode_nodes, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
    )

    outdeg = edges.groupby("src").count()

    def deg_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("src"), pc.cast(b.column("count()"), pa.int64())],
            names=["node", "outdeg"],
        )

    base_deg = outdeg.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True)

    # zero-base rows: every node, contribution 0, outdeg where defined
    def node_zero(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [
                b.column("node"),
                pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                pa.nulls(n, pa.int64()),
            ],
            names=["node", "contrib", "outdeg"],
        )

    def deg_zero(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [
                b.column("node"),
                pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                b.column("outdeg"),
            ],
            names=["node", "contrib", "outdeg"],
        )

    from parser_rdf_ray.tuning import state_parallelism

    base = nodes.map_batches(node_zero, batch_format="pyarrow", zero_copy_batch=True).union(
        base_deg.map_batches(deg_zero, batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()
    # Size the loop state to the DATA (see tuning.state_parallelism): the
    # per-iteration sort's cost is in_blocks × out_partitions object
    # transfers, so both `base` (unioned into every round) and the rank
    # state are held at the same data-sized block count.
    state_parts = state_parallelism(base.count())
    base = base.repartition(state_parts).materialize()

    scale = 10 ** round_to
    dnum = round(damping * 100)  # damping as an integer percentage
    rank_schema = pa.schema(
        [("node", pa.string()), ("rank_u", pa.int64()), ("outdeg", pa.int64())]
    )

    def agg_block(b: pa.Table) -> pa.Table:
        # per-block vectorized aggregation over co-partitioned node runs:
        # exact int64 contribution sum + outdeg pickup + the fixed-point
        # rank update, all in one pass (no per-node Python)
        if b.num_rows == 0:
            return rank_schema.empty_table()
        import polars as pl

        df = pl.from_arrow(b)
        agg = df.group_by("node").agg(
            pl.col("contrib").sum().alias("s"),
            pl.col("outdeg").max().alias("outdeg"),
        )
        agg = agg.with_columns(
            (
                ((100 - dnum) * scale) // 100
                + (dnum * pl.col("s")) // 100
            ).alias("rank_u")
        )
        t = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("node").combine_chunks(), pa.string()),
                pc.cast(t.column("rank_u").combine_chunks(), pa.int64()),
                pc.cast(t.column("outdeg").combine_chunks(), pa.int64()),
            ],
            schema=rank_schema,
        )

    # rank_0 = 1.0 (scale micro-units) per node, outdeg via the same union
    ranks = (
        base.groupby("node")
        .aggregate(Sum("contrib"), Max("outdeg"))
        .map_batches(
            lambda b: pa.Table.from_arrays(
                [
                    b.column("node"),
                    pa.array(np.full(b.num_rows, scale, dtype=np.int64), pa.int64()),
                    pc.cast(b.column("max(outdeg)"), pa.int64()),
                ],
                names=["node", "rank_u", "outdeg"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .repartition(state_parts)  # iteration 1 sorts state_parts blocks, not min_parallelism
    )

    from parser_rdf_ray.stages.edgejoin import edge_join_fn, pin_sorted_blocks

    # pin the iteration-invariant edge relation ONCE: edges is already
    # globally src-sorted (sorted_distinct), so its materialized blocks
    # ARE contiguous src-range partitions — no per-iteration edge exchange
    firsts, part_refs = pin_sorted_blocks(edges, "src")
    contrib_schema = pa.schema([("node", pa.string()), ("contrib", pa.int64())])

    def contrib_combine(joined):
        # map-side combine: sum int64 contributions per dst locally, so
        # the node-sized exchange carries partials, not one row per edge
        import polars as pl

        agg = joined.group_by("dst").agg(pl.col("weight").sum().alias("contrib"))
        t = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("dst").combine_chunks(), pa.string()),
                pc.cast(t.column("contrib").combine_chunks(), pa.int64()),
            ],
            schema=contrib_schema,
        )

    join_fn = edge_join_fn(firsts, part_refs, "node", contrib_combine, contrib_schema)
    # state_parts (computed above from node count) stays FIXED per round —
    # blocks otherwise double per iteration, measured 48 → 1008

    def weights(b: pa.Table) -> pa.Table:
        # Max() over an all-null partition yields a null-TYPED column;
        # normalize to int64 before arithmetic. Weight = integer FLOOR
        # division rank_u // outdeg — the oracle uses the same // so
        # both sides drop the identical sub-unit remainder.
        deg = pc.cast(b.column("outdeg"), pa.int64())
        rank_u = pc.cast(b.column("rank_u"), pa.int64())
        w = pc.if_else(
            pc.is_valid(deg),
            pc.divide(rank_u, pc.fill_null(deg, 1)),  # int64 // int64
            pa.scalar(0, pa.int64()),
        )
        node = pc.cast(b.column("node").combine_chunks(), pa.string())
        t = pa.Table.from_arrays(
            [node, pc.cast(w, pa.int64())], names=["node", "weight"]
        )
        return t.filter(pc.greater(t.column("weight"), 0))

    def contribs(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("node"),
                b.column("contrib"),
                pa.nulls(b.num_rows, pa.int64()),
            ],
            names=["node", "contrib", "outdeg"],
        )

    for _ in range(n_iter):
        w_rows = ranks.map_batches(weights, batch_format="pyarrow", zero_copy_batch=True)
        contrib_rows = w_rows.map_batches(
            join_fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).map_batches(contribs, batch_format="pyarrow", zero_copy_batch=True)
        # node runs are co-partitioned by the key-only sort; per-block
        # polars group_by sums contributions and picks up outdeg —
        # the ONE exchange per iteration. materialize keeps the state
        # sorted, which is what makes the join's range pruning effective.
        merged = contrib_rows.union(base).sort(["node"]).map_batches(
            agg_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        ranks = merged.repartition(state_parts).materialize()

    def to_rank(b: pa.Table) -> pa.Table:
        rank = pc.divide(
            pc.cast(b.column("rank_u"), pa.float64()), pa.scalar(float(scale))
        )
        return pa.Table.from_arrays(
            [b.column("node"), rank], names=["node", "rank"]
        )

    return ranks.map_batches(to_rank, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(adjacency_ds, max_iter: int = 50):
    """Connected components over the UNDIRECTED IRI edge set: every node →
    the lexicographic-min IRI of its component. The KG-side analog of the
    near-dup document clustering (entity-resolution blocking at graph
    scale), run as min-label propagation to an EXACT fixpoint.

    Per iteration (all engine primitives, no driver state): propagate each
    node's label across its edges with a hash join against the pinned
    src-range edge partitions (stages/edgejoin.py — edges never
    re-shuffle), take groupby(node).min over propagated ∪ current labels,
    then detect convergence with one more sorted-run compare (count of
    changed nodes == 0 → stop). Labels are monotonically non-increasing, so the
    fixpoint is the true component minimum; iterations needed ≈ graph
    diameter. The SQL oracle computes the same closure with a recursive
    reachability CTE — independent of iteration count, so convergence
    bugs cannot hide.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from parser_rdf_ray.stages.edgejoin import edge_join_fn, pin_sorted_blocks
    from parser_rdf_ray.stages.groups import sorted_distinct

    def iri_edges(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("obj_kind"), "iri"))
        src = pc.cast(b.column("subj").combine_chunks(), pa.string())
        dst = pc.cast(b.column("obj").combine_chunks(), pa.string())
        # undirected: emit both directions
        return pa.Table.from_arrays(
            [pa.concat_arrays([src, dst]), pa.concat_arrays([dst, src])],
            names=["src", "dst"],
        )

    edges_raw = adjacency_ds.map_batches(
        iri_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()

    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.string())],
        names=["node", "component"],
    )
    n_edge_rows = edges_raw.count()
    if n_edge_rows == 0:
        return ray.data.from_arrow(empty)

    from parser_rdf_ray.tuning import small_graph_max

    if n_edge_rows <= small_graph_max():
        # duplicate edges cannot move a min-label fixpoint — the raw rows
        # skip the sorted_distinct exchange entirely
        return _components_small(edges_raw)

    edges = sorted_distinct(edges_raw, ["src", "dst"]).materialize()

    prop_schema = pa.schema([("node", pa.string()), ("label", pa.string())])

    # pin the iteration-invariant edge relation ONCE as src-range
    # partitions (stages/edgejoin.py); per-iteration label propagation is
    # a hash join against only the overlapping partitions plus a map-side
    # min-combine per dst — no edge-sized exchange per round
    firsts, part_refs = pin_sorted_blocks(edges, "src")

    def prop_combine(joined):
        import polars as pl

        agg = joined.group_by("dst").agg(pl.col("label").min())
        t = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("dst").combine_chunks(), pa.string()),
                pc.cast(t.column("label").combine_chunks(), pa.string()),
            ],
            schema=prop_schema,
        )

    join_fn = edge_join_fn(firsts, part_refs, "node", prop_combine, prop_schema)

    def self_labels(b: pa.Table) -> pa.Table:
        node = pc.cast(b.column("node").combine_chunks(), pa.string())
        return pa.Table.from_arrays([node, node], schema=prop_schema)

    def explode_nodes(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("src").combine_chunks()], names=["node"]
        )

    nodes = sorted_distinct(
        edges.map_batches(explode_nodes, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
    )
    labels = nodes.map_batches(
        self_labels, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # data-sized loop state (see tuning.state_parallelism + the pagerank
    # note): per-iteration sort cost is in_blocks × out_partitions
    from parser_rdf_ray.tuning import state_parallelism

    state_parts = state_parallelism(labels.count())
    labels = labels.repartition(state_parts).materialize()

    # state rows tagged is_old so ONE sorted-run scan per iteration both
    # min-aggregates the candidate labels AND detects per-node change —
    # 1 exchange per round total (propagation is an exchange-free pinned-
    # partition join; only this node-sized sort shuffles), and the
    # convergence count is a free scan of the already-materialized state
    state_schema = pa.schema(
        [("node", pa.string()), ("label", pa.string()), ("changed", pa.int64())]
    )

    def min_and_diff_block(batch: pa.Table) -> pa.Table:
        # node runs are co-partitioned by the key-only sort; per-block
        # vectorized group_by (polars) computes each node's min candidate
        # label and whether it differs from the old one — NO per-node
        # Python dispatch (node count is corpus-scale)
        if batch.num_rows == 0:
            return state_schema.empty_table()
        import polars as pl

        df = pl.from_arrow(batch)
        agg = df.group_by("node").agg(
            pl.col("label").min().alias("new_label"),
            pl.col("label").filter(pl.col("is_old") == 1).first().alias("old_label"),
        )
        agg = agg.with_columns(
            (pl.col("new_label") != pl.col("old_label")).cast(pl.Int64).alias("changed")
        )
        t = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(t.column("node").combine_chunks(), pa.string()),
                pc.cast(t.column("new_label").combine_chunks(), pa.string()),
                pc.cast(t.column("changed").combine_chunks(), pa.int64()),
            ],
            schema=state_schema,
        )

    def tag(is_old: int):
        def f(b: pa.Table) -> pa.Table:
            node = pc.cast(b.column("node").combine_chunks(), pa.string())
            label = pc.cast(b.column("label").combine_chunks(), pa.string())
            return pa.Table.from_arrays(
                [node, label,
                 pa.array(np.full(b.num_rows, is_old, dtype=np.int8), pa.int8())],
                names=["node", "label", "is_old"],
            )

        return f

    # state_parts (computed above from node count) stays FIXED per round —
    # blocks otherwise double per iteration (measured 48 → 1008, wall
    # time quadrupling)

    for _ in range(max_iter):
        prop = labels.map_batches(
            join_fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        tagged = prop.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
            labels.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
        )
        state = tagged.sort(["node"]).map_batches(
            min_and_diff_block, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        state = state.repartition(state_parts).materialize()
        changed = int(state.sum("changed"))  # scan of materialized blocks
        labels = state.select_columns(["node", "label"])
        if changed == 0:
            break
    else:
        # never silent: a graph with diameter > max_iter would otherwise
        # return intermediate labels as if they were components
        raise ValueError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); raise max_iter — the graph's "
            "diameter exceeds the iteration budget"
        )

    return labels.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("node"), b.column("label")], names=["node", "component"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _triangle_count_small(edges, out_schema):
    """Single-task triangle count over a materialized distinct edge
    Dataset: same degree-orientation algorithm as the distributed path,
    vectorized per out-neighbor run, membership via one searchsorted
    over int pair codes. Blocks travel plasma→task, never the driver."""
    import numpy as np
    import ray
    import ray.data

    @ray.remote
    def solve(*blocks):
        import numpy as np
        import pyarrow as pa

        t = pa.concat_tables(list(blocks), promote_options="permissive")
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.Table.from_arrays([pa.array([0], pa.int64())], schema=out_schema)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        n = len(nodes)
        ai, bi = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
        deg = np.bincount(np.concatenate([ai, bi]), minlength=n)
        a_first = (deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi))
        srci = np.where(a_first, ai, bi)
        dsti = np.where(a_first, bi, ai)
        order = np.argsort(srci, kind="stable")
        s_s, d_s = srci[order], dsti[order]
        starts = np.flatnonzero(np.diff(s_s, prepend=s_s[0] - 1))
        ends = np.append(starts[1:], len(s_s))
        lo, hi = np.minimum(ai, bi), np.maximum(ai, bi)
        edge_codes = np.sort(lo * n + hi)
        count = 0
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            nb = np.sort(d_s[st:en])
            iu, iw = np.triu_indices(en - st, 1)
            codes = nb[iu] * n + nb[iw]  # nb sorted → nb[iu] < nb[iw]
            pos = np.searchsorted(edge_codes, codes)
            in_range = pos < len(edge_codes)
            hit = in_range & (
                edge_codes[np.minimum(pos, len(edge_codes) - 1)] == codes
            )
            count += int(hit.sum())
        return pa.Table.from_arrays([pa.array([count], pa.int64())], schema=out_schema)

    return ray.data.from_arrow_refs([solve.remote(*_graph_block_refs(edges))])


def triangle_count(edges_ds):
    """EXACT global triangle count over an undirected edge Dataset
    (columns a, b; any orientation, duplicates/self-loops tolerated) —
    the graph-analytics join workload (community density, near-dup
    cluster cohesion).

    Plan — every step an engine primitive, no driver state beyond the
    final scalar:
      1. canonicalize (min,max) + drop self-loops → global distinct
         (ONE sort, sorted_distinct), materialized once (used twice).
      2. degrees: endpoint explode → ONE node sort → run lengths
         (co-partitioned, so a run length IS the global degree).
      3+4. two tagged-union sorted-run merge joins attach both endpoint
         degrees to each edge.
      5. DEGREE ORIENTATION: direct each edge from the (degree, node)-
         smaller endpoint — out-degree is then O(√m), so the hub node
         that makes naive center-wedge counting quadratic (a KG's
         rdf:type target, a dup-cluster star) is designed out.
      6. wedges: ONE src sort; per out-neighbor run, vectorized
         triu-pair emission (runs are orientation-bounded).
      7. closing-edge check: candidates ∪ edges through ONE (a,b) sort;
         per-block run scan counts wedges whose run holds an edge row —
         each triangle has exactly one orientation-apex, so the count is
         exact with no dedup step.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from parser_rdf_ray.stages.groups import run_spans, sorted_distinct
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    out_schema = pa.schema([("n_triangles", pa.int64())])

    def canon(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("a"), pa.string())
        y = pc.cast(b.column("b"), pa.string())
        lo = pc.min_element_wise(x, y)
        hi = pc.max_element_wise(x, y)
        t = pa.Table.from_arrays([lo, hi], names=["a", "b"])
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    edges = sorted_distinct(
        edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.Table.from_arrays([pa.array([0], pa.int64())], schema=out_schema)
        )

    from parser_rdf_ray.tuning import small_graph_max

    if n_edges <= small_graph_max():
        # size-adaptive single-task path (same rule as pagerank /
        # components): ~7 exchange session floors dwarf compute below
        # the threshold; the local algorithm is the identical
        # orientation count (node-index order == sorted-string order,
        # and the count is orientation-convention-independent anyway)
        return _triangle_count_small(edges, out_schema)

    # 2. degrees via co-partitioned run lengths
    def explode(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [b.column("a").combine_chunks(), b.column("b").combine_chunks()]
        )
        return pa.Table.from_arrays([pc.cast(both, pa.string())], names=["node"])

    deg_schema = pa.schema([("node", pa.string()), ("d", pa.int64())])

    def deg_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return deg_schema.empty_table()
        starts, ends = run_spans(b, ["node"])
        return pa.Table.from_arrays(
            [
                b.column("node").take(pa.array(starts)),
                pa.array((ends - starts).astype(np.int64)),
            ],
            schema=deg_schema,
        )

    deg = (
        edges.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .sort("node")
        .map_batches(deg_block, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    ).materialize()  # consumed by BOTH degree joins — never recompute

    # 3+4. attach endpoint degrees via two tagged-union run-scan joins
    def attach_degree(rows_ds, key_col: str, carry: list[str], out_name: str):
        carry_types = {"other": pa.string(), "da": pa.int64()}
        u_fields = [("key", pa.string()), ("kind", pa.int8()), ("d", pa.int64())]
        u_fields += [(c, carry_types[c]) for c in carry]
        u_schema = pa.schema(u_fields)

        def tag_deg(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = [
                pc.cast(b.column("node"), pa.string()),
                pa.array(np.zeros(n, dtype=np.int8)),
                pc.cast(b.column("d"), pa.int64()),
            ] + [pa.nulls(n, carry_types[c]) for c in carry]
            return pa.Table.from_arrays(cols, schema=u_schema)

        def tag_rows(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = [
                pc.cast(b.column(key_col), pa.string()),
                pa.array(np.ones(n, dtype=np.int8)),
                pa.nulls(n, pa.int64()),
            ] + [pc.cast(b.column(c), carry_types[c]) for c in carry]
            return pa.Table.from_arrays(cols, schema=u_schema)

        tagged = deg.map_batches(
            tag_deg, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            rows_ds.map_batches(tag_rows, batch_format="pyarrow", zero_copy_batch=True)
        )
        srt = tagged.sort("key")
        out_fields = [("key", pa.string())] + [
            (c, carry_types[c]) for c in carry
        ] + [(out_name, pa.int64())]
        out_schema_j = pa.schema(out_fields)

        def join_block(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema_j.empty_table()
            batch = batch.sort_by([("key", "ascending"), ("kind", "ascending")])
            starts, _ = run_spans(batch, ["key"])
            kinds = batch.column("kind").to_numpy()
            marks = np.zeros(batch.num_rows, dtype=np.int64)
            marks[starts] = 1
            run_ids = np.cumsum(marks) - 1
            has_deg = kinds[starts] == 0  # every endpoint HAS a degree row
            probe = (kinds == 1) & has_deg[run_ids]
            idx = np.flatnonzero(probe)
            src = pa.array(starts[run_ids[idx]])
            rows = batch.take(pa.array(idx))
            cols = [rows.column("key")] + [rows.column(c) for c in carry] + [
                batch.column("d").take(src)
            ]
            return pa.Table.from_arrays(cols, schema=out_schema_j)

        return srt.map_batches(
            join_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("a"), b.column("b")], names=["a", "b"]
        )

    j1 = attach_degree(
        edges.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("a"), b.column("b")], names=["key_a", "other"]
            ).rename_columns(["a", "other"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "a",
        ["other"],
        "da",
    )
    # j1: (key=a, other=b, da) → feed join2 keyed by b
    j2 = attach_degree(
        j1.map_batches(
            lambda b: pa.Table.from_arrays(
                [b.column("other"), b.column("key"), b.column("da")],
                names=["b", "other", "da"],
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "b",
        ["other", "da"],
        "db",
    )
    # j2: (key=b, other=a, da, db)

    oriented_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])

    def orient(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return oriented_schema.empty_table()
        a = b.column("other").to_numpy(zero_copy_only=False)
        bb = b.column("key").to_numpy(zero_copy_only=False)
        da = b.column("da").to_numpy()
        db = b.column("db").to_numpy()
        a_first = (da < db) | ((da == db) & (a < bb))
        src = np.where(a_first, a, bb)
        dst = np.where(a_first, bb, a)
        return pa.Table.from_arrays(
            [pa.array(src, pa.string()), pa.array(dst, pa.string())],
            schema=oriented_schema,
        )

    oriented = j2.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)

    # 6. wedge pairs per src run (orientation-bounded run lengths)
    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

    def wedges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pair_schema.empty_table()
        starts, ends = run_spans(batch, ["src"])
        dsts = batch.column("dst").to_numpy(zero_copy_only=False)
        us, ws = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            nb = np.sort(dsts[s:e])
            iu, iw = np.triu_indices(e - s, 1)
            us.append(nb[iu])
            ws.append(nb[iw])
        if not us:
            return pair_schema.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(us), pa.string()),
                pa.array(np.concatenate(ws), pa.string()),
            ],
            schema=pair_schema,
        )

    cands = oriented.sort("src").map_batches(
        wedges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    # 7. closing-edge existence via one (a,b)-keyed run scan
    chk_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("kind", pa.int8())]
    )

    def tag(kind: int):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.Table.from_arrays(
                [
                    pc.cast(b.column("a"), pa.string()),
                    pc.cast(b.column("b"), pa.string()),
                    pa.array(np.full(n, kind, dtype=np.int8)),
                ],
                schema=chk_schema,
            )

        return f

    both = edges.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        cands.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    cnt_schema = pa.schema([("cnt", pa.int64())])

    def count_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return cnt_schema.empty_table()
        starts, _ = run_spans(batch, ["a", "b"])
        kinds = batch.column("kind").to_numpy()
        marks = np.zeros(batch.num_rows, dtype=np.int64)
        marks[starts] = 1
        run_ids = np.cumsum(marks) - 1
        has_edge = np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0
        n = int(((kinds == 1) & has_edge[run_ids]).sum())
        return pa.Table.from_arrays([pa.array([n], pa.int64())], schema=cnt_schema)

    partials = both.sort(["a", "b"]).map_batches(
        count_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    total = int(partials.sum("cnt") or 0)
    return ray.data.from_arrow(
        pa.Table.from_arrays([pa.array([total], pa.int64())], schema=out_schema)
    )


def _kcore_schema():
    import pyarrow as pa

    return pa.schema([("node", pa.string()), ("degree", pa.int64())])


def _kcore_small(edges, k: int, rounds: int):
    """Single-task fixed-R peeling over the materialized distinct edge
    Dataset — identical semantics to the distributed loop (pinned by
    TestKcoreSmallGraphPath); blocks travel plasma→task, never the
    driver."""
    import numpy as np
    import ray
    import ray.data

    @ray.remote
    def solve(*blocks):
        import numpy as np
        import pyarrow as pa

        t = pa.concat_tables(list(blocks), promote_options="permissive")
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        schema = pa.schema([("node", pa.string()), ("degree", pa.int64())])
        if len(a) == 0:
            return schema.empty_table()
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        n = len(nodes)
        ai = inv[: len(a)].astype(np.int64)
        bi = inv[len(a):].astype(np.int64)
        alive = np.ones(n, dtype=bool)
        for _ in range(rounds):
            keep_e = alive[ai] & alive[bi]
            deg = np.bincount(
                np.concatenate([ai[keep_e], bi[keep_e]]), minlength=n
            )
            new_alive = alive & (deg >= k)
            if np.array_equal(new_alive, alive):
                break  # converged: further fixed-R rounds are no-ops
            alive = new_alive
        keep_e = alive[ai] & alive[bi]
        deg = np.bincount(np.concatenate([ai[keep_e], bi[keep_e]]), minlength=n)
        out_idx = np.flatnonzero(alive)
        return pa.Table.from_arrays(
            [
                pa.array(nodes[out_idx]),
                pa.array(deg[out_idx].astype(np.int64)),
            ],
            schema=schema,
        )

    refs = _graph_block_refs(edges)
    return ray.data.from_arrow_refs([solve.remote(*refs)])


def kcore_nodes(edges_ds, k: int = 2, rounds: int = 8):
    """K-CORE DECOMPOSITION (fixed-R peeling): the nodes surviving
    ``rounds`` rounds of "remove every node with induced degree < k"
    over the undirected simple graph, emitted with their degree in the
    final surviving subgraph — the graph-density quality signal (a KG
    entity's k-core membership separates richly-connected entities from
    leaf noise; on a near-dup similarity graph it finds dense template
    families). ``rounds`` ≥ the graph's peel depth yields the true
    k-core; both the engine and the SQL oracle compute the identical
    fixed-R semantics, so the oracle is exact regardless.

    Plan: canonicalized distinct simple edges (ONE sort), then the
    size-adaptive split every iterative graph op here uses
    (tuning.small_graph_max): small graphs solve in ONE task (the
    ~3-sorts-per-round distributed loop pays session floors that dwarf
    compute); at scale each round is (a) two tagged-union sorted-run
    SEMI JOINS filtering the edge list to alive endpoints and (b) one
    node sort whose co-partitioned run lengths ARE the induced degrees —
    only (node, id) rows shuffle, and loop state re-pins its block count
    per round (the CLAUDE.md iterative-loop rule)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from parser_rdf_ray.stages.groups import run_spans, sorted_distinct
    from parser_rdf_ray.tuning import (
        small_graph_max,
        state_parallelism,
        tune_data_context,
    )

    tune_data_context()
    KCORE_SCHEMA = _kcore_schema()

    def canon(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("a"), pa.string())
        y = pc.cast(b.column("b"), pa.string())
        lo = pc.min_element_wise(x, y)
        hi = pc.max_element_wise(x, y)
        t = pa.Table.from_arrays([lo, hi], names=["a", "b"])
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    edges = sorted_distinct(
        edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True),
        ["a", "b"],
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(KCORE_SCHEMA.empty_table())
    if n_edges <= small_graph_max():
        return _kcore_small(edges, k, rounds)

    # ---- distributed fixed-R loop ----
    g_schema = pa.schema([("node", pa.string()), ("other", pa.string())])

    def both_dir(b: pa.Table) -> pa.Table:
        s = b.column("a").combine_chunks()
        t = b.column("b").combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([s, t]), pa.concat_arrays([t, s])],
            schema=g_schema,
        )

    g = edges.map_batches(
        both_dir, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    u_schema = pa.schema(
        [("node", pa.string()), ("other", pa.string()), ("kind", pa.int8())]
    )

    def tag_alive(b: pa.Table) -> pa.Table:
        nodes = b.column("node")
        n = len(nodes)
        return pa.Table.from_arrays(
            [nodes, pa.nulls(n, pa.string()),
             pa.array(np.zeros(n, dtype=np.int8))],
            schema=u_schema,
        )

    def tag_g(col_as_node: bool):
        def f(b: pa.Table) -> pa.Table:
            node = b.column("node" if col_as_node else "other")
            other = b.column("other" if col_as_node else "node")
            n = len(node)
            return pa.Table.from_arrays(
                [node, other, pa.array(np.ones(n, dtype=np.int8))],
                schema=u_schema,
            )

        return f

    def semi_block(batch: pa.Table) -> pa.Table:
        """Keep kind-1 rows whose node run contains a kind-0 row."""
        if batch.num_rows == 0:
            return g_schema.empty_table()
        starts, _ = run_spans(batch, ["node"])
        kinds = batch.column("kind").to_numpy()
        marks = np.zeros(batch.num_rows, dtype=np.int64)
        marks[starts] = 1
        run_ids = np.cumsum(marks) - 1
        has0 = np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0
        emit = (kinds == 1) & has0[run_ids]
        rows = batch.filter(pa.array(emit))
        return pa.Table.from_arrays(
            [rows.column("node"), rows.column("other")], schema=g_schema
        )

    def alive_edges(g_ds, alive_ds):
        """Edges of g with BOTH endpoints alive: two sorted-run semi
        joins (filter on node, swap, filter on the other endpoint)."""
        from parser_rdf_ray.tuning import coalesce_blocks

        f1 = (
            coalesce_blocks(
                g_ds.map_batches(tag_g(True), batch_format="pyarrow", zero_copy_batch=True)
                .union(alive_ds.map_batches(tag_alive, batch_format="pyarrow", zero_copy_batch=True))
            )
            .sort("node")
            .map_batches(semi_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        )
        return (
            coalesce_blocks(
                f1.map_batches(tag_g(False), batch_format="pyarrow", zero_copy_batch=True)
                .union(alive_ds.map_batches(tag_alive, batch_format="pyarrow", zero_copy_batch=True))
            )
            .sort("node")
            .map_batches(semi_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        )

    deg_schema = pa.schema([("node", pa.string()), ("degree", pa.int64())])

    def deg_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return deg_schema.empty_table()
        starts, ends = run_spans(b, ["node"])
        return pa.Table.from_arrays(
            [
                b.column("node").take(pa.array(starts)),
                pa.array((ends - starts).astype(np.int64)),
            ],
            schema=deg_schema,
        )

    def degrees(e_ds):
        # e_ds rows are (node, other) half-edges: node's run length after
        # the node sort IS its induced degree (each undirected edge
        # contributes one half-edge per endpoint)
        return e_ds.sort("node").map_batches(
            deg_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    alive_schema = pa.schema([("node", pa.string())])

    def nodes_of(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([b.column("node")], schema=alive_schema)

    alive = sorted_distinct(
        g.map_batches(nodes_of, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
    )
    n_alive = alive.count()
    state_parts = state_parallelism(n_alive)
    alive = alive.repartition(state_parts).materialize()

    for _ in range(rounds):
        deg = degrees(alive_edges(g, alive))

        def keep(b: pa.Table) -> pa.Table:
            rows = b.filter(pc.greater_equal(b.column("degree"), k))
            return pa.Table.from_arrays([rows.column("node")], schema=alive_schema)

        new_alive = (
            deg.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(state_parts)
            .materialize()
        )
        if new_alive.count() == alive.count():
            alive = new_alive
            break  # converged — remaining fixed-R rounds are no-ops
        alive = new_alive

    # final induced degrees over the surviving set; nodes with zero
    # induced degree (possible only when k == 0) re-attach via a
    # tagged-union run scan rather than a join
    final_deg = degrees(alive_edges(g, alive))
    fu_schema = pa.schema([("node", pa.string()), ("degree", pa.int64()), ("kind", pa.int8())])

    def tag_deg(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_arrays(
            [b.column("node"), b.column("degree"), pa.array(np.ones(n, dtype=np.int8))],
            schema=fu_schema,
        )

    def tag_alive2(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.Table.from_arrays(
            [b.column("node"), pa.array(np.zeros(n, dtype=np.int64)),
             pa.array(np.zeros(n, dtype=np.int8))],
            schema=fu_schema,
        )

    def emit_block(batch: pa.Table) -> pa.Table:
        """One row per alive node: its degree row if present, else 0."""
        if batch.num_rows == 0:
            return KCORE_SCHEMA.empty_table()
        starts, _ = run_spans(batch, ["node"])
        kinds = batch.column("kind").to_numpy()
        degs = batch.column("degree").to_numpy()
        marks = np.zeros(batch.num_rows, dtype=np.int64)
        marks[starts] = 1
        run_ids = np.cumsum(marks) - 1
        best = np.zeros(len(starts), dtype=np.int64)
        np.maximum.at(best, run_ids, degs)  # degree row wins over the 0 tag
        has_alive = np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0
        keep_runs = np.flatnonzero(has_alive)
        return pa.Table.from_arrays(
            [
                batch.column("node").take(pa.array(starts[keep_runs])),
                pa.array(best[keep_runs]),
            ],
            schema=KCORE_SCHEMA,
        )

    from parser_rdf_ray.tuning import coalesce_blocks

    return (
        coalesce_blocks(
            final_deg.map_batches(tag_deg, batch_format="pyarrow", zero_copy_batch=True)
            .union(alive.map_batches(tag_alive2, batch_format="pyarrow", zero_copy_batch=True))
        )
        .sort("node")
        .map_batches(emit_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    )
