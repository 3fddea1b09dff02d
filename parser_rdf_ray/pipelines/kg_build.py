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

    edges: list[tuple[str, str]] = []
    if alias_dict:
        links = link_mod.linker_stage(triples, alias_dict)
        edges.extend((r["mention_uri"], r["canonical_uri"]) for r in links.take_all())
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
