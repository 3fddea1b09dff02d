"""KG-build job entrypoint for ``ray job submit``.

    ray job submit --working-dir . -- \
        python -m parser_rdf_ray.job --input /data/sf0.1 --output /out/kg \
            --checkpoint-dir /out/ckpt --run-id run1

Reads the documents table under --input, runs the full KG build
(assemble → parse → canonicalize → dedup+sort), writes:

    <output>/adjacency/   sorted triples, partitioned Parquet (one file per
                          block — resumable output layout)
    <output>/errors/      error rows (doc_id, error_type, message, line_no)
    <output>/metrics.json wall time per phase, row counts, run metadata

With --checkpoint-dir, the parsed-triples stage is checkpointed with a
lineage manifest (state/lineage.py); a re-run with the same --run-id skips
parsing and resumes from the checkpoint.

Owns its Ray session (guarded init — under ``ray job submit`` the cluster
address comes from the environment; standalone it starts local).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="Distributed KG build")
    ap.add_argument("--input", required=True, help="directory holding documents.parquet")
    ap.add_argument("--output", required=True, help="output directory (scratch, e.g. /tmp/...)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--replicate", type=int, default=1, help="corpus amplification (bench)")
    ap.add_argument("--resolve-sameas", action="store_true")
    ap.add_argument(
        "--export-nt",
        default=None,
        metavar="DIR",
        help="additionally export the adjacency as N-Triples text (one .nt per block)",
    )
    ap.add_argument(
        "--export-nq",
        default=None,
        metavar="DIR",
        help="additionally export as N-Quads (named graphs preserved; one .nq per block)",
    )
    ap.add_argument(
        "--num-cpus",
        type=int,
        default=None,
        help="local-mode CPU cap (cluster-size stand-in for scaling runs); "
        "ignored when RAY_ADDRESS points at a real cluster",
    )
    ap.add_argument(
        "--pipeline",
        choices=["kg", "corpus", "training-set"],
        default="kg",
        help="kg: KG build (default). corpus: training-data curation — "
        "quality gate → near-dup dedup → representatives ⋈ documents "
        "→ train/val split, written as resumable partitioned Parquet "
        "with the curation-trust report in metrics.json. training-set: "
        "the full composite (quality → LSH reps → decontamination → "
        "split → sequence packing) with EVERY stage boundary "
        "lineage-checkpointed — a killed run resumes after the last "
        "completed stage (requires --checkpoint-dir for mid-pipeline "
        "resume; the final output is always resumable)",
    )
    args = ap.parse_args(argv)

    # One rayon thread per Ray worker (set BEFORE ray.init so workers
    # inherit it): polars otherwise spawns a cores-wide pool in every
    # worker and the oversubscription costs ~40% at num_cpus=32 (measured
    # on the dedup shuffle; same setting as bench.py).
    os.environ.setdefault("POLARS_MAX_THREADS", "1")

    import ray

    if not ray.is_initialized():
        kwargs = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False, **kwargs
        )

    from parser_rdf_ray.pipelines.kg_build import (
        build_kg,
        documents_to_raw_triples,
        split_errors,
    )
    from parser_rdf_ray.sources.documents import read_span_documents
    from parser_rdf_ray.stages import canonicalize as canon

    from parser_rdf_ray.state import lineage

    if args.pipeline == "corpus":
        _run_corpus_job(args)
        return
    if args.pipeline == "training-set":
        _run_training_set_job(args)
        return

    t0 = time.time()
    docs = read_span_documents(args.input, replicate=args.replicate)
    phases: dict[str, float] = {}

    if args.resolve_sameas:
        # union-find path: build_kg owns linking + rename
        adjacency, errors = build_kg(
            docs, resolve_sameas=True, checkpoint_dir=args.checkpoint_dir, run_id=args.run_id
        )
        resumed_parse = False
    else:
        # ONE parse pass for both outputs: raw (triples+errors union) is the
        # checkpointed stage, so a resume skips parsing entirely and the
        # errors sink doesn't re-run the parse.
        raw = documents_to_raw_triples(docs)
        if args.checkpoint_dir:
            raw, resumed_parse = lineage.checkpoint_stage(
                raw, args.checkpoint_dir, "raw_triples", fingerprint=args.run_id, run_id=args.run_id
            )
        else:
            raw = raw.materialize()
            resumed_parse = False
        ok, errors = split_errors(raw)
        triples = ok.map_batches(
            canon.canonicalize_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        adjacency = canon.dedup_triples_sorted(triples)
    phases["parse_sec"] = round(time.time() - t0, 3)

    # Every output stage goes through checkpoint_stage: partitioned Parquet
    # (one file per block) + a _lineage.json manifest with per-partition
    # row/byte counts. A re-run with the same --run-id skips any stage whose
    # manifest is complete — checkpoint-resume at stage granularity, with
    # interrupted partials cleared by the checkpointing layer itself.
    t1 = time.time()
    adjacency_ds, resumed_adj = lineage.checkpoint_stage(
        adjacency, args.output, "adjacency", fingerprint=args.run_id, run_id=args.run_id
    )
    phases["adjacency_sec"] = round(time.time() - t1, 3)

    if args.export_nt:
        from parser_rdf_ray.sources.ntriples_sink import write_ntriples

        write_ntriples(adjacency_ds, args.export_nt)
    if args.export_nq:
        from parser_rdf_ray.sources.ntriples_sink import write_nquads

        write_nquads(adjacency_ds, args.export_nq)

    t2 = time.time()
    err_proj = errors.select_columns(["doc_id", "format", "error_type", "obj", "line_no"])
    _, resumed_err = lineage.checkpoint_stage(
        err_proj, args.output, "errors", fingerprint=args.run_id, run_id=args.run_id
    )
    phases["errors_sec"] = round(time.time() - t2, 3)
    wall = time.time() - t0

    adj_manifest = lineage.read_manifest(args.output, "adjacency") or {}
    err_manifest = lineage.read_manifest(args.output, "errors") or {}
    n_triples = adj_manifest.get("total_rows", 0)
    metrics = {
        "run_id": args.run_id,
        "input": args.input,
        "replicate": args.replicate,
        "triples_out": n_triples,
        "errors_out": err_manifest.get("total_rows", 0),
        "partitions": len(adj_manifest.get("partitions", [])),
        "resumed_stages": {
            "raw_triples": resumed_parse,
            "adjacency": resumed_adj,
            "errors": resumed_err,
        },
        "wall_sec": round(wall, 3),
        **phases,
        "triples_per_sec": round(n_triples / wall, 1) if wall > 0 else 0.0,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()


def _run_corpus_job(args) -> None:
    """--pipeline corpus: curated training corpus with split, written as
    resumable partitioned Parquet + a trust report (docs in, survivors,
    kept reps, per-split rows, LSH bucket audit) in metrics.json."""
    import json as _json

    import ray
    import ray.data

    from parser_rdf_ray.pipelines.curation import (
        curation_core,
        curated_corpus_with_split,
    )
    from parser_rdf_ray.pipelines.dedup import minhash_bucket_audit
    from parser_rdf_ray.state import lineage

    t0 = time.time()
    docs = ray.data.read_parquet(
        os.path.join(args.input, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    # ONE core (quality gate + minhash clustering) feeds both the curated
    # output and the metrics below — the survivor regex pass and the LSH
    # banding used to run twice per corpus job
    core = curation_core(docs)
    survivors, _ = core
    curated = curated_corpus_with_split(docs, core=core)
    curated_ds, resumed = lineage.checkpoint_stage(
        curated, args.output, "curated", fingerprint=args.run_id, run_id=args.run_id
    )
    manifest = lineage.read_manifest(args.output, "curated") or {}

    import pyarrow as pa  # noqa: F401
    import pyarrow.compute as pc

    def split_counts(b):
        import pyarrow as pa

        t = pa.Table.from_arrays([b.column("split")], names=["split"])
        return t.group_by("split").aggregate([("split", "count")]).rename_columns(
            ["split", "n"]
        )

    per_split: dict[str, int] = {}
    for row in curated_ds.map_batches(
        split_counts, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("split").sum("n").take_all():
        per_split[row["split"]] = int(row["sum(n)"])

    wall = time.time() - t0
    metrics = {
        "run_id": args.run_id,
        "pipeline": "corpus",
        "input": args.input,
        "docs_in": docs.count(),
        "quality_survivors": survivors.count(),
        "kept": manifest.get("total_rows", 0),
        "split_rows": per_split,
        "partitions": len(manifest.get("partitions", [])),
        "resumed": resumed,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(docs.count() / wall, 1) if wall > 0 else 0.0,
        **minhash_bucket_audit(survivors),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        _json.dump(metrics, f, indent=1)
    print(_json.dumps(metrics))
    ray.shutdown()


def _run_training_set_job(args) -> None:
    """--pipeline training-set: the end-to-end composite with EVERY
    expensive stage boundary checkpointed through state/lineage —
    survivors (quality gate), kept (LSH cluster reps), decontam (gram
    existence join) and the final packed output. A re-run with the same
    --run-id skips every stage whose manifest is complete and re-reads
    its partitioned Parquet, so a run killed during decontamination
    resumes without re-running the quality scan or the LSH banding —
    the round-4 gap (composite restarted from zero on failure)."""
    import json as _json

    import ray
    import ray.data

    from parser_rdf_ray.pipelines.curation import (
        decontaminate,
        keep_set,
        quality_filter,
        training_set_tail,
    )
    from parser_rdf_ray.state import lineage

    t0 = time.time()
    docs = ray.data.read_parquet(
        os.path.join(args.input, "documents.parquet"), columns=["doc_id", "text"]
    )
    ckpt = args.checkpoint_dir
    phases: dict[str, float] = {}
    resumed: dict[str, bool] = {}

    def stage(name, make_ds, out_dir=None):
        """Checkpoint a stage boundary and record wall time + resume flag.
        ``make_ds`` is a THUNK handed to lineage.checkpoint_stage_lazy:
        keep_set() and training_set_tail() do eager driver work (LSH pair
        collect / pack's two passes) at CONSTRUCTION time, so a completed
        stage must short-circuit on its manifest BEFORE the dataset is
        built — otherwise a resume silently redoes the expensive work and
        discards it (pinned by TestTrainingSetCheckpointResume)."""
        base = out_dir or ckpt
        t = time.time()
        if base:
            out, was_resumed = lineage.checkpoint_stage_lazy(
                make_ds, base, name, fingerprint=args.run_id, run_id=args.run_id
            )
        else:
            out, was_resumed = make_ds().materialize(), False
        phases[f"{name}_sec"] = round(time.time() - t, 3)
        resumed[name] = was_resumed
        return out

    survivors = stage("survivors", lambda: quality_filter(docs))
    kept = stage("kept", lambda: keep_set(survivors))
    verdict = stage("decontam", lambda: decontaminate(docs, train_side_ds=survivors))
    final_ds = stage(
        "training_set",
        lambda: training_set_tail(survivors, kept, verdict),
        out_dir=args.output,
    )
    wall = time.time() - t0

    manifest = lineage.read_manifest(args.output, "training_set") or {}
    metrics = {
        "run_id": args.run_id,
        "pipeline": "training-set",
        "input": args.input,
        "docs_in": docs.count(),
        "survivors": survivors.count(),
        "kept": kept.count(),
        "final_rows": manifest.get("total_rows", 0),
        "partitions": len(manifest.get("partitions", [])),
        "resumed_stages": resumed,
        "wall_sec": round(wall, 3),
        **phases,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        _json.dump(metrics, f, indent=1)
    print(_json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
