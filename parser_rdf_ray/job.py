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
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)

    from parser_rdf_ray.pipelines.kg_build import (
        build_kg,
        documents_to_raw_triples,
        split_errors,
        write_adjacency,
    )
    from parser_rdf_ray.sources.documents import read_span_documents
    from parser_rdf_ray.stages import canonicalize as canon

    t0 = time.time()
    docs = read_span_documents(args.input, replicate=args.replicate)

    if args.resolve_sameas:
        # union-find path: build_kg owns linking + rename
        adjacency, errors = build_kg(
            docs, resolve_sameas=True, checkpoint_dir=args.checkpoint_dir, run_id=args.run_id
        )
    else:
        # ONE parse pass for both outputs: raw (triples+errors union) is the
        # checkpointed stage, so a resume skips parsing entirely and the
        # errors sink doesn't re-run the parse.
        raw = documents_to_raw_triples(docs)
        if args.checkpoint_dir:
            from parser_rdf_ray.state import lineage

            raw, _resumed = lineage.checkpoint_stage(
                raw, args.checkpoint_dir, "raw_triples", fingerprint=args.run_id, run_id=args.run_id
            )
        else:
            raw = raw.materialize()
        ok, errors = split_errors(raw)
        triples = ok.map_batches(
            canon.canonicalize_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        adjacency = canon.dedup_triples_sorted(triples)

    adj_dir = os.path.join(args.output, "adjacency")
    err_dir = os.path.join(args.output, "errors")
    for d in (adj_dir, err_dir):
        os.makedirs(d, exist_ok=True)
        for name in os.listdir(d):  # stale files from an interrupted run
            if name.endswith(".parquet"):
                os.remove(os.path.join(d, name))
    write_adjacency(adjacency, adj_dir)
    t_adj = time.time() - t0

    errors.select_columns(["doc_id", "format", "error_type", "obj", "line_no"]).write_parquet(
        err_dir
    )
    wall = time.time() - t0

    import pyarrow.parquet as pq

    n_triples = sum(
        pq.read_metadata(os.path.join(adj_dir, f)).num_rows
        for f in os.listdir(adj_dir)
        if f.endswith(".parquet")
    )
    metrics = {
        "run_id": args.run_id,
        "input": args.input,
        "replicate": args.replicate,
        "triples_out": n_triples,
        "wall_sec": round(wall, 3),
        "adjacency_sec": round(t_adj, 3),
        "triples_per_sec": round(n_triples / wall, 1) if wall > 0 else 0.0,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
