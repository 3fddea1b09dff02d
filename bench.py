#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline KG-build pipeline + representative operator
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE
JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "triples_out": ..., "triples_per_sec": ...}

--scaling: run the headline pipeline in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and report both throughputs
plus scaling efficiency (the sandbox stand-in for the N vs 4N cluster-size
criterion; see BASELINE.md).

--headline-only: internal mode used by --scaling subprocesses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )


def run_headline(sf_dir: str) -> dict:
    """Headline: full KG build (assemble → parse → canonicalize → dedup →
    sort → count). Returns wall time + triple count."""
    from parser_rdf_ray.pipelines.kg_build import build_kg
    from parser_rdf_ray.sources.documents import read_span_documents

    t0 = time.time()
    adjacency, errors = build_kg(read_span_documents(sf_dir))
    n_triples = adjacency.count()
    n_errors = errors.count()
    dt = time.time() - t0
    return {
        "sec": dt,
        "triples_out": n_triples,
        "errors": n_errors,
        "triples_per_sec": n_triples / dt if dt > 0 else 0.0,
    }


def run_pipelines(sf_dir: str) -> dict[str, float]:
    """Representative per-pipeline timings for the driver record."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    picks = [
        "kg_triples",
        "kg_classes",
        "kg_prefixes",
        "dedup_exact",
        "dedup_minhash",
        "text_quality",
        "text_langid",
        "knn_cosine",
        "embedding_near_dup",
        "media_features",
        "rel_lineitem_agg",
        "rel_join_topk",
        "rel_events_window",
    ]
    out: dict[str, float] = {}
    for name in picks:
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume the stream (count() avoids collecting payloads)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for n in (8, 32):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(n)
            env["GRAFT_SF_DIR"] = SF_DIR
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env,
                capture_output=True,
                text=True,
                timeout=3600,
            )
            line = proc.stdout.strip().splitlines()[-1]
            results[n] = json.loads(line)
        thr8 = results[8]["triples_per_sec"]
        thr32 = results[32]["triples_per_sec"]
        efficiency = (thr32 / thr8) / (32 / 8) if thr8 > 0 else 0.0
        print(
            json.dumps(
                {
                    "metric": "kg_build_scaling_efficiency_8_to_32_cpus",
                    "value": round(efficiency, 4),
                    "unit": "efficiency",
                    "throughput_8cpu_triples_per_sec": round(thr8, 1),
                    "throughput_32cpu_triples_per_sec": round(thr32, 1),
                    "sec_8cpu": round(results[8]["sec"], 2),
                    "sec_32cpu": round(results[32]["sec"], 2),
                    "sf": SF_DIR,
                }
            )
        )
        return

    _init_ray(NUM_CPUS)
    headline = run_headline(SF_DIR)

    if "--headline-only" in sys.argv:
        print(
            json.dumps(
                {
                    "metric": "kg_build_end_to_end",
                    "value": round(headline["sec"], 3),
                    "unit": "sec",
                    "sf": SF_DIR,
                    "num_cpus": NUM_CPUS,
                    "sec": headline["sec"],
                    "triples_out": headline["triples_out"],
                    "triples_per_sec": round(headline["triples_per_sec"], 1),
                }
            )
        )
        import ray

        ray.shutdown()
        return

    queries = run_pipelines(SF_DIR)
    print(
        json.dumps(
            {
                "metric": "kg_build_end_to_end",
                "value": round(headline["sec"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "triples_out": headline["triples_out"],
                "errors": headline["errors"],
                "triples_per_sec": round(headline["triples_per_sec"], 1),
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
