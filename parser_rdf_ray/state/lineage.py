"""Per-stage lineage records + checkpoint-resume (north rule).

Every materialized stage writes partitioned Parquet under
``<checkpoint_dir>/<stage>/`` plus a ``_lineage.json`` manifest recording
run_id, input fingerprint, per-file row counts and wall time. A stage whose
manifest exists with a matching fingerprint is SKIPPED on resume and its
output re-read — checkpoint-resume of any stage, partition granularity
(file = partition). Output is never one giant file: Ray Data writes one
file per block.
"""

from __future__ import annotations

import json
import os
import time

MANIFEST = "_lineage.json"


def _read_edge_row(path: str, md, *, first: bool) -> dict:
    """First or last row of a parquet file, decoding one row group only."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    if md.num_rows == 0:
        return {}
    rg = pf.read_row_group(0 if first else md.num_row_groups - 1)
    row = rg.slice(0, 1) if first else rg.slice(rg.num_rows - 1, 1)
    return {name: row.column(name)[0].as_py() for name in row.column_names}


def _json_safe_row(row: dict) -> dict:
    # None values are DROPPED, not kept: a null in an identity column must
    # make incremental_merge_pruned's first-row completeness check fail
    # cleanly (→ documented full-re-exchange fallback) instead of slipping
    # a None into route_by_first_tuples' tuple bisect, where a None-vs-str
    # comparison raises TypeError mid-merge.
    return {k: v for k, v in row.items() if isinstance(v, (str, int, float, bool))}


def stage_dir(checkpoint_dir: str, stage: str) -> str:
    return os.path.join(checkpoint_dir, stage)


def is_complete(checkpoint_dir: str, stage: str, fingerprint: str) -> bool:
    path = os.path.join(stage_dir(checkpoint_dir, stage), MANIFEST)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return False
    return manifest.get("fingerprint") == fingerprint and manifest.get("complete") is True


def checkpoint_stage(ds, checkpoint_dir: str, stage: str, fingerprint: str, run_id: str):
    """Write a stage's output + lineage manifest; returns a Dataset reading
    the checkpoint (so downstream stages consume the materialized copy)."""
    import ray.data

    out = stage_dir(checkpoint_dir, stage)
    if is_complete(checkpoint_dir, stage, fingerprint):
        return ray.data.read_parquet(out), True

    os.makedirs(out, exist_ok=True)
    # clear stale partials from an interrupted run (manifest absent/mismatched)
    for name in os.listdir(out):
        if name != MANIFEST:
            try:
                os.remove(os.path.join(out, name))
            except OSError:
                pass
    t0 = time.time()
    ds.write_parquet(out)
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    import pyarrow.parquet as pq

    per_file = []
    total_rows = 0
    for f in files:
        path = os.path.join(out, f)
        md = pq.read_metadata(path)
        rec = {"file": f, "rows": md.num_rows, "bytes": md.serialized_size}
        # key bounds from parquet column statistics (first column = leading
        # sort key for sorted stages): lets an incremental merge prune to
        # the partitions whose key range overlaps the delta, and documents
        # the range partitioning for resume tooling
        try:
            stats = md.row_group(0).column(0).statistics if md.num_row_groups else None
            last = (
                md.row_group(md.num_row_groups - 1).column(0).statistics
                if md.num_row_groups
                else None
            )
            if stats is not None and last is not None and stats.has_min_max:
                key_min = stats.min
                key_max = last.max
                if isinstance(key_min, bytes):
                    key_min = key_min.decode("utf-8", "replace")
                if isinstance(key_max, bytes):
                    key_max = key_max.decode("utf-8", "replace")
                rec["key_column"] = md.schema.column(0).name
                rec["key_min"] = key_min
                rec["key_max"] = key_max
        except Exception:
            pass  # bounds are an optimization hint, never a correctness need
        # Full first/last row (JSON-safe scalars only): for range-partitioned
        # (sorted) stages these are the partition's exact key-tuple bounds.
        # Routing a delta row needs the FULL identity tuple — leading-column
        # (subj) bounds are ambiguous when one subject's rows straddle a
        # partition boundary (the sort splits on the full tuple), so
        # incremental_merge_pruned requires these, not key_min/key_max.
        try:
            rec["first_row"] = _json_safe_row(_read_edge_row(path, md, first=True))
            rec["last_row"] = _json_safe_row(_read_edge_row(path, md, first=False))
        except Exception:
            pass  # consumers that need exact bounds check for absence
        per_file.append(rec)
        total_rows += md.num_rows
    manifest = {
        "stage": stage,
        "run_id": run_id,
        "fingerprint": fingerprint,
        "complete": True,
        "wall_time_sec": round(time.time() - t0, 3),
        "total_rows": total_rows,
        "partitions": per_file,
        "written_at": time.time(),
    }
    with open(os.path.join(out, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return ray.data.read_parquet(out), False


def checkpoint_stage_lazy(make_ds, checkpoint_dir: str, stage: str,
                          fingerprint: str, run_id: str):
    """checkpoint_stage for EAGERLY-CONSTRUCTED datasets: ``make_ds`` is a
    thunk, invoked only when the stage is NOT already complete. Builders
    like keep_set (LSH pair collect) and training_set_tail (pack's two
    driver passes) do their expensive work at construction time, so a
    resume must short-circuit on the manifest BEFORE building the dataset
    — this keeps that rule with the manifest logic it depends on, instead
    of every caller re-implementing the resume branch."""
    import ray.data

    if is_complete(checkpoint_dir, stage, fingerprint):
        return ray.data.read_parquet(stage_dir(checkpoint_dir, stage)), True
    return checkpoint_stage(
        make_ds(), checkpoint_dir, stage, fingerprint=fingerprint, run_id=run_id
    )


def read_manifest(checkpoint_dir: str, stage: str) -> dict | None:
    path = os.path.join(stage_dir(checkpoint_dir, stage), MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
