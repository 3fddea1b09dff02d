"""Range-pruned incremental KG maintenance (the 100 TB delta path).

``incremental_update`` (pipelines/kg_build.py) re-exchanges existing ∪
delta — correct anywhere, optimal at small scale. This module is the
scale path: the existing adjacency lives as a CHECKPOINTED sorted stage
(state/lineage.py manifest with per-partition key bounds, provably
disjoint), so a delta merge only needs to

1. parse + canonicalize + locally-distinct the DELTA corpus,
2. route each delta row to the existing partition whose key range owns
   it (vectorized searchsorted over the manifest's key_min boundaries),
3. merge-and-rewrite ONLY the partitions that received delta rows (one
   Ray task per touched partition: read file + delta slice → concat →
   sort → consecutive-dedup → write), and
4. reference untouched partition files unchanged (hard link when the
   filesystem allows, copy otherwise — never read, never rewritten).

Global sortedness is preserved because rows routed to partition p all
have keys in [key_min_p, key_min_{p+1}) — they can extend p's max but
never reach the next partition's min. Raw ``ray.remote`` tasks are used
for step 3 (the documented last-resort case: per-file merge with a side
input isn't expressible as a Dataset op); the partitioning assumption it
relies on is exactly the manifest's disjoint-range invariant, pinned by
tests/test_ray_stages.py::TestLineageKeyBounds.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa

from parser_rdf_ray.stages import canonicalize as canon
from parser_rdf_ray.state import lineage


def _delta_triples(new_documents_ds):
    from parser_rdf_ray.pipelines.kg_build import documents_to_raw_triples, split_errors

    raw = documents_to_raw_triples(new_documents_ds)
    ok, _errors = split_errors(raw)
    delta = ok.map_batches(
        canon.canonicalize_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return delta.map_batches(
        canon.local_distinct_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def incremental_merge_pruned(
    existing_dir: str, new_documents_ds, out_dir: str, run_id: str = "incr"
) -> dict:
    """Merge a delta corpus into the checkpointed sorted adjacency at
    ``existing_dir`` (must hold a _lineage.json with key bounds), writing
    the merged stage to ``out_dir``. Returns merge metrics including how
    many partitions were rewritten vs passed through untouched."""
    import ray

    manifest = lineage.read_manifest(os.path.dirname(existing_dir), os.path.basename(existing_dir))
    if manifest is None:
        raise ValueError(f"{existing_dir} has no _lineage.json manifest")
    parts = [p for p in manifest["partitions"] if p["rows"] > 0 and "key_min" in p]
    parts.sort(key=lambda p: p["key_min"])
    if not parts:
        raise ValueError(f"{existing_dir} manifest has no non-empty partitions with bounds")
    boundaries = [p["key_min"] for p in parts]

    # 1-2. delta rows, routed by partition id (vectorized searchsorted)
    bounds_arr = np.array(boundaries[1:], dtype=object)  # route to [min_p, min_{p+1})

    def assign_pid(batch: pa.Table) -> pa.Table:
        subj = np.asarray(batch.column("subj").to_pylist(), dtype=object)
        pid = np.searchsorted(bounds_arr, subj, side="right").astype(np.int32)
        return batch.append_column("pid", pa.array(pid, pa.int32()))

    delta = _delta_triples(new_documents_ds).map_batches(
        assign_pid, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # Collect the routed delta grouped by pid. The delta is the small side
    # by definition; at larger delta sizes swap take_all for a groupby
    # shuffle feeding the merge tasks per-partition.
    by_pid: dict[int, list[dict]] = {}
    for row in delta.take_all():
        by_pid.setdefault(row.pop("pid"), []).append(row)

    os.makedirs(out_dir, exist_ok=True)
    identity = canon.ADJACENCY_IDENTITY_COLS

    @ray.remote
    def merge_partition(src_path: str, rows: list[dict], dst_path: str) -> int:
        import pyarrow.parquet as pq

        existing = pq.read_table(src_path, columns=identity)
        add = None
        if rows:
            # cast to the stored schema (checkpoints written from
            # polars-sorted blocks carry large_string columns)
            add = pa.Table.from_pylist(rows).select(list(identity)).cast(existing.schema)
        merged = pa.concat_tables([existing, add]) if add is not None else existing
        merged = merged.sort_by([(c, "ascending") for c in identity])
        merged = canon.drop_consecutive_dup_rows(merged)
        pq.write_table(merged, dst_path)
        return merged.num_rows

    t0 = time.time()
    futures = {}
    untouched = 0
    for pid, part in enumerate(parts):
        src = os.path.join(existing_dir, part["file"])
        dst = os.path.join(out_dir, part["file"])
        rows = by_pid.get(pid)
        if not rows:
            # pass-through: link (or copy) without reading
            try:
                os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
            untouched += 1
        else:
            futures[pid] = merge_partition.remote(src, rows, dst)
    merged_rows = {pid: ray.get(f) for pid, f in futures.items()}
    rows_out = sum(merged_rows.values()) + sum(
        p["rows"] for pid, p in enumerate(parts) if pid not in merged_rows
    )

    metrics = {
        "run_id": run_id,
        "partitions_total": len(parts),
        "partitions_rewritten": len(futures),
        "partitions_untouched": untouched,
        "delta_rows_routed": sum(len(v) for v in by_pid.values()),
        "rows_out": rows_out,
        "merge_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(out_dir, "_incremental_merge.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics
