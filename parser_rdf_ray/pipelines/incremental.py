"""Range-pruned incremental KG maintenance (the 100 TB delta path).

``incremental_update`` (pipelines/kg_build.py) re-exchanges existing ∪
delta — correct anywhere, optimal at small scale. This module is the
scale path: the existing adjacency lives as a CHECKPOINTED sorted stage
(state/lineage.py manifest with per-partition key bounds, provably
disjoint), so a delta merge only needs to

1. parse + canonicalize + locally-distinct the DELTA corpus,
2. route each delta row to the existing partition whose key range owns
   it — by FULL identity-tuple bisect over the manifest's exact
   first-row tuples (leading-column bounds are NOT enough: the sort
   splits on the whole tuple, so one subject can span two partitions),
3. merge-and-rewrite ONLY the partitions that received delta rows via a
   groupby(pid) shuffle feeding one merge task per touched partition
   (read file + delta group → concat → sort → consecutive-dedup →
   write) — delta rows never visit the driver, and
4. reference untouched partition files unchanged (hard link when the
   filesystem allows, copy otherwise — never read, never rewritten).

Global sortedness is preserved because rows routed to partition p all
have tuples in [T_p, T_{p+1}) — they can extend p's max but never reach
the next partition's first tuple. Any non-empty partition missing its
recorded first row makes pruned merge unsafe → raise, caller falls back
to the full re-exchange (kg_build.incremental_update). Pinned by
tests/test_ray_stages.py::TestIncrementalMergePruned (multiset equality
+ cross-file ordering) and ::TestLineageKeyBounds.
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


def route_by_first_tuples(
    batch: pa.Table, first_tuples: list[tuple], identity_cols: list[str]
) -> pa.Table:
    """Append a ``pid`` column: the index of the partition owning each
    row's FULL identity tuple (bisect over sorted exact first-row tuples;
    partition p owns [T_p, T_{p+1}), p=0 also owns everything below T_0).

    A boundary subject (same subj as a partition's first row but a smaller
    full tuple) correctly routes to the PREVIOUS partition — the case
    leading-column routing gets wrong."""
    import bisect

    cols = [batch.column(c).to_pylist() for c in identity_cols]
    pids = np.fromiter(
        (max(0, bisect.bisect_right(first_tuples, t) - 1) for t in zip(*cols)),
        dtype=np.int32,
        count=batch.num_rows,
    )
    return batch.append_column("pid", pa.array(pids, pa.int32()))


def incremental_merge_pruned(
    existing_dir: str, new_documents_ds, out_dir: str, run_id: str = "incr"
) -> dict:
    """Merge a delta corpus into the checkpointed sorted adjacency at
    ``existing_dir`` (must hold a _lineage.json with full first-row tuple
    bounds), writing the merged stage to ``out_dir``. Returns merge metrics
    including how many partitions were rewritten vs passed through.

    Routing is by the FULL identity tuple against each partition's exact
    first row: the checkpoint is range-partitioned on the whole tuple, so a
    single subject can legally span two partitions — leading-column (subj)
    bounds would mis-route boundary subjects, leaving duplicates and
    breaking global order. Partitions lacking the recorded first row (old
    manifests, or files whose stats read failed) make pruned merge unsafe:
    this raises, and the caller falls back to the full re-exchange path
    (kg_build.incremental_update), which needs no bounds at all.
    """
    manifest = lineage.read_manifest(os.path.dirname(existing_dir), os.path.basename(existing_dir))
    if manifest is None:
        raise ValueError(f"{existing_dir} has no _lineage.json manifest")
    identity = canon.ADJACENCY_IDENTITY_COLS
    nonempty = [p for p in manifest["partitions"] if p["rows"] > 0]
    if not nonempty:
        raise ValueError(f"{existing_dir} manifest has no non-empty partitions")
    missing = [
        p["file"]
        for p in nonempty
        if not all(c in p.get("first_row", {}) for c in identity)
    ]
    if missing:
        raise ValueError(
            "pruned merge needs full first-row tuple bounds for every "
            f"non-empty partition; missing for {missing} — use the full "
            "re-exchange path (incremental_update) instead"
        )
    parts = sorted(nonempty, key=lambda p: tuple(p["first_row"][c] for c in identity))
    first_tuples = [tuple(p["first_row"][c] for c in identity) for p in parts]
    src_paths = [os.path.join(existing_dir, p["file"]) for p in parts]
    dst_paths = [os.path.join(out_dir, p["file"]) for p in parts]

    # 1-2. delta rows routed by full-tuple bisect: partition p owns
    # [T_p, T_{p+1}) and p=0 additionally owns (-inf, T_0)
    def assign_pid(batch: pa.Table) -> pa.Table:
        return route_by_first_tuples(batch, first_tuples, identity)

    delta = _delta_triples(new_documents_ds).map_batches(
        assign_pid, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    os.makedirs(out_dir, exist_ok=True)

    # 3. groupby(pid) shuffle feeds one merge task per TOUCHED partition —
    # delta rows never visit the driver. Per-group dispatch is fine here:
    # group count is bounded by the partition count, not the row count.
    def merge_partition(group: pa.Table) -> pa.Table:
        # Runs INSIDE a Ray worker task, so src/dst paths must be visible
        # from every node: single-node here; on a multi-node cluster the
        # checkpoint dir must live on a shared filesystem (NFS/FUSE-mounted
        # object store). Output is deterministic, so a Ray task RETRY
        # re-writing the same file is benign — and the tmp-file + atomic
        # rename below means a retry killed mid-write can never leave a
        # torn parquet file at the final path.
        import os
        import pyarrow.parquet as pq

        pid = group.column("pid")[0].as_py()
        existing = pq.read_table(src_paths[pid], columns=identity)
        # cast to the stored schema (checkpoints written from
        # polars-sorted blocks carry large_string columns)
        add = group.select(identity).cast(existing.schema)
        merged = pa.concat_tables([existing, add])
        merged = merged.sort_by([(c, "ascending") for c in identity])
        merged = canon.drop_consecutive_dup_rows(merged)
        tmp = dst_paths[pid] + f".tmp.{os.getpid()}"
        pq.write_table(merged, tmp)
        os.replace(tmp, dst_paths[pid])
        return pa.Table.from_pydict(
            {"pid": [pid], "rows_out": [merged.num_rows], "delta_rows": [group.num_rows]},
            schema=pa.schema(
                [("pid", pa.int32()), ("rows_out", pa.int64()), ("delta_rows", pa.int64())]
            ),
        )

    t0 = time.time()
    from parser_rdf_ray.collect import bounded_take_all

    stats = delta.groupby("pid").map_groups(merge_partition, batch_format="pyarrow")
    # one tiny row per touched partition; ceiling = a loud failure if the
    # partition count itself ever stops being driver-small
    stat_rows = bounded_take_all(stats, what="incremental-merge partition stats", ceiling=1_000_000)
    merged_rows = {r["pid"]: r["rows_out"] for r in stat_rows}
    delta_rows_routed = sum(r["delta_rows"] for r in stat_rows)

    untouched = 0
    for pid in range(len(parts)):
        if pid in merged_rows:
            continue
        # pass-through: link (or copy) without reading
        try:
            os.link(src_paths[pid], dst_paths[pid])
        except OSError:
            shutil.copyfile(src_paths[pid], dst_paths[pid])
        untouched += 1
    rows_out = sum(merged_rows.values()) + sum(
        p["rows"] for pid, p in enumerate(parts) if pid not in merged_rows
    )

    metrics = {
        "run_id": run_id,
        "partitions_total": len(parts),
        "partitions_rewritten": len(merged_rows),
        "partitions_untouched": untouched,
        "delta_rows_routed": int(delta_rows_routed),
        "rows_out": rows_out,
        "merge_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(out_dir, "_incremental_merge.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics
