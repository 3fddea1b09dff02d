"""Driver-side collection with loud ceilings.

Every ``take_all()`` in this repo collects a set that is small BY
CONSTRUCTION (owl:sameAs edges, verified near-dup pairs, per-partition
stat rows) — each call site documents why. A pathological corpus can
violate those constructions (e.g. a corpus that is one giant sameAs
clique); rather than silently OOM the driver, collects go through
``bounded_take_all``, which materializes the (small) stream in the object
store, checks the row count from block metadata (O(1) driver memory), and
raises ``DriverCollectOverflow`` naming the bound before any row reaches
the driver. ``GRAFT_DRIVER_COLLECT_CEILING`` RAISES ceilings for clusters
with a bigger head node — it is a floor applied as max(ceiling, env), so
setting it high to admit one big collect can never silently shrink the
intentionally tiny ceilings (k-means centroid rows, HLL register table)
that other call sites rely on.

Materializing first is not wasted work: several call sites previously
consumed the stream twice (count implicitly + take_all), and the pinned
blocks make ``take_all`` a pure object-store read.
"""

from __future__ import annotations

import os


class DriverCollectOverflow(RuntimeError):
    """A driver-side collect exceeded its documented smallness bound."""


def bounded_take_all(ds, *, what: str, ceiling: int) -> list[dict]:
    """``ds.take_all()`` that refuses to pull more than ``ceiling`` rows.

    ``what`` names the collection in the error so an operator of a real
    cluster knows WHICH smallness assumption their corpus broke and which
    scale path to switch to (each call site's docstring points at one).
    """
    env = os.environ.get("GRAFT_DRIVER_COLLECT_CEILING")
    if env:
        try:
            env_ceiling = int(env)
        except ValueError:
            raise ValueError(
                "GRAFT_DRIVER_COLLECT_CEILING must be an integer row count, "
                f"got {env!r}"
            ) from None
        # raise-only: never shrink a call site's intentionally tiny ceiling
        ceiling = max(ceiling, env_ceiling)
    m = ds.materialize()
    n = m.count()  # metadata-only on a materialized dataset
    if n > ceiling:
        raise DriverCollectOverflow(
            f"{what}: {n} rows exceeds the driver-collect ceiling of {ceiling}. "
            "This collection is assumed small by construction; the input breaks "
            "that assumption. Raise GRAFT_DRIVER_COLLECT_CEILING only if the "
            "driver has memory for it, otherwise use the distributed path "
            "documented at the call site."
        )
    return m.take_all()
