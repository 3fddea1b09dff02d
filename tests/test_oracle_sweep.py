"""Full oracle sweep: every ``__ray_entry__.queries()`` entry compared
value-for-value against its ``oracle_sql()`` on the same parquet views,
at TWO scales — sf0.001 AND sf0.01.

This encodes the dual-scale sweep that caught the float-SUM+ROUND latent
flakes (CLAUDE.md) as a CI gate: a regression in SQL exactness fails here
before the driver runs. The compare mirrors the driver's: row count,
column-name set, then values with columns sorted by name and rows sorted
by all columns.

Run with:      python -m pytest -m oracle -q
Excluded from the default run (pytest.ini deselects ``oracle``) — the
two-scale 44-query sweep takes minutes under the 4-CPU test session.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

_QUERY_NAMES = sorted(entrymod.queries().keys())


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray.data.Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: str(list(v)) if isinstance(v, (list, np.ndarray)) else v
            )
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


@pytest.fixture(scope="session")
def oracle_con():
    import duckdb

    cons = {}
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        cons[sf_dir] = con
    yield cons
    for con in cons.values():
        con.close()


@pytest.mark.oracle
@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", _QUERY_NAMES)
def test_oracle_sweep(name, sf_dir, ray_session, oracle_con):
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        pytest.skip(f"{name}: no oracle (rows-only driver check)")
    got = _canon(_to_pandas(entrymod.queries()[name](sf_dir)))
    exp = _canon(oracle_con[sf_dir].execute(sql).df())
    # a vacuous (empty-at-this-scale) query passes value comparison
    # trivially AND breaks the driver's schema check (an empty Ray result
    # round-trips to a column-less frame) — rel_anti_join hit this before
    # its priority restriction; fail loudly instead
    assert len(exp) > 0, f"{name}@{sf_dir}: oracle result is EMPTY (vacuous query)"
    assert len(got) == len(exp), f"{name}@{sf_dir}: rows {len(got)} != {len(exp)}"
    assert list(got.columns) == list(exp.columns), (
        f"{name}@{sf_dir}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            # oracles are designed float-exact (fixed-point int sums under
            # the hood) — compare bit-tight, no epsilon hiding a drift
            ga, ea = g.to_numpy(dtype=float), e.to_numpy(dtype=float)
            same = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
            assert same.all(), f"{name}@{sf_dir}: column {c} differs"
        else:
            gl = [None if v is None or v is pd.NA else v for v in g.tolist()]
            el = [None if v is None or v is pd.NA else v for v in e.tolist()]
            assert gl == el, f"{name}@{sf_dir}: column {c} differs"


@pytest.mark.oracle
@pytest.mark.parametrize("name", ["kg_pagerank", "kg_components", "graph_triangles"])
def test_distributed_path_oracle(name, ray_session, oracle_con, monkeypatch):
    """The graph ops' DISTRIBUTED path (normally bypassed at sandbox
    scale by the size-adaptive single-task branch) against the same SQL
    oracle at sf0.01 — full-scale oracle coverage for the loop/join
    machinery, not just unit-scale path-equivalence pins."""
    monkeypatch.setenv("GRAFT_SMALL_GRAPH_MAX", "0")
    sf_dir = "/root/testdata/sf0.01"
    if sf_dir not in SF_DIRS:
        pytest.skip("sf0.01 testdata absent")
    sql = entrymod.oracle_sql()[name]
    got = _canon(_to_pandas(entrymod.queries()[name](sf_dir)))
    exp = _canon(oracle_con[sf_dir].execute(sql).df())
    assert len(got) == len(exp)
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f":
            assert (g.to_numpy(dtype=float) == e.to_numpy(dtype=float)).all(), c
        else:
            assert g.tolist() == e.tolist(), c
