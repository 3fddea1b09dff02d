"""Bit-exactness pins for the vectorized lane-parallel MD5 (md5vec).

The md5-low64 value gates splits, decontam membership, simhash tokens,
sketches and bloom keys, and the SQL oracles replay the SAME bits via
DuckDB's md5_number_lower — so this hash must match hashlib exactly for
every input, including the single-block/fallback boundary (55/56 bytes),
multi-byte UTF-8, the empty string, and slab-boundary batch sizes.

Pure-function tests: no Ray session needed.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

from parser_rdf_ray import md5vec
from parser_rdf_ray.md5vec import (
    SINGLE_BLOCK_MAX,
    md5_low64,
    md5_low64_ids,
    md5_low64_prefixed,
)


def ref64(msg: bytes) -> int:
    return int.from_bytes(hashlib.md5(msg).digest()[8:16], "little")


@pytest.fixture(autouse=True)
def force_vector_path(monkeypatch):
    """Exactness tests must exercise the LANE path: without this, inputs
    under VECTOR_MIN_ROWS take the per-row hashlib fallback and the
    vectorized MD5 goes untested. test_small_batch_fallback pins the
    other side."""
    monkeypatch.setattr(md5vec, "VECTOR_MIN_ROWS", 0)


class TestBitExactness:
    def test_every_length_0_to_200(self):
        rng = random.Random(7)
        msgs = [bytes(rng.randrange(256) for _ in range(n)) for n in range(201)]
        rng.shuffle(msgs)  # interleave single-block and fallback rows
        got = md5_low64(pa.array(msgs, pa.binary()))
        exp = np.array([ref64(m) for m in msgs], dtype=np.uint64)
        assert np.array_equal(got, exp)

    def test_small_batch_fallback_matches(self, monkeypatch):
        # restore the real threshold: a sub-threshold batch takes the
        # per-row loop and must produce the same bits as the lane path
        monkeypatch.setattr(md5vec, "VECTOR_MIN_ROWS", 1024)
        strs = [f"id{i}" for i in range(50)] + ["ünï", "x" * 80]
        got = md5_low64(strs)
        assert [int(v) for v in got] == [ref64(s.encode()) for s in strs]

    def test_single_block_boundary(self):
        msgs = ["x" * SINGLE_BLOCK_MAX, "y" * (SINGLE_BLOCK_MAX + 1), ""]
        got = md5_low64(msgs)
        assert [int(v) for v in got] == [ref64(m.encode()) for m in msgs]

    def test_multibyte_utf8(self):
        strs = ["ünïcode", "日本語テキスト", "🙂" * 20, "mixed-ascii-日本"]
        got = md5_low64(strs)
        assert [int(v) for v in got] == [ref64(s.encode()) for s in strs]

    def test_large_string_chunked_and_sliced(self):
        strs = ["a", "bb", "ccc", "dddd", "eeeee"]
        exp = np.array([ref64(s.encode()) for s in strs], dtype=np.uint64)
        chunked = pa.chunked_array(
            [pa.array(strs[:2], pa.large_string()), pa.array(strs[2:], pa.large_string())]
        )
        assert np.array_equal(md5_low64(chunked), exp)
        assert np.array_equal(md5_low64(pa.array(strs)[1:4]), exp[1:4])

    def test_slab_boundary_batch(self):
        n = md5vec._SLAB + 17  # force the multi-slab path
        strs = [f"t{i}" for i in range(n)]
        got = md5_low64(strs)
        spots = [0, 1, md5vec._SLAB - 1, md5vec._SLAB, n - 1]
        for i in spots:
            assert int(got[i]) == ref64(strs[i].encode())

    def test_nulls_rejected(self):
        with pytest.raises(ValueError):
            md5_low64(pa.array(["a", None]))

    def test_matches_duckdb_md5_number_lower(self):
        import duckdb

        vals = ["hello", "", "42", "ünï", "x" * 60]
        rows = duckdb.sql(
            "SELECT md5_number_lower(v) FROM (SELECT UNNEST(?) AS v)", params=[vals]
        ).fetchall()
        assert [int(r[0]) for r in rows] == [int(v) for v in md5_low64(vals)]


class TestIdAndPrefixForms:
    def test_ids_match_decimal_string_hash(self):
        ids = np.array([0, 1, -5, 99, 123456789012345], dtype=np.int64)
        got = md5_low64_ids(ids)
        assert [int(v) for v in got] == [ref64(str(i).encode()) for i in ids]
        # pyarrow input path
        assert np.array_equal(md5_low64_ids(pa.array(ids)), got)

    def test_prefixed_matches_fstring_hash(self):
        terms = ["apple", "bü", ""]
        got = md5_low64_prefixed("3:", terms)
        assert [int(v) for v in got] == [ref64(f"3:{t}".encode()) for t in terms]

    def test_scalar_contract_unchanged(self):
        # the scalar _md5_low64 (the documented contract function) and the
        # vectorized form agree — the SQL replay depends on it
        from parser_rdf_ray.pipelines.dedup import _md5_low64

        for s in ["token", "42", "ünï"]:
            assert _md5_low64(s) == int(md5_low64([s])[0])


class TestHypothesisFuzz:
    """Property fuzz: the lane path must agree with hashlib on ARBITRARY
    byte strings and unicode text (any length, any alignment mix within
    one batch)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=40))
    def test_arbitrary_bytes(self, msgs):
        got = md5_low64(pa.array(msgs, pa.binary()))
        assert [int(v) for v in got] == [ref64(m) for m in msgs]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=40))
    def test_arbitrary_unicode(self, strs):
        got = md5_low64(strs)
        assert [int(v) for v in got] == [ref64(s.encode()) for s in strs]

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40))
    def test_arbitrary_ids(self, ids):
        import numpy as np

        got = md5_low64_ids(np.array(ids, dtype=np.int64))
        assert [int(v) for v in got] == [ref64(str(i).encode()) for i in ids]
