"""Property tests for the SQL-reproducibility contracts.

Several driver oracles are only valid because a pipeline hash is
bit-for-bit recomputable in DuckDB (dedup_simhash, text_fingerprint,
corpus_split). The driver checks them on its fixed corpus; these
hypothesis properties pin the contracts on arbitrary ASCII text so a
change to either side (or a DuckDB upgrade) fails loudly here first.

No Ray: everything runs the pure batch functions against DuckDB.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# printable ASCII without the quote/backslash classes that would need SQL
# escaping gymnastics — the CONTRACT under test is hashing, not quoting,
# and all values go through duckdb parameters (no string splicing) anyway
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=300,
)

from parser_rdf_ray.pipelines.text import FINGERPRINT_SQL

_FP_SQL = FINGERPRINT_SQL.replace(
    "FROM documents", "FROM (SELECT 0 AS doc_id, ? AS text)"
)

from parser_rdf_ray.pipelines.dedup import SIMHASH_SQL_BITS as _SIM_BITS

_SIM_SQL = rf"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(?), '\W+'), x -> x <> '') AS t
),
tok AS (SELECT unnest(t) AS tk FROM toks),
h AS (SELECT md5_number_lower(tk) AS hv FROM tok)
SELECT COALESCE((SELECT {_SIM_BITS} FROM h), CAST(0 AS UBIGINT))
"""


@settings(max_examples=40, deadline=None)
@given(_ascii_text)
def test_fingerprint_sql_contract(text):
    from parser_rdf_ray.pipelines.text import fingerprint_batch

    out = fingerprint_batch(pa.Table.from_pydict({"doc_id": [0], "text": [text]}))
    _doc, fp, dg = duckdb.execute(_FP_SQL, [text]).fetchone()
    assert out.column("fingerprint")[0].as_py() == fp
    assert out.column("digest")[0].as_py() == dg


@settings(max_examples=40, deadline=None)
@given(_ascii_text)
def test_simhash_sql_contract(text):
    from parser_rdf_ray.pipelines.dedup import simhash64

    (expected,) = duckdb.execute(_SIM_SQL, [text]).fetchone()
    assert simhash64(text) == expected


@settings(max_examples=40, deadline=None)
@given(_ascii_text)
def test_simhash_batch_equals_scalar(text):
    """The vectorized slab accumulation must equal the scalar reference on
    any input (including the empty-doc / slab-boundary edge cases)."""
    from parser_rdf_ray.pipelines.dedup import SimHashBands, simhash64

    tbl = pa.Table.from_pydict({"doc_id": [1, 2], "text": [text, "pad doc"]})
    out = SimHashBands()(tbl)
    got = {
        d: s
        for d, s in zip(
            out.column("doc_id").to_pylist(), out.column("simhash").to_pylist()
        )
    }
    assert got[1] == simhash64(text)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_hash_split_sql_contract(doc_id):
    from parser_rdf_ray.pipelines.dedup import _md5_low64

    (expected,) = duckdb.execute(
        "SELECT md5_number_lower(CAST(? AS VARCHAR)) % 100", [doc_id]
    ).fetchone()
    assert _md5_low64(str(doc_id)) % 100 == expected
