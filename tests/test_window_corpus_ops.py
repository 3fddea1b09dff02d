"""Pins for the round-3 window/corpus operators: exact group quantiles,
dense rank, inter-event gaps, stratified sampling, blocklist filter,
cross-corpus dedup, term redaction.

Each test compares the distributed plan against an independent
pandas/numpy implementation on synthetic inputs sized to span multiple
blocks, so the cross-block machinery (driver rank location, prefix
offsets, digest-run scans) is actually exercised — single-block inputs
would vacuously pass.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low64(s: str) -> int:
    # same convention as parser_rdf_ray.pipelines.dedup._md5_low64
    # (== DuckDB md5_number_lower): low 8 md5 bytes, little-endian
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


class TestGroupQuantiles:
    def test_matches_rank_formula(self, ray_session, tmp_path):
        """percentile_disc = element at 1-based rank max(1, ceil(q·n)) of
        the group sorted by integer cents — checked against a direct numpy
        computation, with group sizes chosen so ranks land both mid-block
        and at block boundaries."""
        from parser_rdf_ray.pipelines.relational import group_quantiles

        rng = np.random.RandomState(7)
        groups = ["A"] * 1000 + ["B"] * 37 + ["C"] * 1  # big / small / singleton
        prices = np.round(rng.uniform(1.0, 500.0, len(groups)) * 100) / 100.0
        df = pd.DataFrame({"o_orderpriority": groups, "o_totalprice": prices})
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "orders.parquet")

        got = (
            group_quantiles(str(sf))
            .to_pandas()
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )

        for _, row in got.iterrows():
            grp = row["o_orderpriority"]
            cents = np.sort(
                np.round(df[df.o_orderpriority == grp].o_totalprice.values * 100).astype(
                    np.int64
                )
            )
            n = len(cents)
            assert row["n_orders"] == n
            for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
                r = max(1, math.ceil(q * n))
                assert row[col] == cents[r - 1] / 100.0, (grp, q)

    def test_singleton_group_all_quantiles_equal(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import group_quantiles

        df = pd.DataFrame(
            {"o_orderpriority": ["only"], "o_totalprice": [123.45]}
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "orders.parquet")
        got = group_quantiles(str(sf)).to_pandas()
        assert got.iloc[0][["p50", "p90", "p99"]].tolist() == [123.45] * 3


class TestDenseRank:
    def test_matches_pandas_dense_rank(self, ray_session, tmp_path):
        """Per-nation dense rank over descending balance, with heavy
        balance duplication so distinct-value counting (not row counting)
        is what must propagate across blocks."""
        from parser_rdf_ray.pipelines.relational import dense_rank_customers

        rng = np.random.RandomState(13)
        n = 3000
        df = pd.DataFrame(
            {
                "c_custkey": np.arange(n, dtype=np.int64),
                "c_nationkey": rng.randint(0, 5, n).astype(np.int32),
                # few distinct values => ties everywhere, incl. across blocks
                "c_acctbal": rng.choice([10.25, 10.25, 500.0, 499.99, -7.5], n),
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "customer.parquet")

        got = (
            dense_rank_customers(str(sf))
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        cents = np.round(df.c_acctbal.values * 100).astype(np.int64)
        expected = (
            pd.Series(cents)
            .groupby(df.c_nationkey.values)
            .rank(method="dense", ascending=False)
            .astype(np.int64)
        )
        assert len(got) == n
        assert got.balance_rank.tolist() == expected.tolist()
        assert got.c_acctbal.tolist() == (cents / 100.0).tolist()

    def test_rank_one_per_nation(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import dense_rank_customers

        df = pd.DataFrame(
            {
                "c_custkey": [1, 2, 3, 4],
                "c_nationkey": [0, 0, 1, 1],
                "c_acctbal": [5.0, 9.0, 9.0, 9.0],
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "customer.parquet")
        got = dense_rank_customers(str(sf)).to_pandas().sort_values("c_custkey")
        assert got.balance_rank.tolist() == [2, 1, 1, 1]


class TestUserEventGaps:
    def test_matches_pandas_diff(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import user_event_gaps

        rng = np.random.RandomState(3)
        base = pd.Timestamp("2025-06-01")
        rows = []
        eid = 0
        for uid in range(8):
            for _ in range(1 if uid == 0 else 50):  # uid 0: single event
                rows.append(
                    {
                        "user_id": uid,
                        "event_id": eid,
                        "ts": base + pd.Timedelta(seconds=int(rng.randint(0, 100000))),
                    }
                )
                eid += 1
        df = pd.DataFrame(rows)
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "events.parquet")

        got = (
            user_event_gaps(str(sf))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            ts = np.sort(
                df[df.user_id == row["user_id"]].ts.values.astype("datetime64[us]").astype(
                    np.int64
                )
            )
            gaps = np.diff(ts)
            assert row["n_events"] == len(ts)
            assert row["max_gap_us"] == (gaps.max() if len(gaps) else 0)
            assert row["total_gap_us"] == (gaps.sum() if len(gaps) else 0)


class TestStratifiedSample:
    def _docs(self, n):
        langs = ["en", "de", "zh", "fr"]
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": [langs[i % 4] for i in range(n)],
            }
        )

    def test_membership_matches_hash_rule(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import stratified_sample

        df = self._docs(400)
        rates = {"en": 30, "zh": 100, "fr": 0}
        got = (
            stratified_sample(ray.data.from_pandas(df), rates, default_pct=10)
            .to_pandas()
            .sort_values("doc_id")
        )
        keep = [
            _md5_low64(str(i)) % 100 < rates.get(lang, 10)
            for i, lang in zip(df.doc_id, df.lang)
        ]
        assert got.doc_id.tolist() == df.doc_id[keep].tolist()
        assert "fr" not in set(got.lang)  # 0% stratum fully dropped
        assert (got.lang == "zh").sum() == 100  # 100% stratum fully kept

    def test_stable_under_corpus_growth(self, ray_session):
        """A document's fate is a pure function of doc_id — doubling the
        corpus must not change which of the original docs are kept (the
        resumable-ingest property)."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import stratified_sample

        rates = {"en": 40}
        small = (
            stratified_sample(ray.data.from_pandas(self._docs(200)), rates)
            .to_pandas()
        )
        big = (
            stratified_sample(ray.data.from_pandas(self._docs(400)), rates)
            .to_pandas()
        )
        assert set(small.doc_id) == {i for i in big.doc_id if i < 200}


class TestFilterBlocklist:
    def test_drops_exactly_blocked_sources(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import filter_blocklist

        df = pd.DataFrame(
            {
                "doc_id": np.arange(100, dtype=np.int64),
                "source": [f"src{i % 10}" for i in range(100)],
            }
        )
        got = (
            filter_blocklist(ray.data.from_pandas(df), ["src2", "src7"])
            .to_pandas()
            .sort_values("doc_id")
        )
        assert len(got) == 80
        assert not set(got.source) & {"src2", "src7"}
        assert got.doc_id.tolist() == df.doc_id[~df.source.isin(["src2", "src7"])].tolist()

    def test_empty_blocklist_keeps_all(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import filter_blocklist

        df = pd.DataFrame({"doc_id": [1, 2], "source": ["a", "b"]})
        assert filter_blocklist(ray.data.from_pandas(df), []).count() == 2


class TestCrossCorpusDedup:
    def test_matches_set_membership(self, ray_session):
        """New doc is dup iff its text appears among existing docs —
        checked against a direct set lookup, with texts duplicated
        within-new (must NOT count), within-existing, and across."""
        import ray.data

        from parser_rdf_ray.pipelines.dedup import cross_corpus_dedup

        rng = np.random.RandomState(5)
        texts = [f"text variant {rng.randint(0, 60)}" for _ in range(300)]
        df = pd.DataFrame(
            {"doc_id": np.arange(300, dtype=np.int64), "text": texts}
        )
        pct = 70
        got = (
            cross_corpus_dedup(ray.data.from_pandas(df), existing_pct=pct)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        existing_mask = [
            _md5_low64(str(i)) % 100 < pct for i in df.doc_id
        ]
        existing_texts = set(df.text[existing_mask])
        new = df[~np.array(existing_mask)]
        assert got.doc_id.tolist() == new.doc_id.tolist()
        expected = [int(t in existing_texts) for t in new.text]
        assert got.is_dup.tolist() == expected
        assert 0 < sum(expected) < len(expected)  # both outcomes exercised

    def test_new_only_duplicates_not_marked(self, ray_session):
        """Two new docs sharing a text that no existing doc has are NOT
        cross-corpus duplicates."""
        import ray.data

        from parser_rdf_ray.pipelines.dedup import cross_corpus_dedup

        # choose ids so membership is deterministic under the md5 rule
        ids = list(range(40))
        new_ids = [i for i in ids if _md5_low64(str(i)) % 100 >= 50][:2]
        df = pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "text": [
                    "shared-new-only" if i in new_ids else f"unique {i}"
                    for i in ids
                ],
            }
        )
        got = cross_corpus_dedup(ray.data.from_pandas(df), existing_pct=50).to_pandas()
        marked = got[got.doc_id.isin(new_ids)]
        assert (marked.is_dup == 0).all()


class TestRedactTerms:
    def test_matches_python_re(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.text import redact_terms

        texts = [
            "the key to the merge is the window",
            "keys and merges do not match whole words",  # boundary: no hits
            "key key key",
            "no terms here",
            "window",
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = (
            redact_terms(ray.data.from_pandas(df), ["key", "merge", "window"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pat = re.compile(r"\b(?:key|merge|window)\b")
        for i, t in enumerate(texts):
            red = pat.sub("[REDACTED]", t)
            assert got.n_redacted[i] == len(pat.findall(t)), t
            assert got.redacted_len[i] == len(red)
            assert got.redacted_md5[i] == hashlib.md5(red.encode()).hexdigest()
        assert got.n_redacted.tolist() == [3, 0, 3, 0, 1]


class TestMergeJoin:
    def test_matches_pandas_inner_join(self, ray_session, tmp_path):
        """Sort-merge join vs pandas merge: multi-order customers,
        customers with no orders, and orders with a dangling custkey
        (must drop — inner join)."""
        from parser_rdf_ray.pipelines.relational import orders_customer_merge_join

        rng = np.random.RandomState(17)
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(100, dtype=np.int64),
                "c_name": [f"Customer#{i}" for i in range(100)],
                "c_mktsegment": [f"SEG{i % 4}" for i in range(100)],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(2000, dtype=np.int64),
                # keys 0..119: 100..119 dangle (no customer row)
                "o_custkey": rng.randint(0, 120, 2000).astype(np.int64),
                "o_totalprice": np.round(rng.uniform(1, 1000, 2000) * 100) / 100,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(cust, preserve_index=False), sf / "customer.parquet")
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), sf / "orders.parquet")

        got = (
            orders_customer_merge_join(str(sf))
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        exp = (
            orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        assert len(got) == len(exp) < len(orders)  # some orders dangled
        assert got.o_orderkey.tolist() == exp.o_orderkey.tolist()
        assert got.c_name.tolist() == exp.c_name.tolist()
        assert got.c_mktsegment.tolist() == exp.c_mktsegment.tolist()
        assert got.o_totalprice.tolist() == exp.o_totalprice.tolist()


def _tagged_join_batch(build_keys, probe_keys):
    """One co-partitioned block in the merge join's tagged union shape."""
    nb, np_ = len(build_keys), len(probe_keys)
    return pa.Table.from_pydict(
        {
            "key": list(build_keys) + list(probe_keys),
            "salt": [0] * (nb + np_),
            "kind": pa.array([0] * nb + [1] * np_, pa.int8()),
            "o_orderkey": [None] * nb + list(range(np_)),
            "cents": [None] * nb + [100 * (i + 1) for i in range(np_)],
            "c_name": [f"B{k}:{i}" for i, k in enumerate(build_keys)] + [None] * np_,
            "c_mktsegment": [f"S{k}" for k in build_keys] + [None] * np_,
        }
    )


class TestMergeJoinManyToMany:
    """merge_join_pairing: the build side need NOT be unique — every
    probe row pairs with EVERY build row of its run (B×P), matching
    pandas merge exactly; 'left' keeps unmatched probes once."""

    def _pairs(self, batch, how):
        from parser_rdf_ray.pipelines.relational import merge_join_pairing

        batch, probe_take, build_take = merge_join_pairing(
            batch, ["key", "salt"], how
        )
        probe = batch.take(probe_take)
        return pd.DataFrame(
            {
                "key": probe.column("key").to_pylist(),
                "o_orderkey": probe.column("o_orderkey").to_pylist(),
                "c_name": batch.column("c_name").take(build_take).to_pylist(),
            }
        ).sort_values(["o_orderkey", "c_name"], na_position="last").reset_index(drop=True)

    def test_duplicate_build_keys_fan_out(self):
        # key 7 has THREE build rows; key 9 has one; key 4 has none
        batch = _tagged_join_batch([7, 7, 7, 9], [7, 7, 9, 4])
        got = self._pairs(batch, "inner")
        # 2 probes on key 7 × 3 builds + 1 probe on key 9 × 1 build = 7 rows
        assert len(got) == 7
        build = pd.DataFrame(
            {"key": [7, 7, 7, 9], "c_name": ["B7:0", "B7:1", "B7:2", "B9:3"]}
        )
        probe = pd.DataFrame({"key": [7, 7, 9, 4], "o_orderkey": [0, 1, 2, 3]})
        exp = probe.merge(build, on="key").sort_values(
            ["o_orderkey", "c_name"]
        ).reset_index(drop=True)
        assert got.equals(exp[["key", "o_orderkey", "c_name"]])

    def test_left_keeps_unmatched_probe_once(self):
        batch = _tagged_join_batch([7, 7], [7, 4])
        got = self._pairs(batch, "left")
        assert len(got) == 3  # probe@7 × 2 builds + probe@4 × 1 null
        assert got[got.key == 4].c_name.isna().all()

    def test_unique_build_reduces_to_classic(self):
        batch = _tagged_join_batch([1, 2, 3], [1, 1, 2, 9])
        got = self._pairs(batch, "inner")
        assert got.o_orderkey.tolist() == [0, 1, 2]
        assert got.c_name.tolist() == ["B1:0", "B1:0", "B2:1"]


class TestMergeJoinSalting:
    def test_salted_output_equals_unsalted(self, ray_session, tmp_path):
        """salt_buckets=K (probe salting + K× build replication) must be
        bit-equal to the unsalted plan — the hot-key escape hatch changes
        partitioning only."""
        from parser_rdf_ray.pipelines.relational import orders_customer_merge_join

        rng = np.random.RandomState(23)
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(20, dtype=np.int64),
                "c_name": [f"Customer#{i}" for i in range(20)],
                "c_mktsegment": [f"SEG{i % 3}" for i in range(20)],
            }
        )
        # HOT KEY: 80% of orders hit custkey 5
        keys = np.where(rng.uniform(size=3000) < 0.8, 5,
                        rng.randint(0, 25, 3000)).astype(np.int64)
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(3000, dtype=np.int64),
                "o_custkey": keys,
                "o_totalprice": np.round(rng.uniform(1, 1000, 3000) * 100) / 100,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(cust, preserve_index=False), sf / "customer.parquet")
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), sf / "orders.parquet")

        def run(**kw):
            return (
                orders_customer_merge_join(str(sf), **kw)
                .to_pandas()
                .sort_values(["o_orderkey"])
                .reset_index(drop=True)
            )

        for how in ("inner", "left"):
            assert run(how=how, salt_buckets=4).equals(run(how=how))


class TestTfidfTopTerms:
    def test_matches_direct_computation(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.text import tfidf_top_terms

        docs = [
            "apple banana apple",
            "banana cherry",
            "apple cherry cherry dates",
            "dates",
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
        )
        got = (
            tfidf_top_terms(ray.data.from_pandas(df), k=2)
            .to_pandas()
            .sort_values(["doc_id", "score", "term"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        n = len(docs)
        tf: dict[tuple[int, str], int] = {}
        dfreq: dict[str, int] = {}
        for i, t in enumerate(docs):
            terms = t.split()
            for w in set(terms):
                dfreq[w] = dfreq.get(w, 0) + 1
            for w in terms:
                tf[(i, w)] = tf.get((i, w), 0) + 1
        expected = []
        for i in range(n):
            scored = sorted(
                (
                    (-(cnt * ((n * 1_000_000) // dfreq[w])), w)
                    for (d, w), cnt in tf.items()
                    if d == i
                ),
            )[:2]
            for negscore, w in scored:
                expected.append((i, w, -negscore))
        got_rows = list(zip(got.doc_id, got.term, got.score))
        assert got_rows == expected

    def test_rare_term_outranks_common(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.text import tfidf_top_terms

        df = pd.DataFrame(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                "text": ["common rare", "common", "common"],
            }
        )
        got = tfidf_top_terms(ray.data.from_pandas(df), k=1).to_pandas()
        assert got[got.doc_id == 0].term.iloc[0] == "rare"


class TestKmeans:
    @staticmethod
    def _reference_kmeans(X, k, n_iter, scale=10**6):
        U = (np.sign(X) * np.floor(np.abs(X) * scale + 0.5)).astype(np.int64)
        C = U[:k].copy()
        for t in range(1, n_iter + 1):
            d = ((U[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            if t == n_iter:
                return assign
            for c in range(k):
                members = U[assign == c]
                if len(members):
                    C[c] = members.sum(axis=0) // len(members)
        return None

    def test_matches_reference_lloyd(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.similarity import kmeans_embeddings

        rng = np.random.RandomState(23)
        n, dim, k = 400, 16, 5
        X = rng.randn(n, dim).astype(np.float32)
        df = pa.Table.from_arrays(
            [
                pa.array(np.arange(n, dtype=np.int64)),
                pa.array(list(X), pa.list_(pa.float32())),
            ],
            names=["vec_id", "embedding"],
        )
        got = (
            kmeans_embeddings(ray.data.from_arrow(df), k=k, n_iter=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        expected = self._reference_kmeans(X.astype(np.float64), k, 3)
        assert got.cluster.tolist() == expected.tolist()
        assert len(set(got.cluster)) > 1

    def test_empty_cluster_keeps_previous_centroid(self, ray_session):
        """Seed 2 quantizes identically to seed 0, so in round 1 every
        point ties to the lower cid and cluster 2 gets NO members; the
        pipeline must keep its centroid (not drop the cluster), which
        lets it re-capture the origin points in round 2 after cluster 0's
        centroid moves toward [0.1, 0.1]. The reference implementation
        models the same keep-old rule, so agreement pins the path."""
        import ray.data

        from parser_rdf_ray.pipelines.similarity import kmeans_embeddings

        X = np.array(
            [
                [0.0, 0.0],
                [10.0, 10.0],
                [0.0000001, 0.0],  # quantizes identically to seed 0
                [0.1, 0.1],
                [9.9, 9.9],
                [10.1, 10.1],
            ],
            dtype=np.float32,
        )
        tbl = pa.Table.from_arrays(
            [
                pa.array(np.arange(len(X), dtype=np.int64)),
                pa.array(list(X), pa.list_(pa.float32())),
            ],
            names=["vec_id", "embedding"],
        )
        got = (
            kmeans_embeddings(ray.data.from_arrow(tbl), k=3, n_iter=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        expected = self._reference_kmeans(X.astype(np.float64), 3, 3)
        assert got.cluster.tolist() == expected.tolist()
        # premise: round 1 really did leave cluster 2 empty (ties → cid 0) …
        round1 = self._reference_kmeans(X.astype(np.float64), 3, 1)
        assert 2 not in set(round1.tolist())
        # … and the kept centroid re-captured the origin points afterwards
        assert 2 in set(got.cluster)


class TestJoinVariants:
    def _write(self, tmp_path, with_priority=False):
        rng = np.random.RandomState(29)
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(60, dtype=np.int64),
                "c_name": [f"C#{i}" for i in range(60)],
                "c_mktsegment": [f"SEG{i % 3}" for i in range(60)],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(400, dtype=np.int64),
                "o_custkey": rng.randint(0, 80, 400).astype(np.int64),  # 60..79 dangle
                "o_totalprice": np.round(rng.uniform(1, 100, 400) * 100) / 100,
                "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH"], 400),
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(cust, preserve_index=False), sf / "customer.parquet")
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), sf / "orders.parquet")
        return sf, cust, orders

    def test_left_join_keeps_unmatched_probes_with_nulls(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import orders_customer_merge_join

        sf, cust, orders = self._write(tmp_path)
        got = (
            orders_customer_merge_join(str(sf), how="left")
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        exp = (
            orders.merge(cust, left_on="o_custkey", right_on="c_custkey", how="left")
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        assert len(got) == len(orders)  # every probe row survives
        assert got.o_orderkey.tolist() == exp.o_orderkey.tolist()
        assert got.c_name.isna().tolist() == exp.c_name.isna().tolist()
        assert got.c_name.fillna("-").tolist() == exp.c_name.fillna("-").tolist()
        assert got.c_name.isna().any()  # dangling keys exercised

    def test_semi_anti_partition_customers(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import customers_by_order_existence

        sf, cust, orders = self._write(tmp_path)
        urgent = set(orders[orders.o_orderpriority == "1-URGENT"].o_custkey)
        semi = (
            customers_by_order_existence(str(sf), mode="semi", priority="1-URGENT")
            .to_pandas()
            .sort_values("c_custkey")
        )
        anti = (
            customers_by_order_existence(str(sf), mode="anti", priority="1-URGENT")
            .to_pandas()
            .sort_values("c_custkey")
        )
        assert semi.c_custkey.tolist() == sorted(k for k in cust.c_custkey if k in urgent)
        assert anti.c_custkey.tolist() == sorted(k for k in cust.c_custkey if k not in urgent)
        # exact partition of the customer table
        assert len(semi) + len(anti) == len(cust)
        assert len(semi) > 0 and len(anti) > 0


class TestMovingWindow:
    def test_matches_pandas_rolling(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import moving_window_sum

        rng = np.random.RandomState(31)
        base = pd.Timestamp("2025-03-01")
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 6, 300).astype(np.int64),
                "event_id": np.arange(300, dtype=np.int64),
                "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.randint(0, 5000, 300)],
                "value": np.round(rng.uniform(-5, 5, 300), 6),
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "events.parquet")

        got = (
            moving_window_sum(str(sf), frame=3)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        df2 = df.copy()
        df2["uv"] = np.round(df2.value * 1_000_000).astype(np.int64)
        df2 = df2.sort_values(["user_id", "ts", "event_id"])
        df2["mov"] = (
            df2.groupby("user_id")["uv"].rolling(3, min_periods=1).sum().reset_index(0, drop=True)
        )
        df2["nw"] = (
            df2.groupby("user_id")["uv"].rolling(3, min_periods=1).count().reset_index(0, drop=True)
        )
        exp = df2.sort_values("event_id").reset_index(drop=True)
        assert len(got) == 300
        assert got.mov_sum3.tolist() == (exp.mov / 1_000_000.0).tolist()
        assert got.n_window.tolist() == exp.nw.astype(np.int64).tolist()


class TestHllSketch:
    def test_estimate_accuracy_and_determinism(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.sketch import approx_distinct

        for n in (2000, 20000):
            tbl = pa.Table.from_arrays(
                [pa.array(np.arange(n, dtype=np.int64))], names=["k"]
            )
            r1 = approx_distinct(ray.data.from_arrow(tbl), "k", p=8).take_all()[0]
            r2 = approx_distinct(
                ray.data.from_arrow(tbl).repartition(7), "k", p=8
            ).take_all()[0]
            # deterministic and independent of block decomposition
            assert r1 == r2
            assert abs(r1["estimate"] - n) / n < 0.15  # ~2σ for m=256
            assert r1["m"] == 256

    def test_null_keys_hash_as_none_string(self, ray_session):
        """Nulls in the key column hash as the string 'None' (the
        historical str(None) contract) — the vectorized path must fill
        them rather than raise, and a null contributes exactly ONE
        distinct value regardless of multiplicity (equal to literally
        having the string 'None' in the data)."""
        import ray.data

        from parser_rdf_ray.pipelines.sketch import approx_distinct

        vals = ["a", "b", None, "a", None, "c", None]
        with_null = pa.Table.from_arrays([pa.array(vals, pa.string())], names=["k"])
        as_str = pa.Table.from_arrays(
            [pa.array([v if v is not None else "None" for v in vals], pa.string())],
            names=["k"],
        )
        r1 = approx_distinct(ray.data.from_arrow(with_null), "k", p=6).take_all()[0]
        r2 = approx_distinct(ray.data.from_arrow(as_str), "k", p=6).take_all()[0]
        assert r1 == r2
        # nullable INT keys take the same contract (str(None) == 'None')
        ints = pa.Table.from_arrays(
            [pa.array([1, 2, None, 2, None], pa.int64())], names=["k"]
        )
        r3 = approx_distinct(ray.data.from_arrow(ints), "k", p=6).take_all()[0]
        assert r3["nonzero_registers"] >= 1  # ran without raising

    def test_duplicates_do_not_inflate(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.sketch import approx_distinct

        uniq = pa.Table.from_arrays(
            [pa.array(np.arange(3000, dtype=np.int64))], names=["k"]
        )
        dup = pa.Table.from_arrays(
            [pa.array(np.tile(np.arange(3000, dtype=np.int64), 5))], names=["k"]
        )
        e1 = approx_distinct(ray.data.from_arrow(uniq), "k").take_all()[0]["estimate"]
        e2 = approx_distinct(ray.data.from_arrow(dup), "k").take_all()[0]["estimate"]
        assert e1 == e2  # multiplicity is invisible to the register max


class TestIterativeSmallGraphPath:
    """The size-adaptive single-task path and the distributed loop must be
    BIT-IDENTICAL (both run the same order-independent integer
    arithmetic). GRAFT_SMALL_GRAPH_MAX=0 forces the distributed path."""

    def _adjacency(self, n_nodes=40, n_edges=300, seed=41):
        import ray.data

        rng = np.random.RandomState(seed)
        pairs = {
            (f"urn:n{int(a)}", f"urn:n{int(b)}")
            for a, b in zip(rng.randint(0, n_nodes, n_edges), rng.randint(0, n_nodes, n_edges))
            if a != b
        }
        tbl = pa.Table.from_pylist(
            [
                {
                    "subj": s, "pred": "p", "obj": o, "obj_kind": "iri",
                    "obj_datatype": "", "obj_lang": "", "graph": "_:default",
                }
                for s, o in sorted(pairs)
            ]
        )
        return ray.data.from_arrow(tbl)

    def test_pagerank_paths_agree(self, ray_session, monkeypatch):
        from parser_rdf_ray.pipelines.kg_build import pagerank

        small = (
            pagerank(self._adjacency(), n_iter=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        monkeypatch.setenv("GRAFT_SMALL_GRAPH_MAX", "0")
        dist = (
            pagerank(self._adjacency(), n_iter=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert small.node.tolist() == dist.node.tolist()
        assert small["rank"].tolist() == dist["rank"].tolist()  # exact floats

    def test_components_paths_agree(self, ray_session, monkeypatch):
        from parser_rdf_ray.pipelines.kg_build import connected_components

        # sparse graph → several nontrivial components
        small = (
            connected_components(self._adjacency(n_nodes=60, n_edges=45))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        monkeypatch.setenv("GRAFT_SMALL_GRAPH_MAX", "0")
        dist = (
            connected_components(self._adjacency(n_nodes=60, n_edges=45))
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert small.node.tolist() == dist.node.tolist()
        assert small.component.tolist() == dist.component.tolist()
        assert small.component.nunique() > 1

    def test_distributed_engages_above_positive_bound(self, ray_session, monkeypatch):
        """Cluster semantics of the threshold itself (not the =0 test
        sentinel): with GRAFT_SMALL_GRAPH_MAX set to a positive bound
        BELOW the edge count, the distributed loop must engage — observed
        via a counting wrapper — and stay bit-equal to the single-task
        path. On a real cluster this is the contract that keeps one hot
        node from absorbing an over-bound graph."""
        import parser_rdf_ray.tuning as tuning
        from parser_rdf_ray.pipelines.kg_build import pagerank

        single = (
            pagerank(self._adjacency(), n_iter=3)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        calls = []
        orig = tuning.small_graph_max

        def counting():
            v = orig()
            calls.append(v)
            return v

        monkeypatch.setenv("GRAFT_SMALL_GRAPH_MAX", "10")  # < edge count
        monkeypatch.setattr(tuning, "small_graph_max", counting)
        dist = (
            pagerank(self._adjacency(), n_iter=3)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert calls == [10]  # threshold consulted, bound was positive
        assert single.node.tolist() == dist.node.tolist()
        assert single["rank"].tolist() == dist["rank"].tolist()


class TestCountMinSketch:
    def test_never_underestimates_and_exact_without_collisions(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.sketch import heavy_hitters

        words = ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 10 + ["delta"] * 2
        rng = np.random.RandomState(37)
        rng.shuffle(words)
        docs = [" ".join(words[i::10]) for i in range(10)]
        df = pd.DataFrame({"text": docs})
        # w large vs 4 distinct terms → collisions practically impossible:
        # estimates are the TRUE counts and ranking is exact
        got = (
            heavy_hitters(ray.data.from_pandas(df), d=4, w=4096, k=4)
            .to_pandas()
            .reset_index(drop=True)
        )
        assert got.term.tolist() == ["alpha", "beta", "gamma", "delta"]
        assert got.est_count.tolist() == [50, 30, 10, 2]

    def test_collisions_only_overcount(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.sketch import heavy_hitters

        rng = np.random.RandomState(43)
        vocab = [f"w{i}" for i in range(500)]
        words = [vocab[i] for i in rng.randint(0, 500, 5000)]
        true = pd.Series(words).value_counts()
        df = pd.DataFrame({"text": [" ".join(words[i::20]) for i in range(20)]})
        # tiny w → heavy collisions; CM may only OVERcount, never under
        got = heavy_hitters(ray.data.from_pandas(df), d=4, w=64, k=500).to_pandas()
        est = dict(zip(got.term, got.est_count))
        assert all(est[t] >= c for t, c in true.items() if t in est)

    def test_decomposition_invariance(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.sketch import heavy_hitters

        df = pd.DataFrame({"text": [f"tok{i % 40} tok{i % 7}" for i in range(200)]})
        a = heavy_hitters(ray.data.from_pandas(df), k=10).to_pandas()
        b = heavy_hitters(
            ray.data.from_pandas(df).repartition(9), k=10
        ).to_pandas()
        assert a.term.tolist() == b.term.tolist()
        assert a.est_count.tolist() == b.est_count.tolist()


class TestRealMediaCodecs:
    """Real (pure-numpy) codecs for uncompressed formats: netpbm P5/P6,
    24-bit BMP, WAV PCM-16. Payload bytes are hand-constructed so the
    decoders are checked against the exact pixels/samples that built
    them — no image library on either side."""

    @staticmethod
    def _ppm(img):
        h, w = img.shape[:2]
        return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()

    @staticmethod
    def _bmp24(img):
        h, w = img.shape[:2]
        stride = (w * 3 + 3) & ~3
        body = bytearray()
        for row in img[::-1]:  # bottom-up
            r = row[:, ::-1].astype(np.uint8).tobytes()  # RGB→BGR
            body += r + b"\0" * (stride - len(r))
        off = 54
        header = (
            b"BM" + (off + len(body)).to_bytes(4, "little") + b"\0\0\0\0"
            + off.to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
            + b"\0" * 16
        )
        return bytes(header) + bytes(body)

    @staticmethod
    def _wav(samples):
        body = samples.astype("<i2").tobytes()
        fmt = (
            (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
        chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        chunks += b"data" + len(body).to_bytes(4, "little") + body
        return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks

    def _media_table(self, rows):
        from parser_rdf_ray.pipelines.multimodal import MEDIA_SCHEMA

        cols = {n: [] for n in MEDIA_SCHEMA.names}
        for doc_id, ref, kind, payload in rows:
            cols["doc_id"].append(doc_id)
            cols["media_ref"].append(ref)
            cols["media_kind"].append(kind)
            cols["payload"].append(payload)
        return pa.Table.from_arrays(
            [pa.array(cols[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names],
            schema=MEDIA_SCHEMA,
        )

    def test_decoders_roundtrip_exact_pixels(self):
        from parser_rdf_ray.pipelines.multimodal import (
            _decode_bmp24,
            _decode_netpbm,
            _decode_wav_pcm16,
        )

        rng = np.random.RandomState(47)
        img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
        assert np.array_equal(_decode_netpbm(self._ppm(img)), img)
        assert np.array_equal(_decode_bmp24(self._bmp24(img)), img)
        samples = rng.randint(-32768, 32767, 100).astype(np.int16)
        assert np.array_equal(_decode_wav_pcm16(self._wav(samples)), samples)

    def test_decoder_stage_real_features(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.multimodal import (
            FEATURE_DIM,
            MediaDecoder,
            _audio_feature,
            _image_feature,
        )

        rng = np.random.RandomState(53)
        img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        samples = rng.randint(-32768, 32767, 400).astype(np.int16)
        tbl = self._media_table(
            [
                ("1", "m/0", "image", self._ppm(img)),
                ("1", "m/1", "image", self._bmp24(img)),
                ("2", "m/2", "audio", self._wav(samples)),
                ("3", "m/3", "image", b"\x89PNG fake compressed"),
            ]
        )
        got = (
            ray.data.from_arrow(tbl)
            .map_batches(MediaDecoder(use_stub=False), batch_format="pyarrow")
            .to_pandas()
            .sort_values("media_ref")
            .reset_index(drop=True)
        )
        assert got.decode_ok.tolist() == [True, True, True, False]
        np.testing.assert_array_equal(np.array(got.feature[0]), _image_feature(img))
        # BMP and PPM of the same pixels → identical real features
        np.testing.assert_array_equal(np.array(got.feature[1]), np.array(got.feature[0]))
        np.testing.assert_array_equal(np.array(got.feature[2]), _audio_feature(samples))
        assert np.array(got.feature[3]).tolist() == [0.0] * FEATURE_DIM

    def test_resizer_stage_real_resize(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.multimodal import (
            MediaResizer,
            _decode_netpbm,
            _nearest_resize,
        )

        rng = np.random.RandomState(59)
        img = rng.randint(0, 256, (30, 20, 3), dtype=np.uint8)
        tbl = self._media_table([("7", "m/0", "image", self._ppm(img))])
        got = (
            ray.data.from_arrow(tbl)
            .map_batches(MediaResizer(out_w=8, out_h=6, use_stub=False), batch_format="pyarrow")
            .to_pandas()
        )
        assert got.src_w[0] == 20 and got.src_h[0] == 30
        decoded = _decode_netpbm(got.payload[0])
        assert decoded.shape == (6, 8, 3)
        np.testing.assert_array_equal(decoded, _nearest_resize(img, 6, 8))


class TestCuratedCorpusWithSplit:
    def test_rows_and_split_match_components(self, ray_session):
        """curated_corpus_with_split == (curate_corpus ids) semi-joined to
        full rows + the md5 split rule — checked against the components
        computed independently."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import (
            curate_corpus,
            curated_corpus_with_split,
        )

        rng = np.random.RandomState(61)
        words = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 3
        texts = []
        for i in range(120):
            base = " ".join(words) + f" doc{i % 40}"  # 3x near-dup groups
            texts.append(base)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(120, dtype=np.int64),
                "text": texts,
                "lang": ["en"] * 120,
                "source": [f"s{i % 5}" for i in range(120)],
            }
        )
        ds = ray.data.from_pandas(df)
        got = (
            curated_corpus_with_split(ds, min_tokens=5, min_alpha=0.5, train_pct=80)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        kept_ids = sorted(
            r["doc_id"]
            for r in curate_corpus(ds, min_tokens=5, min_alpha=0.5).take_all()
        )
        assert got.doc_id.tolist() == kept_ids
        assert len(kept_ids) < 120  # near-dups actually collapsed
        sub = df.set_index("doc_id").loc[got.doc_id]
        assert got.text.tolist() == sub.text.tolist()
        assert got.source.tolist() == sub.source.tolist()
        expected_split = [
            "train" if _md5_low64(str(i)) % 100 < 80 else "val" for i in got.doc_id
        ]
        assert got.split.tolist() == expected_split


class TestTriangleCount:
    def test_matches_brute_force(self, ray_session):
        """Degree-oriented distributed triangle counting vs itertools
        brute force, fed duplicate AND reversed edge rows so
        canonicalization is exercised."""
        import itertools

        import ray.data

        from parser_rdf_ray.pipelines.kg_build import triangle_count

        rng = np.random.RandomState(71)
        for n, m in [(12, 30), (40, 200)]:
            pairs = set()
            while len(pairs) < m:
                a, b = rng.randint(0, n, 2)
                if a != b:
                    pairs.add((f"n{min(a, b):03d}", f"n{max(a, b):03d}"))
            nodes = sorted({x for p in pairs for x in p})
            brute = sum(
                1
                for x, y, z in itertools.combinations(nodes, 3)
                if (x, y) in pairs and (y, z) in pairs and (x, z) in pairs
            )
            rows_a, rows_b = [], []
            for a, b in pairs:
                rows_a += [b, a]  # reversed + duplicate
                rows_b += [a, b]
            ds = ray.data.from_arrow(
                pa.Table.from_arrays(
                    [pa.array(rows_a), pa.array(rows_b)], names=["a", "b"]
                )
            )
            got = triangle_count(ds).take_all()[0]["n_triangles"]
            assert got == brute > 0, (n, m)

    def test_hub_star_has_no_triangles(self, ray_session):
        """A pure star (the hub-skew shape degree orientation exists
        for): zero triangles, and the wedge stage must not blow up."""
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import triangle_count

        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [
                    pa.array(["hub"] * 200),
                    pa.array([f"leaf{i:03d}" for i in range(200)]),
                ],
                names=["a", "b"],
            )
        )
        assert triangle_count(ds).take_all()[0]["n_triangles"] == 0

    def test_triangle_plus_dangling(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import triangle_count

        ds = ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array(["x", "y", "x", "x"]), pa.array(["y", "z", "z", "w"])],
                names=["a", "b"],
            )
        )
        assert triangle_count(ds).take_all()[0]["n_triangles"] == 1


class TestKcore:
    def _edges(self):
        # 4-clique + path hanging off it + isolated pair
        return pd.DataFrame(
            [("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D"),
             ("C", "D"), ("A", "E"), ("E", "F"), ("F", "G"), ("H", "I")],
            columns=["a", "b"],
        )

    def test_two_core_is_the_clique(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import kcore_nodes

        out = (
            kcore_nodes(ray.data.from_pandas(self._edges()), k=2, rounds=8)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert out.node.tolist() == ["A", "B", "C", "D"]
        assert out.degree.tolist() == [3, 3, 3, 3]

    def test_one_core_keeps_everything_with_induced_degrees(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import kcore_nodes

        out = (
            kcore_nodes(ray.data.from_pandas(self._edges()), k=1, rounds=8)
            .to_pandas().set_index("node").degree
        )
        assert sorted(out.index) == list("ABCDEFGHI")
        assert out["A"] == 4 and out["G"] == 1 and out["H"] == 1

    def test_deep_peel_needs_multiple_rounds(self, ray_session):
        """A chain peels one node per round from each end — pins that the
        loop really iterates (a single-round implementation would leave
        interior chain nodes alive)."""
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import kcore_nodes

        chain = pd.DataFrame(
            [(f"c{i}", f"c{i+1}") for i in range(8)], columns=["a", "b"]
        )
        out = kcore_nodes(ray.data.from_pandas(chain), k=2, rounds=10).to_pandas()
        assert len(out) == 0  # a path has no 2-core
        # with too few rounds the fixed-R semantics leaves the middle
        partial = kcore_nodes(ray.data.from_pandas(chain), k=2, rounds=1).to_pandas()
        assert len(partial) > 0

    def test_paths_agree(self, ray_session, monkeypatch):
        """Single-task and distributed fixed-R peeling must be bit-equal
        (GRAFT_SMALL_GRAPH_MAX=0 forces the distributed loop)."""
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import kcore_nodes

        rng = np.random.RandomState(41)
        pairs = set()
        while len(pairs) < 200:
            a, b = rng.randint(0, 40, 2)
            if a != b:
                pairs.add((f"n{min(a, b):03d}", f"n{max(a, b):03d}"))
        df = pd.DataFrame(sorted(pairs), columns=["a", "b"])
        small = (
            kcore_nodes(ray.data.from_pandas(df), k=3, rounds=8)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        monkeypatch.setenv("GRAFT_SMALL_GRAPH_MAX", "0")
        dist = (
            kcore_nodes(ray.data.from_pandas(df).repartition(6), k=3, rounds=8)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert len(small) > 0
        assert small.equals(dist)


class TestTriangleSmallGraphPath:
    def test_paths_agree(self, ray_session, monkeypatch):
        """Single-task and distributed triangle counts must be equal
        (GRAFT_SMALL_GRAPH_MAX=0 forces the distributed path)."""
        import ray.data

        from parser_rdf_ray.pipelines.kg_build import triangle_count

        rng = np.random.RandomState(73)
        pairs = set()
        while len(pairs) < 250:
            a, b = rng.randint(0, 45, 2)
            if a != b:
                pairs.add((f"n{min(a, b):03d}", f"n{max(a, b):03d}"))
        tbl = pa.Table.from_arrays(
            [
                pa.array([p[0] for p in pairs]),
                pa.array([p[1] for p in pairs]),
            ],
            names=["a", "b"],
        )
        small = triangle_count(ray.data.from_arrow(tbl)).take_all()[0]["n_triangles"]
        monkeypatch.setenv("GRAFT_SMALL_GRAPH_MAX", "0")
        dist = triangle_count(ray.data.from_arrow(tbl)).take_all()[0]["n_triangles"]
        assert small == dist > 0


class TestWinsorize:
    def test_matches_numpy_clip(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import winsorize_orders

        rng = np.random.RandomState(79)
        n = 800
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_orderpriority": rng.choice(["A", "B", "C"], n),
                "o_totalprice": np.round(rng.lognormal(4, 1, n) * 100) / 100,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "orders.parquet")
        got = (
            winsorize_orders(str(sf), lo=0.1, hi=0.9)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        cents = np.round(df.o_totalprice.values * 100).astype(np.int64)
        expected = []
        for grp in ["A", "B", "C"]:
            vals = np.sort(cents[df.o_orderpriority.values == grp])
            nn = len(vals)
            lo = vals[max(1, math.ceil(0.1 * nn)) - 1]
            hi = vals[max(1, math.ceil(0.9 * nn)) - 1]
            expected.append((grp, lo, hi))
        bounds = {g: (lo, hi) for g, lo, hi in expected}
        exp_clip = [
            min(max(c, bounds[g][0]), bounds[g][1]) / 100.0
            for c, g in zip(cents, df.o_orderpriority)
        ]
        assert got.clipped.tolist() == exp_clip
        assert (got.clipped != got.o_totalprice).any()  # clipping really fired
        assert len(got) == n


class TestBloomJoin:
    def test_prunes_dangling_but_result_equals_plain_join(self, ray_session, tmp_path):
        """The bloom reduction must actually drop (most) dangling probe
        rows before the shuffle, yet produce exactly the plain join."""
        from parser_rdf_ray.pipelines.relational import (
            orders_customer_bloom_join,
            orders_customer_merge_join,
        )

        rng = np.random.RandomState(83)
        cust = pd.DataFrame(
            {
                "c_custkey": np.arange(50, dtype=np.int64),
                "c_name": [f"C#{i}" for i in range(50)],
                "c_mktsegment": [f"S{i % 3}" for i in range(50)],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(3000, dtype=np.int64),
                # 95% dangling keys — the regime bloom pruning exists for
                "o_custkey": rng.randint(0, 1000, 3000).astype(np.int64),
                "o_totalprice": np.round(rng.uniform(1, 100, 3000) * 100) / 100,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(cust, preserve_index=False), sf / "customer.parquet")
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), sf / "orders.parquet")

        got = (
            orders_customer_bloom_join(str(sf))
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        plain = (
            orders_customer_merge_join(str(sf))
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        assert got.equals(plain)
        # matching subset is small; the join result reflects that
        assert len(got) == orders.o_custkey.isin(cust.c_custkey).sum()


class TestPerGroupSample:
    def test_bottom_k_by_hash_per_group(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import per_group_sample

        df = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "lang": [["en", "de", "zh"][i % 3] for i in range(300)],
            }
        )
        got = (
            per_group_sample(ray.data.from_pandas(df), k=4)
            .to_pandas()
            .sort_values(["lang", "rank_hash"])
            .reset_index(drop=True)
        )
        for lang in ["en", "de", "zh"]:
            ids = df.doc_id[df.lang == lang]
            expect = sorted(ids, key=lambda i: (_md5_low64(str(i)) % (1 << 63), i))[:4]
            assert got[got.lang == lang].doc_id.tolist() == sorted(
                expect, key=lambda i: _md5_low64(str(i)) % (1 << 63)
            )
        assert len(got) == 12

    def test_stable_under_growth_except_displacement(self, ray_session):
        """Bottom-k property: doubling the corpus can only DISPLACE
        members (new smaller hashes), never reshuffle survivors."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import per_group_sample

        def docs(n):
            return pd.DataFrame(
                {"doc_id": np.arange(n, dtype=np.int64), "lang": ["en"] * n}
            )

        small = set(
            per_group_sample(ray.data.from_pandas(docs(100)), k=5)
            .to_pandas()
            .doc_id
        )
        big = set(
            per_group_sample(ray.data.from_pandas(docs(200)), k=5)
            .to_pandas()
            .doc_id
        )
        # survivors of the bigger run that existed before are a subset
        # of the original sample
        assert (big & set(range(100))) <= small


class TestCovar:
    def test_matches_numpy_cov_and_is_decomposition_invariant(self, ray_session, tmp_path):
        from parser_rdf_ray.pipelines.relational import lineitem_covar

        rng = np.random.RandomState(89)
        n = 2000
        qty = rng.randint(1, 51, n).astype(np.int64)
        # price correlated with qty plus noise, exact cents
        price = np.round((qty * 101.37 + rng.uniform(-500, 500, n)) * 100) / 100
        df = pd.DataFrame(
            {
                "l_returnflag": rng.choice(["A", "N", "R"], n),
                "l_quantity": qty.astype(float),
                "l_extendedprice": price,
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "lineitem.parquet")

        got = (
            lineitem_covar(str(sf))
            .to_pandas()
            .sort_values("l_returnflag")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            sub = df[df.l_returnflag == row["l_returnflag"]]
            x = np.round(sub.l_quantity.values).astype(np.int64)
            y = np.round(sub.l_extendedprice.values * 100).astype(np.int64)
            nn = len(x)
            num = int(nn) * int((x * y).sum()) - int(x.sum()) * int(y.sum())
            expected = ((num * 10**6) // (nn * nn * 100)) / 10**6
            assert row["covar_qty_price"] == expected
            assert row["n"] == nn
            # sanity: strongly positive covariance by construction
            assert row["covar_qty_price"] > 0


class TestNtile:
    def test_matches_pandas_qcut_rule(self, ray_session, tmp_path):
        """NTILE(k) vs a direct implementation of SQL's fill rule (first
        n mod k tiles take one extra row) over the unique total order,
        with enough rows to span blocks."""
        from parser_rdf_ray.pipelines.relational import ntile_customers

        rng = np.random.RandomState(97)
        n = 2500
        df = pd.DataFrame(
            {
                "c_custkey": np.arange(n, dtype=np.int64),
                "c_nationkey": rng.randint(0, 6, n).astype(np.int32),
                "c_acctbal": rng.choice([5.0, 10.0, 10.0, 99.99], n),  # ties
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sf / "customer.parquet")
        k = 4
        got = (
            ntile_customers(str(sf), k=k)
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        cents = np.round(df.c_acctbal.values * 100).astype(np.int64)
        expected = np.empty(n, dtype=np.int64)
        for nat in range(6):
            idx = np.flatnonzero(df.c_nationkey.values == nat)
            order = idx[np.lexsort((df.c_custkey.values[idx], -cents[idx]))]
            nn = len(order)
            big, small = nn % k, nn // k
            tiles = []
            for t in range(k):
                tiles += [t + 1] * (small + (1 if t < big else 0))
            expected[order] = tiles
        assert got.tile.tolist() == expected.tolist()
        # every nation's tile sizes differ by at most 1
        for nat in range(6):
            sizes = got[got.c_nationkey == nat].tile.value_counts()
            assert sizes.max() - sizes.min() <= 1


class TestPackSequences:
    def test_assume_sorted_survives_scrambled_block_order(self, ray_session):
        """Ray's streaming executor returns materialized blocks in
        task-completion order (preserve_order=False default), NOT logical
        order — pack must re-order refs by each block's min doc_id before
        prefix-summing. Feed blocks deliberately OUT of order (each block
        internally sorted, ranges disjoint — the assume_sorted contract)
        and require the globally-correct offsets."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import pack_token_counts

        blocks = [
            pa.Table.from_pydict(  # doc_ids 20-29
                {"doc_id": list(range(20, 30)),
                 "n_tokens": [3] * 10,
                 "split": ["train"] * 10}
            ),
            pa.Table.from_pydict(  # doc_ids 0-9
                {"doc_id": list(range(0, 10)),
                 "n_tokens": [5] * 10,
                 "split": ["train"] * 10}
            ),
            pa.Table.from_pydict(  # empty block in the middle
                {"doc_id": [], "n_tokens": [], "split": []}
            ).cast(pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                              ("split", pa.string())])),
            pa.Table.from_pydict(  # doc_ids 10-19
                {"doc_id": list(range(10, 20)),
                 "n_tokens": [2] * 10,
                 "split": ["val"] * 10}
            ),
        ]
        ds = ray.data.from_arrow(blocks)  # block list order: 20s, 0s, [], 10s
        out = (
            pack_token_counts(ds, seq_len=16, extra_cols=("split",), assume_sorted=True)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 30
        # global doc_id order: 10 docs x5 tokens, then x2, then x3
        n = out.n_tokens.to_numpy()
        assert n.tolist() == [5] * 10 + [2] * 10 + [3] * 10
        import numpy as np

        expect_start = np.concatenate([[0], np.cumsum(n)[:-1]])
        assert out.start_tok.tolist() == expect_start.tolist()
        assert (out.first_seq == out.start_tok // 16).all()

    def test_boundary_straddle_and_offsets(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import pack_sequences

        texts = {
            1: "a b c",          # 3 tokens -> [0,3) seq 0
            2: "d e f g",        # 4 tokens -> [3,7) straddles 4: seqs 0-1
            3: "h",              # 1 token  -> [7,8) seq 1
            4: "",               # trim+split('') == [''] -> 1 token [8,9) seq 2
        }
        tbl = pa.Table.from_pydict(
            {"doc_id": list(texts), "text": list(texts.values())}
        )
        out = (
            pack_sequences(ray.data.from_arrow(tbl), seq_len=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.n_tokens.tolist() == [3, 4, 1, 1]
        assert out.start_tok.tolist() == [0, 3, 7, 8]
        assert out.first_seq.tolist() == [0, 0, 1, 2]
        assert out.last_seq.tolist() == [0, 1, 1, 2]

    def test_cross_block_prefix_is_global(self, ray_session):
        """Offsets must accumulate across sorted blocks, not restart."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import pack_sequences

        n = 500
        tbl = pa.Table.from_pydict(
            {
                "doc_id": list(range(n)),
                "text": ["tok " * ((i % 7) + 1) for i in range(n)],
            }
        )
        out = (
            pack_sequences(
                ray.data.from_arrow(tbl).repartition(16), seq_len=64
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # exclusive prefix property holds globally
        assert out.start_tok.tolist() == np.concatenate(
            [[0], np.cumsum(out.n_tokens.to_numpy())[:-1]]
        ).tolist()

    def test_rejects_nonpositive_seq_len(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import pack_sequences

        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(
                ray.data.from_arrow(pa.Table.from_pydict({"doc_id": [1], "text": ["x"]})),
                seq_len=0,
            )


class TestLineitemRollup:
    def test_levels_match_duckdb(self, ray_session, tmp_path):
        import duckdb
        import ray.data

        from parser_rdf_ray.pipelines.relational import lineitem_rollup

        rng = np.random.RandomState(7)
        li = pd.DataFrame(
            {
                "l_returnflag": rng.choice(["A", "N", "R"], 400),
                "l_linestatus": rng.choice(["O", "F"], 400),
                "l_quantity": rng.randint(1, 51, 400).astype(float),
            }
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(pa.Table.from_pandas(li, preserve_index=False), sf / "lineitem.parquet")
        got = lineitem_rollup(str(sf)).to_pandas()
        exp = duckdb.sql(
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows "
            f"FROM read_parquet('{sf}/lineitem.parquet') "
            "GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ).df()
        key = ["l_returnflag", "l_linestatus"]
        got = got.sort_values(key, na_position="last").reset_index(drop=True)
        exp = exp.sort_values(key, na_position="last").reset_index(drop=True)
        assert got.fillna("~").astype(str).equals(exp.fillna("~").astype(str))
        # 3×2 fine + 3 subtotals + 1 grand total
        assert len(got) == 10


class TestPngCodec:
    """Real PNG decode (stdlib zlib + numpy unfiltering) checked against
    hand-filtered scanlines — the reference filterer below implements the
    PNG spec independently of the decoder, so each of the five filter
    types is verified byte-for-byte without an image library."""

    @staticmethod
    def _filter_rows(img, filter_types):
        """Apply PNG filters (the ENCODER direction) per the spec."""
        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        body = img.reshape(h, w * ch).astype(np.int32)
        out = []
        prev = np.zeros(w * ch, np.int32)
        for y, f in zip(range(h), filter_types):
            cur = body[y]
            line = np.empty(w * ch, np.int32)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                line[i] = (cur[i] - pred) % 256
            out.append(bytes([f]) + bytes(line.astype(np.uint8)))
            prev = cur
        return b"".join(out)

    @staticmethod
    def _png(img, filter_types=None, ctype=None, interlace=0):
        import zlib

        h, w = img.shape[:2]
        ch = 1 if img.ndim == 2 else img.shape[2]
        if ctype is None:
            ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        if filter_types is None:
            filter_types = [0] * h
        raw = TestPngCodec._filter_rows(img, filter_types)

        def chunk(typ, data):
            return (
                len(data).to_bytes(4, "big") + typ + data
                + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
            )

        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
            [8, ctype, 0, 0, interlace]
        )
        sig = b"\x89PNG\r\n\x1a\n"
        return (
            sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def test_all_five_filters_round_trip(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_png

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (5, 9, 3), dtype=np.uint8)
        data = self._png(img, filter_types=[0, 1, 2, 3, 4])
        assert np.array_equal(_decode_png(data), img)

    def test_encoder_decoder_round_trip(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_png, _encode_png

        rng = np.random.RandomState(13)
        rgb = rng.randint(0, 256, (7, 4, 3), dtype=np.uint8)
        gray = rng.randint(0, 256, (6, 11), dtype=np.uint8)
        assert np.array_equal(_decode_png(_encode_png(rgb)), rgb)
        assert np.array_equal(_decode_png(_encode_png(gray)), gray)

    def test_rgba_drops_alpha_and_gray_alpha_reduces(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_png

        rng = np.random.RandomState(17)
        rgba = rng.randint(0, 256, (4, 5, 4), dtype=np.uint8)
        got = _decode_png(self._png(rgba, filter_types=[0, 1, 2, 4]))
        assert np.array_equal(got, rgba[:, :, :3])
        ga = rng.randint(0, 256, (3, 8, 2), dtype=np.uint8)
        got = _decode_png(self._png(ga, filter_types=[4, 3, 1]))
        assert np.array_equal(got, ga[:, :, 0])

    def test_multiple_idat_chunks(self):
        import zlib

        from parser_rdf_ray.pipelines.multimodal import _decode_png

        rng = np.random.RandomState(19)
        img = rng.randint(0, 256, (3, 3, 3), dtype=np.uint8)
        data = self._png(img)
        # split the single IDAT into two chunks
        sig_ihdr_len = 8 + 12 + 13
        idat_len = int.from_bytes(data[sig_ihdr_len : sig_ihdr_len + 4], "big")
        idat_body = data[sig_ihdr_len + 8 : sig_ihdr_len + 8 + idat_len]
        half = len(idat_body) // 2

        def chunk(typ, d):
            return (
                len(d).to_bytes(4, "big") + typ + d
                + (zlib.crc32(typ + d) & 0xFFFFFFFF).to_bytes(4, "big")
            )

        rebuilt = (
            data[: sig_ihdr_len]
            + chunk(b"IDAT", idat_body[:half])
            + chunk(b"IDAT", idat_body[half:])
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(_decode_png(rebuilt), img)

    def test_unsupported_variants_raise(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_png

        img = np.zeros((2, 2, 3), np.uint8)
        with pytest.raises(NotImplementedError, match="interlaced"):
            _decode_png(self._png(img, interlace=1))
        with pytest.raises(NotImplementedError, match="color type"):
            _decode_png(self._png(img, ctype=3))  # palette
        with pytest.raises(ValueError, match="not a PNG"):
            _decode_png(b"JUNK")

    def test_decoder_stage_accepts_png(self, ray_session):
        """PNG payloads flow through MediaDecoder.decode_real with the
        same luminance feature as the equivalent PPM payload."""
        import ray.data

        from parser_rdf_ray.pipelines.multimodal import (
            MediaDecoder,
            _encode_png,
            _image_feature,
        )

        rng = np.random.RandomState(23)
        img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        tbl = pa.Table.from_pydict(
            {
                "doc_id": ["1"],
                "media_ref": ["m/0"],
                "media_kind": ["image"],
                "payload": [_encode_png(img)],
            }
        )
        got = (
            ray.data.from_arrow(tbl)
            .map_batches(MediaDecoder(use_stub=False), batch_format="pyarrow")
            .to_pandas()
        )
        assert got.decode_ok.tolist() == [True]
        np.testing.assert_array_equal(np.array(got.feature[0]), _image_feature(img))


class TestDecontaminate:
    def test_matches_independent_python(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import decontaminate

        rng = np.random.RandomState(31)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, rng.randint(0, 12))) for _ in range(300)]
        df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
        got = (
            decontaminate(ray.data.from_pandas(df).repartition(8), eval_pct=20, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        def grams(t, n=3):
            toks = t.strip().split()
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

        is_eval = {i: _md5_low64(str(i)) % 100 < 20 for i in df.doc_id}
        ev = set().union(*(grams(t) for i, t in zip(df.doc_id, df.text) if is_eval[i]))
        exp = {
            int(i): bool(grams(t) & ev)
            for i, t in zip(df.doc_id, df.text)
            if not is_eval[i]
        }
        assert got.doc_id.tolist() == sorted(exp)
        assert got.contaminated.tolist() == [exp[i] for i in sorted(exp)]
        # short docs (< n tokens) must be present and clean
        shorts = [int(i) for i, t in zip(df.doc_id, df.text)
                  if not is_eval[i] and len(t.split()) < 3]
        assert shorts, "fixture must include short docs"
        assert not got.set_index("doc_id").loc[shorts].contaminated.any()

    def test_exact_duplicate_of_eval_doc_is_contaminated(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import decontaminate

        # find one eval id and one train id under the md5 gate
        ev = next(i for i in range(1000) if _md5_low64(str(i)) % 100 < 10)
        tr = next(i for i in range(1000) if _md5_low64(str(i)) % 100 >= 10)
        tr2 = next(
            i for i in range(tr + 1, 2000) if _md5_low64(str(i)) % 100 >= 10
        )
        df = pd.DataFrame(
            {
                "doc_id": np.array([ev, tr, tr2], dtype=np.int64),
                "text": ["the quick brown fox", "the quick brown fox", "nothing shared here at all"],
            }
        )
        got = decontaminate(ray.data.from_pandas(df), eval_pct=10, n=3).to_pandas()
        verdict = dict(zip(got.doc_id, got.contaminated))
        assert verdict == {tr: True, tr2: False}


class TestApproxQuantilesSketch:
    def test_bucket_upper_bound_estimate(self, ray_session, tmp_path):
        import duckdb

        from parser_rdf_ray.pipelines.sketch import approx_quantiles_sketch

        rng = np.random.RandomState(37)
        prices = np.round(rng.uniform(1, 990, 4000) * 100) / 100
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame({"o_totalprice": prices}), preserve_index=False),
            sf / "orders.parquet",
        )
        got = approx_quantiles_sketch(str(sf)).to_pandas().sort_values("quantile")
        cents = np.sort(np.round(prices * 100).astype(np.int64))
        for _, row in got.iterrows():
            rank = int(np.ceil(row["quantile"] * len(cents)))
            exact = cents[rank - 1] / 100.0
            # estimate is the $100-bucket upper bound containing the value:
            # within one bucket width above the exact quantile
            assert exact <= row["est_price"] <= exact + 100.0
            assert row["n_orders"] == len(cents)


class TestJpegCodec:
    """Baseline JPEG (pure numpy + stdlib, pipelines/jpegcodec.py).
    Verification is three-way independent: (1) a DC-only stream
    hand-assembled byte-by-byte from the T.81 spec (no encoder involved)
    must decode to the exact predicted constant; (2) encoder→decoder
    round trips must equal an INDEPENDENT per-block
    fdct→quant→dequant→idct prediction exactly; (3) lossy behavior is
    sane (quality-monotone error, near-lossless smooth gradients)."""

    def test_handcrafted_dc_only_gray(self):
        from parser_rdf_ray.pipelines.jpegcodec import decode_jpeg

        # tables: 12 DC symbols at 4 bits (code == symbol); AC: EOB (0x00)
        # as the single 2-bit code '00'
        dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
        dc_vals = bytes(range(12))
        ac_bits = bytes([0, 1] + [0] * 14)
        ac_vals = bytes([0x00])
        # quant table: all 16s, zigzag order (uniform, so order-invariant)
        dqt = bytes([0]) + bytes([16] * 64)

        def seg(marker, body):
            return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

        sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
            [1, 1, 0x11, 0]
        )
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        # scan: DC category 3 (code 0011) + bits 100 (value +4), then EOB
        # (code 00) -> 0011 100 00 + 1-padding = 0b00111000 0b01111111
        scan = bytes([0b00111000, 0b01111111])
        data = (
            b"\xff\xd8"
            + seg(0xDB, dqt)
            + seg(0xC0, sof)
            + seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
            + seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
            + seg(0xDA, sos)
            + scan
            + b"\xff\xd9"
        )
        got = decode_jpeg(data)
        # DC quantized 4 x qstep 16 = 64; IDCT of DC-only = 64/8 = 8;
        # +128 level shift = 136 everywhere
        assert got.shape == (8, 8)
        assert np.array_equal(got, np.full((8, 8), 136, np.uint8))

    def test_gray_matches_independent_prediction(self):
        from parser_rdf_ray.pipelines.jpegcodec import (
            _C,
            _default_qtable,
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.RandomState(5)
        g = rng.randint(0, 256, (24, 16), np.uint8)
        dec = decode_jpeg(encode_jpeg(g, quality=75))
        q = _default_qtable(75).astype(np.float64)
        exp = np.zeros_like(g, np.float64)
        for by in range(3):
            for bx in range(2):
                blk = g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float) - 128
                fq = np.rint((_C @ blk @ _C.T) / q) * q
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.rint(_C.T @ fq @ _C + 128), 0, 255
                )
        assert np.array_equal(dec, exp.astype(np.uint8))

    def test_rgb_lossy_sanity(self):
        from parser_rdf_ray.pipelines.jpegcodec import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (17, 13, 3), np.uint8)  # non-x8 dims
        d95 = decode_jpeg(encode_jpeg(img, quality=95)).astype(int)
        d30 = decode_jpeg(encode_jpeg(img, quality=30)).astype(int)
        assert d95.shape == img.shape
        assert np.abs(d95 - img).mean() < np.abs(d30 - img).mean()
        flat = np.full((8, 16, 3), (200, 30, 90), np.uint8)
        got = decode_jpeg(encode_jpeg(flat, quality=90)).astype(int)
        assert np.abs(got - flat.astype(int)).max() <= 1

    def test_420_subsampled_constant_color(self):
        """4:2:0 decode, hand-assembled MCU (4 Y + Cb + Cr blocks) —
        constant color makes the result upsampling-filter-invariant."""
        from parser_rdf_ray.pipelines.jpegcodec import (
            _BitWriter,
            _build_huffman,
            decode_jpeg,
        )

        dc_bits = [0, 0, 0, 12] + [0] * 12
        dc_vals = list(range(12))
        ac_bits = [0, 1] + [0] * 14
        ac_vals = [0x00]
        _, dc_enc = _build_huffman(dc_bits, dc_vals)
        _, ac_enc = _build_huffman(ac_bits, ac_vals)

        def put_dc(wtr, diff):
            s = int(abs(diff)).bit_length()
            ln, code = dc_enc[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            ln, code = ac_enc[0x00]
            wtr.write(code, ln)  # EOB

        wtr = _BitWriter()
        # MCU: 4 Y blocks (DC 8, then 3 zero diffs), Cb DC -6, Cr DC 10
        put_dc(wtr, 8)
        for _ in range(3):
            put_dc(wtr, 0)
        put_dc(wtr, -6)
        put_dc(wtr, 10)
        scan = wtr.flush()

        def seg(marker, body):
            return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

        dqt = bytes([0]) + bytes([16] * 64)
        sof = (
            bytes([8]) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
            + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        )
        sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
        data = (
            b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof)
            + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
            + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
            + seg(0xDA, sos) + scan + b"\xff\xd9"
        )
        got = decode_jpeg(data)
        assert got.shape == (16, 16, 3)
        # Y = 8*16/8+128 = 144, Cb = -6*16/8+128 = 116, Cr = 10*16/8+128 = 148
        y, cb, cr = 144.0, 116.0, 148.0
        exp = np.clip(
            np.rint(
                [
                    y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128),
                ]
            ),
            0,
            255,
        ).astype(np.uint8)
        assert np.array_equal(got, np.broadcast_to(exp, (16, 16, 3)))

    def test_unsupported_variants_raise(self):
        from parser_rdf_ray.pipelines.jpegcodec import decode_jpeg, encode_jpeg

        img = np.zeros((8, 8), np.uint8)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(NotImplementedError, match="non-baseline"):
            decode_jpeg(bytes(data))
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"JUNK")

    def test_decoder_stage_accepts_jpeg(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.jpegcodec import decode_jpeg, encode_jpeg
        from parser_rdf_ray.pipelines.multimodal import MediaDecoder, _image_feature

        rng = np.random.RandomState(41)
        img = rng.randint(0, 256, (8, 8, 3), np.uint8)
        payload = encode_jpeg(img, quality=90)
        tbl = pa.Table.from_pydict(
            {
                "doc_id": ["1"],
                "media_ref": ["m/0"],
                "media_kind": ["image"],
                "payload": [payload],
            }
        )
        got = (
            ray.data.from_arrow(tbl)
            .map_batches(MediaDecoder(use_stub=False), batch_format="pyarrow")
            .to_pandas()
        )
        assert got.decode_ok.tolist() == [True]
        np.testing.assert_array_equal(
            np.array(got.feature[0]), _image_feature(decode_jpeg(payload))
        )


class TestResizeCompressedFormats:
    def test_png_and_jpeg_inputs_reencode_as_png(self):
        from parser_rdf_ray.pipelines.jpegcodec import decode_jpeg, encode_jpeg
        from parser_rdf_ray.pipelines.multimodal import (
            MediaResizer,
            _decode_png,
            _encode_png,
            _nearest_resize,
        )

        rng = np.random.RandomState(43)
        img = rng.randint(0, 256, (12, 10, 3), np.uint8)
        rs = MediaResizer(out_w=5, out_h=6, use_stub=False)
        # PNG in -> lossless PNG out of the nearest-resized pixels
        sw, sh, data = rs.resize_real(_encode_png(img), 5, 6)
        assert (sw, sh) == (10, 12)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(_decode_png(data), _nearest_resize(img, 6, 5))
        # JPEG in -> PNG out of the resized DECODED pixels
        jp = encode_jpeg(img, quality=90)
        sw, sh, data = rs.resize_real(jp, 5, 6)
        assert (sw, sh) == (10, 12)
        assert np.array_equal(_decode_png(data), _nearest_resize(decode_jpeg(jp), 6, 5))


class TestGifCodec:
    def test_round_trip_with_dictionary_growth(self):
        from parser_rdf_ray.pipelines.gifcodec import decode_gif, encode_gif

        rng = np.random.RandomState(3)
        img = rng.randint(0, 6, (23, 17, 3), dtype=np.uint8) * 40
        assert np.array_equal(decode_gif(encode_gif(img)), img)
        # 200 colors -> wide codes; random pattern forces LZW resets
        palette = rng.randint(0, 256, (200, 3)).astype(np.uint8)
        img2 = palette[rng.randint(0, 200, (40, 40))]
        assert np.array_equal(decode_gif(encode_gif(img2)), img2)

    def test_extensions_are_skipped(self):
        from parser_rdf_ray.pipelines.gifcodec import decode_gif, encode_gif

        img = np.zeros((3, 4, 3), np.uint8)
        img[1, 2] = 200
        data = bytearray(encode_gif(img))
        # splice a graphic-control extension right before the image block
        i = data.index(0x2C, 13)
        gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        data[i:i] = gce
        assert np.array_equal(decode_gif(bytes(data)), img)

    def test_interlaced_decode(self):
        """Hand-assemble an interlaced GIF: rows stored in the 4-pass
        order, interlace flag set; the decoder must reorder them back."""
        from parser_rdf_ray.pipelines.gifcodec import _lzw_encode, decode_gif

        rng = np.random.RandomState(9)
        h, w = 11, 5
        idx = rng.randint(0, 4, (h, w), dtype=np.uint8)
        palette = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        stored = idx[order]  # pass-ordered rows
        lzw = _lzw_encode(2, bytes(stored.ravel()))
        out = bytearray(b"GIF89a")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x80 | 1, 0, 0])  # global table, 4 entries
        out += palette.tobytes()
        out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x40])  # interlaced, no local table
        out += bytes([2])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00\x3b"
        assert np.array_equal(decode_gif(bytes(out)), palette[idx])

    def test_too_many_colors_and_junk_raise(self):
        from parser_rdf_ray.pipelines.gifcodec import decode_gif, encode_gif

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1000 colors
        with pytest.raises(ValueError, match="256"):
            encode_gif(img)
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"JUNK")

    def test_media_stage_accepts_gif(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.gifcodec import encode_gif
        from parser_rdf_ray.pipelines.multimodal import MediaDecoder, _image_feature

        img = np.zeros((8, 8, 3), np.uint8)
        img[::2] = (250, 10, 10)
        tbl = pa.Table.from_pydict(
            {
                "doc_id": ["1"],
                "media_ref": ["m/0"],
                "media_kind": ["image"],
                "payload": [encode_gif(img)],
            }
        )
        got = (
            ray.data.from_arrow(tbl)
            .map_batches(MediaDecoder(use_stub=False), batch_format="pyarrow")
            .to_pandas()
        )
        assert got.decode_ok.tolist() == [True]
        np.testing.assert_array_equal(np.array(got.feature[0]), _image_feature(img))


class TestCodecMalformedContract:
    """Every image decoder must raise ValueError / NotImplementedError on
    malformed payloads — never IndexError/KeyError/zlib.error (which
    would fail the whole Ray batch on a scraped corpus). Mutation fuzz
    originally surfaced 20 escaping exception classes across the three
    compressed decoders; pipelines/_codec_guard normalizes them."""

    def _fuzz(self, decode, base, trials=400, seed=7):
        rng = np.random.RandomState(seed)
        for _ in range(trials):
            b = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                op = rng.randint(3)
                if op == 0 and len(b) > 1:
                    b[rng.randint(len(b))] = rng.randint(256)
                elif op == 1 and len(b) > 4:
                    del b[rng.randint(len(b))]
                else:
                    b.insert(rng.randint(len(b)), rng.randint(256))
            try:
                decode(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            # anything else propagates and fails the test

    def test_jpeg_png_gif_mutation_fuzz(self):
        from parser_rdf_ray.pipelines.gifcodec import decode_gif, encode_gif
        from parser_rdf_ray.pipelines.jpegcodec import decode_jpeg, encode_jpeg
        from parser_rdf_ray.pipelines.multimodal import _decode_png, _encode_png

        rng = np.random.RandomState(31)
        img = rng.randint(0, 256, (8, 8, 3), np.uint8)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        self._fuzz(decode_jpeg, encode_jpeg(img))
        self._fuzz(_decode_png, _encode_png(img))
        self._fuzz(decode_gif, encode_gif(pal[rng.randint(0, 16, (8, 8))]))

    def test_allocation_bombs_rejected(self):
        """Mutated headers declaring absurd dimensions must raise, not
        allocate."""
        from parser_rdf_ray.pipelines.multimodal import _decode_netpbm, _decode_png

        with pytest.raises(ValueError, match="implausible"):
            _decode_netpbm(b"P6\n60000 60000\n255\n" + b"\x00" * 10)
        # PNG IHDR with 2^30 x 2^30
        import zlib

        def chunk(typ, d):
            return (
                len(d).to_bytes(4, "big") + typ + d
                + (zlib.crc32(typ + d) & 0xFFFFFFFF).to_bytes(4, "big")
            )

        ihdr = (1 << 30).to_bytes(4, "big") * 2 + bytes([8, 2, 0, 0, 0])
        data = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="implausible"):
            _decode_png(data)

    def test_resizer_survives_malformed_payload(self, ray_session):
        """A malformed real payload yields a zero-dims marker row instead
        of failing the batch."""
        from parser_rdf_ray.pipelines.multimodal import MediaResizer

        rs = MediaResizer(out_w=4, out_h=4, use_stub=False)
        tbl = pa.Table.from_pydict(
            {
                "doc_id": ["1", "2"],
                "media_ref": ["m/0", "m/1"],
                "media_kind": ["image", "image"],
                "payload": [b"\x89PNG\r\n\x1a\nGARBAGE", b"P6\n2 2\n255\n" + b"\x11" * 12],
            }
        )
        out = rs(tbl).to_pydict()
        assert out["src_w"] == [0, 2]
        assert out["src_h"] == [0, 2]


class TestTiffCodec:
    def test_round_trips_and_big_endian(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_tiff, _encode_tiff

        rng = np.random.RandomState(47)
        rgb = rng.randint(0, 256, (9, 7, 3), np.uint8)
        gray = rng.randint(0, 256, (5, 11), np.uint8)
        assert np.array_equal(_decode_tiff(_encode_tiff(rgb)), rgb)
        assert np.array_equal(_decode_tiff(_encode_tiff(gray)), gray)

    def test_hand_built_big_endian_two_strips(self):
        """Independent of the (little-endian, one-strip) encoder: a
        big-endian TIFF with TWO strips, built byte-by-byte."""
        from parser_rdf_ray.pipelines.multimodal import _decode_tiff

        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        strips = [img[:2].tobytes(), img[2:].tobytes()]

        def be2(v):
            return v.to_bytes(2, "big")

        def be4(v):
            return v.to_bytes(4, "big")

        n_tags = 8
        ifd_off = 8
        arr_off = ifd_off + 2 + 12 * n_tags + 4
        bps_off, so_off, sc_off = arr_off, arr_off + 6, arr_off + 14
        data_off = arr_off + 22
        entries = b"".join(
            [
                be2(256) + be2(4) + be4(1) + be4(4),
                be2(257) + be2(4) + be4(1) + be4(4),
                be2(258) + be2(3) + be4(3) + be4(bps_off),
                be2(259) + be2(3) + be4(1) + be2(1) + b"\x00\x00",
                be2(262) + be2(3) + be4(1) + be2(2) + b"\x00\x00",
                be2(273) + be2(4) + be4(2) + be4(so_off),
                be2(277) + be2(3) + be4(1) + be2(3) + b"\x00\x00",
                be2(279) + be2(4) + be4(2) + be4(sc_off),
            ]
        )
        data = (
            b"MM\x00*" + be4(ifd_off) + be2(n_tags) + entries + be4(0)
            + be2(8) * 3
            + be4(data_off) + be4(data_off + len(strips[0]))
            + be4(len(strips[0])) + be4(len(strips[1]))
            + strips[0] + strips[1]
        )
        assert np.array_equal(_decode_tiff(data), img)

    def test_unsupported_and_malformed(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_tiff, _encode_tiff

        img = np.zeros((2, 2, 3), np.uint8)
        data = bytearray(_encode_tiff(img))
        # flip the compression tag value (259, type SHORT) to 5 (LZW)
        i = data.index((259).to_bytes(2, "little"))
        data[i + 8] = 5
        with pytest.raises(NotImplementedError, match="uncompressed"):
            _decode_tiff(bytes(data))
        with pytest.raises(ValueError, match="not a TIFF"):
            _decode_tiff(b"JUNK")
        # mutation fuzz: malformed contract
        rng = np.random.RandomState(17)
        base = _encode_tiff(img)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                b[rng.randint(len(b))] = rng.randint(256)
            try:
                _decode_tiff(bytes(b))
            except (ValueError, NotImplementedError):
                pass


class TestG711Wav:
    """G.711 mu-law / A-law WAV expansion, verified byte-for-byte over
    ALL 256 code points against stdlib audioop (an independent reference
    implementation)."""

    def test_expansion_matches_audioop_exactly(self):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        from parser_rdf_ray.pipelines.multimodal import (
            _alaw_to_linear,
            _mulaw_to_linear,
        )

        allb = np.arange(256, dtype=np.uint8)
        np.testing.assert_array_equal(
            _mulaw_to_linear(allb),
            np.frombuffer(audioop.ulaw2lin(allb.tobytes(), 2), "<i2"),
        )
        np.testing.assert_array_equal(
            _alaw_to_linear(allb),
            np.frombuffer(audioop.alaw2lin(allb.tobytes(), 2), "<i2"),
        )

    @staticmethod
    def _wav(fmt_code, bits, payload: bytes) -> bytes:
        fmt = (
            fmt_code.to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
        body = (
            b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(payload).to_bytes(4, "little") + payload
        )
        return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body

    def test_wav_container_routes_encodings(self):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
        from parser_rdf_ray.pipelines.multimodal import _decode_wav_pcm16

        rng = np.random.RandomState(3)
        codes = rng.randint(0, 256, 300, dtype=np.uint8).tobytes()
        got_u = _decode_wav_pcm16(self._wav(7, 8, codes))
        np.testing.assert_array_equal(
            got_u, np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
        )
        got_a = _decode_wav_pcm16(self._wav(6, 8, codes))
        np.testing.assert_array_equal(
            got_a, np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
        )
        with pytest.raises(NotImplementedError, match="WAVE"):
            _decode_wav_pcm16(self._wav(2, 4, codes))  # ADPCM


class TestRepetitionSignals:
    def test_matches_independent_python(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.text import repetition_signals

        texts = {
            1: "a b\na b\nc d",            # dup line; bigrams: (a b)x2,(b a),(b c),(c d)
            2: "hello",                      # 1 token -> 0 bigrams
            3: "",                           # 1 empty line, 0 tokens
            4: "x x x x",                    # top bigram (x x) = 3
        }
        tbl = pa.Table.from_pydict(
            {"doc_id": list(texts), "text": list(texts.values())}
        )
        got = (
            repetition_signals(ray.data.from_arrow(tbl))
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )

        def expect(t):
            lines = t.split("\n")
            toks = t.strip().split() if t.strip() else []
            bigrams = [tuple(toks[i : i + 2]) for i in range(len(toks) - 1)]
            from collections import Counter

            bc = Counter(bigrams)
            return (
                len(lines),
                len(lines) - len(set(lines)),
                len(bigrams),
                max(bc.values()) if bc else 0,
            )

        for d, t in texts.items():
            nl, dl, nb, tb = expect(t)
            row = got.loc[d]
            assert (row.n_lines, row.dup_lines, row.n_bigrams,
                    row.top_bigram_count) == (nl, dl, nb, tb), (d, t)


class TestTrainingSetComposite:
    def test_each_stage_visible_in_output(self, ray_session):
        """Hand-checkable composite: quality gate drops short docs,
        dedup keeps cluster representatives, eval docs and contaminated
        docs drop, split and packing follow their standalone contracts."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import training_set

        # eval membership: md5(doc_id) % 100 < 10
        ids = list(range(400))
        evals = [i for i in ids if _md5_low64(str(i)) % 100 < 10]
        trains = [i for i in ids if _md5_low64(str(i)) % 100 >= 10]
        def words(prefix, n):
            # letter-only tokens so the 0.6 alpha-ratio quality gate passes
            return " ".join(
                f"{prefix}{chr(97 + j % 26)}{chr(97 + (j // 26) % 26)}"
                for j in range(n)
            )

        base = words("w", 30)
        texts = {}
        texts[evals[0]] = "evalgram one two " + base  # eval doc
        texts[trains[0]] = "evalgram one two " + base + " tail"  # contaminated
        texts[trains[1]] = "short doc"  # fails quality (< 20 tokens)
        texts[trains[2]] = words("u", 30) + " unique alpha beta gamma delta"
        texts[trains[3]] = words("u", 30) + " unique alpha beta gamma delta"
        texts[trains[4]] = words("z", 25)
        docs = pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[i] for i in texts]}
        ).astype({"doc_id": np.int64})
        out = (
            training_set(ray.data.from_pandas(docs), seq_len=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        kept = set(out.doc_id)
        assert evals[0] not in kept  # eval removed
        assert trains[0] not in kept  # contaminated removed
        assert trains[1] not in kept  # quality-failed removed
        # near-dup pair: only the min doc_id representative survives
        assert min(trains[2], trains[3]) in kept
        assert max(trains[2], trains[3]) not in kept
        assert trains[4] in kept
        # split follows the md5 contract; packing is the exclusive prefix
        for _, r in out.iterrows():
            want = "train" if _md5_low64(str(int(r.doc_id))) % 100 < 90 else "val"
            assert r.split == want
        srt = out.sort_values("doc_id")
        assert srt.start_tok.tolist() == np.concatenate(
            [[0], np.cumsum(srt.n_tokens.to_numpy())[:-1]]
        ).tolist()
        assert (srt.first_seq == srt.start_tok // 16).all()


class TestCapPerSource:
    def test_cap_binds_heavy_sources_and_keeps_light_ones(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import cap_per_source

        rows = []
        for i in range(30):
            rows.append((i, "heavy.example"))        # 30 docs, cap binds
        for i in range(30, 35):
            rows.append((i, "light.example"))        # 5 docs, all kept
        docs = pd.DataFrame(rows, columns=["doc_id", "source"]).astype(
            {"doc_id": np.int64}
        )
        out = (
            cap_per_source(ray.data.from_pandas(docs).repartition(6), cap=10)
            .to_pandas()
        )
        by_src = out.groupby("source").doc_id.apply(set)
        assert len(by_src["heavy.example"]) == 10
        assert by_src["light.example"] == set(range(30, 35))
        # the kept heavy subset is the 10 hash-smallest (deterministic)
        expect = sorted(
            range(30), key=lambda i: (_md5_low64(str(i)) % (1 << 63), i)
        )[:10]
        assert by_src["heavy.example"] == set(expect)
        # stability: growing the heavy source only displaces at the boundary
        grown = pd.concat(
            [docs, pd.DataFrame({"doc_id": np.arange(100, 120, dtype=np.int64),
                                 "source": "heavy.example"})]
        )
        out2 = cap_per_source(
            ray.data.from_pandas(grown).repartition(6), cap=10
        ).to_pandas()
        kept2 = set(out2[out2.source == "heavy.example"].doc_id)
        assert kept2 & set(range(30)) <= by_src["heavy.example"]


class TestWeightedPrioritySample:
    def _brute(self, ids, weights, k):
        keys = [
            ((_md5_low64(str(i)) >> 11) / max(w, 1), i)
            for i, w in zip(ids, weights)
        ]
        return [i for _, i in sorted(keys)[:k]]

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import weighted_priority_sample

        rng = np.random.default_rng(3)
        n = 400
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "n_chars": rng.integers(0, 2000, size=n).astype(np.int64),
            }
        )
        out = (
            weighted_priority_sample(ray.data.from_pandas(docs).repartition(8), k=37)
            .to_pandas()
        )
        assert sorted(out.doc_id) == sorted(
            self._brute(docs.doc_id, docs.n_chars, 37)
        )
        # emitted weight is the clamped one
        by_id = docs.set_index("doc_id").n_chars
        for _, r in out.iterrows():
            assert r.weight == max(int(by_id[r.doc_id]), 1)

    def test_weight_proportional_bias(self, ray_session):
        """A document 50x heavier must be sampled far more often than a
        light one — check aggregate bias: the sampled set's mean weight
        exceeds the population's."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import weighted_priority_sample

        rng = np.random.default_rng(9)
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(1000, dtype=np.int64),
                "n_chars": np.where(
                    rng.random(1000) < 0.5, 10, 500
                ).astype(np.int64),
            }
        )
        out = weighted_priority_sample(
            ray.data.from_pandas(docs).repartition(4), k=100
        ).to_pandas()
        assert out.weight.mean() > docs.n_chars.mean() * 1.5

    def test_growth_stability_bottom_k(self, ray_session):
        """Adding documents can only DISPLACE members at the k-boundary —
        every member of the new sample that existed before either was in
        the old sample or has a smaller priority than someone who was
        (the bottom-k sketch property; membership is a pure function of
        (doc_id, weight))."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import weighted_priority_sample

        rng = np.random.default_rng(5)
        base = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "n_chars": rng.integers(1, 900, size=300).astype(np.int64),
            }
        )
        grown = pd.concat(
            [base, pd.DataFrame({"doc_id": np.arange(300, 360, dtype=np.int64),
                                 "n_chars": rng.integers(1, 900, size=60).astype(np.int64)})]
        )
        k = 50
        s1 = set(weighted_priority_sample(
            ray.data.from_pandas(base).repartition(4), k=k).to_pandas().doc_id)
        s2 = set(weighted_priority_sample(
            ray.data.from_pandas(grown).repartition(4), k=k).to_pandas().doc_id)
        # old docs still in the grown sample must have been in the old one
        assert (s2 & set(base.doc_id)) <= s1


class TestGopherQualityProfile:
    def _docs(self):
        def words(prefix, n):
            return " ".join(
                f"{prefix}{chr(97 + j % 26)}{chr(97 + (j // 26) % 26)}"
                for j in range(n)
            )

        # doc 0: clean multi-line prose — passes everything
        clean = "\n".join(words(f"l{k}", 10) for k in range(4))
        # doc 1: boilerplate — same line repeated 10 times (dup-line
        # fraction 90% > 30%)
        dupline = "\n".join([words("dup", 10)] * 10)
        # doc 2: looping generation — one bigram dominates (top-bigram
        # fraction far above 18%)
        loop = " ".join(["spam ham"] * 20) + " " + words("x", 5)
        return pd.DataFrame(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                "text": [clean, dupline, loop],
            }
        )

    def test_repetition_rules_fire_in_gate(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import quality_filter

        docs = self._docs()
        base = quality_filter(ray.data.from_pandas(docs)).to_pandas()
        assert sorted(base.doc_id) == [0, 1, 2]  # length/alpha alone keep all
        gated = quality_filter(
            ray.data.from_pandas(docs), max_dup_line_pct=30, max_top_bigram_pct=18
        ).to_pandas()
        assert sorted(gated.doc_id) == [0]  # both repetition rules fired

    def test_gate_thresholds_match_repetition_signals(self, ray_session):
        """The gate's keep decision must equal thresholding the standalone
        repetition_signals output — same single-source counts."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import quality_filter
        from parser_rdf_ray.pipelines.text import repetition_signals

        docs = self._docs()
        sig = repetition_signals(ray.data.from_pandas(docs)).to_pandas().set_index("doc_id")
        expect = sig[
            (sig.dup_lines * 100 <= 30 * sig.n_lines)
            & (sig.top_bigram_count * 100 <= 18 * sig.n_bigrams)
        ].index
        gated = quality_filter(
            ray.data.from_pandas(docs), max_dup_line_pct=30, max_top_bigram_pct=18
        ).to_pandas()
        assert sorted(gated.doc_id) == sorted(expect)

    def test_single_threshold_variants(self, ray_session):
        import ray.data

        from parser_rdf_ray.pipelines.curation import quality_filter

        docs = self._docs()
        only_lines = quality_filter(
            ray.data.from_pandas(docs), max_dup_line_pct=30
        ).to_pandas()
        assert sorted(only_lines.doc_id) == [0, 2]
        only_bigram = quality_filter(
            ray.data.from_pandas(docs), max_top_bigram_pct=18
        ).to_pandas()
        assert sorted(only_bigram.doc_id) == [0, 1]


class TestClaimedCodecPaths:
    def test_jpeg_422_constant_color(self):
        """4:2:2 (h=2, v=1 luma) — claimed, now pinned via a hand-built
        constant-color MCU (2 Y + Cb + Cr blocks)."""
        from parser_rdf_ray.pipelines.jpegcodec import (
            _BitWriter,
            _build_huffman,
            decode_jpeg,
        )

        dc_bits = [0, 0, 0, 12] + [0] * 12
        ac_bits = [0, 1] + [0] * 14
        _, dc_enc = _build_huffman(dc_bits, list(range(12)))
        _, ac_enc = _build_huffman(ac_bits, [0x00])

        def put_dc(wtr, diff):
            s = int(abs(diff)).bit_length()
            ln, code = dc_enc[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            ln, code = ac_enc[0x00]
            wtr.write(code, ln)

        wtr = _BitWriter()
        put_dc(wtr, 6)   # Y block 1
        put_dc(wtr, 0)   # Y block 2
        put_dc(wtr, -4)  # Cb
        put_dc(wtr, 2)   # Cr
        scan = wtr.flush()

        def seg(m, b):
            return bytes([0xFF, m]) + (len(b) + 2).to_bytes(2, "big") + b

        data = (
            b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([16] * 64))
            + seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
                  + bytes([3, 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
            + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
            + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
            + scan + b"\xff\xd9"
        )
        got = decode_jpeg(data)
        assert got.shape == (8, 16, 3)
        y, cb, cr = 140.0, 120.0, 132.0  # dc*16/8 + 128
        exp = np.clip(np.rint([
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ]), 0, 255).astype(np.uint8)
        assert np.array_equal(got, np.broadcast_to(exp, (8, 16, 3)))

    def test_gif_local_color_table(self):
        from parser_rdf_ray.pipelines.gifcodec import _lzw_encode, decode_gif

        idx = np.array([[0, 1], [1, 0]], np.uint8)
        local = np.array([[10, 20, 30], [200, 210, 220]], np.uint8)
        lzw = _lzw_encode(2, bytes(idx.ravel()))
        out = bytearray(b"GIF89a")
        out += (2).to_bytes(2, "little") * 2 + bytes([0, 0, 0])  # NO global table
        out += b"\x2c" + b"\x00" * 4 + (2).to_bytes(2, "little") * 2
        out += bytes([0x80 | 0])  # local table, 2 entries (bits-1 = 0)
        out += local.tobytes() + bytes([2])
        for i in range(0, len(lzw), 255):
            out += bytes([len(lzw[i:i+255])]) + lzw[i:i+255]
        out += b"\x00\x3b"
        assert np.array_equal(decode_gif(bytes(out)), local[idx])

    def test_bmp_topdown_negative_height(self):
        from parser_rdf_ray.pipelines.multimodal import _decode_bmp24

        img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
        # hand-build a TOP-DOWN (negative height) 24-bit BMP
        stride = (2 * 3 + 3) & ~3
        rows = b""
        for y in range(2):  # top-down: natural order
            row = img[y, :, ::-1].tobytes()  # RGB->BGR
            rows += row + b"\x00" * (stride - len(row))
        off = 54
        header = (
            b"BM" + (off + len(rows)).to_bytes(4, "little") + b"\x00" * 4
            + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
            + (2).to_bytes(4, "little") + (-2).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(rows).to_bytes(4, "little")
            + b"\x00" * 16
        )
        assert np.array_equal(_decode_bmp24(header + rows), img)

    def test_bmp_zero_height_is_malformed(self):
        # h == 0 must take the malformed path (ValueError), not decode to
        # an empty (0, w, 3) image with decode_ok=True
        from parser_rdf_ray.pipelines.multimodal import _decode_bmp24

        off = 54
        header = (
            b"BM" + off.to_bytes(4, "little") + b"\x00" * 4
            + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
            + (2).to_bytes(4, "little") + (0).to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
            + b"\x00" * 16
        )
        with pytest.raises(ValueError):
            _decode_bmp24(header)

    def test_wav_container_parse_is_guarded(self):
        # the malformed-payload guard sits on the WAV CONTAINER parser
        # (not the numpy expansion helpers): a truncated fmt chunk whose
        # slice arithmetic would surface as IndexError/struct garbage must
        # come back as ValueError/NotImplementedError only
        from parser_rdf_ray.pipelines.multimodal import _decode_wav_pcm16

        # fmt chunk claims a huge size so body slicing goes degenerate
        bad = b"RIFF" + (100).to_bytes(4, "little") + b"WAVE" + b"fmt " + (
            0
        ).to_bytes(4, "little")
        with pytest.raises((ValueError, NotImplementedError)):
            _decode_wav_pcm16(bad)


class TestDecontaminateHotGram:
    def test_stop_gram_mega_run_is_correct(self, ray_session):
        """A gram shared by EVERY document (the documented skew hazard)
        must still produce the correct verdicts."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import decontaminate

        n = 300
        # every doc contains the same 3-gram "common stop gram"
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [f"common stop gram unique{i} tail{i}" for i in range(n)],
            }
        )
        out = decontaminate(
            ray.data.from_pandas(docs).repartition(8), eval_pct=10, n=3
        ).to_pandas()
        # the shared gram is in the eval set too, so every train doc is
        # contaminated — and every train doc must be present exactly once
        trains = [i for i in range(n) if _md5_low64(str(i)) % 100 >= 10]
        assert sorted(out.doc_id) == trains
        assert out.contaminated.all()

    def test_max_df_guard_skips_stop_grams(self, ray_session):
        """With max_df forced low, the stop-gram run is SKIPPED (treated
        as a stop-gram, logged) — docs contaminated only via it come back
        clean, while contamination through sub-cap grams still flags."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import decontaminate

        n = 300
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [f"common stop gram unique{i} tail{i}" for i in range(n)],
            }
        )
        # doc 0 is eval at eval_pct=10? find one eval doc and give one
        # train doc a PRIVATE shared 3-gram with it (df=2 < cap)
        evals = [i for i in range(n) if _md5_low64(str(i)) % 100 < 10]
        trains = [i for i in range(n) if _md5_low64(str(i)) % 100 >= 10]
        e0, t0 = evals[0], trains[0]
        docs.loc[docs.doc_id == e0, "text"] += " shared private gram"
        docs.loc[docs.doc_id == t0, "text"] += " shared private gram"
        out = decontaminate(
            ray.data.from_pandas(docs).repartition(8), eval_pct=10, n=3, max_df=10
        ).to_pandas().set_index("doc_id")
        # the df=300 stop gram is over cap -> everyone clean EXCEPT t0,
        # whose df=2 private gram still flags
        assert bool(out.loc[t0, "contaminated"]) is True
        others = out.drop(index=t0)
        assert not others.contaminated.any()
        # and the default cap must NOT fire on this corpus
        out_def = decontaminate(
            ray.data.from_pandas(docs).repartition(8), eval_pct=10, n=3
        ).to_pandas()
        assert out_def.contaminated.all()

    def test_train_side_restriction_matches_full_on_intersection(self, ray_session):
        """decontaminate(train_side_ds=subset) must agree with the full
        run on every doc of the subset (the training_set composition
        guarantee: kept ⊆ survivors)."""
        import ray.data

        from parser_rdf_ray.pipelines.curation import decontaminate

        n = 200
        rng = np.random.default_rng(5)
        vocab = [f"w{j}" for j in range(40)]
        texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(n)]
        docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
        full = (
            decontaminate(ray.data.from_pandas(docs).repartition(8), eval_pct=15, n=3)
            .to_pandas().set_index("doc_id").sort_index()
        )
        sub = docs[docs.doc_id % 3 != 0]  # arbitrary survivor subset
        restricted = decontaminate(
            ray.data.from_pandas(docs).repartition(8),
            eval_pct=15,
            n=3,
            train_side_ds=ray.data.from_pandas(sub).repartition(4),
        ).to_pandas().set_index("doc_id").sort_index()
        # verdict covers exactly the subset's train docs…
        assert set(restricted.index) == set(full.index) & set(sub.doc_id)
        # …and agrees with the full run on all of them
        assert restricted.contaminated.equals(
            full.loc[restricted.index].contaminated
        )
