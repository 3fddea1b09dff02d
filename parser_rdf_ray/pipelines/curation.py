"""Corpus-curation operators: the end-to-end keep/drop decisions a
training-data pipeline makes, composed from the engine's vectorized
primitives — and each SQL-reproducible so the driver oracle verifies the
composition, not just the pieces.

- hash_split: deterministic train/validation assignment by content-free
  doc_id hashing (md5-low64 == DuckDB md5_number_lower, the same
  SQL-equality contract as pipelines/dedup._md5_low64). Split membership
  is stable under corpus growth/reordering — the property a resumable
  100 TB ingest needs (a re-run must not migrate documents across
  splits).
- curate_corpus: quality gate (vectorized Arrow kernels — token count,
  alphabetic ratio) → near-duplicate clustering (minhash LSH + verify,
  pipelines/dedup.py) → keep one representative per cluster. Exact
  duplicates are jaccard-1.0 pairs, so a separate exact-dedup pass is
  subsumed by the cluster step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from parser_rdf_ray.pipelines.dedup import near_dup_clusters


def split_values(ids, train_pct: int) -> pa.Array:
    """train/val labels for int doc_ids (list or pyarrow int array) —
    THE split contract (md5-low64(doc_id) % 100 < train_pct), shared by
    hash_split and curated_corpus_with_split so the rule cannot drift
    between the standalone op and the end-to-end pipeline.  Hashing is
    the vectorized lane-parallel MD5 (md5vec) — bit-identical to the
    SQL oracle's md5_number_lower, zero per-row hashlib dispatch."""
    from parser_rdf_ray.md5vec import md5_low64_ids

    train = md5_low64_ids(ids) % 100 < train_pct
    return pc.if_else(pa.array(train), pa.scalar("train"), pa.scalar("val"))


def _split_batch(batch: pa.Table, train_pct: int) -> pa.Table:
    ids = pc.cast(batch.column("doc_id"), pa.int64())
    return pa.Table.from_arrays(
        [ids, split_values(ids, train_pct)],
        names=["doc_id", "split"],
    )


def hash_split(documents_ds, train_pct: int = 90):
    """(doc_id, split) with split ∈ {train, val}: md5-low64(doc_id) % 100
    against train_pct. Deterministic, content-free, stable under corpus
    growth; SQL oracle: md5_number_lower(CAST(doc_id AS VARCHAR)) % 100."""
    return documents_ds.map_batches(
        lambda b: _split_batch(b, train_pct),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def quality_filter(
    documents_ds,
    min_tokens: int = 20,
    min_alpha: float = 0.6,
    max_dup_line_pct: int | None = None,
    max_top_bigram_pct: int | None = None,
):
    """(doc_id, text, n_tokens) rows passing the quality gate: whitespace
    token count ≥ min_tokens AND alphabetic-character ratio ≥ min_alpha —
    the SHARED metric definitions from pipelines/text.py (n_tokens_of /
    alpha_ratio_of), so the curation SQL oracle and quality_batch can
    never drift apart.  The token count the gate already computed rides
    along so downstream consumers (training_set's packing) never re-scan
    the surviving text for it.

    Optional GOPHER REPETITION PROFILE (Rae et al. 2021): when
    max_dup_line_pct / max_top_bigram_pct are set, the SAME scan also
    computes the within-document repetition counts (the
    repetition_signals single source, pipelines/text.
    repetition_counts_frame — one map_batches emits both signal sets, no
    second text pass) and additionally requires
        dup_lines × 100 ≤ max_dup_line_pct × n_lines
        top_bigram_count × 100 ≤ max_top_bigram_pct × n_bigrams
    — integer-exact inequalities (percent thresholds), so the SQL oracle
    replays them without float comparisons."""
    import polars as pl

    from parser_rdf_ray.pipelines.text import (
        alpha_ratio_of,
        n_tokens_of,
        repetition_counts_frame,
    )

    use_rep = max_dup_line_pct is not None or max_top_bigram_pct is not None

    def gate(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        toks = n_tokens_of(text)
        keep = pc.and_(
            pc.greater_equal(toks, min_tokens),
            pc.greater_equal(alpha_ratio_of(text), min_alpha),
        )
        if use_rep:
            # the thresholds AND with the cheap gates, so repetition
            # counts (the expensive line-split + bigram group_by) are
            # only computed for rows the length/alpha gates KEPT —
            # tokenize-after-filter, result-identical
            keep_np = np.asarray(pc.fill_null(keep, False)).astype(bool)
            kept_pos = np.flatnonzero(keep_np)
            if len(kept_pos):
                ids = pc.cast(batch.column("doc_id"), pa.int64())
                sub_ids = np.asarray(ids, dtype=np.int64)[kept_pos]
                rep = repetition_counts_frame(
                    pl.DataFrame(
                        {
                            "doc_id": pl.Series(sub_ids),
                            "text": pl.from_arrow(text.take(pa.array(kept_pos))),
                        }
                    )
                )
                # repetition_counts_frame sorts by doc_id; align back to
                # the kept-row order with a searchsorted gather (doc_ids
                # unique per batch by construction)
                order = np.searchsorted(rep["doc_id"].to_numpy(), sub_ids)
                ok = np.ones(len(rep), dtype=bool)
                if max_dup_line_pct is not None:
                    ok &= (
                        rep["dup_lines"].to_numpy() * 100
                        <= max_dup_line_pct * rep["n_lines"].to_numpy()
                    )
                if max_top_bigram_pct is not None:
                    ok &= (
                        rep["top_bigram_count"].to_numpy() * 100
                        <= max_top_bigram_pct * rep["n_bigrams"].to_numpy()
                    )
                keep_np[kept_pos] = ok[order]
                keep = pa.array(keep_np)
        out = pa.Table.from_arrays(
            [pc.cast(batch.column("doc_id"), pa.int64()), text, toks],
            names=["doc_id", "text", "n_tokens"],
        )
        return out.filter(keep)

    return documents_ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def curation_core(
    documents_ds,
    min_tokens: int = 20,
    min_alpha: float = 0.6,
    threshold: float = 0.8,
    max_dup_line_pct: int | None = None,
    max_top_bigram_pct: int | None = None,
):
    """(survivors, kept): quality gate → near-dup clustering over the
    SURVIVORS → one representative (component-min doc_id) per cluster —
    computed ONCE. curate_corpus / curation_report /
    curated_corpus_with_split all build on this, and a caller that wants
    more than one of those passes the same core through so the quality
    regex pass and the minhash banding never run twice per job.

    The survivor set is consumed three times downstream (minhash banding,
    verify-text lookup, cluster assignment), so it is pinned with
    materialize() — re-running the corpus read + regex gate 3× costs more
    than holding (doc_id, text) blocks in the object store, which spills
    to disk rather than OOMing when the survivor set outgrows memory."""
    survivors = quality_filter(
        documents_ds, min_tokens, min_alpha,
        max_dup_line_pct=max_dup_line_pct,
        max_top_bigram_pct=max_top_bigram_pct,
    ).materialize()
    return survivors, keep_set(survivors, threshold)


def keep_set(survivors_ds, threshold: float = 0.8):
    """Keep-one-per-near-dup-cluster (doc_id) ids over a survivors
    dataset: LSH clustering → component-min representative filter. The
    checkpointable LSH stage of the composite (job.py training-set)."""
    clusters = near_dup_clusters(survivors_ds, threshold=threshold)

    def keep_reps(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("cluster_rep"), batch.column("doc_id"))
        return batch.filter(keep).select(["doc_id"])

    return clusters.map_batches(
        keep_reps, batch_format="pyarrow", zero_copy_batch=True
    )


def curate_corpus(
    documents_ds,
    min_tokens: int = 20,
    min_alpha: float = 0.6,
    threshold: float = 0.8,
    core=None,
):
    """The composed keep-set as a (doc_id) dataset — see curation_core."""
    if core is None:
        core = curation_core(documents_ds, min_tokens, min_alpha, threshold)
    return core[1]


def curation_report(
    documents_ds,
    min_tokens: int = 20,
    min_alpha: float = 0.6,
    threshold: float = 0.8,
    core=None,
) -> dict:
    """curate_corpus plus the numbers an operator needs to TRUST the run:
    docs in, quality survivors, kept representatives, and the LSH
    bucket-size audit (pipelines/dedup.minhash_bucket_audit). A non-zero
    ``overcap_buckets`` means pair enumeration was truncated and near-dup
    clusters may have split — the condition that silently weakens curation
    on a pathological corpus is surfaced here at the pipeline-output
    level, not just in worker logs."""
    from parser_rdf_ray.pipelines.dedup import minhash_bucket_audit

    if core is None:
        core = curation_core(documents_ds, min_tokens, min_alpha, threshold)
    survivors, kept = core
    return {
        "docs_in": documents_ds.count(),
        "quality_survivors": survivors.count(),
        "kept": kept.count(),
        **minhash_bucket_audit(survivors),
    }


def stratified_sample(documents_ds, rates: dict[str, int], default_pct: int = 10):
    """Deterministic per-stratum sampling: keep a document iff
    md5-low64(doc_id) % 100 < rates[lang] (pct). The training-data
    rebalancing primitive (e.g. downsample English, keep all low-resource
    languages) with hash_split's stability contract: membership is a pure
    function of doc_id, so corpus growth or re-runs never change a kept
    document's fate — the resumable-ingest property. Content-free, one
    streaming pass, no shuffle; SQL oracle via md5_number_lower."""

    def gate(batch: pa.Table) -> pa.Table:
        from parser_rdf_ray.md5vec import md5_low64_ids

        ids = pc.cast(batch.column("doc_id"), pa.int64())
        langs = batch.column("lang").to_pylist()
        buckets = md5_low64_ids(ids) % 100
        # per-row dict lookup over the tiny rate table only; the hash
        # itself is vectorized
        thresh = np.fromiter(
            (rates.get(lang, default_pct) for lang in langs),
            dtype=np.uint64,
            count=len(langs),
        )
        keep = pa.array(buckets < thresh)
        return (
            pa.Table.from_arrays(
                [ids, pc.cast(batch.column("lang"), pa.string())],
                names=["doc_id", "lang"],
            ).filter(keep)
        )

    return documents_ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def filter_blocklist(documents_ds, blocked_sources: list[str]):
    """Anti-join corpus gate: drop every document whose ``source`` is on
    the blocklist (the takedown/bad-domain filter every training corpus
    needs). The blocklist is a SMALL side: it ships as a closure constant
    into each task (an Arrow value_set — no shuffle, no broadcast round
    trip); is_in is one vectorized kernel per batch. Returns kept
    (doc_id, source) rows."""
    value_set = pa.array(sorted(blocked_sources), pa.string())

    def gate(batch: pa.Table) -> pa.Table:
        src = pc.cast(batch.column("source"), pa.string())
        keep = pc.invert(pc.is_in(src, value_set=value_set))
        return pa.Table.from_arrays(
            [pc.cast(batch.column("doc_id"), pa.int64()), src],
            names=["doc_id", "source"],
        ).filter(keep)

    return documents_ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


CURATED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("split", pa.string()),
    ]
)


def curated_corpus_with_split(
    documents_ds,
    min_tokens: int = 20,
    min_alpha: float = 0.6,
    threshold: float = 0.8,
    train_pct: int = 90,
    core=None,
):
    """The deliverable a training run actually consumes: the curated
    keep-set joined back to full document rows, with the deterministic
    train/val split attached — quality gate → near-dup clustering →
    representatives → semi join → hash split, end to end.

    The keep-set ⋈ documents step is the engine's sorted-run SEMI JOIN
    (tagged union, ONE doc_id sort, vectorized existence scan) — the
    kept set is corpus-scale, so no broadcast. Split membership is the
    hash_split md5 contract (pure function of doc_id, growth-stable)."""
    import numpy as np

    from parser_rdf_ray.stages.groups import run_spans
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    kept = curate_corpus(documents_ds, min_tokens, min_alpha, threshold, core=core)

    union_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("kind", pa.int8()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
        ]
    )

    def tag_kept(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("doc_id"), pa.int64()),
                pa.array(np.zeros(n, dtype=np.int8)),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
            ],
            schema=union_schema,
        )

    def tag_docs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("doc_id"), pa.int64()),
                pa.array(np.ones(n, dtype=np.int8)),
                pc.cast(b.column("text"), pa.string()),
                pc.cast(b.column("lang"), pa.string()),
                pc.cast(b.column("source"), pa.string()),
            ],
            schema=union_schema,
        )

    tagged = kept.map_batches(
        tag_kept, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        documents_ds.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
    )
    srt = tagged.sort("doc_id")

    def join_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return CURATED_SCHEMA.empty_table()
        starts, _ = run_spans(batch, ["doc_id"])
        kinds = batch.column("kind").to_numpy()
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        kept_in_run = np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0
        keep = (kinds == 1) & kept_in_run[run_ids]
        rows = batch.filter(pa.array(keep))
        split = split_values(rows.column("doc_id"), train_pct)
        return pa.Table.from_arrays(
            [
                rows.column("doc_id"),
                rows.column("text"),
                rows.column("lang"),
                rows.column("source"),
                split,
            ],
            schema=CURATED_SCHEMA,
        )

    return srt.map_batches(
        join_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


PER_GROUP_SAMPLE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("lang", pa.string()), ("rank_hash", pa.int64())]
)


def per_group_sample(documents_ds, k: int = 5):
    """Deterministic balanced subset: the k documents per language with
    the smallest md5-low64(doc_id) — per-group sampling without
    replacement as a hash-ranked grouped top-k (stages/groups.grouped_topk:
    per-batch combiner bounds the shuffle to k×blocks rows per group).
    Like hash_split, membership is a pure function of doc_id, so the
    sample is stable under corpus growth EXCEPT at the k-boundary (a new
    doc with a smaller hash displaces exactly one member — the standard
    bottom-k sketch property). rank_hash is emitted int64 (md5-low64
    mod 2^63, sign-safe) so the SQL oracle ranks identically."""
    from parser_rdf_ray.stages.groups import grouped_topk

    def project(batch: pa.Table) -> pa.Table:
        from parser_rdf_ray.md5vec import md5_low64_ids

        ids = pc.cast(batch.column("doc_id"), pa.int64())
        hashes = pa.array(
            (md5_low64_ids(ids) % np.uint64(1 << 63)).astype(np.int64),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [ids, pc.cast(batch.column("lang"), pa.string()), hashes],
            schema=PER_GROUP_SAMPLE_SCHEMA,
        )

    projected = documents_ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_topk(
        projected, ["lang"], "rank_hash", k, descending=False, tie_cols=["doc_id"]
    )


SOURCE_CAP_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("source", pa.string()), ("rank_hash", pa.int64())]
)


def cap_per_source(documents_ds, cap: int = 50):
    """PER-SOURCE FREQUENCY CAP: keep at most ``cap`` documents per
    source — the anti-spam / anti-boilerplate domain cap every web-corpus
    pipeline applies (a single crawled domain must not dominate the
    training mix; cf. C4 / RefinedWeb per-domain limits). Sources under
    the cap keep EVERY document; heavy sources keep a deterministic
    hash-ranked subset, so membership is a pure function of doc_id (the
    hash_split stability contract — re-runs and corpus growth never
    reshuffle a kept document's fate except at the cap boundary).

    Distributed form: stages/groups.grouped_topk — the per-batch combiner
    bounds the shuffle to cap × blocks rows per source; document text
    never moves. rank_hash (md5-low64 mod 2^63, int64 sign-safe) is
    emitted so the SQL oracle ranks identically."""
    from parser_rdf_ray.stages.groups import grouped_topk

    def project(batch: pa.Table) -> pa.Table:
        from parser_rdf_ray.md5vec import md5_low64_ids

        ids = pc.cast(batch.column("doc_id"), pa.int64())
        hashes = pa.array(
            (md5_low64_ids(ids) % np.uint64(1 << 63)).astype(np.int64),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [ids, pc.cast(batch.column("source"), pa.string()), hashes],
            schema=SOURCE_CAP_SCHEMA,
        )

    projected = documents_ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_topk(
        projected, ["source"], "rank_hash", cap, descending=False, tie_cols=["doc_id"]
    )


WEIGHTED_SAMPLE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("weight", pa.int64())]
)


def weighted_priority_sample(documents_ds, k: int = 100, weight_col: str = "n_chars"):
    """PRIORITY SAMPLING (Duffield–Lund–Thorup 2007; sequential Poisson,
    Ohlsson 1998): a deterministic weight-proportional sample without
    replacement — the k documents with the smallest priority
    ``uniform(doc_id) / weight``, so heavier documents (more chars, more
    tokens) are proportionally likelier to be kept. THE corpus
    subsampling primitive when "sample 1M documents but favor long ones"
    must be reproducible run-to-run.

    Determinism + SQL-replayability without float hazards: the uniform is
    md5-low64(doc_id) truncated to 53 bits (>> 11), exactly representable
    as an IEEE double, and a single double division is CORRECTLY ROUNDED
    by IEEE 754 — numpy and DuckDB produce the identical bit pattern
    (unlike transcendental ln/pow, which vary by libm and are avoided).
    Ties (hash collisions or equal priorities) break on doc_id.

    Scale shape: per-batch vectorized priorities + a per-batch k-smallest
    prune, so only k×blocks candidate rows reach the ONE small sort;
    weights never shuffle with text."""
    from parser_rdf_ray.md5vec import md5_low64_ids

    cand_schema = pa.schema(
        [("doc_id", pa.int64()), ("weight", pa.int64()), ("rank_key", pa.float64())]
    )

    def prune(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        w = np.maximum(
            np.asarray(pc.cast(batch.column(weight_col), pa.int64()), dtype=np.int64), 1
        )
        u53 = (md5_low64_ids(ids) >> np.uint64(11)).astype(np.float64)
        key = u53 / w.astype(np.float64)
        idn = np.asarray(ids, dtype=np.int64)
        order = np.lexsort((idn, key))[:k]
        return pa.Table.from_arrays(
            [
                pa.array(idn[order], pa.int64()),
                pa.array(w[order], pa.int64()),
                pa.array(key[order], pa.float64()),
            ],
            schema=cand_schema,
        )

    cand = documents_ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    picked = cand.sort(["rank_key", "doc_id"]).limit(k)

    def strip(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column("doc_id"), batch.column("weight")],
            schema=WEIGHTED_SAMPLE_SCHEMA,
        )

    # rank_key stays internal: the membership SET is the contract (float
    # columns in outputs would hash differently across engines)
    return picked.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


PACK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("start_tok", pa.int64()),
        ("first_seq", pa.int64()),
        ("last_seq", pa.int64()),
    ]
)


def pack_token_counts(counts_ds, seq_len: int, extra_cols: tuple = (),
                      assume_sorted: bool = False):
    """The packing core over a (doc_id, n_tokens[, extra...]) dataset:
    ONE doc_id sort range-partitions the stream; each block's token total
    (one int64) ships to the driver, which prefix-sums blocks×1 values
    into per-block starting offsets; a second pass over the pinned block
    refs assigns per-doc offsets with a numpy exclusive cumsum plus the
    block offset (the dense-rank two-pass shape — data moves once).
    ``extra_cols`` pass through unchanged (e.g. the split label).
    ``assume_sorted=True`` skips the sort for inputs whose BLOCKS are each
    internally doc_id-sorted with mutually disjoint key ranges (the output
    of a doc_id sort mapped block-per-batch — training_set's tail) —
    fusing the composite's final exchange away.

    Block-ORDER hazard: Ray's streaming executor does NOT guarantee the
    materialized block list arrives in logical order (default
    preserve_order=False returns blocks in task-completion order — a
    loaded machine WILL scramble them). The metadata pass therefore ships
    each block's min doc_id alongside its token total and the driver
    re-orders the ref list by key before prefix-summing — deterministic
    regardless of completion order, in both the sorted and assume_sorted
    paths."""
    import numpy as np
    import ray
    import ray.data

    from parser_rdf_ray.tuning import tune_data_context

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    tune_data_context()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("start_tok", pa.int64()),
         ("first_seq", pa.int64()), ("last_seq", pa.int64())]
        + [(c, pa.string()) for c in extra_cols]
    )
    srt = (counts_ds if assume_sorted else counts_ds.sort("doc_id")).materialize()
    refs = [
        br for bundle in srt.iter_internal_ref_bundles() for br in bundle.block_refs
    ]

    @ray.remote
    def block_total(block: pa.Table):
        """(token total, min doc_id) — the min key orders the blocks."""
        if block.num_rows == 0:
            return 0, None
        return (
            int(pc.sum(block.column("n_tokens")).as_py()),
            int(pc.min(block.column("doc_id")).as_py()),
        )

    stats = ray.get([block_total.remote(r) for r in refs])
    # restore logical order: blocks are internally sorted with disjoint
    # ranges, so sorting refs by min doc_id IS the global doc_id order
    # (empty blocks contribute nothing; order them last)
    order = sorted(
        range(len(refs)),
        key=lambda i: (stats[i][1] is None, stats[i][1] if stats[i][1] is not None else 0),
    )
    refs = [refs[i] for i in order]
    totals = [stats[i][0] for i in order]
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)

    @ray.remote
    def pack_block(block: pa.Table, offset: int):
        if block.num_rows == 0:
            return schema.empty_table()
        n = block.column("n_tokens").to_numpy()
        start = offset + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64)
        # n_tokens >= 1 always under the whitespace contract (trim+split
        # of '' yields ['']), so (start + n - 1) is the doc's last token
        first_seq = start // seq_len
        last_seq = (start + n - 1) // seq_len
        return pa.Table.from_arrays(
            [
                pc.cast(block.column("doc_id"), pa.int64()),
                pa.array(n, pa.int64()),
                pa.array(start, pa.int64()),
                pa.array(first_seq, pa.int64()),
                pa.array(last_seq, pa.int64()),
            ]
            + [pc.cast(block.column(c), pa.string()) for c in extra_cols],
            schema=schema,
        )

    out_refs = [pack_block.remote(r, int(offsets[i])) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out_refs)


def pack_sequences(documents_ds, seq_len: int = 2048):
    """SEQUENCE PACKING (concat-and-chunk): the pretraining-data step
    that concatenates documents in doc_id order into one token stream and
    cuts it into fixed-length training sequences. Emits, per document,
    its global token offset and the [first_seq, last_seq] span of
    sequence indices it lands in (a doc may straddle a boundary — the
    standard GPT-style packing; sequences are seq_len tokens, no padding).
    Token counts use the shared whitespace contract (pipelines/text.
    n_tokens_of == DuckDB len(string_split_regex(trim(text),'\\s+'))), so
    the whole op is SQL-replayable with one SUM() OVER window. See
    pack_token_counts for the two-pass scale plan."""
    from parser_rdf_ray.pipelines.text import n_tokens_of

    def counts(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.int64()),
                n_tokens_of(batch.column("text")),
            ],
            names=["doc_id", "n_tokens"],
        )

    return pack_token_counts(
        documents_ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        seq_len,
    )


DECONTAM_SCHEMA = pa.schema([("doc_id", pa.int64()), ("contaminated", pa.bool_())])


def decontaminate(documents_ds, eval_pct: int = 10, n: int = 3,
                  train_side_ds=None, max_df: int | None = None):
    """BENCHMARK DECONTAMINATION: flag every training document that
    shares any word n-gram with the EVAL set — the standard
    leakage check an LLM training pipeline runs against its benchmark
    suites. Eval membership is the deterministic md5 gate
    (md5-low64(doc_id) % 100 < eval_pct), so the op is self-contained
    over one table and the SQL oracle can recompute it (the
    cross_corpus_dedup convention); in production the eval side is the
    benchmark corpus. Documents with fewer than n tokens have no grams
    and are never contaminated.

    Scale plan — gram-keyed sort-merge EXISTENCE join, no broadcast and
    no smallness assumption on either side:
    1. Gram construction is fully vectorized (polars extract_all tokens
       → explode → shift(-1)/shift(-2) windows per doc — zero per-doc
       Python), deduped per (doc, gram). Tokens match the SQL contract
       string_split_regex(trim(text), '\\s+') exactly.
    2. ONE gram sort co-partitions each gram's run (eval rows kind 0,
       train rows kind 1); a vectorized run scan emits the train doc_ids
       that hit an eval gram. Only (gram, doc_id) pairs shuffle — never
       document text. SKEW NOTE: a gram appearing in many documents is
       one run in one partition (the co-partition guarantee cuts both
       ways). At n=3 (the oracle-sized default) stop-gram runs can be
       large; production decontamination uses n of 8-13, where shared
       grams are rare by construction — pick n to the corpus, the
       partition bound is max-df × 16 bytes per gram.
    3. ONE doc_id sort existence-joins the hit set against all train
       doc_ids (duplicate hits are harmless: the run scan tests
       existence), yielding (doc_id, contaminated) for every train doc.

    ``train_side_ds``: optional (doc_id, text, ...) dataset to build the
    TRAIN side from instead of documents_ds — training_set passes its
    quality-gate survivors, so grams are never built (or shuffled) for
    documents curation already dropped. The eval side always scans the
    full corpus (the benchmark set is defined over it), but emits only
    eval rows, so the eval scan ships eval_pct% of the gram volume. The
    verdict then covers train docs OF THE TRAIN SIDE only — identical on
    the intersection, which is all a downstream keep-set meet reads.

    ``max_df`` (default tuning.gram_df_cap / $GRAFT_GRAM_DF_CAP): a gram whose
    sorted run exceeds this document frequency is treated as a STOP-GRAM
    — skipped entirely and counted in a worker-log warning (the minhash
    BUCKET_CAP pattern). Deterministic: the gram sort co-partitions each
    gram's full run into one block (batch_size=None), so the run length
    IS the global df, not a batch accident. Skipping can only under-flag
    (a doc contaminated solely via a stop-gram is missed), the same
    direction as the documented production guidance of n = 8–13.
    """
    import numpy as np

    from parser_rdf_ray.stages.groups import run_spans
    from parser_rdf_ray.tuning import tune_data_context

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if max_df is None:
        from parser_rdf_ray.tuning import gram_df_cap

        max_df = gram_df_cap()
    tune_data_context()
    gram_schema = pa.schema(
        [("gram", pa.string()), ("doc_id", pa.int64()), ("kind", pa.int8())]
    )

    def gram_builder(side: str):
        """side: 'both' (single-scan default), 'eval' (emit kind-0 rows
        only), or 'train' (emit kind-1 rows only)."""

        def grams(batch: pa.Table) -> pa.Table:
            import polars as pl

            from parser_rdf_ray.md5vec import md5_low64_ids

            ids = pc.cast(batch.column("doc_id"), pa.int64())
            is_eval = md5_low64_ids(ids) % 100 < eval_pct
            df = pl.DataFrame(
                {
                    "doc_id": pl.from_arrow(ids),
                    "kind": pl.Series(
                        np.where(is_eval, 0, 1).astype(np.int8), dtype=pl.Int8
                    ),
                    "text": pl.from_arrow(batch.column("text")),
                }
            )
            # filter BEFORE tokenizing: the regex token scan is the
            # expensive part, and a side-restricted scan keeps only its
            # own rows (the eval scan would otherwise tokenize the whole
            # corpus to ship 10% of it)
            if side == "eval":
                df = df.filter(pl.col("kind") == 0)
            elif side == "train":
                df = df.filter(pl.col("kind") == 1)
            df = df.with_columns(
                pl.col("text").str.strip_chars().str.extract_all(r"\S+").alias("ts")
            ).drop("text")
            ex = df.explode("ts", empty_as_null=True)
            shifts = [
                pl.col("ts").shift(-k).over("doc_id").alias(f"_t{k}")
                for k in range(1, n)
            ]
            gram_expr = pl.col("ts")
            for k in range(1, n):
                gram_expr = gram_expr + " " + pl.col(f"_t{k}")
            ex = (
                ex.with_columns(shifts)
                .filter(
                    pl.col(f"_t{n - 1}").is_not_null()
                    if n > 1
                    else pl.col("ts").is_not_null()
                )
                .with_columns(gram_expr.alias("gram"))
                .select(["gram", "doc_id", "kind"])
                .unique()
            )
            out = ex.to_arrow()
            return pa.Table.from_arrays(
                [pc.cast(out.column(f.name), f.type) for f in gram_schema],
                schema=gram_schema,
            )

        return grams

    from parser_rdf_ray.tuning import coalesce_blocks

    if train_side_ds is None:
        tagged = documents_ds.map_batches(
            gram_builder("both"), batch_format="pyarrow", zero_copy_batch=True
        )
        train_universe_ds = documents_ds
    else:
        # union STACKS block counts (eval blocks + train blocks), and a Ray
        # sort emits one output partition per input block — so the exchange's
        # transfer count (in_blocks × out_partitions) would grow
        # quadratically with every union. Coalesce to the tuned partition
        # count first (streaming local merge, no all-to-all).
        tagged = coalesce_blocks(
            documents_ds.map_batches(
                gram_builder("eval"), batch_format="pyarrow", zero_copy_batch=True
            ).union(
                train_side_ds.map_batches(
                    gram_builder("train"), batch_format="pyarrow", zero_copy_batch=True
                )
            )
        )
        train_universe_ds = train_side_ds
    srt = tagged.sort("gram")
    hit_schema = pa.schema([("doc_id", pa.int64()), ("kind", pa.int8())])

    def hits_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return hit_schema.empty_table()
        starts, _ = run_spans(batch, ["gram"])
        kinds = batch.column("kind").to_numpy()
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        run_lens = np.diff(np.concatenate([starts, [batch.num_rows]]))
        over = run_lens > max_df
        if over.any():
            import logging

            logging.getLogger(__name__).warning(
                "decontaminate: %d stop-gram(s) over max_df=%d skipped "
                "(largest run %d rows) — contamination via these grams "
                "is not flagged; raise GRAFT_GRAM_DF_CAP or use larger n",
                int(over.sum()), max_df, int(run_lens.max()),
            )
        eval_in_run = (
            (np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0) & ~over
        )
        hit = (kinds == 1) & eval_in_run[run_ids]
        ids = pc.unique(batch.column("doc_id").filter(pa.array(hit)))
        return pa.Table.from_arrays(
            [ids, pa.array(np.zeros(len(ids), dtype=np.int8))], schema=hit_schema
        )

    hits = srt.map_batches(
        hits_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def train_ids(batch: pa.Table) -> pa.Table:
        from parser_rdf_ray.md5vec import md5_low64_ids

        ids = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pa.array(md5_low64_ids(ids) % 100 >= eval_pct)
        ids = ids.filter(keep)
        return pa.Table.from_arrays(
            [ids, pa.array(np.ones(len(ids), dtype=np.int8))], schema=hit_schema
        )

    docs = train_universe_ds.map_batches(
        train_ids, batch_format="pyarrow", zero_copy_batch=True
    )
    # same block-stacking consideration: hits inherits the gram sort's
    # partition count, docs the scan's — coalesce before the verdict sort
    joined = coalesce_blocks(hits.union(docs)).sort("doc_id")

    def verdict_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return DECONTAM_SCHEMA.empty_table()
        starts, _ = run_spans(batch, ["doc_id"])
        kinds = batch.column("kind").to_numpy()
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        hit_in_run = np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0
        is_doc = kinds == 1
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").filter(pa.array(is_doc)),
                pa.array(hit_in_run[run_ids][is_doc]),
            ],
            schema=DECONTAM_SCHEMA,
        )

    return joined.map_batches(
        verdict_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def training_set(
    documents_ds,
    min_tokens: int = 20,
    min_alpha: float = 0.6,
    threshold: float = 0.8,
    eval_pct: int = 10,
    n_gram: int = 3,
    train_pct: int = 90,
    seq_len: int = 2048,
    max_dup_line_pct: int | None = None,
    max_top_bigram_pct: int | None = None,
):
    """THE END-TO-END TRAINING-SET BUILD — the deliverable all the corpus
    operators exist for, composed into one pipeline: quality gate →
    near-duplicate cluster representatives (curation_core) → eval-set
    removal + benchmark decontamination (decontaminate) → deterministic
    train/val hash split (split_values) → sequence packing
    (pack_token_counts). Returns one row per surviving document:
    (doc_id, n_tokens, start_tok, first_seq, last_seq, split).

    Composition stays shuffle-lean — tightened in round 5:
    - decontamination's TRAIN-side grams build only over the quality-gate
      survivors (train_side_ds) — grams are never constructed or shuffled
      for documents the gate already dropped, and the eval scan emits only
      eval rows; the final keep-set ∩ clean-set meet is unchanged because
      kept ⊆ survivors.
    - the keep-set, the clean-set and the survivor token counts meet in
      ONE tagged-union doc_id sort (three id-sized inputs, one exchange —
      formerly two consecutive sorts), whose run scan emits rows already
      doc_id-sorted, so packing (pack_token_counts assume_sorted=True)
      skips its sort too: three tail exchanges fused into one.
    - token counts come from the quality gate's own scan (survivors carry
      n_tokens) — the text is read exactly once end to end and never
      re-shuffled.
    Every stage's contract is the one its standalone operator pins, so the
    composite's SQL oracle is the composition of their oracle fragments.

    For job-level checkpoint-resume, the composite decomposes into
    checkpointable stage datasets: quality_filter → (near_dup_clusters
    reps) → decontaminate(train_side_ds=survivors) → training_set_tail —
    job.py's ``--pipeline training-set`` writes each boundary through
    state/lineage.checkpoint_stage so a killed run resumes after the last
    completed stage."""
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    survivors, kept = curation_core(
        documents_ds, min_tokens, min_alpha, threshold,
        max_dup_line_pct=max_dup_line_pct,
        max_top_bigram_pct=max_top_bigram_pct,
    )
    verdict = decontaminate(documents_ds, eval_pct, n_gram, train_side_ds=survivors)
    return training_set_tail(survivors, kept, verdict, train_pct, seq_len)


def training_set_tail(survivors, kept, verdict, train_pct: int = 90,
                      seq_len: int = 2048):
    """The composite's tail as a standalone stage over three boundary
    datasets — survivors (doc_id, text?, n_tokens), kept (doc_id) and
    verdict (doc_id, contaminated): ONE tagged-union doc_id sort whose
    run scan emits the kept ∩ clean ∩ survivors count rows in sorted
    order, then sort-free packing. Split out so job.py can resume from
    lineage-checkpointed stage outputs (re-read from Parquet, any block
    layout — the tail's own sort renormalizes)."""
    import numpy as np

    from parser_rdf_ray.stages.groups import run_spans
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    # one 3-way tagged union: kind 0 = kept rep, kind 1 = decontam-clean,
    # kind 2 = survivor count row (n_tokens + split payload)
    union_schema = pa.schema(
        [("doc_id", pa.int64()), ("kind", pa.int8()),
         ("n_tokens", pa.int64()), ("split", pa.string())]
    )

    def tag_kept(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column("doc_id"), pa.int64())
        n = len(ids)
        return pa.Table.from_arrays(
            [ids, pa.array(np.zeros(n, dtype=np.int8)),
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.string())],
            schema=union_schema,
        )

    def tag_clean(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("contaminated"), pa.scalar(False))
        ids = pc.cast(b.column("doc_id").filter(keep), pa.int64())
        n = len(ids)
        return pa.Table.from_arrays(
            [ids, pa.array(np.ones(n, dtype=np.int8)),
             pa.nulls(n, pa.int64()), pa.nulls(n, pa.string())],
            schema=union_schema,
        )

    def tag_counts(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column("doc_id"), pa.int64())
        n = len(ids)
        return pa.Table.from_arrays(
            [ids, pa.array(np.full(n, 2, dtype=np.int8)),
             pc.cast(b.column("n_tokens"), pa.int64()),
             split_values(ids, train_pct)],
            schema=union_schema,
        )

    from parser_rdf_ray.tuning import coalesce_blocks

    # the 3-way union stacks each branch's block count (kept + verdict +
    # counts ≈ 5× the scan's) and the sort fans out one partition per
    # input block — coalesce first (see decontaminate's note)
    tagged = (
        kept.map_batches(tag_kept, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            verdict.map_batches(tag_clean, batch_format="pyarrow", zero_copy_batch=True)
        )
        .union(
            survivors.map_batches(tag_counts, batch_format="pyarrow", zero_copy_batch=True)
        )
    )
    tagged = coalesce_blocks(tagged)
    srt = tagged.sort("doc_id")
    out_counts = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("split", pa.string())]
    )

    def meet_block(batch: pa.Table) -> pa.Table:
        """Emit the count row of every doc whose run holds kept AND clean
        tags — the kept ∩ clean ∩ survivors meet in one scan."""
        if batch.num_rows == 0:
            return out_counts.empty_table()
        starts, _ = run_spans(batch, ["doc_id"])
        kinds = batch.column("kind").to_numpy()
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        has_kept = np.add.reduceat((kinds == 0).astype(np.int64), starts) > 0
        has_clean = np.add.reduceat((kinds == 1).astype(np.int64), starts) > 0
        both = has_kept & has_clean
        emit = (kinds == 2) & both[run_ids]
        rows = batch.filter(pa.array(emit))
        return pa.Table.from_arrays(
            [rows.column("doc_id"), rows.column("n_tokens"), rows.column("split")],
            schema=out_counts,
        )

    counts = srt.map_batches(
        meet_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # counts is globally doc_id-sorted (run scan over the sorted stream,
    # map_batches preserves block order) — packing skips its sort
    return pack_token_counts(counts, seq_len, extra_cols=("split",), assume_sorted=True)
