"""Text-analysis operators (training-data pipeline ops): token counting,
quality scoring, language ID, document fingerprinting.

Every operator here is defined to be SQL-reproducible so the DuckDB
oracle can verify it exactly: token/quality metrics map to string_split /
regexp kernels, langid's stopword profiles are injected as SQL constants,
and fingerprints use md5 + an ord()-polynomial the oracle recomputes.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish subword splitter: words, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "est"},
    "de": {"der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"},
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Vectorized token/char counts (Arrow kernels, no Python loop):
    n_tokens = whitespace-delimited token count, SQL-equivalent to
    len(string_split_regex(text, '\\s+')) on trimmed text."""
    text = batch.column("text")
    trimmed = pc.utf8_trim_whitespace(text)
    n_tokens = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    n_chars = pc.utf8_length(text)
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pc.cast(n_tokens, pa.int64()),
            pc.cast(n_chars, pa.int64()),
        ],
        names=["doc_id", "n_tokens", "n_chars"],
    )


def token_count(documents_ds):
    return documents_ds.map_batches(
        token_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting as ONE Arrow regex kernel. The alternatives
    in _BPE_RE match disjoint character classes, so RE2's leftmost-longest
    and Python's leftmost-first find the identical non-overlapping match
    set — count_substring_regex equals len(findall)."""
    counts = pc.count_substring_regex(batch.column("text"), _BPE_RE.pattern)
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pc.cast(counts, pa.int64())],
        names=["doc_id", "n_bpe_tokens"],
    )


def ws_tokens(text_col):
    """Whitespace token lists of trimmed text — THE token definition every
    quality metric (and the curation gate, and the SQL oracles via
    string_split_regex(trim(text), '\\s+')) shares."""
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(text_col), r"\s+")


def n_tokens_of(text_col):
    """int64 whitespace token count (shared metric definition)."""
    return pc.cast(pc.list_value_length(ws_tokens(text_col)), pa.int64())


def alpha_ratio_of(text_col):
    """float64 alphabetic-character ratio (shared metric definition):
    length(regexp_replace(text,'[^A-Za-z]','','g')) / max(length(text),1)."""
    n_chars = pc.cast(pc.utf8_length(text_col), pa.int64())
    alpha_chars = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text_col, r"[^A-Za-z]", "")),
        pa.int64(),
    )
    return pc.divide(
        pc.cast(alpha_chars, pa.float64()),
        pc.cast(pc.max_element_wise(n_chars, 1), pa.float64()),
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality metrics, all Arrow-kernel vectorized:
    n_chars, n_tokens, mean_token_len, alpha_ratio (alphabetic chars /
    chars), stopword_ratio (against the English profile)."""
    text = batch.column("text")
    tokens = ws_tokens(text)
    n_tokens = pc.cast(pc.list_value_length(tokens), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    alpha_ratio = alpha_ratio_of(text)
    # stopword ratio: flatten the token lists once, lower + set-membership
    # as Arrow kernels, then one reduceat back to per-doc counts
    import numpy as np

    flat = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    counts = np.asarray(pc.list_value_length(flat).fill_null(0), dtype=np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    is_stop = np.asarray(
        pc.is_in(pc.utf8_lower(flat.flatten()), value_set=pa.array(_LANG_PROFILES["en"])),
        dtype=np.int64,
    )
    cum = np.zeros(len(is_stop) + 1, dtype=np.int64)
    np.cumsum(is_stop, out=cum[1:])
    stop_counts = cum[offsets[1:]] - cum[offsets[:-1]]
    stop_ratio = stop_counts / np.maximum(np.asarray(n_tokens, dtype=np.int64), 1)
    mean_tok = pc.divide(
        pc.cast(pc.subtract(n_chars, pc.subtract(n_tokens, 1)), pa.float64()),
        pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
    )
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            n_chars,
            n_tokens,
            mean_tok,
            alpha_ratio,
            pa.array(stop_ratio, pa.float64()),
        ],
        names=["doc_id", "n_chars", "n_tokens", "mean_token_len", "alpha_ratio", "stopword_ratio"],
    )


def quality_score(documents_ds):
    return documents_ds.map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


class LangId:
    """Stopword-profile language classifier, vectorized end-to-end: ONE
    flatten of the whitespace token lists, one lower + is_in against the
    union vocabulary, a polars distinct + group_by for the per-(doc, lang)
    DISTINCT stopword hits (set semantics — 'the the' counts once), then a
    per-lang best-score sweep over numpy arrays (profile dict order breaks
    ties, same as the former scalar loop). No per-row Python anywhere."""

    def __init__(self):
        self.langs = list(_LANG_PROFILES)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.vocab = sorted(set().union(*_LANG_PROFILES.values()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl

        n = batch.num_rows
        toks = ws_tokens(batch.column("text"))
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = np.asarray(pc.list_value_length(flat).fill_null(0), dtype=np.int64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        low = pc.utf8_lower(flat.flatten())
        hits = pl.DataFrame(
            {"doc": doc_idx, "tok": pl.from_arrow(low)}
        ).filter(pl.col("tok").is_in(self.vocab)).unique()
        best = np.zeros(n, dtype=np.float64)
        best_lang = np.full(n, "unknown", dtype=object)
        if hits.height:
            agg = hits.group_by("doc").agg(
                *[
                    pl.col("tok").is_in(sorted(prof)).sum().alias(lang)
                    for lang, prof in self.profiles.items()
                ]
            )
            docs = agg["doc"].to_numpy()
            for lang in self.langs:
                s = np.zeros(n, dtype=np.float64)
                s[docs] = agg[lang].to_numpy() / len(self.profiles[lang])
                upd = s > best
                best[upd] = s[upd]
                best_lang[upd] = lang
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(best_lang, pa.string()),
                pa.array(best, pa.float64()),
            ],
            names=["doc_id", "lang_pred", "lang_score"],
        )


def langid(documents_ds):
    # instance (task pool), not class (actor pool): the stopword profiles
    # are a few hundred bytes, so shipping them per task is free while an
    # autoscaling actor pool pays seconds of cold-start per pipeline
    return documents_ds.map_batches(
        LangId(), batch_format="pyarrow", zero_copy_batch=True
    )


def top_ngrams(documents_ds, n: int = 1, k: int = 100):
    """Corpus-level top-k word n-grams by total occurrence (vocabulary
    mining). Tokenization matches the dedup pipelines (lower, split \\W+,
    drop empties) so the SQL oracle re-derives identical grams.

    Plan: per-batch vectorized counting (polars group_by over the
    flattened gram column — the combiner) → groupby(gram).sum of the
    partial counts (only vocabulary-sized rows shuffle, never token
    streams) → per-block partial top-k → final sort+limit over ≤
    k × n_blocks rows. Ties deterministic: count desc, gram asc."""
    import re as _re

    import polars as pl
    from ray.data.aggregate import Sum

    token_re = _re.compile(r"\W+")

    def partial_counts(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch.column("text").to_pylist():
            toks = [x for x in token_re.split(t.lower()) if x]
            if n == 1:
                grams.extend(toks)
            elif len(toks) >= n:
                grams.extend(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
        if not grams:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64())],
                names=["gram", "count"],
            )
        vc = pl.Series("gram", grams).value_counts()
        return pa.Table.from_arrays(
            [
                vc.get_column("gram").to_arrow().cast(pa.string()),
                vc.get_column("count").to_arrow().cast(pa.int64()),
            ],
            names=["gram", "count"],
        )

    counts = documents_ds.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = counts.groupby("gram").aggregate(Sum("count"))

    def local_topk(batch: pa.Table) -> pa.Table:
        batch = pa.Table.from_arrays(
            [batch.column("gram"), pc.cast(batch.column("sum(count)"), pa.int64())],
            names=["gram", "count"],
        )
        order = batch.sort_by([("count", "descending"), ("gram", "ascending")])
        return order.slice(0, min(k, order.num_rows))

    partial_top = totals.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return partial_top.sort(
        ["count", "gram"], descending=[True, False]
    ).limit(k)


_FP_POWERS = None


# The DuckDB expression recomputing one window's polynomial hash exactly
# (i is the 1-based window start over a `text` column). The leading term
# ord·257^7 can exceed INT64 (byte 125 '}' already overflows), so the sum
# runs in HUGEINT with an explicit mod 2^64 — the same wrap semantics as
# the pipeline's uint64 arithmetic. Single source of truth for the driver
# oracle and the SQL-contract property tests.
_FP_POWERS_INT = [257 ** (7 - i) for i in range(8)]
FINGERPRINT_SQL_WINDOW = "CAST((" + " + ".join(
    f"CAST(ord(substr(text, i + {j}, 1)) AS HUGEINT) * {p}"
    for j, p in enumerate(_FP_POWERS_INT)
) + ") % 18446744073709551616 AS UBIGINT)"

# hex via to_hex/lpad: printf('%x') rejects UBIGINT values above INT64
FINGERPRINT_SQL = f"""
SELECT doc_id,
       CASE WHEN length(text) < 8 THEN substr(md5(text), 1, 16)
            ELSE lpad(lower(to_hex(
                 list_min(list_transform(range(1, length(text) - 6),
                                         i -> {FINGERPRINT_SQL_WINDOW})))), 16, '0')
       END AS fingerprint,
       md5(text) AS digest
FROM documents
"""


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rolling-hash document fingerprint: min of 8-byte window polynomial
    hashes (winnowing-style, base 257, uint64 wrap-around — ASCII inputs
    stay below 2^64 but the definition is mod-2^64 so arbitrary bytes are
    well-defined too; vectorizes as one sliding-window multiply-add per
    doc), plus a full-content md5 digest.

    Both columns are SQL-reproducible (the driver oracle recomputes them
    via FINGERPRINT_SQL above): digest = DuckDB md5(text); fingerprint =
    the HUGEINT-mod-2^64 window polynomial over ord() — exact on ASCII
    corpora (byte == codepoint), which the driver documents tables are."""
    import numpy as np

    global _FP_POWERS
    if _FP_POWERS is None:
        base = np.uint64(257)
        _FP_POWERS = np.empty(8, dtype=np.uint64)
        _FP_POWERS[7] = 1
        with np.errstate(over="ignore"):
            for i in range(6, -1, -1):
                _FP_POWERS[i] = _FP_POWERS[i + 1] * base

    texts = batch.column("text").to_pylist()
    fps, digests = [], []
    with np.errstate(over="ignore"):
        for t in texts:
            data = t.encode()
            digest = hashlib.md5(data).hexdigest()
            digests.append(digest)
            if len(data) < 8:
                fps.append(digest[:16])
                continue
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
            windows = np.lib.stride_tricks.sliding_window_view(arr, 8)
            h = (windows * _FP_POWERS).sum(axis=1)
            fps.append(f"{int(h.min()):016x}")
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(fps, pa.string()),
            pa.array(digests, pa.string()),
        ],
        names=["doc_id", "fingerprint", "digest"],
    )


def fingerprint(documents_ds):
    return documents_ds.map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def redact_terms(documents_ds, terms: list[str], replacement: str = "[REDACTED]"):
    """Sensitive-term scrubbing — the PII/boilerplate-removal stage of a
    training-data pipeline, on synthetic text that has no emails/numbers:
    every whole-word occurrence of a configured term is replaced.

    Vectorized end-to-end: ONE RE2 alternation compiled into two Arrow
    kernels per batch (count_substring_regex for the per-doc match count,
    replace_substring_regex for the rewrite). DuckDB's regexp_matches /
    regexp_replace(.., 'g') are RE2 with identical semantics, so the SQL
    oracle replays the exact same engine. Output is
    (doc_id, n_redacted, redacted_len, redacted_md5) — content equality
    is checked by md5 (DuckDB md5()) instead of shipping rewritten text.
    """
    import hashlib

    pattern = r"\b(?:" + "|".join(re.escape(t) for t in sorted(terms)) + r")\b"

    def scrub(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column("text"), pa.string())
        n = pc.cast(pc.count_substring_regex(text, pattern), pa.int64())
        red = pc.replace_substring_regex(text, pattern, replacement)
        md5s = pa.array(
            [hashlib.md5(t.encode()).hexdigest() for t in red.to_pylist()],
            pa.string(),
        )
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.int64()),
                n,
                pc.cast(pc.utf8_length(red), pa.int64()),
                md5s,
            ],
            names=["doc_id", "n_redacted", "redacted_len", "redacted_md5"],
        )

    return documents_ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


TFIDF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("term", pa.string()), ("score", pa.int64())]
)


def tfidf_top_terms(documents_ds, k: int = 3, idf_scale: int = 1_000_000):
    """Top-k TF-IDF terms per document — the relevance/keyword-extraction
    primitive, with an INTEGER-SCALED idf so every score is exact int64
    and the SQL oracle matches bit-for-bit (no log, no float ordering):

        score(doc, term) = tf(doc, term) · (N·idf_scale // df(term))

    Monotone in tf/df exactly like tf·(N/df); `//` floor semantics agree
    between numpy int64 and DuckDB's `//` for these all-positive values.

    Plan (two exchanges total, no broadcast table): per-batch vectorized
    (doc_id, term, tf) rows via ONE polars explode+group_by (tf rows are
    globally unique per (doc, term) because a document lives in exactly
    one batch); then ONE term sort co-partitions each term's full run, so
    document frequency is just the run length IN-BLOCK — df computation
    and the tf⋈df join collapse into the same exchange. Scoring is
    vectorized per block; stages/groups.grouped_topk bounds the final
    per-doc top-k to k × blocks rows per doc. Ties break by term asc.
    """
    import numpy as np
    import polars as pl

    from parser_rdf_ray.stages.groups import grouped_topk, run_spans
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()
    n_docs = documents_ds.count()  # driver scalar; the read is pruned

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        toks = ws_tokens(pc.cast(batch.column("text"), pa.string()))
        t = pa.Table.from_arrays([ids, toks], names=["doc_id", "term"])
        agg = (
            pl.from_arrow(t)
            .explode("term", empty_as_null=True)
            .group_by(["doc_id", "term"])
            .len()
        )
        out = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(out.column("doc_id").combine_chunks(), pa.int64()),
                pc.cast(out.column("term").combine_chunks(), pa.string()),
                pc.cast(out.column("len").combine_chunks(), pa.int64()),
            ],
            names=["doc_id", "term", "tf"],
        )

    tf = documents_ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
    srt = tf.sort("term")

    def score_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return TFIDF_SCHEMA.empty_table()
        starts, ends = run_spans(batch, ["term"])
        df_per_run = ends - starts  # GLOBAL df: the term sort co-partitions runs
        run_marks = np.zeros(batch.num_rows, dtype=np.int64)
        run_marks[starts] = 1
        run_ids = np.cumsum(run_marks) - 1
        idf = (n_docs * idf_scale) // df_per_run  # int64 floor, all positive
        score = batch.column("tf").to_numpy() * idf[run_ids]
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("term"),
                pa.array(score, pa.int64()),
            ],
            schema=TFIDF_SCHEMA,
        )

    scored = srt.map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return grouped_topk(
        scored, ["doc_id"], "score", k, descending=True, tie_cols=["term"]
    )


REPETITION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_lines", pa.int64()),
        ("dup_lines", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("top_bigram_count", pa.int64()),
    ]
)


def repetition_counts_frame(df):
    """Per-doc repetition counts over a polars (doc_id, text) frame:
    (doc_id, n_lines, dup_lines, n_bigrams, top_bigram_count), sorted by
    doc_id. The SINGLE SOURCE for the Gopher signals — repetition_signals
    and the curation quality gate's repetition profile both call this, so
    the rule and its SQL oracle cannot drift between consumers. All
    counts integer-exact; docs with < 2 tokens have 0 bigrams."""
    import polars as pl

    lines = (
        df.select("doc_id", pl.col("text").str.split("\n").alias("line"))
        .explode("line", empty_as_null=True)
        .group_by("doc_id", "line")
        .agg(pl.len().alias("c"))
        .group_by("doc_id")
        .agg(
            pl.col("c").sum().alias("n_lines"),
            (pl.col("c").sum() - pl.len()).alias("dup_lines"),
        )
    )
    toks = df.select(
        "doc_id",
        pl.col("text").str.strip_chars().str.extract_all(r"\S+").alias("t"),
    ).explode("t", empty_as_null=True)
    bi = (
        toks.with_columns(pl.col("t").shift(-1).over("doc_id").alias("t1"))
        .filter(pl.col("t1").is_not_null())
        .group_by("doc_id", "t", "t1")
        .agg(pl.len().alias("c"))
        .group_by("doc_id")
        .agg(
            pl.col("c").sum().alias("n_bigrams"),
            pl.col("c").max().alias("top_bigram_count"),
        )
    )
    return (
        lines.join(bi, on="doc_id", how="left")
        .with_columns(
            pl.col("n_bigrams").fill_null(0),
            pl.col("top_bigram_count").fill_null(0),
        )
        .sort("doc_id")
        .rechunk()
    )


def repetition_signals(documents_ds):
    """WITHIN-DOCUMENT repetition signals (the Gopher/MassiveText
    quality rules, Rae et al. 2021): duplicate-line count and the
    most-frequent-word-bigram count per document — boilerplate and
    looping-generation detectors. All counts integer-exact (consumers
    derive fractions), so the SQL oracle matches bit-for-bit.

    Scale shape: per-document computation only — ONE vectorized
    map_batches (polars split/explode/group_by inside the block,
    repetition_counts_frame), no shuffle at all. Tokens are the shared
    whitespace contract; lines split on newline."""
    import polars as pl

    def per_batch(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "doc_id": pl.from_arrow(pc.cast(batch.column("doc_id"), pa.int64())),
                "text": pl.from_arrow(batch.column("text")),
            }
        )
        t = repetition_counts_frame(df).to_arrow()
        return pa.Table.from_arrays(
            [pc.cast(t.column(f.name), f.type) for f in REPETITION_SCHEMA],
            schema=REPETITION_SCHEMA,
        )

    return documents_ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def term_postings(documents_ds, k: int = 5):
    """INVERTED-INDEX POSTINGS: the top-k documents per term by term
    frequency (ties → smaller doc_id) — the retrieval-index build step,
    emitted as (term, doc_id, tf) rows.

    Plan (one exchange): per-batch vectorized (doc_id, term, tf) rows via
    ONE polars explode+group_by (globally unique per (doc, term): a doc
    lives in exactly one batch), then stages/groups.grouped_topk bounds
    the shuffle to k × blocks candidate rows per term — the distributed
    ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) <= k.
    Tokens are the shared whitespace contract, so the SQL oracle (a
    QUALIFY window over unnested tokens) matches exactly."""
    import polars as pl

    from parser_rdf_ray.stages.groups import grouped_topk
    from parser_rdf_ray.tuning import tune_data_context

    tune_data_context()

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.int64())
        toks = ws_tokens(pc.cast(batch.column("text"), pa.string()))
        t = pa.Table.from_arrays([ids, toks], names=["doc_id", "term"])
        agg = pl.from_arrow(t).explode("term", empty_as_null=True).group_by(["doc_id", "term"]).len()
        out = agg.to_arrow()
        return pa.Table.from_arrays(
            [
                pc.cast(out.column("term").combine_chunks(), pa.string()),
                pc.cast(out.column("doc_id").combine_chunks(), pa.int64()),
                pc.cast(out.column("len").combine_chunks(), pa.int64()),
            ],
            names=["term", "doc_id", "tf"],
        )

    tf = documents_ds.map_batches(
        tf_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_topk(
        tf, ["term"], "tf", k, descending=True, tie_cols=["doc_id"]
    )
