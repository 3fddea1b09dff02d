"""Span assembly stage (S1): interleaved spans → document text.

Concatenates kind=='text' span texts in offset order (FIXTURES.md §1);
media spans pass through as a media_refs list column for the multimodal
stages. Enforces the per-row invariant the driver checks: span-sequence
well-formedness on (kind, text, media_ref, order) — strictly increasing
offsets, text spans carry no media_ref, media spans carry no text.
Violations become assembly-stage error rows, not exceptions.
"""

from __future__ import annotations

import pyarrow as pa

ASSEMBLED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("rdf_text", pa.string()),
        ("media_refs", pa.list_(pa.string())),
        ("n_spans", pa.int32()),
        ("assembly_error", pa.string()),  # "" when ok
    ]
)


def check_span_invariant(spans: list[dict]) -> str:
    """Returns '' if the span sequence is well-formed, else a message."""
    prev = None
    for s in spans:
        off = s["offset"]
        if prev is not None and off <= prev:
            return f"span offsets not strictly increasing at offset {off}"
        prev = off
        kind = s["kind"]
        if kind == "text":
            if s["media_ref"]:
                return "text span carries media_ref"
        elif kind == "media":
            if s["text"]:
                return "media span carries text"
        else:
            return f"unknown span kind {kind!r}"
    return ""


def _assemble_spans_py(batch: pa.Table) -> pa.Table:
    """Per-row Python path: used for batches with null span lists and as
    the behavior reference for the vectorized path below."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    texts, medias, n_spans, errors = [], [], [], []
    for spans in spans_col:
        spans = spans or []
        err = check_span_invariant(spans)
        ordered = sorted(spans, key=lambda s: s["offset"])
        texts.append("".join(s["text"] for s in ordered if s["kind"] == "text"))
        medias.append([s["media_ref"] for s in ordered if s["kind"] == "media"])
        n_spans.append(len(spans))
        errors.append(err)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(medias, pa.list_(pa.string())),
            pa.array(n_spans, pa.int32()),
            pa.array(errors, pa.string()),
        ],
        schema=ASSEMBLED_SCHEMA,
    )


def assemble_spans(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents(doc_id, spans) → assembled docs.

    Vectorized over the flattened list<struct> arrays: invariant checks are
    Arrow/numpy masks over all spans at once, text concatenation is one
    ``binary_join`` over a rebuilt list array, and Python touches only
    documents that actually violate the invariant (re-checked per-doc for
    exact error-message parity with _assemble_spans_py). Well-formed spans
    are strictly offset-increasing by contract, so stored order IS offset
    order — no sort; violating docs become error rows whose text is never
    parsed. Was ~1/3 of the parse-stage CPU as a per-span dict loop."""
    import numpy as np
    import pyarrow.compute as pc

    lc = batch.column("spans")
    if isinstance(lc, pa.ChunkedArray):
        lc = lc.combine_chunks()
    if lc.null_count:
        return _assemble_spans_py(batch)
    n = len(lc)
    counts = np.asarray(pc.list_value_length(lc), dtype=np.int64)
    values = lc.flatten()
    doc_idx = np.repeat(np.arange(n), counts)

    kind = values.field("kind")
    text = values.field("text")
    media_ref = values.field("media_ref")
    offset = np.asarray(values.field("offset"), dtype=np.int64)

    is_text = np.asarray(pc.equal(kind, "text"), dtype=bool)
    is_media = np.asarray(pc.equal(kind, "media"), dtype=bool)
    has_ref = np.asarray(pc.not_equal(media_ref, ""), dtype=bool)
    has_text = np.asarray(pc.not_equal(text, ""), dtype=bool)

    bad = ~(is_text | is_media) | (is_text & has_ref) | (is_media & has_text)
    if len(offset) > 1:
        non_increasing = (offset[1:] <= offset[:-1]) & (doc_idx[1:] == doc_idx[:-1])
        bad[1:] |= non_increasing
    bad_docs = np.unique(doc_idx[bad]) if bad.any() else ()

    errors = [""] * n
    if len(bad_docs):
        spans_py = lc.take(pa.array(bad_docs)).to_pylist()
        for d, spans in zip(bad_docs, spans_py):
            errors[d] = check_span_invariant(spans)

    text_mask = pa.array(is_text)
    text_counts = np.bincount(doc_idx[is_text], minlength=n) if is_text.any() else np.zeros(n, dtype=np.int64)
    text_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(text_counts, out=text_offsets[1:])
    text_lists = pa.ListArray.from_arrays(
        pa.array(text_offsets, pa.int32()), text.filter(text_mask)
    )
    joined = pc.binary_join(text_lists, "")

    media_mask = pa.array(is_media)
    media_counts = np.bincount(doc_idx[is_media], minlength=n) if is_media.any() else np.zeros(n, dtype=np.int64)
    media_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(media_counts, out=media_offsets[1:])
    media_lists = pa.ListArray.from_arrays(
        pa.array(media_offsets, pa.int32()), media_ref.filter(media_mask)
    )

    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            joined,
            media_lists,
            pa.array(counts, pa.int32()),
            pa.array(errors, pa.string()),
        ],
        schema=ASSEMBLED_SCHEMA,
    )
