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


def assemble_spans(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents(doc_id, spans) → assembled docs."""
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
