"""Multimodal column handling (training-data pipeline ops).

Media spans are opaque references/bytes with typed metadata. The Ray-side
plumbing — schemas, batch sizing, actor-pool signatures, output layout —
is real and tested; the actual codec work is STUBBED (image/audio libraries
are not in this environment) behind MediaDecoder.decode_real, which raises
NotImplementedError, with a clearly-marked deterministic fake used so the
pipeline shape is exercisable end-to-end.

Batch-size note (100 TB design): media payloads are large binaries, so
these stages should run with small batch_size (e.g. 16-64) and actor pools
sized so batch_size × concurrency × payload fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_kind", pa.string()),  # image | audio | video | unknown
        ("payload", pa.binary()),  # opaque bytes (empty when ref-only)
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_kind", pa.string()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
        ("decode_ok", pa.bool_()),
    ]
)


def media_rows_from_documents(batch: pa.Table) -> pa.Table:
    """documents(spans) → one row per media span (flat_map-style)."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    out = {n: [] for n in MEDIA_SCHEMA.names}
    for doc_id, spans in zip(doc_ids, spans_col):
        for s in spans or []:
            if s["kind"] != "media":
                continue
            ref = s["media_ref"]
            if ref.startswith("media://"):
                kind = "image" if ref.endswith(("0", "2", "4", "6", "8")) else "audio"
            else:
                kind = "unknown"
            out["doc_id"].append(doc_id)
            out["media_ref"].append(ref)
            out["media_kind"].append(kind)
            out["payload"].append(b"")
    return pa.Table.from_arrays(
        [pa.array(out[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names],
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool featurizer: expensive setup (codec/model load) happens
    once per actor in __init__; __call__ handles one small batch."""

    def __init__(self, use_stub: bool = True):
        self.use_stub = use_stub
        # real implementation would load codecs / a feature model here, once

    def decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        # STUB: image/audio decode libraries are not available in this
        # environment. The interface (bytes + kind → float32 feature vec)
        # is the real contract.
        raise NotImplementedError(
            "media decoding requires image/audio codecs not present in this build"
        )

    def _decode_fake(self, ref: str, kind: str) -> np.ndarray:
        # deterministic fake: feature = normalized blake2b of the ref
        digest = hashlib.blake2b(f"{kind}:{ref}".encode(), digest_size=FEATURE_DIM).digest()
        vec = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
        return vec / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {n: [] for n in FEATURES_SCHEMA.names}
        for doc_id, ref, kind, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("media_kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            try:
                if self.use_stub:
                    vec = self._decode_fake(ref, kind)
                else:
                    vec = self.decode_real(payload, kind)
                ok = True
            except NotImplementedError:
                vec = np.zeros(FEATURE_DIM, dtype=np.float32)
                ok = False
            out["doc_id"].append(doc_id)
            out["media_ref"].append(ref)
            out["media_kind"].append(kind)
            out["feature"].append(vec.tolist())
            out["decode_ok"].append(ok)
        return pa.Table.from_arrays(
            [pa.array(out[n], FEATURES_SCHEMA.field(n).type) for n in FEATURES_SCHEMA.names],
            schema=FEATURES_SCHEMA,
        )


def media_features(documents_ds, batch_size: int = 64, concurrency=(1, 4)):
    """documents(spans) → media feature rows. Small batches + actor pool:
    the binary-payload memory contract for multimodal stages."""
    media = documents_ds.map_batches(
        media_rows_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
