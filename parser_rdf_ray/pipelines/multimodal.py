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


RESIZE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("src_w", pa.int32()),
        ("src_h", pa.int32()),
        ("out_w", pa.int32()),
        ("out_h", pa.int32()),
        ("payload", pa.binary()),
    ]
)


class MediaResizer:
    """Actor-pool image resize stage (image rows only). Codec work is
    STUBBED like MediaDecoder: resize_real raises NotImplementedError (no
    image libraries in this build); the deterministic fake derives source
    dimensions from the ref so the plumbing — small batches, actor
    signature, typed output schema with a binary payload column — is real
    and oracle-checkable."""

    def __init__(self, out_w: int = 224, out_h: int = 224, use_stub: bool = True):
        self.out_w, self.out_h = out_w, out_h
        self.use_stub = use_stub  # real impl would load the codec here, once

    def resize_real(self, payload: bytes, out_w: int, out_h: int) -> bytes:
        raise NotImplementedError(
            "image resize requires codecs not present in this build"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {n: [] for n in RESIZE_SCHEMA.names}
        for doc_id, ref, kind in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("media_kind").to_pylist(),
        ):
            if kind != "image":
                continue
            # deterministic fake source dims (SQL-derivable): the media
            # index i is the ref suffix
            i = int(ref.rsplit("/", 1)[-1]) if ref.rsplit("/", 1)[-1].isdigit() else 0
            src_w = 64 + 32 * ((int(doc_id) + i) % 7) if doc_id.isdigit() else 64
            src_h = 64 + 32 * ((int(doc_id) * 3 + i) % 5) if doc_id.isdigit() else 64
            out["doc_id"].append(doc_id)
            out["media_ref"].append(ref)
            out["src_w"].append(src_w)
            out["src_h"].append(src_h)
            out["out_w"].append(self.out_w)
            out["out_h"].append(self.out_h)
            out["payload"].append(b"")
        return pa.Table.from_arrays(
            [pa.array(out[n], RESIZE_SCHEMA.field(n).type) for n in RESIZE_SCHEMA.names],
            schema=RESIZE_SCHEMA,
        )


FRAMES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("offset_ms", pa.int32()),
    ]
)


class FrameSampler:
    """Actor-pool temporal sampler (audio/video rows): flat_map of N
    deterministic sample points per media row — the frame-extraction
    plumbing (one input row → many frame rows, fixed stride) with the
    decoder itself stubbed as in MediaDecoder."""

    def __init__(self, n_frames: int = 2, stride_ms: int = 1000):
        self.n_frames = n_frames
        self.stride_ms = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {n: [] for n in FRAMES_SCHEMA.names}
        for doc_id, ref, kind in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("media_kind").to_pylist(),
        ):
            if kind not in ("audio", "video"):
                continue
            for f in range(self.n_frames):
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["frame_idx"].append(f)
                out["offset_ms"].append(f * self.stride_ms)
        return pa.Table.from_arrays(
            [pa.array(out[n], FRAMES_SCHEMA.field(n).type) for n in FRAMES_SCHEMA.names],
            schema=FRAMES_SCHEMA,
        )


def media_resize(documents_ds, batch_size: int = 64, concurrency=(1, 4)):
    media = documents_ds.map_batches(
        media_rows_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return media.map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def media_frames(documents_ds, batch_size: int = 64, concurrency=(1, 4)):
    media = documents_ds.map_batches(
        media_rows_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    return media.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
