"""Vectorized MD5-low64 — the engine's SQL-replayable hash, batched.

The md5-low64 contract (low 8 digest bytes, little-endian == DuckDB's
``md5_number_lower``) gates splits, decontamination, sampling, simhash
tokens, sketches and bloom keys.  The scalar form
(``hashlib.md5(msg).digest()[8:16]`` per row) was the last per-row
Python dispatch on corpus-scale columns; this module computes the SAME
bits with a numpy lane-parallel single-block MD5 (RFC 1321): messages
that fit one padded block (≤ 55 bytes — every decimal doc_id and almost
every token) run 64 rounds of uint32 array arithmetic across the whole
batch at once; longer messages fall back to per-row hashlib, so the
output is bit-for-bit identical to the scalar form for ANY input.

Bit-exactness is pinned against hashlib in tests/test_md5vec.py over
random bytes at every length 0..200 plus multi-byte UTF-8; the oracle
sweep then replays the same bits in SQL, so any drift here fails both.

Word loads view the padded buffer as little-endian uint32 ('<u4'),
which is byte-order-explicit and therefore platform-independent.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RFC 1321 tables ------------------------------------------------------------
_S = (
    [7, 12, 17, 22] * 4
    + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4
)
_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_G = [
    i if i < 16
    else (5 * i + 1) % 16 if i < 32
    else (3 * i + 5) % 16 if i < 48
    else (7 * i) % 16
    for i in range(64)
]

# single padded block holds messages of ≤ 55 bytes (56th is 0x80, last 8
# the bit length)
SINGLE_BLOCK_MAX = 55

# below this many rows the per-row hashlib loop is FASTER than the lane
# path: the 64 rounds cost ~768 numpy ufunc dispatches (~0.4 ms) however
# few the lanes, while hashlib is ~0.6 µs/row (measured crossover ~1k;
# n=16 loop wins 37×, n=16k lanes win 2.6×). Bits identical either way.
VECTOR_MIN_ROWS = 1024


# lanes per slab: measured sweep (1M tokens, this VM) bottoms at 2^14 —
# the ~9 live uint32 work arrays (~0.6 MB) sit in L2, vs DRAM-streaming
# temporaries at 2^16+ (0.16 s vs 0.43 s rounds time) and ufunc dispatch
# overhead dominating below 2^13
_SLAB = 1 << 14

# MD5 padding for a message of L ≤ 55 bytes is a pure function of L:
# 0x80, zeros to byte 56, then the 8-byte little-endian bit length.
# Precomputing all 56 suffixes lets the whole padded-block buffer be
# built with two Arrow C kernels (take + binary_join_element_wise)
# instead of a ragged numpy scatter (~5x on the build phase).
_PAD_SUFFIXES = [
    b"\x80" + bytes(55 - L) + (L * 8).to_bytes(8, "little") for L in range(56)
]
_PAD_TABLE = pa.array(_PAD_SUFFIXES, pa.binary())
_PAD_TABLE_LARGE = pa.array(_PAD_SUFFIXES, pa.large_binary())


def _md5_rounds_slab(M: np.ndarray) -> np.ndarray:
    """(k, 16) little-endian uint32 message words → (k,) uint64 low-64
    digests.  One slab of the 64 MD5 rounds, all-lane uint32 arithmetic
    with preallocated temporaries; unsigned overflow wraps silently in
    numpy, which is exactly MD5's mod-2^32 semantics."""
    n = M.shape[0]
    a = np.full(n, 0x67452301, np.uint32)
    b = np.full(n, 0xEFCDAB89, np.uint32)
    c = np.full(n, 0x98BADCFE, np.uint32)
    d = np.full(n, 0x10325476, np.uint32)
    f = np.empty(n, np.uint32)
    t = np.empty(n, np.uint32)
    for i in range(64):
        if i < 16:
            # F = (b & c) | (~b & d)  ==  d ^ (b & (c ^ d))
            np.bitwise_xor(c, d, out=f)
            np.bitwise_and(f, b, out=f)
            np.bitwise_xor(f, d, out=f)
        elif i < 32:
            # F = (d & b) | (~d & c)  ==  c ^ (d & (b ^ c))
            np.bitwise_xor(b, c, out=f)
            np.bitwise_and(f, d, out=f)
            np.bitwise_xor(f, c, out=f)
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
        else:
            # F = c ^ (b | ~d)
            np.bitwise_not(d, out=f)
            np.bitwise_or(f, b, out=f)
            np.bitwise_xor(f, c, out=f)
        np.add(f, a, out=f)
        f += _K[i]
        f += M[:, _G[i]]
        s = _S[i]
        a, d, c, b, t = d, c, b, t, a  # rotate registers, recycle old a as new b
        np.left_shift(f, np.uint32(s), out=b)
        np.right_shift(f, np.uint32(32 - s), out=f)
        np.bitwise_or(b, f, out=b)
        b += c  # c now holds the previous b
    c += np.uint32(0x98BADCFE)
    d += np.uint32(0x10325476)
    return c.astype(np.uint64) | (d.astype(np.uint64) << np.uint64(32))


def _md5_low64_blocks(buf: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 pre-padded single blocks → (n,) uint64 low-64
    digests, slabbed for cache residency."""
    M = np.ascontiguousarray(buf).view("<u4").reshape(-1, 16)
    n = M.shape[0]
    if n <= _SLAB:
        return _md5_rounds_slab(M)
    out = np.empty(n, dtype=np.uint64)
    for lo in range(0, n, _SLAB):
        hi = min(lo + _SLAB, n)
        out[lo:hi] = _md5_rounds_slab(M[lo:hi])
    return out


def _scalar_low64(msg: bytes) -> int:
    return int.from_bytes(hashlib.md5(msg).digest()[8:16], "little")


def _as_flat_binary(values) -> pa.Array:
    """Normalize input (pa string/binary array, chunked array, numpy
    object array, or sequence of str/bytes) to one flat pyarrow
    string/binary array.  pa.array() does the UTF-8 encoding of Python
    strs in C, so even list input avoids a per-row .encode() loop."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(list(values) if not isinstance(values, (list, np.ndarray)) else values)
    if values.null_count:
        raise ValueError("md5_low64: null values are not hashable")
    return values


def md5_low64(values) -> np.ndarray:
    """Batched md5-low64 (== DuckDB ``md5_number_lower`` on the same
    strings): accepts a pyarrow string/binary (chunked) array or any
    sequence of str/bytes, returns uint64 per value.  Messages ≤ 55
    bytes (all ids, nearly all tokens) take the vectorized single-block
    path; longer ones fall back to per-row hashlib — bits identical
    either way."""
    arr = _as_flat_binary(values)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    elif pa.types.is_string(t) or pa.types.is_binary(t):
        off_dtype = np.int32
    else:
        raise TypeError(f"md5_low64: unsupported array type {t}")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)

    lens = np.diff(offsets)
    out = np.empty(n, dtype=np.uint64)
    if n < VECTOR_MIN_ROWS:
        for i in range(n):
            out[i] = _scalar_low64(data[offsets[i] : offsets[i + 1]].tobytes())
        return out
    small = lens <= SINGLE_BLOCK_MAX
    ns = int(small.sum())
    if ns:
        if ns == n:
            sub, sl = arr, lens
        else:
            idx = np.flatnonzero(small)
            sub, sl = arr.take(pa.array(idx)), lens[small]
        # pad every message to its 64-byte MD5 block in C: gather the
        # length-keyed suffix and concatenate — the result is uniformly
        # 64 bytes wide, so its data buffer IS the (ns, 64) block matrix
        if off_dtype is np.int64:
            bin_t, table = pa.large_binary(), _PAD_TABLE_LARGE
        else:
            bin_t, table = pa.binary(), _PAD_TABLE
        suffixes = table.take(pa.array(sl, type=pa.int32()))
        padded = pc.binary_join_element_wise(
            sub.cast(bin_t), suffixes, pa.scalar(b"", type=bin_t)
        )
        pbufs = padded.buffers()
        start = int(np.frombuffer(pbufs[1], dtype=off_dtype)[padded.offset])
        buf = np.frombuffer(pbufs[2], dtype=np.uint8)[start : start + ns * 64].reshape(ns, 64)
        out[small] = _md5_low64_blocks(buf)
    if ns < n:
        for i in np.flatnonzero(~small):
            lo, hi = offsets[i], offsets[i + 1]
            out[i] = _scalar_low64(data[lo:hi].tobytes())
    return out


def md5_low64_ids(ids) -> np.ndarray:
    """md5-low64 over the DECIMAL STRING of each integer id — the
    split/sample membership contract (``md5_number_lower(CAST(id AS
    VARCHAR))``).  Input: pyarrow int array/chunked array or numpy int
    array; the int→string render is pyarrow's C cast kernel."""
    if isinstance(ids, np.ndarray):
        ids = pa.array(ids)
    elif not isinstance(ids, (pa.Array, pa.ChunkedArray)):
        ids = pa.array(list(ids), pa.int64())
    return md5_low64(pc.cast(ids, pa.string()))


def md5_low64_prefixed(prefix: str, terms) -> np.ndarray:
    """md5-low64 over ``prefix + term`` per term (the count-min row-seed
    shape ``f"{j}:{term}"``), with the concat done by pyarrow's
    element-wise join kernel rather than a Python f-string loop."""
    arr = _as_flat_binary(terms)
    joined = pc.binary_join_element_wise(
        pa.scalar(prefix, type=arr.type), arr, pa.scalar("", type=arr.type)
    )
    return md5_low64(joined)
