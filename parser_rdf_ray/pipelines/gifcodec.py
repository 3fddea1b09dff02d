"""GIF87a/89a codec (LZW) in pure Python + numpy — no external library.

Decoder: logical screen descriptor, global/local color tables, extension
blocks skipped (the graphic-control extension's transparency index is
ignored — the palette color shows), FIRST image frame decoded (animated
GIFs: later frames are ignored, documented), Adam-style 4-pass interlace
supported. LZW decompression is the classic variable-width dictionary
loop (per-code Python — inherent to LZW; output assembly is numpy).

Encoder (round-trip counterpart): palettized images (≤256 unique
colors), proper dictionary-building LZW with width growth and a reset at
the 4096-entry ceiling, non-interlaced GIF89a.
"""

from __future__ import annotations

import numpy as np

from parser_rdf_ray.pipelines._codec_guard import check_dims, malformed_guard

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW data truncated")
            acc |= data[pos] << nbits  # LSB-first bit packing
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dictionary):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        if prev is not None:
            dictionary.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(dictionary) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_expected])


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


@malformed_guard("GIF")
def decode_gif(data: bytes) -> np.ndarray:
    """GIF → uint8 (h, w, 3) RGB of the first image frame. Malformed
    payloads raise ValueError (pipelines/_codec_guard contract)."""
    if data[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_table = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    del sw, sh
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            check_dims(w, h, "GIF")
            iflags = data[pos + 9]
            pos += 10
            table = global_table
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                table = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(min_code_size, bytes(lzw), w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= len(table):
                raise ValueError("GIF pixel index outside color table")
            return table[idx]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {(i,): i for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = fresh()
    put(clear, width)
    seq: tuple = ()
    for byte in indices:
        cand = seq + (byte,)
        if cand in table:
            seq = cand
            continue
        put(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear, width)
            table, next_code, width = fresh()
        seq = (byte,)
    if seq:
        put(table[seq], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB with ≤256 unique colors → GIF89a."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("GIF encoder needs <=256 unique colors")
    # color-table size: power of two >= max(2, len(palette))
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    n = 1 << bits
    table = np.zeros((n, 3), np.uint8)
    table[: len(palette)] = palette
    min_code_size = max(2, bits)
    lzw = _lzw_encode(min_code_size, bytes(inverse.astype(np.uint8)))
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # global table, bg 0, no aspect
    out += table.tobytes()
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0])  # no local table, not interlaced
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
