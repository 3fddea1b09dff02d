"""Baseline JPEG (ITU-T T.81, public spec) codec in pure numpy + stdlib —
no external codec library.

Decoder: SOI, APPn/COM skip, DQT (8-bit), SOF0 (baseline sequential,
8-bit, 1 or 3 components, sampling factors 1-2 → 4:4:4 / 4:2:2 / 4:2:0),
DHT (tables read from the stream — nothing relies on the Annex K
defaults), single interleaved SOS scan. Entropy decoding is a bit-serial
Python loop (inherent to Huffman); everything after the coefficient
arrays is vectorized numpy: dequantization, batched 8×8 IDCT as two
matrix products over all blocks at once (einsum), chroma upsampling by
pixel repetition (the box filter JFIF decoders commonly use — the spec
leaves the upsampling filter to the implementation), and the JFIF
YCbCr→RGB transform.

Encoder (round-trip counterpart and re-encode target): grayscale or
4:4:4 RGB, single quant table per component class, and deliberately
SIMPLE spec-valid Huffman tables (all 12 DC symbols at 4 bits, all 162
AC symbols at 8 bits — canonical, all-ones code unassigned). Suboptimal
compression, but the tables ship in the DHT segments like any JPEG's,
so the decoder path exercised is exactly the general one.

Not supported (raise NotImplementedError, never a wrong answer):
progressive (SOF2) and the other non-baseline frame types, 12-bit
precision, arithmetic coding, restart intervals (DRI > 0), sampling
factors > 2.
"""

from __future__ import annotations

import numpy as np

from parser_rdf_ray.pipelines._codec_guard import check_dims, malformed_guard


def _zigzag_order() -> np.ndarray:
    """The spec's zigzag scan as flat 8×8 indices, generated from the
    diagonal rule (even anti-diagonals walk bottom-up) rather than
    transcribed."""
    order = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(0, d + 1)
        for i in rng:
            j = d - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# orthonormal DCT-II basis: forward F = C @ f @ C.T, inverse f = C.T @ F @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * k * np.pi / 16)
            for x in range(8)
        ]
        for k in range(8)
    ]
)


def _build_huffman(bits: list[int], values: list[int]):
    """Canonical JPEG Huffman code assignment (T.81 C.2): returns both
    the decode map {(length, code): symbol} and the encode map
    {symbol: (length, code)}."""
    decode, encode = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[k]
            decode[(length, code)] = sym
            encode[sym] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise _MarkerHit(nxt)
            self.buf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


@malformed_guard("JPEG")
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w) gray or (h, w, 3) RGB. Malformed
    payloads raise ValueError (pipelines/_codec_guard contract)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2:
            raise ValueError("JPEG segment length below header size")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                q = np.frombuffer(body[p + 1 : p + 65], np.uint8).astype(np.int32)
                qtables[tq] = q
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                table, _ = _build_huffman(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            check_dims(w, h, "JPEG")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": body[8 + 3 * c]}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG frame type")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
            if restart_interval:
                raise NotImplementedError("JPEG restart intervals")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                td, ta = body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({**comp, "td": td, "ta": ta})
            return _decode_scan(
                data, pos + seglen, frame, scan, qtables, huff_dc, huff_ac
            )
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("JPEG scan not found")


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors > 2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = {
        c["id"]: np.zeros((mcuy * c["v"] * mcux * c["h"], 64), np.int32)
        for c in scan
    }
    # block index layout: per component, row-major over the full block grid
    bpl = {c["id"]: mcux * c["h"] for c in scan}  # blocks per line
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan}
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                for c in scan:
                    dc_t, ac_t = huff_dc[c["td"]], huff_ac[c["ta"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = np.zeros(64, np.int32)
                            s = reader.huff(dc_t)
                            diff = _extend(reader.bits(s), s) if s else 0
                            pred[c["id"]] += diff
                            blk[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = reader.huff(ac_t)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("JPEG AC index overflow")
                                blk[k] = _extend(reader.bits(s), s)
                                k += 1
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            coefs[c["id"]][row * bpl[c["id"]] + col] = blk
    except _MarkerHit as m:
        if m.marker != 0xD9:
            raise ValueError(f"unexpected JPEG marker 0x{m.marker:02x} in scan")
    planes = {}
    for c in scan:
        q = qtables[c["tq"]]
        deq = (coefs[c["id"]] * q).astype(np.float64)
        blocks = np.zeros((len(deq), 64), np.float64)
        blocks[:, _ZIGZAG] = deq  # un-zigzag
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ka,nkl,lb->nab", _C, blocks, _C)
        spatial = np.clip(np.rint(spatial + 128.0), 0, 255).astype(np.uint8)
        nlines = mcuy * c["v"]
        ncols = bpl[c["id"]]
        plane = (
            spatial.reshape(nlines, ncols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nlines * 8, ncols * 8)
        )
        # upsample to full resolution by pixel repetition, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes[c["id"]] = plane[:h, :w]
    if len(scan) == 1:
        return planes[scan[0]["id"]]
    y, cb, cr = (planes[c["id"]].astype(np.float64) for c in scan)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------

# simple spec-valid canonical tables: 12 DC symbols at 4 bits, 162 AC
# symbols at 8 bits (all-ones code unassigned in both)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [
    rs
    for rs in ([0x00] + [r << 4 | s for r in range(16) for s in range(1, 11)]
               + [0xF0])
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
assert len(_AC_VALS) == 162 and len(_AC_VALS) <= 255


def _default_qtable(quality: int) -> np.ndarray:
    """Deterministic quant table (natural order): base grows with
    frequency, scaled by an IJG-style quality factor, clipped to 1..255.
    The table ships in DQT, so its exact values are a tuning choice, not
    a conformance one."""
    i, j = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    base = 8 + 2 * (i + j)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 75) -> bytes:
    """uint8 gray (h, w) or RGB (h, w, 3) → baseline 4:4:4 JPEG."""
    img = np.asarray(img, dtype=np.uint8)
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    q = _default_qtable(quality)
    qz = q.ravel()[_ZIGZAG]
    dc_dec, dc_enc = _build_huffman(_DC_BITS, _DC_VALS)
    ac_dec, ac_enc = _build_huffman(_AC_BITS, _AC_VALS)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    writer = _BitWriter()
    preds = [0] * len(planes)
    # quantized zigzag coefficients per plane, all blocks vectorized
    plane_coefs = []
    for plane in planes:
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        fdct = np.einsum("ak,nkl,bl->nab", _C, blocks, _C)
        zz = fdct.reshape(-1, 64)[:, _ZIGZAG]
        plane_coefs.append(np.rint(zz / qz).astype(np.int64))
    n_blocks = plane_coefs[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4: one block per component per MCU
        for ci, coefs in enumerate(plane_coefs):
            blk = coefs[bi]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            s = _category(diff)
            ln, code = dc_enc[s]
            writer.write(code, ln)
            if s:
                writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_enc[0xF0]  # ZRL
                    writer.write(code, ln)
                    run -= 16
                s = _category(v)
                ln, code = ac_enc[(run << 4) | s]
                writer.write(code, ln)
                writer.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if run:
                ln, code = ac_enc[0x00]  # EOB
                writer.write(code, ln)
    payload = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    # DQT elements are stored in ZIGZAG order (T.81 B.2.4.1)
    out += seg(0xDB, bytes([0]) + bytes(qz.tolist()))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += payload
    out += b"\xff\xd9"
    return bytes(out)
