"""Baseline JPEG (SOF0) encode/decode from the public spec, no codec lib.

Decoder scope: baseline sequential DCT, 8-bit, Huffman entropy coding,
1 or 3 components, sampling factors (1,1)/(2,2)-luma, JFIF YCbCr.
Progressive (SOF2), arithmetic coding, 12-bit, restart intervals, and
exotic sampling raise ``NotImplementedError`` explicitly.

Encoder scope (fixture/test writer): 4:4:4 or 4:2:0, caller-supplied
quantization tables (default all-ones = near-lossless: flat images
round-trip EXACTLY, arbitrary images within +/-1 per channel before
color conversion), simple flat Huffman tables (all DC symbols at 4
bits, all AC symbols at 8 bits — canonical, all-ones code unused as
the spec requires).

Numerics: the 2-D DCT is the orthonormal matrix form F = M B Mt with
M[u,x] = 0.5 c(u) cos((2x+1) u pi / 16) — exactly the spec's FDCT
scaling (flat block of value v has DC = 8(v-128) and zero AC), so
quantization with q=1 is value-preserving for flat blocks.

The zigzag table is verified in tests against an independent
diagonal-walk derivation, since encoder and decoder sharing one table
would otherwise hide a transposition.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_C = np.array([1.0 / np.sqrt(2.0)] + [1.0] * 7)
_M = 0.5 * _C[:, None] * np.cos(
    (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ (block.astype(np.float64) - 128.0) @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M + 128.0


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from DHT BITS/HUFFVAL (canonical order)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> symbol lookup walked bit by bit."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.table = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(counts, symbols).items()
        }

    def read(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


# Flat encoder tables: N symbols all at one length L with 2^L > N, so
# the all-1s code of length L is never assigned (spec requirement).
_DC_SYMS = list(range(12))                      # categories 0..11 at 4 bits
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]                                               # EOB, ZRL, 160 run/size
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8  # all at 8 bits


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif 0xD0 <= nxt <= 0xD7:
                    raise NotImplementedError("JPEG restart markers unsupported")
                else:
                    raise ValueError("marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _encode_block(
    w: "_BitWriter",
    coef: np.ndarray,
    pred: int,
    q: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    qz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
    dc = int(qz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(qz)[0])) if np.any(qz[1:]) else 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]  # ZRL
                w.write(code, ln)
                run = 0
            continue
        s = _category(v)
        if s > 10:
            raise ValueError("AC coefficient too large for baseline tables")
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., c].astype(np.float64) for c in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: bool = False,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JFIF JPEG.

    ``quant``: 64 zigzag-order quantization values shared by all
    components (default all-ones: near-lossless). ``subsample``: 4:2:0
    chroma with (2,2) luma sampling, else 4:4:4.
    """
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    q = np.ones(64, dtype=np.float64) if quant is None else np.asarray(quant, dtype=np.float64)
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    hs = vs = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    def padded(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")

    y_plane = padded(ycc[:, :, 0], mcus_y * mcu_h, mcus_x * mcu_w)
    if subsample:
        cpad = [padded(ycc[:, :, c], mcus_y * mcu_h, mcus_x * mcu_w) for c in (1, 2)]
        chroma = [p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3)) for p in cpad]
    else:
        chroma = [padded(ycc[:, :, c], mcus_y * 8, mcus_x * 8) for c in (1, 2)]

    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vs):
                for bx in range(hs):
                    r0, c0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    block = y_plane[r0 : r0 + 8, c0 : c0 + 8]
                    preds[0] = _encode_block(bw, _fdct(block), preds[0], q, dc_codes, ac_codes)
            for ci, plane in enumerate(chroma, start=1):
                block = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[ci] = _encode_block(bw, _fdct(block), preds[ci], q, dc_codes, ac_codes)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = np.round(q).astype(np.uint8)
    dqt = seg(0xFFDB, b"\x00" + qz.tobytes())
    comp = b""
    for cid, (hf, vf) in ((1, (hs, vs)), (2, (1, 1)), (3, (1, 1))):
        comp += bytes([cid, (hf << 4) | vf, 0])
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3) + comp)
    dht = seg(0xFFC4, b"\x00" + bytes(_DC_COUNTS) + bytes(_DC_SYMS)) + seg(
        0xFFC4, b"\x10" + bytes(_AC_COUNTS) + bytes(_AC_SYMS)
    )
    sos = seg(0xFFDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes into an (h, w, 3) uint8 RGB array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected JPEG marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before scan data")
        length = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq:
                    raise NotImplementedError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.float64)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(counts, symbols)
                i += 17 + n
        elif marker == 0xC0:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            from ag_data_ingestion_github_to_snowflake_spark.operators.codecs import (
                check_decode_dims,
            )

            check_decode_dims(fw, fh)
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} unsupported (baseline only)")
        elif marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals unsupported")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            tables = {body[1 + 2 * i]: body[2 + 2 * i] for i in range(ns)}
            return _decode_scan(data, pos, frame, tables, quant, huff)
        # else: APPn/COM — skipped
    raise ValueError("no JPEG scan found")


def _decode_scan(data, pos, frame, tables, quant, huff):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                td = tables[c["id"]] >> 4
                ta = tables[c["id"]] & 0x0F
                dc_dec, ac_dec = huff[(0, td)], huff[(1, ta)]
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = dc_dec.read(br)
                        diff = _extend(br.receive(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = ac_dec.read(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.receive(s), s) * q[k]
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        px = _idct(coef.reshape(8, 8))
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = px
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
