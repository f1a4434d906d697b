"""Pure-numpy baseline JPEG codec (no codec library).

Decoder: baseline/extended sequential Huffman JPEG (SOF0/SOF1) — DQT /
DHT / DRI / RSTn / APPn / COM segment parsing, canonical Huffman
entropy decode, dequantize + inverse zigzag, separable float64 IDCT,
sample-replication chroma upsampling for any (h, v) factors, and the
BT.601 YCbCr->RGB transform.  Progressive (SOF2), arithmetic, 12-bit,
and hierarchical streams return ``None`` — callers fall back to the
stub tier exactly like the other decoders in ``multimodal``.

Encoder: the round-trip partner used to synthesize REAL ``.jpg``
payloads distributed (``multimodal.make_real_media``) — grayscale or
RGB, optional 4:2:0 subsampling, Annex K standard Huffman tables, any
quantization table (the all-ones default makes block-constant images
round-trip EXACTLY: a constant 8x8 block has one integer DC
coefficient and zero ACs, so quantize/IDCT introduce no error — the
property the correctness gate's closed-form SQL oracle replays).

Everything here is public-spec material: ITU-T T.81 (the JPEG spec,
including the Annex K example tables) plus the JFIF conventions.

Scale note: like the PNG/BMP tier, decode runs where the bytes live
(inside ``mapInPandas`` kernels); nothing in this module touches Spark
directly.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan: position k of the scan -> (row, col) of the 8x8 block.
# Derived from the diagonal rule instead of a 64-literal table: within
# an anti-diagonal d = r + c, odd d runs top-right -> bottom-left
# (row ascending), even d the reverse.
_ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
)
_ZZ_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZZ_COLS = np.array([c for _, c in _ZIGZAG])

# 8x8 DCT-II matrix A with orthonormal scaling: S = A @ B @ A.T,
# B = A.T @ S @ A.  A[0, :] = 1/(2*sqrt(2)); S[0,0] of a constant
# block v is exactly 8*v.
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# ITU-T T.81 Annex K.3 "typical" Huffman tables.  BITS = number of
# codes per length 1..16; VALS = symbols in code order.
_DC_LUM_BITS = bytes.fromhex("00010501010101010100000000000000")
_DC_LUM_VALS = bytes(range(12))
_DC_CHR_BITS = bytes.fromhex("00030101010101010101010000000000")
_DC_CHR_VALS = bytes(range(12))
_AC_LUM_BITS = bytes.fromhex("0002010303020403050504040000017d")
_AC_LUM_VALS = bytes.fromhex(
    "01020300041105122131410613516107227114328191a1082342b1c11552d1"
    "f02433627282090a161718191a25262728292a3435363738393a4344454647"
    "48494a535455565758595a636465666768696a737475767778797a83848586"
    "8788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9ba"
    "c2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3"
    "f4f5f6f7f8f9fa"
)
_AC_CHR_BITS = bytes.fromhex("00020102040403040705040400010277")
_AC_CHR_VALS = bytes.fromhex(
    "000102031104052131061241510761711322328108144291a1b1c109233352"
    "f0156272d10a162434e125f11718191a262728292a35363738393a43444546"
    "4748494a535455565758595a636465666768696a737475767778797a828384"
    "85868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8"
    "b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3"
    "f4f5f6f7f8f9fa"
)


def _canonical_codes(bits, vals):
    """(code, length) per symbol in canonical order — shared by the
    encoder (symbol -> code dict) and decoder (min/max/valptr arrays,
    the F.16 decode procedure)."""
    codes, code = [], 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes.append((code, ln))
            code += 1
        code <<= 1
    return codes


def _enc_table(bits, vals):
    return {v: cl for v, cl in zip(vals, _canonical_codes(bits, vals))}


def _dec_table(bits, vals):
    """Spec F.16 arrays: per length, (mincode, maxcode, valptr)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    codes = _canonical_codes(bits, vals)
    i = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            valptr[ln] = i
            mincode[ln] = codes[i][0]
            maxcode[ln] = codes[i + n - 1][0]
            i += n
        else:
            maxcode[ln] = -1
    return mincode, maxcode, valptr, bytes(vals)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over already-unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huff(self, table) -> int:
        mincode, maxcode, valptr, vals = table
        code = self.read(1)
        for ln in range(1, 17):
            mc = maxcode[ln]
            if mc >= 0 and code <= mc:
                return vals[valptr[ln] + code - mincode[ln]]
            code = (code << 1) | self.read(1)
        raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """Spec F.12: map the s received bits to the signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_block(S: np.ndarray) -> np.ndarray:
    return _DCT_A.T @ S @ _DCT_A


def decode_jpeg(payload: bytes) -> Optional[np.ndarray]:
    """Baseline-sequential JPEG bytes -> ``(H, W, C) uint8`` (C = 1
    gray or 3 RGB), or ``None`` for non-JPEG / unsupported variants
    (progressive, arithmetic, 12-bit)."""
    try:
        return _decode_jpeg(payload)
    except Exception:
        return None


def _decode_jpeg(payload: bytes) -> Optional[np.ndarray]:
    if payload is None or payload[:2] != b"\xff\xd8":
        return None
    n = len(payload)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huf: dict[tuple[int, int], tuple] = {}
    comps = None  # [(cid, hi, vi, tq)]
    h = w = 0
    restart = 0
    scan = None
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:  # 16-bit table
                    tab = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    tab = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                q = np.zeros((8, 8), np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = tab
                qt[tq] = q
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or not h or not w:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive / lossless / arithmetic
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = seg[i + 1 : i + 17]
                nv = sum(bits)
                vals = seg[i + 17 : i + 17 + nv]
                huf[(tc, th)] = _dec_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos += ln
            break
        pos += ln
    if comps is None or scan is None:
        return None

    # entropy-coded data: unstuff FF00 -> FF, note RST positions
    segments = []  # list of unstuffed byte strings (restart intervals)
    cur = bytearray()
    i = pos
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker
            break
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes at sampled resolution
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64)
        for _, hi, vi, _ in comps
    ]
    scan_of = {cs: (td, ta) for cs, td, ta in scan}
    order = []  # (comp_index, hi, vi, dc_table, ac_table, quant)
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        td, ta = scan_of[cid]
        order.append((ci, hi, vi, huf[(0, td)], huf[(1, ta)], qt[tq]))

    pred = [0] * len(comps)
    mcu_i = 0
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                reader = _BitReader(next(seg_iter))
                pred = [0] * len(comps)
            mcu_i += 1
            for ci, hi, vi, dct, act, q in order:
                for by in range(vi):
                    for bx in range(hi):
                        S = np.zeros((8, 8), np.float64)
                        s = reader.huff(dct)
                        diff = _extend(reader.read(s), s) if s else 0
                        pred[ci] += diff
                        S[0, 0] = pred[ci] * q[0, 0]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            v = _extend(reader.read(s), s)
                            rr, cc = _ZIGZAG[k]
                            S[rr, cc] = v * q[rr, cc]
                            k += 1
                        px = _idct_block(S) + 128.0
                        y0, x0 = (my * vi + by) * 8, (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px

    out_planes = []
    for (ci, hi, vi, _, _, _), plane in zip(order, planes):
        up = plane.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        out_planes.append(up[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | code
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_coeff(bw: _BitWriter, v: int, table):
    s = int(v).bit_length() if v else 0
    code, ln = table[s]
    bw.write(code, ln)
    if s:
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_block(bw: _BitWriter, S: np.ndarray, pred: int, dct, act) -> int:
    zz = S[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, ln = dct[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.flatnonzero(zz[1:]) + 1
    k = 1
    for idx in nz:
        run = int(idx) - k
        while run >= 16:
            bw.write(*act[0xF0])  # ZRL
            run -= 16
        v = int(zz[idx])
        s = abs(v).bit_length()
        code, ln = act[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k = int(idx) + 1
    if k < 64:
        bw.write(*act[0x00])  # EOB
    return dc


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    S = _DCT_A @ (block - 128.0) @ _DCT_A.T
    return np.round(S / q)


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    return struct.pack(">HB", 2 + 1 + 64, tq) + zz


def _dht_segment(tc: int, th: int, bits: bytes, vals: bytes) -> bytes:
    return (
        struct.pack(">HB", 2 + 1 + 16 + len(vals), (tc << 4) | th)
        + bits
        + vals
    )


def encode_jpeg(
    arr: np.ndarray,
    quant_luma=None,
    quant_chroma=None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """``(H, W)``/``(H, W, 1)`` gray or ``(H, W, 3)`` RGB uint8 ->
    baseline JPEG bytes (Annex K Huffman tables, JFIF marker).

    Quant tables default to ALL-ONES (a legal table): with it, a
    block-constant image round-trips bit-exactly (integer DC, zero
    ACs), which the correctness gate exploits.  ``subsample=True``
    writes 4:2:0 chroma (2x2-mean downsample) — the common real-world
    layout, exercising the decoder's MCU-interleave path.
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that-many MCUs (DC predictors reset, bitstream re-aligned) —
    the error-resilience layout real encoders emit."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    ql = np.ones((8, 8), np.int64) if quant_luma is None else np.asarray(
        quant_luma, np.int64
    ).reshape(8, 8)
    qc = np.ones((8, 8), np.int64) if quant_chroma is None else np.asarray(
        quant_chroma, np.int64
    ).reshape(8, 8)

    a = arr.astype(np.float64)
    if ch == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        chans = [yy, cb, cr]
        quants = [ql, qc, qc]
    else:
        samp = [(1, 1)]
        chans = [a[..., 0]]
        quants = [ql]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = []
    for (hi, vi), cdata in zip(samp, chans):
        if hi != hmax or vi != vmax:
            fy, fx = vmax // vi, hmax // hi
            eh = -(-h // fy) * fy
            ew = -(-w // fx) * fx
            padded = np.pad(
                cdata, ((0, eh - h), (0, ew - w)), mode="edge"
            )
            cdata = padded.reshape(
                eh // fy, fy, ew // fx, fx
            ).mean(axis=(1, 3))
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        cdata = np.pad(
            cdata,
            ((0, ph - cdata.shape[0]), (0, pw - cdata.shape[1])),
            mode="edge",
        )
        planes.append(cdata)

    dc_lum = _enc_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _enc_table(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _enc_table(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _enc_table(_AC_CHR_BITS, _AC_CHR_VALS)
    tabs = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (len(chans) - 1)

    bw = _BitWriter()
    pred = [0] * len(chans)
    mcu_i = rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst_n % 8])
                rst_n += 1
                pred = [0] * len(chans)
            mcu_i += 1
            for ci, ((hi, vi), plane, q, (dct, act)) in enumerate(
                zip(samp, planes, quants, tabs)
            ):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        S = _fdct_quant(
                            plane[y0 : y0 + 8, x0 : x0 + 8], q
                        )
                        pred[ci] = _encode_block(
                            bw, S, pred[ci], dct, act
                        )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + _dqt_segment(0, ql)
    if len(chans) == 3:
        out += b"\xff\xdb" + _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, len(chans))
    for ci, (hi, vi) in enumerate(samp):
        sof += struct.pack(
            ">BBB", ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1
        )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += b"\xff\xc4" + _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if len(chans) == 3:
        out += b"\xff\xc4" + _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += b"\xff\xc4" + _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(chans)])
    for ci in range(len(chans)):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
