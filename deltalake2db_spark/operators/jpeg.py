"""Pure-numpy JPEG codec (no codec library).

Decoder: Huffman JPEG, both baseline/extended sequential (SOF0/SOF1)
AND progressive (SOF2) — DQT / DHT / DRI / RSTn / APPn / COM segment
parsing, canonical Huffman entropy decode into a per-component
coefficient store, multi-scan progressive reassembly (spectral
selection, successive approximation with DC/AC first + refinement
scans, EOB runs per spec G.2), dequantize + inverse zigzag, batched
separable float64 IDCT, sample-replication chroma upsampling for any
(h, v) factors, and the BT.601 YCbCr->RGB transform.  Arithmetic,
12-bit, lossless, and hierarchical streams return ``None`` — callers
fall back to the stub tier exactly like the other decoders in
``multimodal``.

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

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no media handling of any kind (SURVEY.md §2.5); this is a north-star
extension for multimodal training-data pipelines.
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
    """Huffman JPEG bytes -> ``(H, W, C) uint8`` (C = 1 gray or 3
    RGB).  Supports baseline/extended sequential (SOF0/SOF1) AND
    progressive (SOF2: spectral selection + successive approximation,
    DC/AC first and refinement scans, EOB runs).  Returns ``None``
    for non-JPEG or the remaining variants (lossless, arithmetic,
    hierarchical, 12-bit)."""
    try:
        return _decode_jpeg(payload)
    except Exception:
        return None


class _Scan:
    __slots__ = (
        "comps", "ss", "se", "ah", "al", "segments", "restart", "tables",
    )

    def __init__(self, comps, ss, se, ah, al, segments, restart, tables):
        self.comps = comps  # [(comp_index, td, ta)]
        self.ss = ss
        self.se = se
        self.ah = ah
        self.al = al
        self.segments = segments
        self.restart = restart
        # tables are SNAPSHOTTED at parse time: real progressive files
        # redefine DHT ids between scans, so resolving lazily against
        # the final definitions mis-decodes earlier scans
        self.tables = tables  # {comp_index: (dc_table, ac_table)}


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
    scans: list[_Scan] = []
    progressive = False
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
                qt[tq] = tab.copy()  # zigzag order, like the coef store
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or not h or not w:
                return None
            if h * w > 64_000_000:
                # adversarial header guard: don't allocate coefficient
                # stores for a claimed 16k x 16k frame inside a kernel
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
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
        elif marker == 0xDA:  # SOS — parse header + its entropy data
            if comps is None:
                return None
            ns = seg[0]
            cid_to_ix = {c[0]: ix for ix, c in enumerate(comps)}
            sc = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sc.append((cid_to_ix[cs], tt >> 4, tt & 0xF))
            ss, se, aa = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos += ln
            # unstuff FF00 -> FF; split at RSTn; stop at any other marker
            segments = []
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
                else:
                    break
            segments.append(bytes(cur))
            tabs = {
                ci: (huf.get((0, td)), huf.get((1, ta)))
                for ci, td, ta in sc
            }
            scans.append(
                _Scan(
                    sc, ss, se, aa >> 4, aa & 0xF, segments, restart, tabs
                )
            )
            pos = i
            continue
        pos += ln
    if comps is None or not scans:
        return None

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geom = []  # (hi, vi, bw_full, bh_full, bw, bh) per component
    coefs = []
    for cid, hi, vi, tq in comps:
        bw = -(-(-(-w * hi // hmax)) // 8)
        bh = -(-(-(-h * vi // vmax)) // 8)
        geom.append((hi, vi, mcux * hi, mcuy * vi, bw, bh))
        coefs.append(np.zeros((mcuy * vi, mcux * hi, 64), np.int64))
    for sc in scans:
        _decode_scan(sc, coefs, geom, mcux, mcuy, progressive)

    planes = []
    for (cid, hi, vi, tq), coef, (_, _, bwf, bhf, _, _) in zip(
        comps, coefs, geom
    ):
        q = qt[tq]  # zigzag order
        deq = coef * q[None, None, :]
        S = np.zeros((bhf, bwf, 8, 8), np.float64)
        S[:, :, _ZZ_ROWS, _ZZ_COLS] = deq
        # batched separable IDCT over all blocks of the component
        px = np.einsum("ux,mnuv,vy->mnxy", _DCT_A, S, _DCT_A) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bhf * 8, bwf * 8)
        up = _upsample(plane, vmax // vi, hmax // hi)
        planes.append(up[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _up2(a: np.ndarray, axis: int) -> np.ndarray:
    """Factor-2 triangular ("fancy") upsampling along ``axis`` — the
    libjpeg kernel the mainstream decoders use: the nearer source
    sample gets weight 3, the next-nearest 1, edges replicate.  The
    spec leaves upsampling to the decoder; this matches ImageIO /
    libjpeg within rounding (verified against Spark's JVM image source
    on real 4:2:0/4:2:2 files)."""
    a = np.moveaxis(a, axis, 0)
    prev = np.concatenate([a[:1], a[:-1]], axis=0)
    nxt = np.concatenate([a[1:], a[-1:]], axis=0)
    out = np.empty((a.shape[0] * 2,) + a.shape[1:], a.dtype)
    out[0::2] = (3.0 * a + prev) / 4.0
    out[1::2] = (3.0 * a + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _upsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    if fy == 2:
        plane = _up2(plane, 0)
    elif fy != 1:
        plane = plane.repeat(fy, axis=0)
    if fx == 2:
        plane = _up2(plane, 1)
    elif fx != 1:
        plane = plane.repeat(fx, axis=1)
    return plane


def _decode_scan(sc: _Scan, coefs, geom, mcux, mcuy, progressive):
    """One entropy-coded scan into the coefficient store (spec F.2 /
    G.2): sequential full-band, progressive DC/AC first, and
    progressive DC/AC refinement, with EOB runs and restarts."""
    ns = len(sc.comps)
    if progressive:
        # spec G.1: progressive scans are DC-only (0,0) or AC-only
        # (1<=Ss<=Se<=63) — a full-band scan here is a corrupt stream
        if not (
            (sc.ss == 0 and sc.se == 0)
            or (1 <= sc.ss <= sc.se <= 63)
        ):
            raise ValueError("invalid progressive spectral range")
    elif (sc.ss, sc.se) != (0, 63):
        raise ValueError("sequential scan must cover the full band")
    p1, m1 = 1 << sc.al, -1 << sc.al
    seg_iter = iter(sc.segments)
    reader = _BitReader(next(seg_iter))
    pred = [0] * len(coefs)
    eobrun = 0

    def ac_first(coef, dct, act):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = max(sc.ss, 1)
        while k <= sc.se:
            rs = reader.huff(act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                return
            k += r
            if k > sc.se:
                raise ValueError("AC index out of range")
            coef[k] = _extend(reader.read(s), s) << sc.al
            k += 1

    def ac_refine(coef, act):
        # spec G.1.2.3 (the libjpeg AC-refinement control flow)
        nonlocal eobrun
        k = sc.ss
        if eobrun == 0:
            while k <= sc.se:
                rs = reader.huff(act)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r)
                        if r:
                            eobrun += reader.read(r)
                        break
                    # r == 15: pass over 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("refinement size must be 1")
                    newval = p1 if reader.read(1) else m1
                while k <= sc.se:
                    if coef[k] != 0:
                        if reader.read(1) and (coef[k] & p1) == 0:
                            coef[k] += p1 if coef[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= sc.se:
                    coef[k] = newval
                k += 1
        if eobrun > 0:
            while k <= sc.se:
                if coef[k] != 0:
                    if reader.read(1) and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                k += 1
            eobrun -= 1

    def one_block(ci, by, bx, dct, act):
        coef = coefs[ci][by, bx]
        if sc.ss == 0:
            if sc.ah == 0:
                s = reader.huff(dct)
                diff = _extend(reader.read(s), s) if s else 0
                pred[ci] += diff
                coef[0] = pred[ci] << sc.al
            else:
                if reader.read(1):
                    coef[0] |= p1
        if sc.se > 0 and (not progressive or sc.ss > 0):
            # sequential: DC+AC in one pass; progressive: AC-only scans
            if sc.ah == 0:
                ac_first(coef, dct, act)
            else:
                ac_refine(coef, act)

    tables = sc.tables
    mcu_i = 0
    if ns == 1:
        ci = sc.comps[0][0]
        dct, act = tables[ci]
        _, _, _, _, bw, bh = geom[ci]
        for by in range(bh):
            for bx in range(bw):
                if sc.restart and mcu_i and mcu_i % sc.restart == 0:
                    reader = _BitReader(next(seg_iter))
                    pred = [0] * len(coefs)
                    eobrun = 0
                mcu_i += 1
                one_block(ci, by, bx, dct, act)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                if sc.restart and mcu_i and mcu_i % sc.restart == 0:
                    reader = _BitReader(next(seg_iter))
                    pred = [0] * len(coefs)
                    eobrun = 0
                mcu_i += 1
                for ci, td, ta in sc.comps:
                    dct, act = tables[ci]
                    hi, vi = geom[ci][0], geom[ci][1]
                    for by in range(vi):
                        for bx in range(hi):
                            one_block(
                                ci, my * vi + by, mx * hi + bx, dct, act
                            )


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


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dct, act) -> int:
    """Sequential full-band block encode from ZIGZAG-ordered quantized
    coefficients."""
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
    progressive: bool = False,
) -> bytes:
    """``(H, W)``/``(H, W, 1)`` gray or ``(H, W, 3)`` RGB uint8 ->
    baseline JPEG bytes (Annex K Huffman tables, JFIF marker);
    ``progressive=True`` writes SOF2 with the common 4-phase scan
    script (interleaved DC first at Al=1, per-component AC 1-63 at
    Al=1, AC refinement to Al=0, DC refinement) — exercising spectral
    selection, successive approximation, and EOB-run coding end to
    end.  Baseline notes:

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

    # quantized coefficient blocks, zigzag order: (bh, bw, 64) per comp
    all_zz = []
    for (hi, vi), plane, q in zip(samp, planes, quants):
        bh, bwid = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3) - 128.0
        )
        S = np.einsum("ux,mnxy,vy->mnuv", _DCT_A, blocks, _DCT_A)
        qz = np.round(
            S[:, :, _ZZ_ROWS, _ZZ_COLS] / q[_ZZ_ROWS, _ZZ_COLS]
        ).astype(np.int64)
        all_zz.append(qz)

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
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + _dht_segment(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
    out += b"\xff\xc4" + _dht_segment(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
    if len(chans) == 3:
        out += b"\xff\xc4" + _dht_segment(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        out += b"\xff\xc4" + _dht_segment(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
    if restart_interval and not progressive:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos_header(comp_ids_tabs, ss, se, ah, al):
        sos = bytes([len(comp_ids_tabs)])
        for cid, td, ta in comp_ids_tabs:
            sos += bytes([cid, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    if not progressive:
        bw = _BitWriter()
        pred = [0] * len(chans)
        mcu_i = rst_n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_i
                    and mcu_i % restart_interval == 0
                ):
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + rst_n % 8])
                    rst_n += 1
                    pred = [0] * len(chans)
                mcu_i += 1
                for ci, ((hi, vi), zzc, (dct, act)) in enumerate(
                    zip(samp, all_zz, tabs)
                ):
                    for by in range(vi):
                        for bx in range(hi):
                            pred[ci] = _encode_block(
                                bw, zzc[my * vi + by, mx * hi + bx],
                                pred[ci], dct, act,
                            )
        bw.flush()
        out += sos_header(
            [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1)
             for ci in range(len(chans))],
            0, 63, 0, 0,
        )
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive: the common 4-phase scan script ----
    al0 = 1
    # non-interleaved AC block grids per component
    grids = []
    for hi, vi in samp:
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        grids.append((-(-chh // 8), -(-cw // 8)))

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    pred = [0] * len(chans)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((hi, vi), zzc, (dct, _)) in enumerate(
                zip(samp, all_zz, tabs)
            ):
                for by in range(vi):
                    for bx in range(hi):
                        v = int(zzc[my * vi + by, mx * hi + bx, 0]) >> al0
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = abs(diff).bit_length()
                        code, ln = dct[s]
                        bw.write(code, ln)
                        if s:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << s) - 1,
                                s,
                            )
    bw.flush()
    out += sos_header(
        [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(len(chans))],
        0, 0, 0, al0,
    )
    out += bw.out

    # scan 2: AC first (1..63, Al=1), one scan per component
    for ci, (zzc, (_, act)) in enumerate(zip(all_zz, tabs)):
        bh_c, bw_c = grids[ci]
        bw = _BitWriter()
        for by in range(bh_c):
            for bx in range(bw_c):
                zz = zzc[by, bx]
                shifted = np.sign(zz[1:]) * (np.abs(zz[1:]) >> al0)
                nzi = np.flatnonzero(shifted) + 1
                k = 1
                for idx in nzi:
                    run = int(idx) - k
                    while run >= 16:
                        bw.write(*act[0xF0])
                        run -= 16
                    v = int(shifted[idx - 1])
                    s = abs(v).bit_length()
                    code, ln = act[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    k = int(idx) + 1
                if k < 64:
                    bw.write(*act[0x00])  # EOB (EOBRUN = 1)
        bw.flush()
        out += sos_header(
            [(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, 0, al0
        )
        out += bw.out

    # scan 3: AC refinement (Ah=1 -> Al=0), one scan per component
    for ci, (zzc, (_, act)) in enumerate(zip(all_zz, tabs)):
        bh_c, bw_c = grids[ci]
        bw = _BitWriter()
        for by in range(bh_c):
            for bx in range(bw_c):
                zz = zzc[by, bx]
                # pending correction bits are tagged with how many
                # zero-history coefficients precede them in the current
                # run: a ZRL covers exactly 16 zero-history positions,
                # so only bits tagged < 16 ride with that ZRL — bits
                # for already-significant coefficients BEYOND the span
                # wait for the next code (spec G.1.2.3; flushing all
                # pending after the first ZRL desynchronized the
                # decoder on runs > 15 with trailing significants)
                r, pending = 0, []  # pending: (zeros_before, bit)
                for k in range(1, 64):
                    t = abs(int(zz[k]))
                    if t == 0:
                        r += 1
                        continue
                    if (t >> al0) != 0:
                        # already significant: correction bit
                        pending.append((r, t & 1))
                        continue
                    # newly significant (magnitude is exactly 1 here)
                    while r > 15:
                        bw.write(*act[0xF0])
                        keep = []
                        for rr, bit in pending:
                            if rr < 16:
                                bw.write(bit, 1)
                            else:
                                keep.append((rr - 16, bit))
                        pending = keep
                        r -= 16
                    code, ln = act[(r << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if zz[k] > 0 else 0, 1)
                    for _, bit in pending:
                        bw.write(bit, 1)
                    pending = []
                    r = 0
                if r > 0 or pending:
                    bw.write(*act[0x00])  # EOB (EOBRUN = 1)
                    for _, bit in pending:
                        bw.write(bit, 1)
        bw.flush()
        out += sos_header(
            [(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, 1, 0
        )
        out += bw.out

    # scan 4: DC refinement (Ah=1 -> Al=0): one raw bit per block
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((hi, vi), zzc) in enumerate(zip(samp, all_zz)):
                for by in range(vi):
                    for bx in range(hi):
                        bw.write(
                            int(zzc[my * vi + by, mx * hi + bx, 0]) & 1, 1
                        )
    bw.flush()
    out += sos_header(
        [(ci + 1, 0, 0) for ci in range(len(chans))], 0, 0, 1, 0
    )
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
