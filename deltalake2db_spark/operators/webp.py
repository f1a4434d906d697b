"""Pure-numpy WebP-lossless (VP8L) codec.

Decoder: the full VP8L bitstream (RFC 9649 / the public WebP lossless
specification): LSB-first bit reading, canonical prefix codes (simple
and RLE-coded code lengths), the five-code groups (green+length+cache,
red, blue, alpha, distance), LZ77 backward references with the 2-D
distance mapping, color cache (0x1e35a7bd multiplicative hash), meta
prefix codes (entropy image), and all four transforms — predictor (14
modes), color (signed 3.5 fixed-point cross-channel), subtract-green,
and color-indexing with pixel bundling.  Lossy VP8 (``'VP8 '``
chunks) and extended containers without a VP8L chunk return ``None``
— the remaining stub tier.

Encoder: the verification partner — real VP8L output covering
literals, LZ77 run references (both plain and 2-D-mapped distances),
color cache hits, and the subtract-green / single-tile predictor /
color-indexing transforms, with complete RLE-coded prefix tables.
``decode(encode(x)) == x`` exactly for every path (the format is
lossless), which is what the tests and the correctness gate pin.

No real VP8L fixture exists in this sandbox (the only .webp on disk
is lossy VP8), so unlike the JPEG decoder the cross-validation here is
self-round-trip plus spec-derived constants; the 2-D distance-map
table is generated from the spec's ordering rule (d² ascending, then
y descending, then x descending) and exercised by encoder-emitted
mapped distances.

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no media handling (SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# 2-D distance map: the 120 closest (x, y) offsets, y >= 0 (same row
# left, or any previous row), ordered per spec: squared distance
# ascending, then y descending, then x descending.
_DIST_MAP = sorted(
    (
        (x, y)
        for y in range(9)
        for x in range(-8, 9)
        if (y > 0 or x > 0) and x * x + y * y <= 128
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)[:120]

_CACHE_MUL = 0x1E35A7BD
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _LSBReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _LSBWriter:
    __slots__ = ("bits", "nbits")

    def __init__(self):
        self.bits = bytearray()
        self.nbits = 0

    def write(self, v: int, n: int):
        for i in range(n):
            if self.nbits & 7 == 0:
                self.bits.append(0)
            if (v >> i) & 1:
                self.bits[-1] |= 1 << (self.nbits & 7)
            self.nbits += 1

    def tobytes(self) -> bytes:
        return bytes(self.bits)


def _canon_codes(lengths: list[int]) -> dict:
    """Deflate-style canonical codes: {symbol: (code, length)} —
    shorter codes first, ties by symbol order; bits transmitted MSB of
    the code first (tree walk from the root)."""
    pairs = sorted(
        (ln, s) for s, ln in enumerate(lengths) if ln > 0
    )
    out, code, prev_len = {}, 0, 0
    for ln, s in pairs:
        code <<= ln - prev_len
        out[s] = (code, ln)
        code += 1
        prev_len = ln
    return out


class _Tree:
    """Prefix decoder: walk bits MSB-first through the canonical map;
    a single-symbol tree costs zero bits."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            return
        self.single = None
        self.table = {
            (ln, code): s for s, (code, ln) in _canon_codes(lengths).items()
        }

    def decode(self, br: _LSBReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code")


def _read_prefix_code(br: _LSBReader, alphabet: int) -> _Tree:
    if br.read_bit():  # simple code
        num = br.read_bit() + 1
        first_8bit = br.read_bit()
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet
        if num == 1:
            lengths[s0] = 1  # single symbol: zero-bit code
            t = _Tree(lengths)
            t.single = s0
            return t
        s1 = br.read(8)
        lengths[s0] = 1
        lengths[s1] = 1
        return _Tree(lengths)
    # RLE-coded lengths
    n_codes = 4 + br.read(4)
    clc = [0] * 19
    for i in range(n_codes):
        clc[_CLC_ORDER[i]] = br.read(3)
    cl_tree = _Tree(clc)
    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl_tree.decode(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                    sym += 1
        elif s == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _Tree(lengths)


def _lz77_value(br: _LSBReader, sym: int) -> int:
    if sym < 4:
        return sym + 1
    nbits = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << nbits
    return offset + br.read(nbits) + 1


def _lz77_symbol(v: int):
    """(symbol, extra_bits_value, n_extra) for value v >= 1 (encoder)."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    nbits = v.bit_length() - 2
    offset = (2 + ((v >> nbits) & 1)) << nbits
    return 2 * nbits + 2 + ((v >> nbits) & 1), v - offset, nbits


def _cache_index(argb: int, bits: int) -> int:
    return ((_CACHE_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_pixels(br: _LSBReader, w: int, h: int, level0: bool):
    """Spatially-coded ARGB pixel stream -> uint32 array (h, w)."""
    cache_bits = br.read(4) if br.read_bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta_tree = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read_bit():  # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img = _decode_pixels(br, mw, mh, level0=False)
        meta_tree = (
            ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        )  # (red<<8)|green
        n_groups = int(meta_tree.max()) + 1
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    n = w * h
    while pos < n:
        if meta_tree is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta_tree[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        gtree, rtree, btree, atree, dtree = g
        sym = gtree.decode(br)
        if sym < 256:
            red = rtree.decode(br)
            blue = btree.decode(br)
            alpha = atree.decode(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
        elif sym < 280:
            length = _lz77_value(br, sym - 256)
            dsym = dtree.decode(br)
            dcode = _lz77_value(br, dsym)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("lz77 reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
        else:
            px = cache[sym - 280]
            out[pos] = px
            pos += 1
    return out.reshape(h, w)


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a = (img >> 24) & 0xFF
    r = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def _s8(v: np.ndarray) -> np.ndarray:
    return v.astype(np.uint8).astype(np.int8).astype(np.int64)


def _inv_color_transform(img: np.ndarray, tiles: np.ndarray, bits: int):
    h, w = img.shape
    ty = np.arange(h) >> bits
    tx = np.arange(w) >> bits
    t = tiles[np.ix_(ty, tx)]
    g2r = _s8(t & 0xFF)          # blue channel
    g2b = _s8((t >> 8) & 0xFF)   # green channel
    r2b = _s8((t >> 16) & 0xFF)  # red channel
    a = (img >> 24) & 0xFF
    r = ((img >> 16) & 0xFF).astype(np.int64)
    g = ((img >> 8) & 0xFF).astype(np.int64)
    b = (img & 0xFF).astype(np.int64)
    r = (r + ((g2r * _s8(g)) >> 5)) & 0xFF
    b = (b + ((g2b * _s8(g)) >> 5)) & 0xFF
    b = (b + ((r2b * _s8(r)) >> 5)) & 0xFF
    return (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    )


def _avg2(p, q):
    return (
        ((((p >> 24) & 0xFF) + ((q >> 24) & 0xFF)) // 2) << 24
        | ((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF)) // 2) << 16
        | ((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF)) // 2) << 8
        | ((p & 0xFF) + (q & 0xFF)) // 2
    )


def _clamp_add_sub_full(a, b, c):
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(a, b, c):
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) // 2
        cc = (c >> sh) & 0xFF
        v = ave + (ave - cc) // 2
        out |= max(0, min(255, v)) << sh
    return out


def _select(l, t, tl):  # noqa: E741 — spec naming
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        pr = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        p_l += abs(pr - ((l >> sh) & 0xFF))
        p_t += abs(pr - ((t >> sh) & 0xFF))
    return l if p_l <= p_t else t


def _inv_predictor(img: np.ndarray, tiles: np.ndarray, bits: int):
    h, w = img.shape
    out = img.copy().astype(np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # L
            elif x == 0:
                pred = int(out[y - 1, 0])  # T
            else:
                mode = int(tiles[y >> bits, x >> bits] >> 8) & 0xFF
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(
                    out[y - 1, 0]
                )
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(L, T, TL)
                else:
                    raise ValueError(f"predictor mode {mode}")
            v = int(out[y, x])
            out[y, x] = (
                (((v >> 24) + (pred >> 24)) & 0xFF) << 24
                | ((((v >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((v >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | (((v & 0xFF) + (pred & 0xFF)) & 0xFF)
            )
    return out.astype(np.uint32)


def decode_webp_lossless(payload: bytes) -> Optional[np.ndarray]:
    """WebP bytes -> ``(H, W, 4) uint8`` RGBA, or ``None`` when the
    container has no VP8L chunk (lossy VP8 stays stubbed) or the
    stream is malformed."""
    try:
        return _decode_webp_lossless(payload)
    except Exception:
        return None


def _find_vp8l(payload: bytes) -> Optional[bytes]:
    if (
        payload is None
        or len(payload) < 20
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (sz,) = struct.unpack_from("<I", payload, i + 4)
        if tag == b"VP8L":
            return payload[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)
    return None


def _decode_webp_lossless(payload: bytes) -> Optional[np.ndarray]:
    data = _find_vp8l(payload)
    if data is None or not data or data[0] != 0x2F:
        return None
    br = _LSBReader(data)
    br.read(8)  # signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_hint = br.read(1)
    if br.read(3) != 0:
        return None  # version
    if w * h > 64_000_000:
        return None  # adversarial-header allocation guard
    # transforms (level 0 only), remembered in read order
    transforms = []
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color
            bits = br.read(3) + 2
            tw = -(-cur_w // (1 << bits))
            th = -(-h // (1 << bits))
            tiles = _decode_pixels(br, tw, th, level0=False)
            transforms.append((ttype, bits, tiles))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal = _decode_pixels(br, n_colors, 1, level0=False)[0]
            # componentwise delta decode; astype(uint8) IS the mod-256
            # (an explicit `% 256` would silently promote to int16 and
            # corrupt the uint32 reinterpretation below)
            pal = np.cumsum(
                pal.view(np.uint8).reshape(-1, 4).astype(np.uint32), axis=0
            ).astype(np.uint8)
            pal32 = pal.copy().view(np.uint32).reshape(-1)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, width_bits, pal32))
            cur_w = -(-cur_w // (1 << width_bits))
    img = _decode_pixels(br, cur_w, h, level0=True)
    # undo transforms in reverse read order
    for ttype, bits, aux in reversed(transforms):
        if ttype == 3:
            width_bits, pal32 = bits, aux
            if width_bits:
                per = 1 << width_bits
                bpp = 8 >> width_bits
                green = ((img >> 8) & 0xFF).astype(np.uint32)
                idx = np.zeros((h, img.shape[1] * per), dtype=np.uint32)
                for k in range(per):
                    idx[:, k::per] = (green >> (k * bpp)) & ((1 << bpp) - 1)
                idx = idx[:, :w]
            else:
                idx = (img >> 8) & 0xFF
            if int(idx.max(initial=0)) >= len(pal32):
                raise ValueError("palette index out of range")
            img = pal32[idx]
        elif ttype == 2:
            img = _inv_subtract_green(img)
        elif ttype == 1:
            img = _inv_color_transform(img, aux, bits)
        else:
            img = _inv_predictor(img, aux, bits)
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    if not alpha_hint:
        return np.stack([r, g, b], axis=-1)  # header says opaque
    return np.stack([r, g, b, a], axis=-1)


# ---------------------------------------------------------------- encoder


def _write_code_lengths(bw: _LSBWriter, lengths: list[int]):
    """Emit a prefix code's lengths: simple form for <=2 symbols, else
    the full RLE machinery with a literal-per-symbol code-length code
    (complete two/one-symbol trees over the length values in use)."""
    nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and all(s < 256 for s, _ in nz) and (
        len(nz) == 1 or all(ln == 1 for _, ln in nz)
    ):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0][0]
        if s0 < 2:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write(0, 1)  # normal
    used = sorted({ln for _, ln in nz} | ({0} if len(nz) < len(lengths) else set()))
    # code-length code: assign equal lengths to the used values
    if len(used) == 1:
        clc_len = {used[0]: 1}
    else:
        depth = max(1, (len(used) - 1).bit_length())
        clc_len = {}
        # complete tree: first (2^depth - len(used)) values get depth-1?
        # keep it simple and COMPLETE: pad the used set to a power of two
        # with dummy entries assigned to unused length values
        pad = (1 << depth) - len(used)
        pool = [v for v in range(16) if v not in used]
        padded = used + pool[:pad]
        for v in padded:
            clc_len[v] = depth
    order_pos = {v: i for i, v in enumerate(_CLC_ORDER)}
    max_needed = max(order_pos[v] for v in clc_len) + 1
    n_codes = max(4, max_needed)
    bw.write(n_codes - 4, 4)
    for i in range(n_codes):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    codes = _canon_codes(
        [clc_len.get(v, 0) for v in range(19)]
    )
    bw.write(0, 1)  # no max_symbol shortcut
    if len(codes) == 1:
        return  # single-value clc: zero-bit codes, nothing to emit
    for s in range(len(lengths)):
        c, ln = codes[lengths[s]]
        bw.write(_rev(c, ln), ln)


def _rev(code: int, ln: int) -> int:
    """Prefix-code bits go MSB-first into the LSB-first stream: emit
    the code's bits from the top."""
    out = 0
    for i in range(ln):
        out = (out << 1) | ((code >> i) & 1)
    return out


def _fixed_lengths(alphabet: int, used: set) -> list[int]:
    """Complete canonical lengths covering every symbol in ``used``
    cheaply: the smallest depth d with 2^d >= |used|, padded to a full
    tree with dummy symbols."""
    k = max(1, len(used))
    depth = max(1, (k - 1).bit_length())
    lengths = [0] * alphabet
    syms = sorted(used)
    pad = (1 << depth) - k
    for s in range(alphabet):
        if pad == 0:
            break
        if s not in used:
            syms.append(s)
            pad -= 1
    for s in syms:
        lengths[s] = depth
    if len(syms) == 1:
        lengths[syms[0]] = 1
    return lengths


class _Enc:
    def __init__(self, bw: _LSBWriter, lengths: list[int]):
        self.codes = _canon_codes(lengths)
        self.bw = bw

    def emit(self, sym: int):
        c, ln = self.codes[sym]
        if len(self.codes) == 1:
            return  # zero-bit single-symbol code
        self.bw.write(_rev(c, ln), ln)


def _encode_pixels_body(
    bw: _LSBWriter,
    img: np.ndarray,
    cache_bits: int = 0,
    use_lz77: bool = True,
):
    """Spatially code an ARGB uint32 image: literals, dist-1 / mapped
    run references, optional color-cache hits.  The caller has already
    written the color-cache info (and, at level 0, the meta bit)."""
    h, w = img.shape
    flat = img.reshape(-1)
    n = len(flat)
    # plan the token stream first (to know which symbols get codes)
    tokens = []  # ('lit', px) | ('ref', length, dcode) | ('cache', idx)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0:
            run = 0
            while (
                pos + run < n
                and flat[pos + run] == flat[pos - 1]
                and run < 4096
            ):
                run += 1
            if run >= 3:
                # distance 1 == 2-D map entry (1, 0) == dcode 2
                tokens.append(("ref", run, 2))
                if cache is not None:
                    px = int(flat[pos - 1])
                    cache[_cache_index(px, cache_bits)] = px
                pos += run
                continue
            if pos >= w:
                run = 0
                while (
                    pos + run < n
                    and flat[pos + run] == flat[pos + run - w]
                    and run < 4096
                ):
                    run += 1
                if run >= 3:
                    # distance w == map entry (0, 1) == dcode 1
                    tokens.append(("ref", run, 1))
                    if cache is not None:
                        for k in range(run):
                            px = int(flat[pos + k])
                            cache[_cache_index(px, cache_bits)] = px
                    pos += run
                    continue
        px = int(flat[pos])
        if cache is not None:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                tokens.append(("cache", ci))
                pos += 1
                continue
            cache[ci] = px
        tokens.append(("lit", px))
        pos += 1
    # symbol usage
    g_used, r_used, b_used, a_used, d_used = set(), set(), set(), set(), set()
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            g_used.add((px >> 8) & 0xFF)
            r_used.add((px >> 16) & 0xFF)
            b_used.add(px & 0xFF)
            a_used.add((px >> 24) & 0xFF)
        elif t[0] == "ref":
            ls, _, _ = _lz77_symbol(t[1])
            g_used.add(256 + ls)
            ds, _, _ = _lz77_symbol(t[2])
            d_used.add(ds)
        else:
            g_used.add(280 + t[1])
    if not r_used:
        r_used, b_used, a_used = {0}, {0}, {0}
    if not d_used:
        d_used = {0}
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    gl = _fixed_lengths(green_alpha, g_used)
    rl = _fixed_lengths(256, r_used)
    bl = _fixed_lengths(256, b_used)
    al = _fixed_lengths(256, a_used)
    dl = _fixed_lengths(40, d_used)
    for lengths in (gl, rl, bl, al, dl):
        _write_code_lengths(bw, lengths)
    ge, re_, be, ae, de = (
        _Enc(bw, gl), _Enc(bw, rl), _Enc(bw, bl), _Enc(bw, al), _Enc(bw, dl)
    )
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            ge.emit((px >> 8) & 0xFF)
            re_.emit((px >> 16) & 0xFF)
            be.emit(px & 0xFF)
            ae.emit((px >> 24) & 0xFF)
        elif t[0] == "ref":
            ls, lx, ln_ = _lz77_symbol(t[1])
            ge.emit(256 + ls)
            if ln_:
                bw.write(lx, ln_)
            ds, dx, dn = _lz77_symbol(t[2])
            de.emit(ds)
            if dn:
                bw.write(dx, dn)
        else:
            ge.emit(280 + t[1])


def _encode_subimage(bw: _LSBWriter, img: np.ndarray):
    """Transform / palette subimages: cache off, no meta bit (the
    decoder only reads one at level 0), no transforms."""
    bw.write(0, 1)  # no color cache
    _encode_pixels_body(bw, img, cache_bits=0, use_lz77=False)


def encode_webp_lossless(
    arr: np.ndarray,
    transform: str | None = None,
    cache_bits: int = 0,
    use_lz77: bool = True,
    predictor_mode: int = 2,
) -> bytes:
    """``(H, W, 3|4) uint8`` -> lossless WebP bytes.

    ``transform``: None | 'subtract_green' | 'predictor' (single-tile,
    ``predictor_mode``) | 'palette' (color indexing, auto bundling).
    Exercises every decoder path; ``decode(encode(x)) == x`` exactly.
    """
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("encode_webp_lossless: (H, W, 3|4) uint8")
    h, w = arr.shape[:2]
    if arr.shape[2] == 3:
        a4 = np.concatenate(
            [arr, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    else:
        a4 = arr.astype(np.uint8)
    r = a4[:, :, 0].astype(np.uint32)
    g = a4[:, :, 1].astype(np.uint32)
    b = a4[:, :, 2].astype(np.uint32)
    al = a4[:, :, 3].astype(np.uint32)
    img = (al << 24) | (r << 16) | (g << 8) | b

    bw = _LSBWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (a4[:, :, 3] != 255).any() else 0, 1)
    bw.write(0, 3)  # version

    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        rr = ((img >> 16) - (img >> 8)) & 0xFF
        bb = (img - (img >> 8)) & 0xFF
        img = (img & 0xFF00FF00) | (rr << 16) | bb
    elif transform == "predictor":
        bw.write(1, 1)
        bw.write(0, 2)
        # one tile covering the image: size_bits so that 1 tile suffices
        size_bits = max(2, (max(w, h) - 1).bit_length())
        bw.write(size_bits - 2, 3)
        mode_px = np.array(
            [[0xFF000000 | (predictor_mode << 8)]], dtype=np.uint32
        )
        _encode_subimage(bw, mode_px)
        img = _forward_predictor(img, predictor_mode)
    elif transform == "color":
        bw.write(1, 1)
        bw.write(1, 2)
        size_bits = max(2, (max(w, h) - 1).bit_length())
        bw.write(size_bits - 2, 3)
        g2r, g2b, r2b = 0x10, 0x08, 0xFC  # fixed cross-channel elements
        cte_px = np.array(
            [[0xFF000000 | (r2b << 16) | (g2b << 8) | g2r]], dtype=np.uint32
        )
        _encode_subimage(bw, cte_px)

        def d(t, c):
            t8 = t - 256 if t >= 128 else t
            c8 = c - 256 if c >= 128 else c
            return (t8 * c8) >> 5

        rr = ((img >> 16) & 0xFF).astype(np.int64)
        gg = ((img >> 8) & 0xFF).astype(np.int64)
        b0 = (img & 0xFF).astype(np.int64)
        g8 = np.where(gg >= 128, gg - 256, gg)
        r8 = np.where(rr >= 128, rr - 256, rr)
        t_ = lambda t: t - 256 if t >= 128 else t  # noqa: E731
        r_enc = (rr - ((t_(g2r) * g8) >> 5)) & 0xFF
        b_enc = (b0 - ((t_(g2b) * g8) >> 5) - ((t_(r2b) * r8) >> 5)) & 0xFF
        img = (
            (img & 0xFF00FF00)
            | (r_enc.astype(np.uint32) << 16)
            | b_enc.astype(np.uint32)
        )
    elif transform == "palette":
        pal32, idx = np.unique(img, return_inverse=True)
        if len(pal32) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(pal32) - 1, 8)
        deltas = pal32.copy().view(np.uint8).reshape(-1, 4).astype(np.int64)
        deltas[1:] = (deltas[1:] - deltas[:-1]) % 256
        dpal = (
            deltas.astype(np.uint8).copy().view(np.uint32).reshape(1, -1)
        )
        _encode_subimage(bw, dpal)
        n_colors = len(pal32)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        idx = idx.reshape(h, w).astype(np.uint32)
        if width_bits:
            per = 1 << width_bits
            bpp = 8 >> width_bits
            pw = -(-w // per)
            packed = np.zeros((h, pw), dtype=np.uint32)
            for k in range(per):
                col = idx[:, k::per]
                packed[:, : col.shape[1]] |= col << (k * bpp)
            img = 0xFF000000 | (packed << 8)
        else:
            img = 0xFF000000 | (idx << 8)
    elif transform is not None:
        raise ValueError(f"transform={transform!r}")
    bw.write(0, 1)  # end of transforms

    # level0 spatial image: cache bit written by _encode_pixels; meta
    # bit sits between them per spec ordering (cache, then meta)
    _encode_pixels_level0(bw, img, cache_bits, use_lz77)

    data = bw.tobytes()
    vp8l = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _encode_pixels_level0(bw, img, cache_bits, use_lz77):
    # spec order at level 0: color-cache info, then meta-prefix bit,
    # then the code groups.  _encode_pixels writes cache info + groups;
    # splice the meta bit by writing cache info here instead.
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix codes
    _encode_pixels_body(bw, img, cache_bits, use_lz77)


def _forward_predictor(img: np.ndarray, mode: int) -> np.ndarray:
    h, w = img.shape
    out = np.zeros_like(img)
    rec = img  # residual computed against the ORIGINAL (reconstructed)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(rec[0, x - 1])
            elif x == 0:
                pred = int(rec[y - 1, 0])
            else:
                L = int(rec[y, x - 1])
                T = int(rec[y - 1, x])
                TL = int(rec[y - 1, x - 1])
                TR = int(rec[y - 1, x + 1]) if x + 1 < w else int(
                    rec[y - 1, 0]
                )
                pred = {
                    0: 0xFF000000, 1: L, 2: T, 3: TR, 4: TL,
                    5: _avg2(_avg2(L, TR), T), 6: _avg2(L, TL),
                    7: _avg2(L, T), 8: _avg2(TL, T), 9: _avg2(T, TR),
                    10: _avg2(_avg2(L, TL), _avg2(T, TR)),
                    11: _select(L, T, TL),
                    12: _clamp_add_sub_full(L, T, TL),
                    13: _clamp_add_sub_half(L, T, TL),
                }[mode]
            v = int(img[y, x])
            out[y, x] = (
                (((v >> 24) - (pred >> 24)) & 0xFF) << 24
                | ((((v >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((v >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | (((v & 0xFF) - (pred & 0xFF)) & 0xFF)
            )
    return out
