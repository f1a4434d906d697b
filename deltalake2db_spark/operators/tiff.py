"""TIFF — pure stdlib/numpy baseline decoder + writer.

TIFF is the EXIF container's native format (``operators/exif.py``
already walks the same IFD structure inside JPEG APP1 segments) and
still shows up across document/scan corpora.  This implements the
baseline-TIFF subset a curation pipeline meets: both byte orders
(``II``/``MM``), IFD0 tag walk, strip-organized image data
(StripOffsets / StripByteCounts / RowsPerStrip), 8-bit samples,
grayscale (PhotometricInterpretation 0/1, MinIsBlack/MinIsWhite) and
RGB(A), chunky planar config, compression 1 (none) and 32773
(PackBits, decoded vectorized-ish per strip).  Fail-to-None on
everything else (tiled TIFFs, LZW, 16-bit, palettes).

Untrusted-header bounds: dims, strip counts, and total pixels are
capped before any allocation (the mp4/gif guard class).

Reference scope: no media tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_MAX_DIM = 16384
_MAX_PIXELS = 1 << 26
_MAX_STRIPS = 65536

_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
               9: 4, 10: 8, 11: 4, 12: 8}


def _read_values(buf: bytes, bo: str, typ: int, cnt: int, val_off: int,
                 inline: bytes) -> Optional[list]:
    """SHORT/LONG tag values (the only types the baseline tags use)."""
    size = _TYPE_SIZES.get(typ)
    if size is None or typ not in (1, 3, 4):
        return None
    total = size * cnt
    if total <= 4:
        raw = inline[:total]
    else:
        if val_off + total > len(buf):
            return None
        raw = buf[val_off : val_off + total]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(f"{bo}{cnt}{fmt}", raw))


def _unpackbits_rle(data: bytes, expected: int) -> Optional[bytes]:
    """PackBits (RFC-style TIFF 32773): n in [0,127] -> copy n+1
    literal bytes; n in [-127,-1] -> repeat next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n and len(out) < expected:
        ctl = data[pos]
        pos += 1
        if ctl < 128:  # literal run
            end = pos + ctl + 1
            if end > n:
                return None
            out += data[pos:end]
            pos = end
        elif ctl == 128:  # no-op
            continue
        else:  # replicate run
            if pos >= n:
                return None
            out += bytes([data[pos]]) * (257 - ctl)
            pos += 1
    if len(out) < expected:
        return None
    return bytes(out[:expected])


def decode_tiff(payload: bytes) -> Optional[np.ndarray]:
    """Baseline TIFF -> (H, W, C) uint8 (C = 1 gray, 3 RGB, 4 RGBA);
    None for non-TIFF or unsupported variants."""
    if payload is None or len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    try:
        (ifd_off,) = struct.unpack_from(f"{bo}I", payload, 4)
        if ifd_off + 2 > len(payload):
            return None
        (n_tags,) = struct.unpack_from(f"{bo}H", payload, ifd_off)
        if n_tags > 512:
            return None
        tags: dict = {}
        for k in range(n_tags):
            off = ifd_off + 2 + 12 * k
            if off + 12 > len(payload):
                return None
            tag, typ, cnt = struct.unpack_from(f"{bo}HHI", payload, off)
            (val_off,) = struct.unpack_from(f"{bo}I", payload, off + 8)
            tags[tag] = (typ, cnt, val_off, payload[off + 8 : off + 12])

        def vals(tag):
            if tag not in tags:
                return None
            typ, cnt, val_off, inline = tags[tag]
            if cnt > _MAX_STRIPS:
                return None
            return _read_values(payload, bo, typ, cnt, val_off, inline)

        def one(tag, default=None):
            v = vals(tag)
            return v[0] if v else default

        w = one(_T_WIDTH)
        h = one(_T_HEIGHT)
        comp = one(_T_COMPRESSION, 1)
        photo = one(_T_PHOTOMETRIC, 1)
        spp = one(_T_SPP, 1)
        bits = vals(_T_BITS) or [8] * spp
        planar = one(_T_PLANAR, 1)
        rps = one(_T_ROWS_PER_STRIP, h)
        offsets = vals(_T_STRIP_OFFSETS)
        counts = vals(_T_STRIP_COUNTS)
        if (
            not w or not h
            or not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM)
            or w * h > _MAX_PIXELS
            or comp not in (1, 32773)
            or photo not in (0, 1, 2)
            or planar != 1
            or spp not in (1, 3, 4)
            or any(b != 8 for b in bits)
            or offsets is None or counts is None
            or len(offsets) != len(counts)
            or not rps
        ):
            return None
        stride = w * spp
        rows = []
        remaining = h
        for so, sc in zip(offsets, counts):
            if so + sc > len(payload):
                return None
            nrows = min(rps, remaining)
            remaining -= nrows
            expected = nrows * stride
            raw = payload[so : so + sc]
            if comp == 32773:
                raw = _unpackbits_rle(raw, expected)
                if raw is None:
                    return None
            elif len(raw) < expected:
                return None
            rows.append(
                np.frombuffer(raw, np.uint8, count=expected).reshape(
                    nrows, stride
                )
            )
        if remaining > 0:
            return None
        img = np.vstack(rows).reshape(h, w, spp)
        if photo == 0:  # MinIsWhite: invert to MinIsBlack convention
            img = 255 - img
        return np.ascontiguousarray(img)
    except (struct.error, ValueError):
        return None


def encode_tiff(
    arr: np.ndarray,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: Optional[int] = None,
) -> bytes:
    """Baseline writer for fixtures: 8-bit gray/RGB/RGBA, chunky,
    strip-organized, optional PackBits compression."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = arr.astype(np.uint8)
    h, w, spp = arr.shape
    bo = ">" if big_endian else "<"
    photo = 1 if spp == 1 else 2
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        raw = arr[y0 : y0 + rps].tobytes()
        if packbits:
            out = bytearray()
            data = raw
            pos = 0
            while pos < len(data):
                # find a run
                run = 1
                while (
                    pos + run < len(data)
                    and run < 128
                    and data[pos + run] == data[pos]
                ):
                    run += 1
                if run >= 2:
                    out.append(257 - run)
                    out.append(data[pos])
                    pos += run
                else:
                    lit_start = pos
                    pos += 1
                    while (
                        pos < len(data)
                        and pos - lit_start < 128
                        and not (
                            pos + 1 < len(data)
                            and data[pos] == data[pos + 1]
                        )
                    ):
                        pos += 1
                    out.append(pos - lit_start - 1)
                    out += data[lit_start:pos]
            raw = bytes(out)
        strips.append(raw)

    n_strips = len(strips)
    entries = []

    def entry(tag, typ, cnt, values):
        entries.append((tag, typ, cnt, values))

    entry(_T_WIDTH, 4, 1, [w])
    entry(_T_HEIGHT, 4, 1, [h])
    entry(_T_BITS, 3, spp, [8] * spp)
    entry(_T_COMPRESSION, 3, 1, [32773 if packbits else 1])
    entry(_T_PHOTOMETRIC, 3, 1, [photo])
    entry(_T_STRIP_OFFSETS, 4, n_strips, None)  # patched below
    entry(_T_SPP, 3, 1, [spp])
    entry(_T_ROWS_PER_STRIP, 4, 1, [rps])
    entry(_T_STRIP_COUNTS, 4, n_strips, [len(s) for s in strips])
    entry(_T_PLANAR, 3, 1, [1])

    header = struct.pack(f"{bo}2sHI", b"II" if bo == "<" else b"MM",
                         42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    # overflow area for >4-byte values, then strip data
    over = bytearray()
    over_base = 8 + ifd_size
    packed = []
    for tag, typ, cnt, values in entries:
        size = _TYPE_SIZES[typ] * cnt
        placeholder = values is None
        fmt = {3: "H", 4: "I"}[typ]
        if placeholder:
            vals_b = None  # strip offsets, patched after layout
        else:
            vals_b = struct.pack(f"{bo}{cnt}{fmt}", *values)
        packed.append((tag, typ, cnt, vals_b, size))
    # layout pass: compute where strip data starts
    over_len = sum(
        size for (_t, _ty, _c, vb, size) in packed if size > 4
    )
    data_base = over_base + over_len
    strip_offsets = []
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # now fill the placeholder
    final = []
    for tag, typ, cnt, vals_b, size in packed:
        if vals_b is None:
            fmt = {3: "H", 4: "I"}[typ]
            vals_b = struct.pack(f"{bo}{cnt}{fmt}", *strip_offsets)
        final.append((tag, typ, cnt, vals_b, size))
    ifd = bytearray(struct.pack(f"{bo}H", len(final)))
    for tag, typ, cnt, vals_b, size in final:
        ifd += struct.pack(f"{bo}HHI", tag, typ, cnt)
        if size <= 4:
            ifd += vals_b.ljust(4, b"\x00")
        else:
            ifd += struct.pack(f"{bo}I", over_base + len(over))
            over += vals_b
    ifd += struct.pack(f"{bo}I", 0)  # next-IFD pointer
    return header + bytes(ifd) + bytes(over) + b"".join(strips)
