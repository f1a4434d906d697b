"""ICO (favicon) container — pure stdlib/numpy decode + encode.

Favicons are the one image container a web crawl sees on virtually
every site, and they're a CONTAINER, not a codec: each directory
entry is either a PNG stream (modern) or a BMP-style DIB with an
XOR bitmap plus a 1-bit AND transparency mask (classic).  This module
parses the directory, decodes both entry kinds — PNG via
``multimodal.decode_png``, DIB at 32/24/8 bpp (palette) with the AND
mask applied as alpha — and exposes the usual map-side Spark tier.

Untrusted-header hygiene (same class as the other containers): entry
count, per-entry dimensions, and total pixels are bounded before any
allocation; malformed entries fail to None individually (a poisoned
entry doesn't kill the file's good entries).

Reference scope: no media tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAX_ENTRIES = 64
_MAX_DIM = 1024
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_dib(data: bytes) -> Optional[np.ndarray]:
    """BMP-style ICO entry: BITMAPINFOHEADER (height doubled for the
    AND mask), bottom-up XOR rows at 32/24/8 bpp, optional palette,
    1-bit AND mask -> (H, W, 4) RGBA."""
    if len(data) < 40:
        return None
    (hdr, w, h2, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", data, 0
    )
    if hdr != 40 or comp != 0:
        return None
    h = h2 // 2
    if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
        return None
    pos = 40
    palette = None
    if bpp == 8:
        palette = np.frombuffer(
            data, np.uint8, count=256 * 4, offset=pos
        ).reshape(256, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        pos += 256 * 4
    elif bpp not in (24, 32):
        return None
    xor_stride = ((bpp * w + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    need = h * xor_stride + h * and_stride
    if len(data) - pos < h * xor_stride:
        return None
    xor = np.frombuffer(
        data, np.uint8, count=h * xor_stride, offset=pos
    ).reshape(h, xor_stride)
    pos += h * xor_stride
    have_and = len(data) - pos >= h * and_stride
    out = np.zeros((h, w, 4), np.uint8)
    if bpp == 32:
        px = xor[:, : w * 4].reshape(h, w, 4)
        out[..., :3] = px[..., [2, 1, 0]]
        out[..., 3] = px[..., 3]
    elif bpp == 24:
        px = xor[:, : w * 3].reshape(h, w, 3)
        out[..., :3] = px[..., [2, 1, 0]]
        out[..., 3] = 255
    else:  # 8-bit palette
        idx = xor[:, :w]
        out[..., :3] = palette[idx]
        out[..., 3] = 255
    if have_and and bpp != 32:
        anm = np.frombuffer(
            data, np.uint8, count=h * and_stride, offset=pos
        ).reshape(h, and_stride)
        bits = np.unpackbits(anm, axis=1)[:, :w]
        out[..., 3] = np.where(bits == 1, 0, out[..., 3])
    return out[::-1]  # bottom-up -> top-down


def parse_ico(payload: bytes) -> Optional[list]:
    """Decode every entry: ``[{width, height, bpp, is_png,
    image (H,W,4) | None}]`` — entry dims from the DECODED image
    (directory bytes cap at 255 and lie routinely).  None for
    non-ICO payloads."""
    if payload is None or len(payload) < 6:
        return None
    rsv, typ, count = struct.unpack_from("<HHH", payload, 0)
    if rsv != 0 or typ != 1 or count == 0 or count > _MAX_ENTRIES:
        return None
    if len(payload) < 6 + 16 * count:
        return None
    out = []
    for k in range(count):
        (_w, _h, _nc, _r, _planes, bpp, size, off) = struct.unpack_from(
            "<BBBBHHII", payload, 6 + 16 * k
        )
        if off + size > len(payload) or size < 8:
            out.append({"width": None, "height": None, "bpp": bpp,
                        "is_png": False, "image": None})
            continue
        data = payload[off : off + size]
        if data.startswith(_PNG_SIG):
            from .multimodal import decode_png

            img = decode_png(data)
            if img is not None and img.shape[2] != 4:
                pad = np.full(
                    (*img.shape[:2], 4 - img.shape[2]), 255, np.uint8
                )
                if img.shape[2] in (1, 3):
                    img = np.dstack([
                        np.repeat(img, 3, axis=2)
                        if img.shape[2] == 1 else img,
                        pad[..., :1],
                    ])
                else:  # gray+alpha
                    img = np.dstack([
                        np.repeat(img[..., :1], 3, axis=2),
                        img[..., 1:],
                    ])
            is_png = True
        else:
            img = _decode_dib(data)
            is_png = False
        out.append({
            "width": None if img is None else img.shape[1],
            "height": None if img is None else img.shape[0],
            "bpp": bpp, "is_png": is_png, "image": img,
        })
    return out


def encode_ico(images: list, as_png: bool = False) -> bytes:
    """Fixture writer: ``images`` is a list of (H, W, 4) uint8 RGBA
    arrays, written as 32-bpp DIB entries (with all-opaque AND masks)
    or PNG entries."""
    from .multimodal import encode_png

    parts = []
    for img in images:
        img = np.asarray(img, np.uint8)
        h, w = img.shape[:2]
        if as_png:
            parts.append(encode_png(img))
            continue
        bgra = img[..., [2, 1, 0, 3]][::-1]  # top-down -> bottom-up BGRA
        xor = bgra.reshape(h, w * 4)
        and_stride = ((w + 31) // 32) * 4
        anm = np.zeros((h, and_stride), np.uint8)
        hdr = struct.pack(
            "<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
            h * (w * 4 + and_stride), 0, 0, 0, 0,
        )
        parts.append(hdr + xor.tobytes() + anm.tobytes())
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    off = 6 + 16 * len(images)
    for img, data in zip(images, parts):
        h, w = np.asarray(img).shape[:2]
        out += struct.pack(
            "<BBBBHHII", w if w < 256 else 0, h if h < 256 else 0,
            0, 0, 1, 32, len(data), off,
        )
        off += len(data)
    for data in parts:
        out += data
    return bytes(out)


def ico_entry_stats(df: DataFrame) -> DataFrame:
    """(media_id, entry_idx, width, height, bpp, is_png, r_sum,
    g_sum, b_sum, a_sum) per decodable ICO entry, decoded map-side
    (mapInPandas; payload bytes never cross a shuffle).  Undecodable
    entries and non-ICO rows skip fail-open."""
    out_schema = (
        "media_id long, entry_idx int, width int, height int, "
        "bpp int, is_png boolean, r_sum long, g_sum long, "
        "b_sum long, a_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                entries = parse_ico(bytes(payload))
                if entries is None:
                    continue
                for j, en in enumerate(entries):
                    img = en["image"]
                    if img is None:
                        continue
                    sums = img.sum(axis=(0, 1), dtype=np.int64)
                    rows.append((
                        int(mid), j, en["width"], en["height"],
                        en["bpp"], en["is_png"],
                        int(sums[0]), int(sums[1]), int(sums[2]),
                        int(sums[3]),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "entry_idx", "width", "height",
                         "bpp", "is_png", "r_sum", "g_sum", "b_sum",
                         "a_sum"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )
