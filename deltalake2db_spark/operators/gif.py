"""GIF codec — pure stdlib/numpy LZW decode + encode, GIF87a/89a.

GIF is the one web-image container the codec tier still lacked
(PNG/JPEG/WebP/BMP/PPM are in ``multimodal.py`` / ``jpeg.py`` /
``webp.py`` / ``vp8.py``): a Common Crawl image pipeline sees GIFs
constantly, and animated GIFs are a frame-sample source exactly like
animated WebP and MP4/WebM video.  Everything here is stdlib + numpy:

* ``_lzw_decode`` / ``_lzw_encode``: GIF-variant LZW (variable code
  width 3..12 bits LSB-first, clear/EOI codes, 4096-entry table with
  deferred-clear handling) — the compression core.
* ``parse_gif(payload)``: full container parse to *indexed* frames —
  logical screen, global/local color tables, Graphic Control
  Extensions (delay, transparency, disposal), NETSCAPE2.0 loop count,
  interlace unweaving.  All header counts are untrusted input and are
  bounded before any allocation (same guard class as
  ``multimodal._mp4_sample_table``).
* ``gif_meta`` / ``decode_gif`` / ``decode_gif_frames``: metadata,
  first composited RGB frame, and the full composited animation
  (disposal methods 0/1 keep, 2 restore-background, 3 restore-previous)
  — ``decode_gif`` is wired into ``multimodal.decode_image_array`` so
  GIF rows flow through the existing image-feature operators.
* ``encode_gif(frames, palette, ...)``: writer (fixtures + gates) —
  indexed frames, optional interlace, transparency, per-frame delays,
  disposal, loop count.
* ``gif_frame_stats(df)``: the Spark tier — map-side decode via
  ``mapInPandas`` (payload bytes never leave the executor, no
  shuffle), one row per composited frame with placement/timing and a
  replayable pixel sum.  Mirrors ``multimodal.webp_anim_frame_stats``.

The decoder is validated bit-exact against the system giflib
(``libgif.so.7``) via ctypes in ``tests/test_gif.py`` — giflib is used
ONLY as a test reference, the operators stay pure numpy (the same
external-reference strategy as the VP8/libwebp and JPEG/ImageIO
parity sweeps).

Reference scope: the reference engine has no media tier at all
(SURVEY.md §2.5) — north-star extension surface.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# Untrusted-header bounds: a 20-byte header must not be able to
# request an unbounded allocation (mirrors _mp4_sample_table).
_MAX_DIM = 8192          # per-axis canvas / frame size
_MAX_FRAMES = 1024
_MAX_TOTAL_PIXELS = 1 << 26   # ~67M px across all frames of one file

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW

def _lzw_decode(
    data: bytes, min_code_size: int, npix: int
) -> Optional[np.ndarray]:
    """GIF LZW: variable-width codes packed LSB-first.  Returns
    exactly ``npix`` uint8 indices, or None on any malformation
    (bad first code, code beyond table, stream ending early)."""
    if not (1 <= min_code_size <= 8):
        return None  # roots must be uint8 pixel indices
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = list(base)
    table += [b"", b""]  # clear / EOI placeholders
    csize = min_code_size + 1
    out = bytearray()
    prev: Optional[bytes] = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < npix:
        while nbits < csize:
            if pos >= n:
                return None  # ran out of codes before npix pixels
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << csize) - 1)
        acc >>= csize
        nbits -= csize
        if code == clear:
            table = list(base) + [b"", b""]
            csize = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return None  # EOI before the raster was complete
        if prev is None:
            if code >= clear:  # first code must be a root literal
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                return None
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << csize) and csize < 12:
                    csize += 1
        out += entry
        prev = entry
    return np.frombuffer(bytes(out[:npix]), np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW writer: emits an initial clear code, resets the table
    with a clear code whenever it fills (the giflib-compatible
    choice), and terminates with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, csize: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += csize
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    csize = min_code_size + 1
    emit(clear, csize)
    w = b""
    for b in bytes(bytearray(indices.astype(np.uint8).ravel())):
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        emit(table[w], csize)
        if next_code < 4096:
            # width bump BEFORE the insert (giflib's output-then-
            # insert order) — the decoder widens one code later than
            # a naive post-insert check would.
            if next_code >= (1 << csize) and csize < 12:
                csize += 1
            table[wb] = next_code
            next_code += 1
        else:
            emit(clear, csize)
            table = fresh()
            next_code = eoi + 1
            csize = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], csize)
    if next_code >= (1 << csize) and csize < 12:
        csize += 1  # a strict decoder reads the EOI post-bump
    emit(eoi, csize)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Unweave the four GIF interlace passes: ``rows`` holds the
    raster in transmission order; the result is display order."""
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ------------------------------------------------------- container

def _color_table(buf: bytes, pos: int, packed: int) -> tuple:
    """(palette (N,3) uint8 | None, new_pos) when the packed byte's
    table flag is set; tables are 2^(1+(packed&7)) entries."""
    if not (packed & 0x80):
        return None, pos
    count = 2 << (packed & 0x07)
    end = pos + 3 * count
    if end > len(buf):
        raise ValueError("truncated color table")
    pal = np.frombuffer(buf, np.uint8, count=3 * count, offset=pos)
    return pal.reshape(count, 3).copy(), end


def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (data, pos_after_terminator)."""
    parts = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated sub-blocks")
        size = buf[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("truncated sub-block")
        parts.append(buf[pos : pos + size])
        pos += size


def parse_gif(payload: bytes) -> Optional[dict]:
    """Full GIF parse to indexed frames: ``{version, width, height,
    bg_index, loop_count, palette, frames: [{left, top, width,
    height, indices (h,w) uint8, palette (N,3)|None, transparent,
    delay_cs, disposal}]}``.  ``palette`` is the global color table
    (None if absent); frame ``palette`` is the local table or None
    (meaning: use global).  Returns None on any malformation — the
    fail-to-None contract every decoder in this tier follows."""
    if (
        payload is None
        or len(payload) < 13
        or payload[:4] != b"GIF8"
        or payload[4:6] not in (b"7a", b"9a")
    ):
        return None
    try:
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        packed = payload[10]
        bg_index = payload[11]
        if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM):
            return None
        gct, pos = _color_table(payload, 13, packed)
        loop = 0
        frames = []
        total_px = 0
        # pending graphic-control state for the next image
        gce = {"transparent": None, "delay_cs": 0, "disposal": 0}
        n = len(payload)
        while pos < n:
            block = payload[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension
                if pos >= n:
                    return None
                label = payload[pos]
                pos += 1
                if label == 0xF9:  # Graphic Control Extension
                    data, pos = _sub_blocks(payload, pos)
                    if len(data) >= 4:
                        p = data[0]
                        gce = {
                            "disposal": (p >> 2) & 0x07,
                            "delay_cs": int.from_bytes(
                                data[1:3], "little"
                            ),
                            "transparent": data[3] if p & 1 else None,
                        }
                elif label == 0xFF:  # application extension
                    data, pos = _sub_blocks(payload, pos)
                    if (
                        data[:11] in (b"NETSCAPE2.0", b"ANIMEXTS1.0")
                        and len(data) >= 14
                        and data[11] == 1
                    ):
                        loop = int.from_bytes(data[12:14], "little")
                else:  # comment / plain text / unknown: skip
                    _, pos = _sub_blocks(payload, pos)
                continue
            if block != 0x2C:  # not an image descriptor
                return None
            if pos + 9 > n:
                return None
            left = int.from_bytes(payload[pos : pos + 2], "little")
            top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
            fw = int.from_bytes(payload[pos + 4 : pos + 6], "little")
            fh = int.from_bytes(payload[pos + 6 : pos + 8], "little")
            fpacked = payload[pos + 8]
            pos += 9
            if not (0 < fw <= _MAX_DIM and 0 < fh <= _MAX_DIM):
                return None
            total_px += fw * fh
            if total_px > _MAX_TOTAL_PIXELS or len(frames) >= _MAX_FRAMES:
                return None
            lct, pos = _color_table(payload, pos, fpacked)
            if pos >= n:
                return None
            mcs = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            ind = _lzw_decode(data, mcs, fw * fh)
            if ind is None:
                return None
            rows = ind.reshape(fh, fw)
            if fpacked & 0x40:
                rows = _deinterlace(rows)
            frames.append({
                "left": left, "top": top, "width": fw, "height": fh,
                "indices": rows, "palette": lct,
                "transparent": gce["transparent"],
                "delay_cs": gce["delay_cs"],
                "disposal": gce["disposal"],
            })
            gce = {"transparent": None, "delay_cs": 0, "disposal": 0}
    except (ValueError, IndexError):
        return None
    if not frames:
        return None
    return {
        "version": payload[3:6].decode("ascii"),
        "width": width, "height": height, "bg_index": bg_index,
        "loop_count": loop, "palette": gct, "frames": frames,
    }


def gif_meta(payload: bytes) -> Optional[dict]:
    """Cheap metadata: {version, width, height, n_frames, loop_count,
    delays_cs} — a full parse under the hood (the raster must decode
    for the frame count to be trustworthy)."""
    g = parse_gif(payload)
    if g is None:
        return None
    return {
        "version": g["version"], "width": g["width"],
        "height": g["height"], "n_frames": len(g["frames"]),
        "loop_count": g["loop_count"],
        "delays_cs": [f["delay_cs"] for f in g["frames"]],
    }


def _background(g: dict) -> np.ndarray:
    pal = g["palette"]
    if pal is not None and g["bg_index"] < pal.shape[0]:
        return pal[g["bg_index"]].copy()
    return np.zeros(3, np.uint8)


def decode_gif_frames(
    payload: bytes, max_frames: Optional[int] = None
) -> Optional[list]:
    """Composited (H, W, 3) uint8 RGB canvases, one per frame, with
    GIF89a disposal semantics: 0/1 keep, 2 restore-background,
    3 restore-previous.  Transparent pixels leave the canvas as-is."""
    g = parse_gif(payload)
    if g is None:
        return None
    bg = _background(g)
    canvas = np.broadcast_to(
        bg, (g["height"], g["width"], 3)
    ).astype(np.uint8).copy()
    out = []
    prev_canvas = None
    for fr in g["frames"][: max_frames if max_frames else None]:
        pal = fr["palette"] if fr["palette"] is not None else g["palette"]
        if pal is None:
            return None
        y0, x0 = fr["top"], fr["left"]
        y1 = min(y0 + fr["height"], g["height"])
        x1 = min(x0 + fr["width"], g["width"])
        if y1 <= y0 or x1 <= x0:
            out.append(canvas.copy())
            continue
        if fr["disposal"] == 3:
            prev_canvas = canvas.copy()
        ind = fr["indices"][: y1 - y0, : x1 - x0]
        if int(ind.max()) >= pal.shape[0]:
            return None
        rgb = pal[ind]
        region = canvas[y0:y1, x0:x1]
        if fr["transparent"] is not None:
            mask = ind != fr["transparent"]
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        out.append(canvas.copy())
        if fr["disposal"] == 2:
            canvas[y0:y1, x0:x1] = bg
        elif fr["disposal"] == 3 and prev_canvas is not None:
            canvas = prev_canvas
    return out


def decode_gif(payload: bytes) -> Optional[np.ndarray]:
    """First composited frame as (H, W, 3) uint8 RGB — the
    ``decode_image_array`` entry point for GIF payloads."""
    frames = decode_gif_frames(payload, max_frames=1)
    return frames[0] if frames else None


# ---------------------------------------------------------- encoder

def encode_gif(
    frames: list,
    palette: np.ndarray,
    delays_cs=0,
    loop: Optional[int] = 0,
    transparent: Optional[int] = None,
    disposal: int = 0,
    interlace: bool = False,
    bg_index: int = 0,
    offsets: Optional[list] = None,
) -> bytes:
    """GIF89a writer for fixtures and gates: ``frames`` are (h, w)
    uint8 *index* arrays into ``palette`` ((N,3) uint8, N a power of
    two >= 2).  ``delays_cs`` is an int or per-frame list;
    ``offsets`` optional per-frame (left, top).  ``loop=None`` omits
    the NETSCAPE block (still GIF89a)."""
    pal = np.asarray(palette, np.uint8)
    ncol = pal.shape[0]
    if ncol < 2 or ncol > 256 or ncol & (ncol - 1):
        raise ValueError("palette size must be a power of two in 2..256")
    pal_bits = ncol.bit_length() - 1
    canvas_w = max(
        int(f.shape[1]) + (offsets[i][0] if offsets else 0)
        for i, f in enumerate(frames)
    )
    canvas_h = max(
        int(f.shape[0]) + (offsets[i][1] if offsets else 0)
        for i, f in enumerate(frames)
    )
    out = bytearray(b"GIF89a")
    out += canvas_w.to_bytes(2, "little")
    out += canvas_h.to_bytes(2, "little")
    out.append(0x80 | ((pal_bits - 1) & 7) << 4 | ((pal_bits - 1) & 7))
    out.append(bg_index)
    out.append(0)
    out += pal.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += int(loop).to_bytes(2, "little")
        out += b"\x00"
    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * len(frames)
    for i, frame in enumerate(frames):
        ind = np.asarray(frame, np.uint8)
        if int(ind.max(initial=0)) >= ncol:
            raise ValueError("frame index out of palette range")
        # Graphic Control Extension
        p = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([p])
        out += int(delays_cs[i]).to_bytes(2, "little")
        out.append(transparent if transparent is not None else 0)
        out += b"\x00"
        left, top = offsets[i] if offsets else (0, 0)
        out += b"\x2c"
        out += int(left).to_bytes(2, "little")
        out += int(top).to_bytes(2, "little")
        out += int(ind.shape[1]).to_bytes(2, "little")
        out += int(ind.shape[0]).to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        rows = ind
        if interlace:
            h = ind.shape[0]
            order = np.concatenate([
                np.arange(start, h, step)
                for start, step in _INTERLACE_PASSES
            ])
            rows = ind[order]
        mcs = max(2, pal_bits)
        out.append(mcs)
        data = _lzw_encode(rows, mcs)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# -------------------------------------------------------- Spark tier

def gif_frame_stats(df: DataFrame) -> DataFrame:
    """(media_id, frame_idx, n_frames, loop_count, delay_cs, height,
    width, r_sum, g_sum, b_sum) — one row per composited frame of
    every animated-or-still GIF payload, decoded map-side with the
    pure-numpy codec (``mapInPandas``: payload bytes never cross a
    shuffle; the work distributes with the scan).  Non-GIF rows are
    skipped.  Mirrors ``multimodal.webp_anim_frame_stats``."""
    out_schema = (
        "media_id long, frame_idx int, n_frames int, loop_count int, "
        "delay_cs int, height int, width int, "
        "r_sum long, g_sum long, b_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                payload = bytes(payload)
                g = parse_gif(payload)
                if g is None:
                    continue
                frames = decode_gif_frames(payload)
                if frames is None:
                    continue
                for j, rgb in enumerate(frames):
                    sums = rgb.sum(axis=(0, 1), dtype=np.int64)
                    rows.append((
                        int(mid), j, len(frames), g["loop_count"],
                        g["frames"][j]["delay_cs"],
                        rgb.shape[0], rgb.shape[1],
                        int(sums[0]), int(sums[1]), int(sums[2]),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "n_frames",
                         "loop_count", "delay_cs", "height", "width",
                         "r_sum", "g_sum", "b_sum"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )
