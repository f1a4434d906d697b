"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` stages.

Decode support is tiered:

* **Real, dependency-free decoders**: BMP (24/32-bit BI_RGB), PPM
  ``P6`` / PGM ``P5`` (binary netpbm), PCM WAV (16/8-bit), PNG
  (stdlib zlib inflate + numpy unfiltering), sequential AND
  progressive Huffman JPEG (pure-numpy — ``operators/jpeg.py``),
  lossless-VP8L WebP (``operators/webp.py``), lossy-VP8 WebP
  key frames incl. loop filter + fancy upsampling (r11,
  ``operators/vp8.py`` — bit-exact against the system libwebp), and
  MP4/ISO-BMFF container metadata, all implemented from the public
  specs with ``struct`` + numpy.
* **Video frame PIXEL decode** (r11): real for ``vp08`` (VP8-in-
  ISO-BMFF) tracks via ``decode_video_frames`` — sample-table slice +
  the pure-numpy VP8 decoder.  Other codec fourccs (avc1/hvc1)
  genuinely need ffmpeg, absent here: those rows are skipped, and the
  image-side ``_decode_image`` stub fallback (``NotImplementedError``
  in strict mode / deterministic fake in test mode) now only fires
  for formats outside the real-decoder set above.

Everything Spark-side — the schema, the Arrow batch shapes, the
partition sizing, and the UDF signatures — is identical for both
tiers.

Scale notes: binary payloads never shuffle — every stage here is
map-side (``mapInPandas``); metadata-only projections (`media_stats`)
prune the binary column at the parquet reader, so a stats query reads
kilobytes, not the blobs.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

STRICT_DECODE = False


# --------------------------------------------------------------------------
# Real decoders (spec-only formats, no codec library needed)
# --------------------------------------------------------------------------

def _pnm_header(payload: bytes) -> Optional[tuple[int, int, int, int]]:
    """Parse a binary netpbm header: returns (width, height, maxval,
    raster_offset) or None if malformed.  Handles '#' comments and any
    whitespace runs, per the netpbm spec."""
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] not in b"\r\n":
                pos += 1
        elif 48 <= c <= 57:
            start = pos
            while pos < n and 48 <= payload[pos] <= 57:
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            return None
    if len(tokens) < 3 or pos >= n:
        return None
    return tokens[0], tokens[1], tokens[2], pos + 1  # one ws after maxval


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


_ADAM7 = (  # (x0, y0, dx, dy) per pass
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    rows: np.ndarray, bpp: int
) -> Optional[np.ndarray]:
    """Reverse PNG row filters: ``rows`` is (h, stride+1) with the
    filter byte leading each row; ``bpp`` is the filter's left-pixel
    byte offset.  None/Up reverse as whole-row vector ops; Sub as a
    per-lane modular cumsum (the left-dependency closed form);
    Average/Paeth fall back to the spec's sequential recurrence."""
    h = rows.shape[0]
    stride = rows.shape[1] - 1
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            cur += prev
        elif f == 1:  # Sub: recon(x) = raw(x) + recon(x - bpp)
            for k in range(bpp):
                lane = cur[k::bpp].astype(np.uint64)
                cur[k::bpp] = (lane.cumsum() & 0xFF).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            return None
        out[y] = cur
        prev = out[y]
    return out


def _png_subimage(
    raw: np.ndarray, off: int, sw: int, sh: int, ch: int, depth: int
):
    """Decode one (sub-)image's rows starting at byte ``off`` of the
    inflated stream: returns ((sh, sw, ch) uint8 in the CODED range —
    sub-byte samples NOT yet rescaled — , new offset) or None."""
    stride = (sw * ch * depth + 7) // 8
    need = sh * (stride + 1)
    if off + need > len(raw):
        return None
    rows = raw[off : off + need].reshape(sh, stride + 1)
    bpp = max(1, ch * depth // 8)
    img = _png_unfilter(rows, bpp)
    if img is None:
        return None
    if depth == 8:
        arr = img.reshape(sh, stride)[:, : sw * ch].reshape(sh, sw, ch)
    else:  # ch == 1 by construction (gray / palette indices)
        bits = np.unpackbits(img, axis=1)
        samples = bits[:, : sw * depth].reshape(sh, sw, depth)
        # big-endian packing within the byte: weight and sum
        weights = 1 << np.arange(depth - 1, -1, -1)
        vals = (samples * weights).sum(axis=2).astype(np.uint8)
        arr = vals.reshape(sh, sw, 1)
    return arr, off + need


def decode_png(payload: bytes) -> Optional[np.ndarray]:
    """Pure-stdlib PNG decode (zlib inflate + numpy unfiltering) to an
    ``(H, W, C) uint8`` array.

    Supports the web-mainstream subset: color types 0 (gray), 2
    (RGB), 3 (palette, incl. tRNS alpha), 4 (gray+alpha), 6 (RGBA);
    bit depth 8 everywhere plus 1/2/4 for gray and palette; BOTH
    scanline layouts — sequential and Adam7 interlaced (r12).
    Palette rows map through PLTE (RGBA when tRNS present); sub-byte
    gray is rescaled to 8-bit.  Verified against the JVM ImageIO
    reference in tests/test_operators.py.  Returns None for non-PNG
    or unsupported variants (16-bit) — callers fall back to the stub
    tier."""
    import zlib

    if payload is None or not payload.startswith(_PNG_SIG):
        return None
    pos = len(_PNG_SIG)
    w = h = None
    ch = 0
    depth = color = interlace = 0
    plte = None
    trns = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln  # len + type + data + crc (crc not verified)
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if (
                    comp != 0
                    or filt != 0
                    or interlace not in (0, 1)
                    or color not in (0, 2, 3, 4, 6)
                    or depth not in ((1, 2, 4, 8) if color in (0, 3)
                                     else (8,))
                    or not (0 < w <= 1 << 15 and 0 < h <= 1 << 15)
                ):
                    return None
                ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
            elif ctype == b"PLTE":
                if ln % 3:
                    return None
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif ctype == b"tRNS" and color == 3:
                trns = np.frombuffer(data, np.uint8)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
        if not w or not h or not idat:
            return None
        # budget the inflate by the header-derived raw size (the dims
        # cap bounds THIS, not the stream): a bomb IDAT declaring a
        # tiny image must not inflate past what that image can hold.
        # Adam7 re-filters each of 7 sub-images, so allow 2x the
        # non-interlaced size plus slack; a well-formed PNG inflates
        # to exactly its raw size, so hitting the cap means corrupt
        # or hostile input -> None (fail-open like every other codec
        # guard here).
        row_bytes = (w * ch * depth + 7) // 8
        expected = 2 * h * (1 + row_bytes) + 1024
        d = zlib.decompressobj()
        raw_b = d.decompress(bytes(idat), expected)
        if d.unconsumed_tail:
            return None
        # stream-completeness check the old whole-buffer
        # zlib.decompress did implicitly: a truncated/corrupt IDAT
        # whose deflate stream never terminates (d.eof False) is
        # rejected AT decode, not left for downstream size checks
        if not d.eof:
            return None
        raw = np.frombuffer(raw_b, np.uint8)
    except Exception:
        return None
    if interlace == 0:
        sub = _png_subimage(raw, 0, w, h, ch, depth)
        if sub is None:
            return None
        out = sub[0]
    else:  # Adam7: seven sub-images, each independently filtered
        out = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            sw = (w - x0 + dx - 1) // dx
            sh = (h - y0 + dy - 1) // dy
            if sw <= 0 or sh <= 0:
                continue
            sub = _png_subimage(raw, off, sw, sh, ch, depth)
            if sub is None:
                return None
            out[y0::dy, x0::dx] = sub[0]
            off = sub[1]
    if color == 3:
        if plte is None:
            return None
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            return None
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(plte.shape[0], 255, np.uint8)
            alpha[: min(len(trns), plte.shape[0])] = trns[
                : plte.shape[0]
            ]
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if depth < 8:  # sub-byte gray: rescale to full 8-bit range
        scale = 255 // ((1 << depth) - 1)
        return (out * np.uint8(scale)).astype(np.uint8)
    return out


def _png_filter_rows(
    sub: np.ndarray, filter_type: int
) -> bytearray:
    """Filter one (sub-)image (sh, sw, ch) with a single filter type
    (0/1/2) — the encoder half of ``_png_unfilter``."""
    sh, sw, ch = sub.shape
    stride = sw * ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(sh):
        cur = sub[y].reshape(stride)
        if filter_type == 0:
            raw = cur
        elif filter_type == 2:
            raw = cur - prev
        elif filter_type == 1:
            shifted = np.zeros_like(cur)
            shifted[ch:] = cur[:-ch]
            raw = cur - shifted
        else:
            raise ValueError("encode_png supports filter types 0/1/2")
        lines.append(filter_type)
        lines += raw.tobytes()
        prev = cur
    return lines


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    interlace: bool = False,
    palette: Optional[np.ndarray] = None,
    trns: Optional[np.ndarray] = None,
) -> bytes:
    """Minimal PNG encoder (stdlib zlib): 8-bit gray/GA/RGB/RGBA —
    or palette (color type 3) when ``palette`` ((N,3) uint8) is given
    and ``arr`` is an (h, w) index raster, with optional ``trns``
    per-index alpha.  One filter type for every scanline (0/1/2) and
    optionally Adam7-``interlace``d scanline layout (r12) — enough to
    exercise every decoder path and produce valid files."""
    import zlib

    if palette is not None:
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        arr = arr.astype(np.uint8)[:, :, None]
        color = 3
    else:
        if arr.ndim == 2:
            arr = arr[:, :, None]
        arr = arr.astype(np.uint8)
        color = {1: 0, 2: 4, 3: 2, 4: 6}[arr.shape[2]]
    h, w, _ch = arr.shape
    if interlace:
        lines = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines += _png_filter_rows(
                    np.ascontiguousarray(sub), filter_type
                )
    else:
        lines = _png_filter_rows(arr, filter_type)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0
    )
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
        if trns is not None:
            out += chunk(b"tRNS", np.asarray(trns, np.uint8).tobytes())
    return (
        out
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_image_array(payload: bytes) -> Optional[np.ndarray]:
    """Decode PNG (8-bit gray/GA/RGB/RGBA, stdlib zlib inflate),
    baseline JPEG (pure-numpy Huffman + IDCT, gray or YCbCr with any
    sampling factors), WebP (lossless VP8L + lossy VP8), GIF (LZW,
    first composited frame — ``operators/gif.py``), BMP (24/32-bit
    uncompressed), PPM ``P6`` or PGM ``P5`` bytes to an ``(H, W, C)
    uint8`` array (RGB channel order for BMP's stored BGR).  Returns
    None when the payload is not one of these formats or is malformed
    — callers fall back to the stub tier."""
    if payload is None or len(payload) < 16:
        return None
    if payload.startswith(_PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import decode_webp_lossless

        arr = decode_webp_lossless(payload)
        if arr is not None:
            return arr
        from .vp8 import decode_webp_lossy

        return decode_webp_lossy(payload)  # r11: lossy VP8 is real now
    if payload[:4] == b"GIF8":
        from .gif import decode_gif

        return decode_gif(payload)  # r12: first composited frame
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        return decode_tiff(payload)  # r12: baseline TIFF
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        hdr = _pnm_header(payload)
        if hdr is None:
            return None
        w, h, maxval, off = hdr
        ch = 3 if magic == b"P6" else 1
        if w <= 0 or h <= 0 or not (0 < maxval < 256):
            return None
        need = w * h * ch
        if len(payload) - off < need:
            return None
        return (
            np.frombuffer(payload, np.uint8, count=need, offset=off)
            .reshape(h, w, ch)
            .copy()
        )
    if magic == b"BM":
        if len(payload) < 54:
            return None
        pix_off = struct.unpack_from("<I", payload, 10)[0]
        dib = struct.unpack_from("<I", payload, 14)[0]
        if dib < 40:
            return None  # BITMAPCOREHEADER not supported
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        top_down = h < 0
        h = abs(h)
        if w <= 0 or h == 0 or bpp not in (24, 32) or comp != 0:
            return None
        nch = bpp // 8
        row = ((bpp * w + 31) // 32) * 4  # rows pad to 4 bytes
        if len(payload) - pix_off < row * h:
            return None
        data = np.frombuffer(
            payload, np.uint8, count=row * h, offset=pix_off
        ).reshape(h, row)
        px = data[:, : w * nch].reshape(h, w, nch)
        rgb = px[..., [2, 1, 0]]  # stored BGR(A) -> RGB; alpha dropped
        if not top_down:
            rgb = rgb[::-1]
        return np.ascontiguousarray(rgb)
    return None


def resize_image(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index math,
    the standard thumbnail/normalize step before feature extraction."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[rows][:, cols]


def decode_wav(payload: bytes) -> Optional[tuple[np.ndarray, int]]:
    """Decode PCM WAV bytes to ``(samples float32 in [-1, 1],
    sample_rate)``; multi-channel is averaged to mono.  Returns None
    for non-RIFF/compressed payloads."""
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    rate, bits, channels, fmt = None, None, None, None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            fmt, channels, rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
        elif cid == b"data":
            if fmt != 1 or bits not in (8, 16) or not channels:
                return None
            count = min(size, n - body)
            if bits == 16:
                raw = np.frombuffer(
                    payload, "<i2", count=count // 2, offset=body
                )
                x = raw.astype(np.float32) / 32768.0
            else:  # 8-bit PCM is unsigned
                raw = np.frombuffer(payload, np.uint8, count=count, offset=body)
                x = (raw.astype(np.float32) - 128.0) / 128.0
            usable = (len(x) // channels) * channels
            x = x[:usable].reshape(-1, channels).mean(axis=1)
            return x, int(rate)
        pos = body + size + (size & 1)  # chunks are 2-byte aligned
    return None


def _decode_image(payload: bytes, width: int, height: int):
    """Feature tuple (mean_px, fill_ratio, n_px) for one image payload.

    PNG (stdlib zlib) / sequential+progressive JPEG / lossless-VP8L
    and lossy-VP8 WebP (r11) / BMP / PPM / PGM decode for real (see
    ``decode_image_array``), and VP8-coded video tracks decode for
    real too (``decode_video_frames``); ONLY codecs that need ffmpeg
    (avc1/hvc1 video, unrecognized image formats) hit the stub tier —
    ``NotImplementedError`` in strict mode (swap for an ffmpeg/Pillow
    kernel in deployments that need it), or a deterministic fake
    derived from the payload bytes so tests have stable expectations.
    """
    if payload is None:
        return None
    arr = decode_image_array(payload)
    if arr is not None:
        n_px = arr.shape[0] * arr.shape[1]
        return (
            float(arr.mean()),
            float(np.count_nonzero(arr.any(axis=-1))) / n_px,
            n_px,
        )
    if STRICT_DECODE:
        raise NotImplementedError(
            "compressed-image codec not available in this environment; "
            "swap _decode_image's fallback for a Pillow/libvips kernel"
        )
    s = sum(payload[:64]) if payload else 0
    n = max(len(payload), 1)
    return (s % 256, len(payload) / n, n)


def apply_exif_orientation(
    arr: np.ndarray, orientation
) -> np.ndarray:
    """Transform a decoded (H, W[, C]) array into display orientation
    per the EXIF Orientation tag (1 normal, 2 mirror-H, 3 rot180,
    4 mirror-V, 5 transpose, 6 rot90 CW, 7 transverse, 8 rot90 CCW).
    Index views where possible; unknown values pass through."""
    o = int(orientation or 1)
    if o == 2:
        return arr[:, ::-1]
    if o == 3:
        return arr[::-1, ::-1]
    if o == 4:
        return arr[::-1]
    if o == 5:
        return arr.swapaxes(0, 1)
    if o == 6:
        return np.rot90(arr, k=-1)
    if o == 7:
        return np.rot90(arr, k=-1)[::-1]
    if o == 8:
        return np.rot90(arr, k=1)
    return arr


def oriented_image_stats(df: DataFrame) -> DataFrame:
    """(media_id, orientation, height, width, tl, tr, bl, br) — every
    image decoded map-side, its EXIF Orientation (JPEG APP1, via
    ``exif.parse_exif``; 1 elsewhere) APPLIED, then post-normalization
    dims + channel-0 corner pixels emitted.  This is the pipeline's
    'pixels are upright before featurization' pass; corners pin the
    transform exactly (sums are rotation-invariant and would prove
    nothing)."""
    out_schema = (
        "media_id long, orientation int, height int, width int, "
        "tl int, tr int, bl int, br int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .exif import parse_exif

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                payload = bytes(payload)
                arr = decode_image_array(payload)
                if arr is None:
                    continue
                meta = parse_exif(payload)
                o = (meta or {}).get("orientation") or 1
                arr = apply_exif_orientation(arr, o)
                rows.append((
                    int(mid), int(o), arr.shape[0], arr.shape[1],
                    int(arr[0, 0, 0]), int(arr[0, -1, 0]),
                    int(arr[-1, 0, 0]), int(arr[-1, -1, 0]),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "orientation", "height", "width",
                         "tl", "tr", "bl", "br"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — never touches the binary column, so
    column pruning keeps the scan tiny."""
    return (
        df.select("kind", "meta.mime", F.length("payload").alias("nbytes"))
        .groupBy("kind", "mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nbytes").alias("total_bytes"),
            F.round(F.avg("nbytes"), 2).alias("avg_bytes"),
        )
    )


def extract_image_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """(media_id, mean_px, fill_ratio, n_px) per image row via an
    Arrow-batched mapInPandas — the decode stub runs where the bytes
    live; only the tiny feature vector ever moves."""
    out_schema = "media_id long, mean_px double, fill_ratio double, n_px long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    continue
                w = meta["width"] if meta is not None else None
                h = meta["height"] if meta is not None else None
                feat = _decode_image(payload, w, h)
                if feat is not None:
                    rows.append((mid, float(feat[0]), float(feat[1]), int(feat[2])))
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_px", "fill_ratio", "n_px"]
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema,
        cols=("media_id", "kind", "payload", "meta"),
    )


def parse_webp_anim(payload: bytes) -> Optional[dict]:
    """Animated-WebP (VP8X + ANIM/ANMF, the public container spec)
    metadata + per-frame sub-payloads: ``{canvas_w, canvas_h,
    loop_count, frames: [{x, y, w, h, dur_ms, payload}]}`` — frame
    payloads are the raw ``VP8 ``/``VP8L`` sub-chunk streams, ready
    for ``vp8.decode_vp8`` / ``webp.decode_webp_lossless``.  Returns
    None for non-animated or malformed containers.  Canvas
    COMPOSITING (blend/dispose) is the caller's concern — frame
    extraction is the training-pipeline primitive (every frame is an
    image sample with placement + timing metadata)."""
    if (
        payload is None
        or len(payload) < 30
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        return None
    pos = 12
    n = len(payload)
    canvas_w = canvas_h = None
    loop = 0
    frames = []
    animated = False
    try:
        while pos + 8 <= n:
            tag = payload[pos : pos + 4]
            size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + size]
            if tag == b"VP8X" and len(body) >= 10:
                animated = bool(body[0] & 0x02)
                canvas_w = int.from_bytes(body[4:7], "little") + 1
                canvas_h = int.from_bytes(body[7:10], "little") + 1
            elif tag == b"ANIM" and len(body) >= 6:
                loop = int.from_bytes(body[4:6], "little")
            elif tag == b"ANMF" and len(body) >= 16:
                fx = int.from_bytes(body[0:3], "little") * 2
                fy = int.from_bytes(body[3:6], "little") * 2
                fw = int.from_bytes(body[6:9], "little") + 1
                fh = int.from_bytes(body[9:12], "little") + 1
                dur = int.from_bytes(body[12:15], "little")
                # sub-chunks: ALPH? then VP8 /VP8L
                sub = 16
                fpay = None
                while sub + 8 <= len(body):
                    st = body[sub : sub + 4]
                    ss = int.from_bytes(body[sub + 4 : sub + 8], "little")
                    if st in (b"VP8 ", b"VP8L"):
                        fpay = (st, body[sub + 8 : sub + 8 + ss])
                        break
                    sub += 8 + ss + (ss & 1)
                if fpay is not None:
                    frames.append({
                        "x": fx, "y": fy, "w": fw, "h": fh,
                        "dur_ms": dur, "fourcc": fpay[0],
                        "payload": fpay[1],
                    })
            pos += 8 + size + (size & 1)
    except (IndexError, ValueError):
        return None
    if not animated or not frames:
        return None
    return {
        "canvas_w": canvas_w, "canvas_h": canvas_h,
        "loop_count": loop, "frames": frames,
    }


def encode_webp_anim(
    frames: list, canvas_w: int, canvas_h: int, loop: int = 0
) -> bytes:
    """Animated-WebP writer (the parse_webp_anim partner for fixtures
    and gates): ``frames`` is ``[(x, y, dur_ms, fourcc, payload)]``
    where payload is a raw ``VP8 `` or ``VP8L`` stream (e.g. from
    ``vp8.encode_vp8``)."""
    body = bytearray()
    vp8x = bytes([0x02, 0, 0, 0]) + (canvas_w - 1).to_bytes(
        3, "little"
    ) + (canvas_h - 1).to_bytes(3, "little")
    body += b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
    anim = b"\x00\x00\x00\x00" + loop.to_bytes(2, "little")
    body += b"ANIM" + len(anim).to_bytes(4, "little") + anim
    for x, y, dur, fourcc, payload in frames:
        sub = fourcc + len(payload).to_bytes(4, "little") + payload
        if len(payload) & 1:
            sub += b"\x00"
        anmf = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + bytes(6)  # w-1 / h-1 patched below
            + dur.to_bytes(3, "little")
            + b"\x00"
            + sub
        )
        # frame dims from the sub-stream are unknown here; callers
        # pass canvas-sized frames in the gates — record canvas dims
        anmf = (
            anmf[:6]
            + (canvas_w - 1).to_bytes(3, "little")
            + (canvas_h - 1).to_bytes(3, "little")
            + anmf[12:]
        )
        body += b"ANMF" + len(anmf).to_bytes(4, "little") + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return (
        b"RIFF"
        + (4 + len(body)).to_bytes(4, "little")
        + b"WEBP"
        + bytes(body)
    )


def webp_anim_frame_stats(df: DataFrame) -> DataFrame:
    """(media_id, frame_idx, x, y, dur_ms, height, width, y_sum,
    u_sum, v_sum) for animated-WebP rows: every frame's sub-stream is
    decoded map-side — lossy VP8 frames by the pure-numpy VP8 decoder
    (YUV plane sums), VP8L frames by the lossless decoder (RGB summed
    into y_sum with u_sum/v_sum NULL).  Non-animated rows are
    skipped."""
    out_schema = (
        "media_id long, frame_idx int, x int, y int, dur_ms int, "
        "height int, width int, y_sum long, u_sum long, v_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .vp8 import decode_vp8
        from .webp import decode_webp_lossless

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                meta = parse_webp_anim(bytes(payload))
                if meta is None:
                    continue
                for j, fr in enumerate(meta["frames"]):
                    if fr["fourcc"] == b"VP8 ":
                        planes = decode_vp8(fr["payload"])
                        if planes is None:
                            continue
                        y, u, v = planes
                        rows.append((
                            int(mid), j, fr["x"], fr["y"], fr["dur_ms"],
                            y.shape[0], y.shape[1],
                            int(y.sum(dtype=np.int64)),
                            int(u.sum(dtype=np.int64)),
                            int(v.sum(dtype=np.int64)),
                        ))
                    else:
                        riff = (
                            b"RIFF"
                            + (4 + 8 + len(fr["payload"])).to_bytes(
                                4, "little"
                            )
                            + b"WEBP"
                            + b"VP8L"
                            + len(fr["payload"]).to_bytes(4, "little")
                            + fr["payload"]
                        )
                        arr = decode_webp_lossless(riff)
                        if arr is None:
                            continue
                        rows.append((
                            int(mid), j, fr["x"], fr["y"], fr["dur_ms"],
                            arr.shape[0], arr.shape[1],
                            int(arr.sum(dtype=np.int64)), None, None,
                        ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "x", "y", "dur_ms",
                         "height", "width", "y_sum", "u_sum", "v_sum"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


def webp_lossy_plane_sums(df: DataFrame) -> DataFrame:
    """(media_id, y_sum, u_sum, v_sum) for lossy-WebP rows: decode the
    VP8 key frame map-side (pure-numpy ``operators/vp8.py``) and sum
    the raw YUV420 planes — the plane sums are exactly replayable for
    the MB-constant gate images, making the lossy codec oracle-checkable
    end to end (the RGB path would entangle the fancy-upsampling
    blends of neighboring MBs into the closed form)."""
    out_schema = "media_id long, y_sum long, u_sum long, v_sum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .vp8 import decode_vp8, vp8_chunk_of

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                chunk = vp8_chunk_of(payload)
                if chunk is None:
                    continue
                planes = decode_vp8(chunk)
                if planes is None:
                    continue
                y, u, v = planes
                rows.append((
                    mid, int(y.sum(dtype=np.int64)),
                    int(u.sum(dtype=np.int64)),
                    int(v.sum(dtype=np.int64)),
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "y_sum", "u_sum", "v_sum"]
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


def extract_audio_features(df: DataFrame) -> DataFrame:
    """(media_id, n_samples, sample_rate, duration_ms, mean_abs, rms)
    per audio row — PCM WAV natively, FLAC via the pure-numpy lossless
    decoder (r11, ``operators/flac.py``); other compressed formats
    (mp3/ogg need ffmpeg) are skipped.  Same map-side mapInPandas
    shape as the image path."""
    out_schema = (
        "media_id long, n_samples long, sample_rate int, "
        "duration_ms long, mean_abs double, rms double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .flac import decode_flac

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                payload = bytes(payload)
                if payload[:4] == b"fLaC":
                    f = decode_flac(payload)
                    if f is None:
                        continue
                    # interleave channels flat, same shape contract as
                    # decode_wav (n_samples counts every sample)
                    x = f[0].reshape(-1).astype(np.float64)
                    rate = f[1]
                else:
                    decoded = decode_wav(payload)
                    if decoded is None:
                        continue
                    x, rate = decoded
                rows.append((
                    int(mid), len(x), rate,
                    int(len(x) * 1000 / rate) if rate else 0,
                    float(np.abs(x).mean()) if len(x) else 0.0,
                    float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "sample_rate",
                         "duration_ms", "mean_abs", "rms"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


# --------------------------------------------------------------------------
# MP4 / ISO-BMFF container metadata (ISO 14496-12 box walk — pure
# struct parsing, no codec).  VP8-coded tracks (vp08) get REAL frame
# pixel decode via decode_video_frames + operators/vp8.py (r11); only
# avc1/hvc1 frame pixels stay env-stubbed (ffmpeg absent).  The
# container layer (duration, dimensions, track types, codec fourccs)
# is what a corpus-curation pipeline filters on before any decode.
# --------------------------------------------------------------------------

def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each top-level box in
    ``buf[start:end]`` — handles 64-bit largesize and size==0 (to
    end-of-enclosure) per the spec."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _find_box(buf: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _walk_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


def parse_mp4_meta(payload: bytes) -> Optional[dict]:
    """Container metadata of an MP4/ISO-BMFF payload:
    ``{major_brand, duration_ms, width, height, n_tracks, tracks:
    [{handler, codec, duration_ms, width, height}]}`` — or ``None``
    when the payload is not BMFF (no ftyp/moov) or malformed.

    Reads ftyp, moov/mvhd (movie timescale + duration), and per trak:
    tkhd (16.16 fixed-point presentation size), mdia/mdhd (media
    timescale/duration), mdia/hdlr (vide/soun), stbl/stsd (first
    sample-entry fourcc).  Pure driver-free parsing — runs inside the
    same mapInPandas tier as the image decoders."""
    try:
        return _parse_mp4_meta(payload)
    except Exception:
        return None


def _parse_mp4_meta(payload: bytes) -> Optional[dict]:
    if payload is None or len(payload) < 16:
        return None
    n = len(payload)
    major = None
    moov = None
    for t, b, e in _walk_boxes(payload, 0, n):
        if t == b"ftyp":
            major = payload[b : b + 4].decode("ascii", "replace")
        elif t == b"moov":
            moov = (b, e)
    if moov is None or major is None:
        return None
    mb, me = moov
    out = {
        "major_brand": major,
        "duration_ms": None,
        "width": None,
        "height": None,
        "n_tracks": 0,
        "tracks": [],
    }
    mvhd = _find_box(payload, mb, me, b"mvhd")
    if mvhd:
        vb, _ = mvhd
        ver = payload[vb]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", payload, vb + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", payload, vb + 4 + 8)
        if ts:
            out["duration_ms"] = int(dur * 1000 // ts)
    for t, b, e in _walk_boxes(payload, mb, me):
        if t != b"trak":
            continue
        tr = {"handler": None, "codec": None, "duration_ms": None,
              "width": None, "height": None}
        tkhd = _find_box(payload, b, e, b"tkhd")
        if tkhd:
            vb, ve = tkhd
            ver = payload[vb]
            # width/height are the LAST 8 bytes of tkhd (16.16 fixed)
            w_fx, h_fx = struct.unpack_from(">II", payload, ve - 8)
            tr["width"] = w_fx >> 16 or None
            tr["height"] = h_fx >> 16 or None
        mdia = _find_box(payload, b, e, b"mdia")
        if mdia:
            db, de = mdia
            mdhd = _find_box(payload, db, de, b"mdhd")
            if mdhd:
                vb, _ = mdhd
                ver = payload[vb]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, vb + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", payload, vb + 4 + 8)
                if ts:
                    tr["duration_ms"] = int(dur * 1000 // ts)
            hdlr = _find_box(payload, db, de, b"hdlr")
            if hdlr:
                vb, _ = hdlr
                tr["handler"] = payload[vb + 8 : vb + 12].decode(
                    "ascii", "replace"
                )
            minf = _find_box(payload, db, de, b"minf")
            if minf:
                stbl = _find_box(payload, minf[0], minf[1], b"stbl")
                if stbl:
                    stsd = _find_box(payload, stbl[0], stbl[1], b"stsd")
                    if stsd:
                        vb, ve = stsd
                        n_ent = struct.unpack_from(">I", payload, vb + 4)[0]
                        if n_ent and vb + 16 <= ve:
                            tr["codec"] = payload[vb + 12 : vb + 16].decode(
                                "ascii", "replace"
                            )
        if tr["handler"] == "vide" and out["width"] is None:
            out["width"], out["height"] = tr["width"], tr["height"]
        out["tracks"].append(tr)
    out["n_tracks"] = len(out["tracks"])
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def encode_mp4_meta(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    codec: bytes = b"avc1",
    audio: bool = False,
    timescale: int = 1000,
) -> bytes:
    """Minimal VALID metadata-only MP4 (ftyp + moov, no media data) —
    the round-trip partner of ``parse_mp4_meta`` for synthesizing
    test/gate payloads without ffmpeg.  One video track (and optionally
    one audio track) with the given presentation size and duration."""
    dur = duration_ms * timescale // 1000

    def track(handler: bytes, fourcc: bytes, w: int, h: int, tid: int):
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIIII", 0, 0, tid, 0, dur)
            + b"\x00" * 8
            + struct.pack(
                ">hhhh", 0, 0, 0 if handler == b"vide" else 0x0100, 0
            )
            + struct.pack(
                ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _box(
            b"mdhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _box(
            b"hdlr", struct.pack(">B3x4x", 0) + handler + b"\x00" * 13
        )
        entry = struct.pack(">I", 16) + fourcc + b"\x00" * 8
        stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3),
    )
    traks = track(b"vide", codec, width, height, 1)
    if audio:
        traks += track(b"soun", b"mp4a", 0, 0, 2)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + _box(b"moov", mvhd + traks)


def mp4_sample_table(payload: bytes) -> Optional[list]:
    """Sample (frame) table of the FIRST video track:
    ``[(offset, size, pts_ms), ...]`` from the stts/stsz/stsc/stco
    boxes — the container-level frame index a sampling pipeline seeks
    with, no codec required.  Returns ``None`` for non-BMFF payloads
    or tracks without sample tables (e.g. metadata-only MP4s)."""
    try:
        return _mp4_sample_table(payload)
    except Exception:
        return None


def _mp4_sample_table(payload: bytes) -> Optional[list]:
    if payload is None or len(payload) < 16:
        return None
    n = len(payload)
    moov = None
    for t, b, e in _walk_boxes(payload, 0, n):
        if t == b"moov":
            moov = (b, e)
    if moov is None:
        return None
    for t, b, e in _walk_boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find_box(payload, b, e, b"mdia")
        if not mdia:
            continue
        hdlr = _find_box(payload, mdia[0], mdia[1], b"hdlr")
        if not hdlr or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find_box(payload, mdia[0], mdia[1], b"mdhd")
        ts = 1000
        if mdhd:
            vb = mdhd[0]
            ver = payload[vb]
            off = vb + 4 + (16 if ver == 1 else 8)
            ts = struct.unpack_from(">I", payload, off)[0] or 1000
        minf = _find_box(payload, mdia[0], mdia[1], b"minf")
        if not minf:
            continue
        stbl = _find_box(payload, minf[0], minf[1], b"stbl")
        if not stbl:
            continue
        sb, se = stbl

        def full(btype):
            box = _find_box(payload, sb, se, btype)
            return None if box is None else box[0] + 4  # skip ver/flags

        # sizes.  Counts are untrusted 32-bit header fields: bound them
        # by what the payload could possibly index BEFORE materializing
        # python lists (a crafted cnt=0xFFFFFFFF would otherwise
        # allocate a 4-billion-entry list — an executor memory blowout
        # the try/except wrappers upstream cannot catch), mirroring the
        # h*w caps in the jpeg/webp decoders.
        max_samples = min(n, 1 << 24)
        p = full(b"stsz")
        if p is None:
            return None
        uniform, cnt = struct.unpack_from(">II", payload, p)
        if cnt > max_samples:
            return None
        if uniform:
            sizes = [uniform] * cnt
        else:
            sizes = list(
                struct.unpack_from(f">{cnt}I", payload, p + 8)
            )
        # chunk offsets
        p = full(b"stco")
        if p is None:
            return None
        (n_chunks,) = struct.unpack_from(">I", payload, p)
        chunk_offs = list(struct.unpack_from(f">{n_chunks}I", payload, p + 4))
        # samples per chunk (stsc runs)
        p = full(b"stsc")
        if p is None:
            return None
        (n_runs,) = struct.unpack_from(">I", payload, p)
        runs = [
            struct.unpack_from(">III", payload, p + 4 + 12 * r)
            for r in range(n_runs)
        ]
        # durations (stts runs) -> cumulative pts
        p = full(b"stts")
        if p is None:
            return None
        (n_tt,) = struct.unpack_from(">I", payload, p)
        deltas = []
        for r in range(n_tt):
            c, d = struct.unpack_from(">II", payload, p + 4 + 8 * r)
            if c > max_samples or len(deltas) + c > max_samples:
                return None
            deltas += [d] * c
        # walk chunks expanding stsc runs into per-sample offsets
        out = []
        si = 0
        t_acc = 0
        for ci in range(n_chunks):
            spc = 1
            for first, cnt_run, _desc in runs:
                if ci + 1 >= first:
                    spc = cnt_run
            off = chunk_offs[ci]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                pts = t_acc * 1000 // ts
                out.append((off, sizes[si], pts))
                t_acc += deltas[si] if si < len(deltas) else 0
                off += sizes[si]
                si += 1
        return out
    return None


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int | None = None,
) -> DataFrame:
    """Container-level frame sampling: every ``every_n``-th video
    frame's ``(media_id, frame_idx, pts_ms, nbytes, frame)`` — the
    encoded sample BYTES sliced straight out of mdat by the
    stts/stsz/stsc/stco index, no codec touched (frame DECODE remains
    the stub tier).  Map-side mapInPandas like the other media paths;
    only the sampled frames' bytes leave the scan."""
    out_schema = (
        "media_id long, frame_idx int, pts_ms long, nbytes int, "
        "frame binary"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                payload = bytes(payload)
                table = mp4_sample_table(payload)
                if not table:
                    continue
                picked = table[::every_n]
                if max_frames is not None:
                    picked = picked[:max_frames]
                for j, (off, size, pts) in enumerate(picked):
                    rows.append((
                        int(mid), j * every_n, pts, size,
                        payload[off : off + size],
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "pts_ms", "nbytes",
                         "frame"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


def decode_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int | None = None,
) -> DataFrame:
    """REAL video-frame PIXEL decode (r11) for VP8-coded MP4 tracks
    (``vp08`` sample entry — the standardized VP8-in-ISO-BMFF
    mapping): every ``every_n``-th frame is sliced out of mdat by the
    sample tables and decoded by the pure-numpy VP8 key-frame decoder
    (operators/vp8.py), yielding ``(media_id, frame_idx, pts_ms,
    height, width, y_sum, u_sum, v_sum)`` — the YUV plane sums the
    frame-quality screens aggregate.  Tracks with any other codec
    fourcc (avc1/hvc1 need ffmpeg, absent here) are skipped, which is
    the one remaining stub surface.  Map-side mapInPandas; only the
    tiny per-frame feature rows leave the scan."""
    out_schema = (
        "media_id long, frame_idx int, pts_ms long, height int, "
        "width int, y_sum long, u_sum long, v_sum long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .vp8 import decode_vp8

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                payload = bytes(payload)
                meta = parse_mp4_meta(payload)
                if not meta or not meta.get("tracks"):
                    continue
                codecs = {
                    t.get("codec")
                    for t in meta["tracks"]
                    if t.get("handler") == "vide"
                }
                if "vp08" not in codecs:
                    continue  # non-VP8 codecs stay stubbed (ffmpeg)
                table = mp4_sample_table(payload)
                if not table:
                    continue
                picked = table[::every_n]
                if max_frames is not None:
                    picked = picked[:max_frames]
                for j, (off, size, pts) in enumerate(picked):
                    planes = decode_vp8(payload[off : off + size])
                    if planes is None:
                        continue
                    y, u, v = planes
                    rows.append((
                        int(mid), j * every_n, pts,
                        y.shape[0], y.shape[1],
                        int(y.sum(dtype=np.int64)),
                        int(u.sum(dtype=np.int64)),
                        int(v.sum(dtype=np.int64)),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "pts_ms", "height",
                         "width", "y_sum", "u_sum", "v_sum"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


def encode_mp4_video(
    frames: list,
    width: int = 0,
    height: int = 0,
    frame_ms: int = 40,
    codec: bytes = b"avc1",
    timescale: int = 1000,
) -> bytes:
    """MP4 with REAL sample tables: mdat holds the given encoded-frame
    byte strings, moov carries stts/stsc/stsz/stco so
    ``mp4_sample_table``/``sample_video_frames`` round-trip exactly —
    the ffmpeg-free partner for synthesizing frame-sampling fixtures.
    Layout: ftyp, mdat, moov (offsets computable in one pass)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    body = b"".join(frames)
    mdat = _box(b"mdat", body)
    data_off = len(ftyp) + 8  # first frame byte
    dur = len(frames) * frame_ms * timescale // 1000
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + b"vide" + b"\x00" * 13)
    entry = struct.pack(">I", 16) + codec + b"\x00" * 8
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    delta = frame_ms * timescale // 1000
    stts = _box(
        b"stts", struct.pack(">B3xIII", 0, 1, len(frames), delta)
    )
    stsc = _box(
        b"stsc", struct.pack(">B3xIIII", 0, 1, 1, len(frames), 1)
    )
    stsz = _box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, len(frames))
        + struct.pack(f">{len(frames)}I", *(len(f) for f in frames)),
    )
    stco = _box(b"stco", struct.pack(">B3xII", 0, 1, data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    return ftyp + mdat + _box(b"moov", mvhd + trak)


def extract_video_meta(df: DataFrame) -> DataFrame:
    """(media_id, major_brand, duration_ms, width, height, n_tracks,
    codecs) per video row — container parse (ISO-BMFF boxes OR
    Matroska/WebM EBML, r11) in the same map-side mapInPandas tier as
    the image/audio paths; unrecognized payloads are skipped.  For
    WebM, ``major_brand`` carries the EBML doctype."""
    out_schema = (
        "media_id long, major_brand string, duration_ms long, "
        "width int, height int, n_tracks int, codecs string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .webm import parse_webm_meta

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                meta = parse_mp4_meta(payload)
                if meta is not None:
                    rows.append((
                        int(mid), meta["major_brand"],
                        meta["duration_ms"], meta["width"],
                        meta["height"], meta["n_tracks"],
                        ",".join(
                            t["codec"] or "?" for t in meta["tracks"]
                        ),
                    ))
                    continue
                wm = parse_webm_meta(bytes(payload))
                if wm is None:
                    continue
                vids = [
                    t for t in wm["tracks"] if t.get("type") == 1
                ]
                rows.append((
                    int(mid), wm["doctype"], wm["duration_ms"],
                    vids[0]["width"] if vids else None,
                    vids[0]["height"] if vids else None,
                    len(wm["tracks"]),
                    ",".join(
                        t["codec"] or "?" for t in wm["tracks"]
                    ),
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "major_brand", "duration_ms",
                         "width", "height", "n_tracks", "codecs"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


# --------------------------------------------------------------------------
# Encoders (round-trip partners of the decoders; used to synthesize
# real-format test payloads without any codec library)
# --------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up)."""
    h, w = arr.shape[:2]
    row = ((24 * w + 31) // 32) * 4
    body = np.zeros((h, row), np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    header = struct.pack("<2sIHHI", b"BM", 54 + row * h, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
    return header + dib + body.tobytes()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float array in [-1, 1] -> mono 16-bit PCM WAV."""
    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def make_real_media(
    spark, n: int = 100, width: int = 16, height: int = 12,
    fmt: str = "bmp",
) -> DataFrame:
    """Synthetic media table whose image payloads are REAL encoded
    BMPs, PNGs, or baseline JPEGs (``fmt``), generated distributed
    (mapInPandas over ``spark.range`` — no driver-side byte building,
    so the builder itself scales).

    BMP/PNG pixels follow the closed form ``(i + x + y + c) % 256``
    (RGB); ``fmt='jpeg'`` (baseline) and ``fmt='pjpeg'`` (progressive
    SOF2, 4-phase scan script) write GRAYSCALE images that are
    CONSTANT per 8x8 block with value ``(i + x//8 + y//8) % 256`` —
    with the encoder's all-ones quant table such blocks round-trip
    bit-exactly (one integer DC coefficient, zero ACs), so an
    external oracle can recompute decoded pixels from the closed form
    despite JPEG being a lossy codec.  ``width``/``height`` must be
    multiples of 8 for the JPEG formats."""
    if fmt not in ("bmp", "png", "jpeg", "pjpeg", "webp", "vp8"):
        raise ValueError(
            f"fmt={fmt!r}: expected 'bmp', 'png', 'jpeg', 'pjpeg', "
            "'webp', or 'vp8'"
        )
    if fmt in ("jpeg", "pjpeg") and (width % 8 or height % 8):
        raise ValueError("JPEG fmts need width/height multiples of 8")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fmt in ("jpeg", "pjpeg"):
            import functools

            from .jpeg import encode_jpeg

            y, x = np.meshgrid(
                np.arange(height), np.arange(width), indexing="ij"
            )
            base = (x // 8 + y // 8).astype(np.int64)
            enc = functools.partial(
                encode_jpeg, progressive=(fmt == "pjpeg")
            )
        elif fmt == "vp8":
            # LOSSY WebP: luma constant per 16x16 MB with value
            # (i + 17*mbx + 31*mby) % 256, chroma constant per MB with
            # (2i + 11*(mbx + 2*mby)) % 256 / (3i + 7*(mbx + 2*mby))
            # % 256 — MB-constant planes at qi=0 round-trip EXACTLY
            # through the VP8 codec (DC-only residue, divisible
            # dequant factors), the JPEG gate's block-constant trick
            from .vp8 import encode_webp_lossy

            if width % 16 or height % 16:
                raise ValueError("fmt='vp8' needs multiples of 16")
            mbw, mbh = width // 16, height // 16
            mby, mbx = np.meshgrid(
                np.arange(mbh), np.arange(mbw), indexing="ij"
            )

            def enc_vp8(i: int) -> bytes:
                yv = (int(i) + 17 * mbx + 31 * mby) % 256
                uv_ = (2 * int(i) + 11 * (mbx + 2 * mby)) % 256
                vv = (3 * int(i) + 7 * (mbx + 2 * mby)) % 256
                y = np.kron(yv, np.ones((16, 16), np.int64)).astype(
                    np.uint8
                )
                u = np.kron(uv_, np.ones((8, 8), np.int64)).astype(
                    np.uint8
                )
                v = np.kron(vv, np.ones((8, 8), np.int64)).astype(
                    np.uint8
                )
                return encode_webp_lossy(y, u, v, qi=0)

            mime = "image/webp"
            for pdf in it:
                rows = []
                for i in pdf["id"]:
                    rows.append((
                        int(i), "image", enc_vp8(int(i)),
                        {"mime": mime, "width": width,
                         "height": height, "duration_ms": None},
                    ))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "kind", "payload", "meta"],
                )
            return
        elif fmt == "webp":
            import functools

            from .webp import encode_webp_lossless

            y, x, c = np.meshgrid(
                np.arange(height), np.arange(width), np.arange(3),
                indexing="ij",
            )
            base = (x + y + c).astype(np.int64)
            enc = functools.partial(
                encode_webp_lossless, transform="subtract_green"
            )
        else:
            y, x, c = np.meshgrid(
                np.arange(height), np.arange(width), np.arange(3),
                indexing="ij",
            )
            base = (x + y + c).astype(np.int64)
            enc = encode_bmp if fmt == "bmp" else encode_png
        mime = f"image/{fmt}"
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                arr = ((base + int(i)) % 256).astype(np.uint8)
                rows.append((
                    int(i), "image", enc(arr),
                    {"mime": mime, "width": width,
                     "height": height, "duration_ms": None},
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    from .parallel import fusable_map

    return fusable_map(spark.range(n), gen, MEDIA_SCHEMA)


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests (no codecs needed)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64 + (i % 5) * 16)])
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 if kind != "audio" else None,
            "height": 48 if kind != "audio" else None,
            "duration_ms": 1000 * (i % 30) if kind != "image" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
