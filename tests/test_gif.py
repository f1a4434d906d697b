"""GIF codec validation against the system giflib (ctypes).

The pure-numpy GIF decoder (operators/gif.py) must agree bit-exactly
with giflib's DGifSlurp on raster indices, palettes, screen geometry,
and frame placement for every stream this repo's own encoder emits
(still / interlaced / animated / 256-color noise that forces 12-bit
LZW code growth / repetitive rasters that force table-full clear
resets).  giflib is used ONLY here as the reference — the operators
stay pure numpy (the same external-reference strategy as the
VP8/libwebp and JPEG/ImageIO parity sweeps).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deltalake2db_spark.operators import gif as G

LIB = None
for _cand in ("libgif.so.7", ctypes.util.find_library("gif")):
    if not _cand:
        continue
    try:
        LIB = ctypes.CDLL(_cand)
        break
    except OSError:
        continue


GifWord = ctypes.c_int
GifByteType = ctypes.c_ubyte


class GifColorType(ctypes.Structure):
    _fields_ = [("Red", GifByteType), ("Green", GifByteType),
                ("Blue", GifByteType)]


class ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(GifColorType)),
    ]


class GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", GifWord), ("Top", GifWord),
        ("Width", GifWord), ("Height", GifWord),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(ColorMapObject)),
    ]


class ExtensionBlock(ctypes.Structure):
    _fields_ = [
        ("ByteCount", ctypes.c_int),
        ("Bytes", ctypes.POINTER(GifByteType)),
        ("Function", ctypes.c_int),
    ]


class SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", GifImageDesc),
        ("RasterBits", ctypes.POINTER(GifByteType)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
    ]


class GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", GifWord), ("SHeight", GifWord),
        ("SColorResolution", GifWord),
        ("SBackGroundColor", GifWord),
        ("AspectByte", GifByteType),
        ("SColorMap", ctypes.POINTER(ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", GifImageDesc),
        ("SavedImages", ctypes.POINTER(SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


INPUT_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(GifFileType),
    ctypes.POINTER(GifByteType), ctypes.c_int,
)

if LIB is not None:
    LIB.DGifOpen.restype = ctypes.POINTER(GifFileType)
    LIB.DGifOpen.argtypes = [
        ctypes.c_void_p, INPUT_FUNC, ctypes.POINTER(ctypes.c_int)
    ]
    LIB.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    LIB.DGifCloseFile.argtypes = [
        ctypes.POINTER(GifFileType), ctypes.POINTER(ctypes.c_int)
    ]

pytestmark = pytest.mark.skipif(
    LIB is None, reason="system giflib unavailable"
)


def giflib_slurp(payload: bytes):
    """Decode with giflib: (screen_w, screen_h, global_palette,
    frames=[{left, top, w, h, indices, palette}]) or None on error."""
    buf = payload
    state = {"pos": 0}

    @INPUT_FUNC
    def read(_gf, dest, want):
        pos = state["pos"]
        chunk = buf[pos : pos + want]
        ctypes.memmove(dest, chunk, len(chunk))
        state["pos"] = pos + len(chunk)
        return len(chunk)

    err = ctypes.c_int(0)
    gf = LIB.DGifOpen(None, read, ctypes.byref(err))
    if not gf:
        return None
    try:
        if LIB.DGifSlurp(gf) != 1:  # GIF_OK
            return None
        g = gf.contents

        def cmap(ptr):
            if not ptr:
                return None
            cm = ptr.contents
            out = np.empty((cm.ColorCount, 3), np.uint8)
            for i in range(cm.ColorCount):
                c = cm.Colors[i]
                out[i] = (c.Red, c.Green, c.Blue)
            return out

        frames = []
        for i in range(g.ImageCount):
            si = g.SavedImages[i]
            d = si.ImageDesc
            n = d.Width * d.Height
            raster = np.ctypeslib.as_array(
                ctypes.cast(
                    si.RasterBits, ctypes.POINTER(GifByteType * n)
                ).contents
            ).reshape(d.Height, d.Width).copy()
            frames.append({
                "left": d.Left, "top": d.Top, "w": d.Width,
                "h": d.Height, "indices": raster,
                "palette": cmap(d.ColorMap),
            })
        return {
            "w": g.SWidth, "h": g.SHeight,
            "palette": cmap(g.SColorMap), "frames": frames,
        }
    finally:
        LIB.DGifCloseFile(gf, ctypes.byref(err))


def _check_parity(payload: bytes) -> None:
    ours = G.parse_gif(payload)
    ref = giflib_slurp(payload)
    assert ours is not None and ref is not None
    assert (ours["width"], ours["height"]) == (ref["w"], ref["h"])
    assert np.array_equal(ours["palette"], ref["palette"])
    assert len(ours["frames"]) == len(ref["frames"])
    for mine, theirs in zip(ours["frames"], ref["frames"]):
        assert (mine["left"], mine["top"]) == (
            theirs["left"], theirs["top"]
        )
        assert np.array_equal(mine["indices"], theirs["indices"])
        if mine["palette"] is not None or theirs["palette"] is not None:
            assert np.array_equal(mine["palette"], theirs["palette"])


def test_giflib_parity_sweep():
    """Own-encoder streams across sizes, palette widths, interlace,
    animation, and both LZW stress shapes decode bit-identically to
    giflib."""
    rng = np.random.RandomState(7)
    n_checked = 0
    for ncol in (2, 4, 16, 256):
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        for h, w in ((1, 1), (5, 9), (33, 17), (64, 64)):
            f = rng.randint(0, ncol, (h, w)).astype(np.uint8)
            _check_parity(G.encode_gif([f], pal))
            _check_parity(G.encode_gif([f], pal, interlace=True))
            n_checked += 2
    # 12-bit code growth + deferred-clear: 256-color noise
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    noise = rng.randint(0, 256, (150, 150)).astype(np.uint8)
    _check_parity(G.encode_gif([noise], pal))
    # table-full clear reset: long repetitive raster
    rep = np.tile(np.arange(256, dtype=np.uint8), 700).reshape(350, 512)
    _check_parity(G.encode_gif([rep], pal))
    # animation with offsets, transparency, disposal
    frames = [
        rng.randint(0, 16, (12, 20)).astype(np.uint8) for _ in range(6)
    ]
    _check_parity(G.encode_gif(
        frames, pal[:16], delays_cs=list(range(6)), loop=2,
        transparent=3, disposal=2,
        offsets=[(i, 2 * i) for i in range(6)],
    ))
    assert n_checked == 32


def test_giflib_agrees_on_meta():
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    frames = [rng.randint(0, 8, (10, 10)).astype(np.uint8)
              for _ in range(4)]
    payload = G.encode_gif(frames, pal, delays_cs=7, loop=5)
    ref = giflib_slurp(payload)
    meta = G.gif_meta(payload)
    assert meta["n_frames"] == len(ref["frames"]) == 4
    assert meta["loop_count"] == 5
    assert meta["delays_cs"] == [7, 7, 7, 7]


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ncol_bits=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, ncol_bits, interlace, seed):
    """encode -> parse recovers the exact index raster and palette
    for any size / palette width / interlace flag."""
    rng = np.random.RandomState(seed)
    ncol = 1 << ncol_bits
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    f = rng.randint(0, ncol, (h, w)).astype(np.uint8)
    g = G.parse_gif(G.encode_gif([f], pal, interlace=interlace))
    assert g is not None
    assert np.array_equal(g["frames"][0]["indices"], f)
    assert np.array_equal(g["palette"], pal)


def test_disposal_compositing_semantics():
    """Hand-checked canvases: disposal 2 restores the painted region
    to background; transparency keeps the underlying canvas pixel."""
    pal = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0]], np.uint8
    )
    pal = np.vstack([pal, [[0, 0, 255]]])  # 4 entries (power of two)
    a = np.full((4, 4), 1, np.uint8)
    b = np.full((2, 2), 2, np.uint8)
    payload = G.encode_gif(
        [a, b], pal, disposal=2, offsets=[(0, 0), (1, 1)]
    )
    frames = G.decode_gif_frames(payload)
    assert len(frames) == 2
    assert (frames[0] == [200, 0, 0]).all()
    # frame 1: canvas restored to bg (index 0) everywhere, then b at
    # (1,1)..(2,2)
    f1 = frames[1]
    assert (f1[1:3, 1:3] == [0, 200, 0]).all()
    assert (f1[0, :] == [10, 10, 10]).all()
    # transparency: a transparent second frame leaves frame 1 showing
    # whatever disposal left on the canvas
    t = np.zeros((4, 4), np.uint8)
    payload2 = G.encode_gif([a, t], pal, transparent=0, disposal=0)
    f2 = G.decode_gif_frames(payload2)[1]
    assert (f2 == [200, 0, 0]).all()  # frame 0 kept, frame 1 all-trans


def test_malformed_gif_fuzz_never_crashes():
    """Random truncations and byte flips of a valid stream must
    fail-to-None or decode — never raise."""
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    frames = [rng.randint(0, 16, (9, 13)).astype(np.uint8)
              for _ in range(3)]
    valid = G.encode_gif(frames, pal, transparent=1, disposal=2)
    for i in range(150):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = G.parse_gif(bytes(buf))
        assert out is None or out["frames"]
        G.decode_gif_frames(bytes(buf))
    # pathological header: huge dims must be rejected, not allocated
    evil = bytearray(valid)
    evil[6:8] = (60000).to_bytes(2, "little")
    assert G.parse_gif(bytes(evil)) is None


def test_decode_image_array_dispatches_gif():
    from deltalake2db_spark.operators.multimodal import (
        decode_image_array,
    )

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (32, 3)).astype(np.uint8)
    f = rng.randint(0, 32, (21, 34)).astype(np.uint8)
    arr = decode_image_array(G.encode_gif([f], pal))
    assert arr is not None and arr.shape == (21, 34, 3)
    assert np.array_equal(arr, pal[f])
