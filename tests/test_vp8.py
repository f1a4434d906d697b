"""Lossy-VP8 codec validation against the system libwebp (ctypes).

The pure-numpy decoder (operators/vp8.py) must be BIT-EXACT against
libwebp on (a) the real lossy .webp fixture shipped with CPython,
(b) streams produced by libwebp's own encoder across sizes, qualities,
and content styles (exercising B_PRED, 16x16 modes, Y2/WHT,
segmentation, per-segment loop-filter levels), and (c) streams from
this repo's own encoder (proving the encoder emits conforming VP8).
The same external-reference strategy the JPEG codec used with Spark's
JVM ImageIO.  libwebp is used ONLY here, as the reference — the
operators stay pure numpy.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

LIB = None
for _cand in ("libwebp.so.7", ctypes.util.find_library("webp")):
    if not _cand:
        continue
    try:
        LIB = ctypes.CDLL(_cand)
        break
    except OSError:
        continue

pytestmark = pytest.mark.skipif(
    LIB is None, reason="system libwebp unavailable"
)

FIXTURE = (
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/"
    "data/python.webp"
)


def _riff(vp8: bytes) -> bytes:
    pad = b"\x00" if len(vp8) & 1 else b""
    return (
        b"RIFF"
        + (4 + 8 + len(vp8) + len(pad)).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8 "
        + len(vp8).to_bytes(4, "little")
        + vp8
        + pad
    )


def lib_yuv(vp8_chunk: bytes):
    riff = _riff(vp8_chunk)
    w = ctypes.c_int()
    h = ctypes.c_int()
    u_ptr = ctypes.POINTER(ctypes.c_ubyte)()
    v_ptr = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    y_ptr = LIB.WebPDecodeYUV(
        riff, len(riff), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u_ptr), ctypes.byref(v_ptr),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    W, H = w.value, h.value
    y = np.ctypeslib.as_array(y_ptr, shape=(H, stride.value))[:, :W].copy()
    u = np.ctypeslib.as_array(
        u_ptr, shape=((H + 1) // 2, uv_stride.value)
    )[:, : (W + 1) // 2].copy()
    v = np.ctypeslib.as_array(
        v_ptr, shape=((H + 1) // 2, uv_stride.value)
    )[:, : (W + 1) // 2].copy()
    LIB.WebPFree(y_ptr)
    return y, u, v


def lib_rgb(webp: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_ubyte)
    ptr = LIB.WebPDecodeRGB(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
    arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    LIB.WebPFree(ptr)
    return arr


def lib_encode(arr: np.ndarray, quality: float) -> bytes:
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    n = LIB.WebPEncodeRGB(
        arr.tobytes(), w, h, w * 3, ctypes.c_float(quality),
        ctypes.byref(out),
    )
    data = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    LIB.WebPFree(out)
    return data


def test_real_fixture_bit_exact():
    from deltalake2db_spark.operators.vp8 import decode_vp8, vp8_chunk_of

    import os

    if not os.path.exists(FIXTURE):
        pytest.skip("fixture not on disk")
    payload = open(FIXTURE, "rb").read()
    chunk = vp8_chunk_of(payload)
    assert chunk is not None
    my = decode_vp8(chunk)
    assert my is not None
    ref = lib_yuv(chunk)
    for mine, theirs in zip(my, ref):
        assert np.array_equal(mine, theirs)


def test_libwebp_encoded_streams_bit_exact():
    """Streams from libwebp's encoder (default config: 4 segments,
    per-segment quantizers + filter levels, autofilter) decode
    bit-exactly — entropy decode, every intra predictor, IDCT/WHT,
    and the normal loop filter all agree."""
    from deltalake2db_spark.operators.vp8 import decode_vp8, vp8_chunk_of

    rng = np.random.default_rng(7)
    n_checked = 0
    for (w, h) in [(16, 16), (5, 7), (33, 17), (64, 48), (80, 80),
                   (31, 64), (96, 32), (15, 15)]:
        for q in (10, 35, 50, 75, 95):
            style = (w + h + q) % 3
            if style == 0:
                base = rng.integers(
                    0, 256, (max(1, h // 8) + 1, max(1, w // 8) + 1, 3)
                ).astype(np.float64)
                img = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(
                    np.uint8
                )
            elif style == 1:
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(yy * 3 + xx * 2) % 256, (xx * 5) % 256,
                     (yy * 7) % 256], -1
                ).astype(np.uint8)
            else:
                img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            chunk = vp8_chunk_of(lib_encode(img, q))
            my = decode_vp8(chunk)
            assert my is not None, (w, h, q)
            ref = lib_yuv(chunk)
            for mine, theirs in zip(my, ref):
                assert np.array_equal(mine, theirs), (w, h, q, style)
            n_checked += 1
    assert n_checked == 40


def test_own_encoder_conforms_and_roundtrips():
    """encode_vp8 output (a) decodes identically under libwebp and
    this repo's decoder at every quantizer (a conforming stream), and
    (b) round-trips MB-constant planes EXACTLY at qi=0 — the
    correctness-gate construction."""
    from deltalake2db_spark.operators.vp8 import (
        decode_vp8,
        decode_webp_lossy,
        encode_vp8,
        encode_webp_lossy,
    )

    rng = np.random.default_rng(3)
    for (h, w) in [(16, 16), (17, 33), (7, 5), (48, 64)]:
        mbh, mbw = (h + 15) // 16, (w + 15) // 16
        y = np.kron(
            rng.integers(0, 256, (mbh, mbw)), np.ones((16, 16), np.int64)
        )[:h, :w].astype(np.uint8)
        u = np.kron(
            rng.integers(0, 256, (mbh, mbw)), np.ones((8, 8), np.int64)
        )[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8)
        v = np.kron(
            rng.integers(0, 256, (mbh, mbw)), np.ones((8, 8), np.int64)
        )[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8)
        stream = encode_vp8(y, u, v, qi=0)
        my = decode_vp8(stream)
        assert np.array_equal(my[0], y)
        assert np.array_equal(my[1], u)
        assert np.array_equal(my[2], v)
        ref = lib_yuv(stream)
        for mine, theirs in zip(my, ref):
            assert np.array_equal(mine, theirs)
    # arbitrary content, lossy quantizers: conforming (libwebp == mine)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    for qi in (0, 40, 127):
        s = encode_vp8(y, u, v, qi=qi)
        my = decode_vp8(s)
        ref = lib_yuv(s)
        for mine, theirs in zip(my, ref):
            assert np.array_equal(mine, theirs)
    # RGB path: container wrapper + fancy upsample + yuv.h constants
    webp = encode_webp_lossy(y, u, v, qi=0)
    assert np.array_equal(decode_webp_lossy(webp), lib_rgb(webp))


def test_decode_media_routes_lossy_webp():
    from deltalake2db_spark.operators.multimodal import decode_image_array
    from deltalake2db_spark.operators.vp8 import encode_webp_lossy

    y = np.full((16, 16), 140, np.uint8)
    u = np.full((8, 8), 90, np.uint8)
    v = np.full((8, 8), 200, np.uint8)
    arr = decode_image_array(encode_webp_lossy(y, u, v, qi=0))
    assert arr is not None and arr.shape == (16, 16, 3)
    # interframes / corrupt streams fall through to None, not a crash
    from deltalake2db_spark.operators.vp8 import decode_vp8

    assert decode_vp8(b"\x01\x00\x00\x9d\x01\x2a" + bytes(8)) is None
    assert decode_vp8(bytes(20)) is None
