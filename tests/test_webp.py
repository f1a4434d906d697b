"""VP8L (WebP lossless) codec tests (operators/webp.py).

No real VP8L fixture exists in this sandbox (the only on-disk .webp is
lossy VP8), so coverage is exhaustive self-round-trip over every
bitstream feature the decoder implements — the format is lossless, so
decode(encode(x)) must equal x EXACTLY on every path.
"""

from __future__ import annotations

import numpy as np
import pytest

from deltalake2db_spark.operators.webp import (
    _DIST_MAP,
    decode_webp_lossless,
    encode_webp_lossless,
)


def _rt(arr, **kw):
    dec = decode_webp_lossless(encode_webp_lossless(arr, **kw))
    assert dec is not None
    if arr.shape[2] == 3:
        assert dec.shape == arr.shape  # alpha-hint 0 -> RGB out
        assert np.array_equal(dec, arr)
    else:
        assert np.array_equal(dec, arr)
    return dec


def test_literals_and_subtract_green():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    _rt(img, use_lz77=False)
    _rt(img)  # lz77 allowed (few runs in random data)
    _rt(img, transform="subtract_green")


def test_lz77_runs_and_color_cache():
    runs = np.zeros((16, 20, 3), np.uint8)
    runs[:8] = 50
    runs[8:] = 200
    runs[:, :3] = 7
    _rt(runs)                      # dist-1 and dist-w mapped references
    _rt(runs, cache_bits=4)        # cache-hit symbols
    _rt(runs, cache_bits=8)


def test_palette_all_bundle_widths():
    rng = np.random.default_rng(5)
    # 2 colors -> 8 px/byte; 3 -> 4; 17 -> 2; 256 -> none
    for n, _bits in [(2, 3), (3, 2), (17, 1), (256, 0)]:
        if n == 256:
            idx = rng.permutation(256).reshape(16, 16)
        else:
            idx = rng.integers(0, n, (9, 23))
        img = (idx * (255 // max(n - 1, 1))).astype(np.uint8)[..., None]
        img = img.repeat(3, axis=2)
        _rt(img, transform="palette")


def test_all_predictor_modes():
    rng = np.random.default_rng(6)
    smooth = np.cumsum(rng.integers(0, 3, (12, 14, 4)), axis=0).astype(
        np.uint8
    )
    for mode in range(14):
        _rt(smooth, transform="predictor", predictor_mode=mode)


def test_color_transform():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    _rt(img, transform="color")


def test_alpha_channel_and_hint():
    rng = np.random.default_rng(11)
    rgba = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    dec = _rt(rgba)
    assert dec.shape == (6, 7, 4)
    # fully-opaque RGBA input: hint 0 -> decoder returns RGB
    opaque = rgba.copy()
    opaque[:, :, 3] = 255
    dec2 = decode_webp_lossless(encode_webp_lossless(opaque))
    assert dec2.shape == (6, 7, 3)
    assert np.array_equal(dec2, opaque[:, :, :3])


def test_distance_map_prefix():
    """The generated 2-D map's head matches the spec's published
    ordering (the part cross-checkable from the spec text)."""
    assert _DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


def test_non_vp8l_fallthrough():
    assert decode_webp_lossless(b"not riff at all....") is None
    assert decode_webp_lossless(b"RIFF\x00\x00\x00\x00WEBPVP8 ") is None
    # the on-disk python.webp is lossy VP8 -> stub tier
    import os

    p = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/"
         "data/python.webp")
    if os.path.exists(p):
        assert decode_webp_lossless(open(p, "rb").read()) is None


def test_dispatch_and_distributed(spark):
    from deltalake2db_spark.operators import multimodal as M

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    got = M.decode_image_array(encode_webp_lossless(img))
    assert np.array_equal(got, img)

    media = M.make_real_media(spark, 5, width=16, height=12, fmt="webp")
    feats = {r["media_id"]: r for r in
             M.extract_image_features(media).collect()}
    assert len(feats) == 5
    y, x, c = np.meshgrid(
        np.arange(12), np.arange(16), np.arange(3), indexing="ij"
    )
    base = (x + y + c).astype(np.int64)
    for i in range(5):
        expect = ((base + i) % 256).mean()
        assert abs(feats[i]["mean_px"] - expect) < 1e-9


def test_bad_args():
    with pytest.raises(ValueError, match="3|4"):
        encode_webp_lossless(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="transform"):
        encode_webp_lossless(
            np.zeros((4, 4, 3), np.uint8), transform="bogus"
        )


def test_meta_prefix_codes_hand_built_stream():
    """Decoder-only path (the encoder emits one code group): a
    hand-built level-0 stream with an entropy image routing the left
    tile to one code group and the right tile to another."""
    import struct

    from deltalake2db_spark.operators import webp as W

    w, h, mbits = 8, 4, 2
    bw = W._LSBWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix present
    bw.write(mbits - 2, 3)
    ent = np.array([[0xFF000000, 0xFF000100]], dtype=np.uint32)
    W._encode_subimage(bw, ent)
    A = (255, 10, 20, 30)
    B = (255, 40, 50, 60)
    groups = []
    for (a, r, g, b) in (A, B):
        gl = W._fixed_lengths(280, {g})
        rl = W._fixed_lengths(256, {r})
        bl = W._fixed_lengths(256, {b})
        al = W._fixed_lengths(256, {a})
        dl = W._fixed_lengths(40, {0})
        for lengths in (gl, rl, bl, al, dl):
            W._write_code_lengths(bw, lengths)
        groups.append((
            W._Enc(bw, gl), W._Enc(bw, rl), W._Enc(bw, bl), W._Enc(bw, al)
        ))
    for y in range(h):
        for x in range(w):
            gi = 0 if (x >> mbits) == 0 else 1
            a, r, g, b = A if gi == 0 else B
            ge, re_, be, ae = groups[gi]
            ge.emit(g)
            re_.emit(r)
            be.emit(b)
            ae.emit(a)
    data = bw.tobytes()
    vp8l = (
        b"VP8L" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    payload = (
        b"RIFF" + struct.pack("<I", len(b"WEBP" + vp8l)) + b"WEBP" + vp8l
    )
    dec = W.decode_webp_lossless(payload)
    assert dec is not None and dec.shape == (4, 8, 3)
    assert (dec[:, :4] == [10, 20, 30]).all()
    assert (dec[:, 4:] == [40, 50, 60]).all()
