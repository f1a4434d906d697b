"""Baseline-TIFF codec tests: both byte orders, strip layouts,
PackBits, photometric inversion, dispatch, fuzz."""

from __future__ import annotations

import struct

import numpy as np

from deltalake2db_spark.operators.tiff import decode_tiff, encode_tiff


def test_roundtrip_matrix():
    rng = np.random.RandomState(5)
    for spp in (1, 3, 4):
        for be in (False, True):
            for pb in (False, True):
                for rps in (None, 5):
                    a = rng.randint(0, 256, (23, 17, spp)).astype(
                        np.uint8
                    )
                    got = decode_tiff(encode_tiff(
                        a, big_endian=be, packbits=pb,
                        rows_per_strip=rps,
                    ))
                    assert got is not None
                    assert np.array_equal(got, a), (spp, be, pb, rps)


def test_packbits_compresses_and_min_is_white():
    flat = np.zeros((40, 40), np.uint8)
    flat[10:20, :] = 200
    p = encode_tiff(flat, packbits=True, rows_per_strip=8)
    assert len(p) < 600  # runs actually compress
    assert np.array_equal(decode_tiff(p)[:, :, 0], flat)
    # photometric 0 (MinIsWhite) inverts
    buf = bytearray(encode_tiff(flat))
    n = struct.unpack_from("<H", buf, 8)[0]
    for k in range(n):
        off = 10 + 12 * k
        if struct.unpack_from("<H", buf, off)[0] == 262:
            struct.pack_into("<H", buf, off + 8, 0)
    assert np.array_equal(decode_tiff(bytes(buf))[:, :, 0], 255 - flat)


def test_unsupported_variants_fail_to_none():
    a = np.zeros((4, 4), np.uint8)
    buf = bytearray(encode_tiff(a))
    n = struct.unpack_from("<H", buf, 8)[0]
    for k in range(n):
        off = 10 + 12 * k
        if struct.unpack_from("<H", buf, off)[0] == 259:
            struct.pack_into("<H", buf, off + 8, 5)  # LZW
    assert decode_tiff(bytes(buf)) is None
    assert decode_tiff(b"II+\x00rest") is None  # BigTIFF
    assert decode_tiff(b"") is None and decode_tiff(None) is None


def test_dispatch_and_fuzz():
    from deltalake2db_spark.operators.multimodal import (
        decode_image_array,
    )

    rng = np.random.RandomState(6)
    a = rng.randint(0, 256, (12, 9, 3)).astype(np.uint8)
    assert np.array_equal(decode_image_array(encode_tiff(a)), a)
    valid = encode_tiff(a, packbits=True)
    for i in range(300):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = decode_tiff(bytes(buf))
        assert out is None or out.dtype == np.uint8
