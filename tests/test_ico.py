"""ICO/favicon container tests."""

from __future__ import annotations

import numpy as np


def test_ico_roundtrips_and_masks():
    """ICO container: 32-bpp DIB and PNG entries round-trip exactly;
    a hand-built 24-bpp entry applies the AND mask as alpha; fuzz
    never crashes."""
    import struct

    from deltalake2db_spark.operators import ico as I

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (16, 16, 4)).astype(np.uint8),
            rng.randint(0, 256, (33, 20, 4)).astype(np.uint8)]
    for as_png in (False, True):
        got = I.parse_ico(I.encode_ico(imgs, as_png=as_png))
        assert len(got) == 2
        for g, src in zip(got, imgs):
            assert g["is_png"] == as_png
            assert np.array_equal(g["image"], src)
    # hand-built 24bpp + AND mask
    w, h = 4, 2
    rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    bgr = rgb[..., ::-1][::-1]
    xor_stride = ((24 * w + 31) // 32) * 4
    xor = np.zeros((h, xor_stride), np.uint8)
    xor[:, : w * 3] = bgr.reshape(h, w * 3)
    anm = np.zeros((h, 4), np.uint8)
    anm[0, 0] = 0b10000000
    hdr = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0,
                      0, 0, 0, 0, 0)
    data = hdr + xor.tobytes() + anm.tobytes()
    payload = (struct.pack("<HHH", 0, 1, 1)
               + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 24,
                             len(data), 22) + data)
    g = I.parse_ico(payload)[0]
    assert np.array_equal(g["image"][..., :3], rgb)
    assert g["image"][1, 0, 3] == 0 and g["image"][0, 0, 3] == 255
    # malformed inputs
    assert I.parse_ico(b"") is None
    assert I.parse_ico(b"\x00\x00\x02\x00\x01\x00") is None  # cursor
    valid = I.encode_ico(imgs)
    for i in range(150):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = I.parse_ico(bytes(buf))
        assert out is None or isinstance(out, list)
