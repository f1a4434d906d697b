"""SVG metadata/text extraction tests."""

from __future__ import annotations

import numpy as np

from deltalake2db_spark.operators.svg import parse_svg


def test_dims_census_text():
    svg = (
        '<svg xmlns="http://www.w3.org/2000/svg" width="120.5px" '
        'height="80" viewBox="0 0 241 160">'
        '<rect x="0" y="0" width="10" height="10"/>'
        '<g><circle cx="5" cy="5" r="2"/><path d="M0 0L1 1"/></g>'
        '<text x="1" y="1">hello <tspan>world</tspan></text></svg>'
    )
    m = parse_svg(svg)
    assert (m["width"], m["height"]) == (120.5, 80.0)
    assert (m["viewbox_w"], m["viewbox_h"]) == (241.0, 160.0)
    assert m["n_elements"] == 4  # rect, circle, path, text
    assert m["text"] == "hello world"


def test_percent_falls_back_to_viewbox():
    m = parse_svg('<svg width="100%" viewBox="0 0 32 16"><rect/></svg>')
    assert (m["width"], m["height"]) == (32.0, 16.0)


def test_rejections_and_fuzz():
    assert parse_svg("<html></html>") is None
    assert parse_svg("not xml") is None
    assert parse_svg(None) is None
    assert parse_svg(b"<svg><text>bytes</text></svg>")["text"] == "bytes"
    rng = np.random.RandomState(3)
    valid = (
        '<svg width="10" height="10"><rect/><text>t</text></svg>'
    ).encode()
    for i in range(150):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 5)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = parse_svg(bytes(buf))
        assert out is None or isinstance(out["n_elements"], int)
