"""SVG — dimensions, element census, and text extraction.

SVG is the one image format on the web that is TEXT, so a crawl
pipeline treats it as both: dimensions/complexity for the media
screens, embedded ``<text>`` content for the text pipeline.  Parsing
is stdlib ElementTree (namespace-agnostic localnames; expat's
billion-laughs amplification protection applies on this Python), with
a size cap ahead of the parse.

* ``parse_svg(payload)``: ``{width, height, viewbox_w, viewbox_h,
  n_elements, text}`` — width/height parse their leading float
  (units stripped, ``%`` yields None), falling back to the viewBox;
  ``n_elements`` counts drawable elements (path/rect/circle/ellipse/
  line/polyline/polygon/image/use/text); ``text`` joins ``<text>``/
  ``<tspan>`` runs.
* ``svg_meta_stats(df)``: map-side ``mapInPandas`` tier.

Reference scope: no media tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_MAX_BYTES = 10 << 20

_DRAWABLE = {
    "path", "rect", "circle", "ellipse", "line", "polyline",
    "polygon", "image", "use", "text",
}

_NUM_RE = re.compile(r"^\s*([+-]?\d*\.?\d+(?:[eE][+-]?\d+)?)")


def _local(tag) -> str:
    return str(tag).rsplit("}", 1)[-1].lower()


def _dim(value) -> Optional[float]:
    if value is None:
        return None
    s = str(value).strip()
    if s.endswith("%"):
        return None
    m = _NUM_RE.match(s)
    return float(m.group(1)) if m else None


def parse_svg(payload) -> Optional[dict]:
    import xml.etree.ElementTree as ET

    if payload is None:
        return None
    data = (
        payload.encode("utf-8", "replace")
        if isinstance(payload, str)
        else bytes(payload)
    )
    if len(data) > _MAX_BYTES:
        return None
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return None
    if _local(root.tag) != "svg":
        return None
    width = _dim(root.get("width"))
    height = _dim(root.get("height"))
    vb_w = vb_h = None
    vb = root.get("viewBox") or root.get("viewbox")
    if vb:
        parts = vb.replace(",", " ").split()
        if len(parts) == 4:
            try:
                vb_w, vb_h = float(parts[2]), float(parts[3])
            except ValueError:
                pass
    if width is None:
        width = vb_w
    if height is None:
        height = vb_h
    n_elements = 0
    texts = []
    for node in root.iter():
        name = _local(node.tag)
        if name in _DRAWABLE:
            n_elements += 1
        if name in ("text", "tspan") and node.text and node.text.strip():
            texts.append(node.text.strip())
    return {
        "width": width, "height": height,
        "viewbox_w": vb_w, "viewbox_h": vb_h,
        "n_elements": n_elements, "text": " ".join(texts),
    }


def svg_meta_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, width, height, n_elements, text) per parseable SVG row,
    map-side; non-SVG rows skip fail-open."""
    out_schema = (
        f"{id_col} long, width double, height double, "
        "n_elements int, text string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                meta = parse_svg(payload)
                if meta is None:
                    continue
                rows.append((
                    int(rid), meta["width"], meta["height"],
                    meta["n_elements"], meta["text"],
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_elements",
                         "text"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=(id_col, payload_col))
