"""WebM (Matroska/EBML) container support — pure struct parsing.

The WebM container (public Matroska/EBML spec + the WebM project's
doctype restriction) is where web-crawled VP8/VP9 video actually
lives.  This module gives the training-data pipeline the same three
layers MP4 already has:

* ``webm_metadata``: doctype, timestamp scale, duration, per-track
  (number, type, codec id, dimensions) — the curation-filter layer.
* ``webm_sample_table`` / frame sampling: every SimpleBlock's
  (track, pts_ms, keyframe, payload bytes) from the Clusters.
* frame PIXEL decode for ``V_VP8`` tracks via the pure-numpy VP8
  key-frame decoder (``operators/vp8.py``) — ``webm_frame_stats``.

``encode_webm_video`` is the fixture/gate partner (EBML writer:
header, Info, Tracks, one Cluster per frame batch, SimpleBlocks).

Scale shape: identical to the MP4 path — mapInPandas over the binary
column, map-side parse/decode, only small per-frame feature rows
leave the scan.  Reference scope: the reference engine has no media
support (SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# EBML element IDs (Matroska spec, with marker bits — matched raw)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_DOCTYPE = 0x4282

_MAX_ELEMENTS = 1 << 20  # adversarial-input guard: parse work bound


def _read_vint(buf: bytes, pos: int, keep_marker: bool):
    """EBML variable-size integer at ``pos`` -> (value, next_pos)."""
    if pos >= len(buf):
        raise ValueError("vint past end")
    b0 = buf[pos]
    if b0 == 0:
        raise ValueError("invalid vint")
    length = 1
    mask = 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
    if pos + length > len(buf):
        raise ValueError("vint truncated")
    v = b0 if keep_marker else (b0 & (mask - 1))
    for i in range(1, length):
        v = (v << 8) | buf[pos + i]
    return v, pos + length


def _walk(buf: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) inside [pos, end)."""
    count = 0
    while pos < end:
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size, pos = _read_vint(buf, pos, keep_marker=False)
        body_end = min(pos + size, end)
        yield eid, pos, body_end
        pos = body_end
        count += 1
        if count > _MAX_ELEMENTS:
            raise ValueError("element bound exceeded")


def _uint(buf: bytes, b: int, e: int) -> int:
    return int.from_bytes(buf[b:e], "big")


def parse_webm_meta(payload: bytes) -> Optional[dict]:
    """``{doctype, timescale_ns, duration_ms, tracks: [{number, type,
    codec, width, height}]}`` or None for non-EBML payloads."""
    if payload is None or len(payload) < 8 or payload[0] != 0x1A:
        return None
    try:
        out = {
            "doctype": None,
            "timescale_ns": 1_000_000,
            "duration_ms": None,
            "tracks": [],
        }
        duration_raw = None
        for eid, b, e in _walk(payload, 0, len(payload)):
            if eid == _EBML:
                for i2, b2, e2 in _walk(payload, b, e):
                    if i2 == _DOCTYPE:
                        out["doctype"] = payload[b2:e2].decode(
                            "ascii", "replace"
                        )
            elif eid == _SEGMENT:
                for i2, b2, e2 in _walk(payload, b, e):
                    if i2 == _INFO:
                        for i3, b3, e3 in _walk(payload, b2, e2):
                            if i3 == _TS_SCALE:
                                out["timescale_ns"] = _uint(
                                    payload, b3, e3
                                )
                            elif i3 == _DURATION:
                                import struct as _s

                                raw = payload[b3:e3]
                                if len(raw) in (4, 8):  # else: malformed
                                    duration_raw = _s.unpack(
                                        ">f" if len(raw) == 4 else ">d",
                                        raw,
                                    )[0]
                    elif i2 == _TRACKS:
                        for i3, b3, e3 in _walk(payload, b2, e2):
                            if i3 != _TRACK_ENTRY:
                                continue
                            tr = {
                                "number": None, "type": None,
                                "codec": None, "width": None,
                                "height": None,
                            }
                            for i4, b4, e4 in _walk(payload, b3, e3):
                                if i4 == _TRACK_NUM:
                                    tr["number"] = _uint(payload, b4, e4)
                                elif i4 == _TRACK_TYPE:
                                    tr["type"] = _uint(payload, b4, e4)
                                elif i4 == _CODEC_ID:
                                    tr["codec"] = payload[b4:e4].decode(
                                        "ascii", "replace"
                                    )
                                elif i4 == _VIDEO:
                                    for i5, b5, e5 in _walk(
                                        payload, b4, e4
                                    ):
                                        if i5 == _PIX_W:
                                            tr["width"] = _uint(
                                                payload, b5, e5
                                            )
                                        elif i5 == _PIX_H:
                                            tr["height"] = _uint(
                                                payload, b5, e5
                                            )
                            out["tracks"].append(tr)
        if out["doctype"] is None and not out["tracks"]:
            return None
        if duration_raw is not None:
            out["duration_ms"] = int(
                duration_raw * out["timescale_ns"] / 1_000_000
            )
        return out
    except (ValueError, IndexError):
        return None


def webm_sample_table(payload: bytes) -> Optional[list]:
    """Every SimpleBlock as ``(track, pts_ms, keyframe, offset,
    size)`` — offsets index the frame BYTES inside ``payload`` (the
    mdat-style slice contract ``mp4_sample_table`` has)."""
    if payload is None or len(payload) < 8 or payload[0] != 0x1A:
        return None
    try:
        scale = 1_000_000
        out = []
        for eid, b, e in _walk(payload, 0, len(payload)):
            if eid != _SEGMENT:
                continue
            for i2, b2, e2 in _walk(payload, b, e):
                if i2 == _INFO:
                    for i3, b3, e3 in _walk(payload, b2, e2):
                        if i3 == _TS_SCALE:
                            scale = _uint(payload, b3, e3)
                elif i2 == _CLUSTER:
                    cluster_ts = 0
                    for i3, b3, e3 in _walk(payload, b2, e2):
                        if i3 == _CLUSTER_TS:
                            cluster_ts = _uint(payload, b3, e3)
                        elif i3 == _SIMPLE_BLOCK:
                            track, p = _read_vint(
                                payload, b3, keep_marker=False
                            )
                            if p + 3 > e3:
                                continue
                            rel = int.from_bytes(
                                payload[p : p + 2], "big", signed=True
                            )
                            flags = payload[p + 2]
                            pts_ms = (
                                (cluster_ts + rel) * scale // 1_000_000
                            )
                            out.append((
                                track, pts_ms, bool(flags & 0x80),
                                p + 3, e3 - (p + 3),
                            ))
        return out or None
    except (ValueError, IndexError):
        return None


def webm_frame_stats(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """(media_id, frame_idx, pts_ms, keyframe, height, width, y_sum,
    u_sum, v_sum) for WebM rows whose video track is ``V_VP8``: every
    ``every_n``-th SimpleBlock of that track is decoded map-side by
    the pure-numpy VP8 key-frame decoder.  Non-VP8 codecs (V_VP9/AV1
    need libvpx/libaom) are skipped."""
    out_schema = (
        "media_id long, frame_idx int, pts_ms long, keyframe boolean, "
        "height int, width int, y_sum long, u_sum long, v_sum long"
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
                meta = parse_webm_meta(payload)
                if not meta:
                    continue
                vp8_tracks = {
                    t["number"]
                    for t in meta["tracks"]
                    if t.get("type") == 1 and t.get("codec") == "V_VP8"
                }
                if not vp8_tracks:
                    continue
                table = webm_sample_table(payload)
                if not table:
                    continue
                picked = [
                    s for s in table if s[0] in vp8_tracks
                ][::every_n]
                if max_frames is not None:
                    picked = picked[:max_frames]
                for j, (track, pts, key, off, size) in enumerate(picked):
                    planes = decode_vp8(payload[off : off + size])
                    if planes is None:
                        continue
                    y, u, v = planes
                    rows.append((
                        int(mid), j * every_n, int(pts), bool(key),
                        y.shape[0], y.shape[1],
                        int(y.sum(dtype=np.int64)),
                        int(u.sum(dtype=np.int64)),
                        int(v.sum(dtype=np.int64)),
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "pts_ms", "keyframe",
                         "height", "width", "y_sum", "u_sum", "v_sum"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )


# ------------------------------------------------------------- writer


def _vint_size(v: int) -> bytes:
    """Encode ``v`` as an EBML size vint (shortest form)."""
    for length in range(1, 9):
        if v < (1 << (7 * length)) - 1:
            marker = 1 << (7 * length)
            return (marker | v).to_bytes(length, "big")
    raise ValueError("size too large")


def _elem(eid: int, body: bytes) -> bytes:
    nid = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nid, "big") + _vint_size(len(body)) + body


def _uint_body(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def encode_webm_video(
    frames: list,
    width: int,
    height: int,
    frame_ms: int = 40,
    codec: str = "V_VP8",
) -> bytes:
    """Minimal conforming WebM: EBML header (webm doctype), Info
    (1 ms timestamp scale, duration), one video TrackEntry, one
    Cluster per frame with a keyframe SimpleBlock — the fixture/gate
    partner of the parser (``frames`` are raw VP8 payloads, e.g. from
    ``vp8.encode_vp8``)."""
    import struct as _s

    ebml = _elem(
        _EBML,
        _elem(0x4286, _uint_body(1))        # EBMLVersion
        + _elem(0x42F7, _uint_body(1))      # EBMLReadVersion
        + _elem(0x42F2, _uint_body(4))      # EBMLMaxIDLength
        + _elem(0x42F3, _uint_body(8))      # EBMLMaxSizeLength
        + _elem(_DOCTYPE, b"webm")
        + _elem(0x4287, _uint_body(2))      # DocTypeVersion
        + _elem(0x4285, _uint_body(2)),     # DocTypeReadVersion
    )
    dur = float(len(frames) * frame_ms)
    info = _elem(
        _INFO,
        _elem(_TS_SCALE, _uint_body(1_000_000))
        + _elem(_DURATION, _s.pack(">d", dur)),
    )
    video = _elem(
        _VIDEO,
        _elem(_PIX_W, _uint_body(width)) + _elem(_PIX_H, _uint_body(height)),
    )
    track = _elem(
        _TRACKS,
        _elem(
            _TRACK_ENTRY,
            _elem(_TRACK_NUM, _uint_body(1))
            + _elem(0x73C5, _uint_body(1))  # TrackUID
            + _elem(_TRACK_TYPE, _uint_body(1))
            + _elem(_CODEC_ID, codec.encode("ascii"))
            + video,
        ),
    )
    clusters = b""
    for k, f in enumerate(frames):
        sb = b"\x81" + (0).to_bytes(2, "big") + b"\x80" + bytes(f)
        clusters += _elem(
            _CLUSTER,
            _elem(_CLUSTER_TS, _uint_body(k * frame_ms))
            + _elem(_SIMPLE_BLOCK, sb),
        )
    segment = _elem(_SEGMENT, info + track + clusters)
    return ebml + segment
