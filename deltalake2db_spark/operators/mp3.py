"""MP3 metadata over binary columns — ID3v2 tags + MPEG frame headers.

MP3 is the long tail of crawled audio; curation filters on its
METADATA (title/artist tags, bitrate, sample rate, duration) long
before anything is decoded.  This module parses exactly that layer
with ``struct`` only: the ID3v2.3/2.4 tag (syncsafe sizes, text
frames with encoding bytes) and the MPEG-1/2 Layer III frame headers
(bitrate/sample-rate tables, padding, frame walk) for an exact frame
count and duration.  Audio DECODE stays honestly out of scope (MDCT
synthesis needs a DSP library); the metadata layer is what the
pipeline filters on.  ``encode_mp3_meta`` writes conforming fixtures:
a real ID3v2.3 tag followed by valid CBR frame headers.

Reference scope: no media support in the reference engine
(SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

# MPEG-1 Layer III tables (ISO 11172-3)
_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  160, 192, 224, 256, 320, 0]
_RATES_V1 = [44100, 48000, 32000, 0]
_SAMPLES_V1L3 = 1152

_MAX_FRAMES = 1 << 22


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def parse_mp3_meta(payload: bytes) -> Optional[dict]:
    """``{title, artist, album, bitrate_kbps, sample_rate, n_frames,
    duration_ms}`` from ID3v2 + the MPEG frame-header walk, or None
    for non-MP3 payloads.  ``bitrate_kbps`` is the FIRST frame's
    (CBR assumption; VBR averages need the whole walk anyway, which
    n_frames/duration already do)."""
    if payload is None or len(payload) < 10:
        return None
    out = {"title": None, "artist": None, "album": None,
           "bitrate_kbps": None, "sample_rate": None,
           "n_frames": 0, "duration_ms": None}
    pos = 0
    try:
        if payload[:3] == b"ID3":
            ver = payload[3]
            size = _syncsafe(payload[6:10])
            tag_end = 10 + size
            p = 10
            while p + 10 <= min(tag_end, len(payload)):
                fid = payload[p : p + 4]
                if fid == b"\x00\x00\x00\x00":
                    break
                fsz = (
                    _syncsafe(payload[p + 4 : p + 8])
                    if ver >= 4
                    else int.from_bytes(payload[p + 4 : p + 8], "big")
                )
                body = payload[p + 10 : p + 10 + fsz]
                if fid in (b"TIT2", b"TPE1", b"TALB") and body:
                    enc = body[0]
                    txt = body[1:]
                    if enc == 0:
                        s = txt.decode("latin-1", "replace")
                    elif enc == 1:
                        s = txt.decode("utf-16", "replace")
                    elif enc == 3:
                        s = txt.decode("utf-8", "replace")
                    else:
                        s = txt.decode("utf-16-be", "replace")
                    s = s.rstrip("\x00")
                    key = {b"TIT2": "title", b"TPE1": "artist",
                           b"TALB": "album"}[fid]
                    out[key] = s
                p += 10 + fsz
            pos = tag_end
        # MPEG frame walk
        n = len(payload)
        frames = 0
        first_br = first_sr = None
        while pos + 4 <= n and frames < _MAX_FRAMES:
            h = payload[pos : pos + 4]
            if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
                break
            version = (h[1] >> 3) & 0x3  # 3 = MPEG1
            layer = (h[1] >> 1) & 0x3    # 1 = Layer III
            if version != 3 or layer != 1:
                break
            br = _BITRATES_V1L3[(h[2] >> 4) & 0xF]
            sr = _RATES_V1[(h[2] >> 2) & 0x3]
            pad = (h[2] >> 1) & 0x1
            if not br or not sr:
                break
            fsz = 144 * br * 1000 // sr + pad
            if first_br is None:
                first_br, first_sr = br, sr
            frames += 1
            pos += fsz
        if frames == 0 and out["title"] is None:
            return None
        out["n_frames"] = frames
        if first_br:
            out["bitrate_kbps"] = first_br
            out["sample_rate"] = first_sr
            out["duration_ms"] = frames * _SAMPLES_V1L3 * 1000 // first_sr
        return out
    except (IndexError, struct.error, ValueError):
        return None


def encode_mp3_meta(
    title: str,
    artist: str,
    album: str,
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
) -> bytes:
    """ID3v2.3 tag + ``n_frames`` valid CBR MPEG-1 Layer III frame
    HEADERS with zero-filled payloads — the fixture partner of
    ``parse_mp3_meta`` (no DSP anywhere)."""
    def t_frame(fid: bytes, text: str) -> bytes:
        body = b"\x00" + text.encode("latin-1", "replace")
        return fid + struct.pack(">I", len(body)) + b"\x00\x00" + body

    frames = (
        t_frame(b"TIT2", title)
        + t_frame(b"TPE1", artist)
        + t_frame(b"TALB", album)
    )
    sz = len(frames)
    tag = b"ID3\x03\x00\x00" + bytes([
        (sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F
    ]) + frames

    bi = _BITRATES_V1L3.index(bitrate_kbps)
    si = _RATES_V1.index(sample_rate)
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,      # MPEG1, Layer III, no CRC
        (bi << 4) | (si << 2) | (0 << 1),    # no padding
        0x00,
    ])
    fsz = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + bytes(fsz - 4)
    return tag + frame * n_frames


def mp3_meta_stats(df: DataFrame) -> DataFrame:
    """(media_id, title, artist, album, bitrate_kbps, sample_rate,
    n_frames, duration_ms) for MP3 audio rows, map-side."""
    out_schema = (
        "media_id long, title string, artist string, album string, "
        "bitrate_kbps int, sample_rate int, n_frames int, "
        "duration_ms long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                m = parse_mp3_meta(bytes(payload))
                if m is None:
                    continue
                rows.append((
                    int(mid), m["title"], m["artist"], m["album"],
                    m["bitrate_kbps"], m["sample_rate"],
                    m["n_frames"], m["duration_ms"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "title", "artist", "album",
                         "bitrate_kbps", "sample_rate", "n_frames",
                         "duration_ms"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )
