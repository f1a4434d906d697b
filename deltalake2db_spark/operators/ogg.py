"""Ogg container — Vorbis/Opus identification headers + duration.

The audio metadata tier covers WAV (multimodal), FLAC, and MP3; Ogg
is the remaining common container for speech/music corpora.  This
parses the page structure (capture pattern, header-type flags,
granule positions, lacing) and the first packet's identification
header — Vorbis (``\\x01vorbis``: channels, sample rate) or Opus
(``OpusHead``: channels, pre-skip, input rate) — and derives the
duration from the LAST page's granule position (Vorbis granules are
PCM samples at the stream rate; Opus granules tick at 48 kHz minus
the pre-skip, per RFC 7845).

The writer emits spec-valid pages including the real Ogg CRC-32
(poly 0x04c11db7, unreflected, zero init/xorout); the parser is
deliberately CRC-lenient (metadata extraction over crawled bytes
must survive bit rot — the payload-level decoders are the strict
tier).

Reference scope: no media tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAX_PAGES = 100_000


def _crc_table() -> np.ndarray:
    tbl = np.zeros(256, np.uint32)
    for i in range(256):
        r = np.uint32(i << 24)
        for _ in range(8):
            r = np.uint32(
                ((r << np.uint32(1)) ^ np.uint32(0x04C11DB7))
                if (r & np.uint32(0x80000000))
                else (r << np.uint32(1))
            )
        tbl[i] = r
    return tbl


_CRC_TBL = _crc_table()


def ogg_crc(data: bytes) -> int:
    """Ogg's CRC-32: poly 0x04c11db7, no reflection, init/xorout 0."""
    crc = np.uint32(0)
    tbl = _CRC_TBL
    for b in data:
        crc = np.uint32(
            (crc << np.uint32(8))
            ^ tbl[((crc >> np.uint32(24)) ^ np.uint32(b)) & np.uint32(0xFF)]
        )
    return int(crc)


def parse_ogg_meta(payload: bytes) -> Optional[dict]:
    """{codec, channels, sample_rate, pre_skip, n_pages,
    duration_ms} — codec from the first packet's id header, duration
    from the last granule.  None for non-Ogg payloads."""
    if payload is None or len(payload) < 28 or payload[:4] != b"OggS":
        return None
    pos = 0
    n = len(payload)
    codec = None
    channels = None
    rate = None
    pre_skip = 0
    last_granule = None
    n_pages = 0
    first = True
    while pos + 27 <= n and n_pages < _MAX_PAGES:
        if payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
            break
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        nsegs = payload[pos + 26]
        seg_table = payload[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            break
        body_len = sum(seg_table)
        body = payload[pos + 27 + nsegs : pos + 27 + nsegs + body_len]
        if len(body) < body_len:
            break
        n_pages += 1
        if granule >= 0:
            last_granule = granule
        if first:
            first = False
            if body[:7] == b"\x01vorbis" and len(body) >= 30:
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack_from("<I", body, 12)[0]
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                pre_skip = struct.unpack_from("<H", body, 10)[0]
                rate = struct.unpack_from("<I", body, 12)[0]
        pos += 27 + nsegs + body_len
    if codec is None or n_pages == 0:
        return None
    duration_ms = None
    if last_granule is not None:
        if codec == "vorbis" and rate:
            duration_ms = last_granule * 1000 // rate
        elif codec == "opus":
            duration_ms = max(last_granule - pre_skip, 0) * 1000 // 48000
    return {
        "codec": codec, "channels": channels, "sample_rate": rate,
        "pre_skip": pre_skip, "n_pages": n_pages,
        "duration_ms": duration_ms,
    }


def _page(
    body: bytes, serial: int, seq: int, granule: int, htype: int
) -> bytes:
    segs = []
    rem = len(body)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    hdr = (
        b"OggS\x00" + bytes([htype])
        + struct.pack("<qIIi", granule, serial, seq, 0)
        + bytes([len(segs)]) + bytes(segs)
    )
    page = bytearray(hdr + body)
    crc = ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def encode_ogg_meta(
    codec: str, channels: int, sample_rate: int,
    n_samples: int, pre_skip: int = 312, serial: int = 1,
) -> bytes:
    """Fixture writer: a BOS page carrying the id header plus an EOS
    page whose granule encodes ``n_samples`` (Vorbis: at stream rate;
    Opus: 48 kHz ticks, pre-skip added per RFC 7845)."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<IiiiB", sample_rate, 0, 128000, 0, 0xB8)
            + b"\x01"
        )
        granule = n_samples
    elif codec == "opus":
        ident = (
            b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0)
        )
        granule = n_samples + pre_skip
    else:
        raise ValueError(codec)
    bos = _page(ident, serial, 0, 0, 0x02)
    eos = _page(b"\x00" * 16, serial, 1, granule, 0x04)
    return bos + eos


def ogg_meta_stats(df: DataFrame) -> DataFrame:
    """(media_id, codec, channels, sample_rate, n_pages,
    duration_ms) per parseable Ogg row, map-side."""
    out_schema = (
        "media_id long, codec string, channels int, "
        "sample_rate int, n_pages int, duration_ms long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                meta = parse_ogg_meta(bytes(payload))
                if meta is None:
                    continue
                rows.append((
                    int(mid), meta["codec"], meta["channels"],
                    meta["sample_rate"], meta["n_pages"],
                    meta["duration_ms"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "codec", "channels",
                         "sample_rate", "n_pages", "duration_ms"],
            )

    from .parallel import kernel_map

    return kernel_map(
        df, batches, out_schema, cols=("media_id", "kind", "payload")
    )
