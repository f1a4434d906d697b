"""Subtitles — SRT and WebVTT cue parsing, map-side.

Video+caption pairs are a staple multimodal training source, and the
captions arrive as SubRip (.srt) or WebVTT (.vtt).  Both parse with
the same cue model: ``(cue_idx, start_ms, end_ms, text)`` — SRT uses
comma-decimal timestamps and numeric cue ids; VTT uses dot-decimal
timestamps, an optional ``WEBVTT`` header block, optional cue ids,
cue settings after the arrow, NOTE/STYLE blocks, and inline markup
tags (stripped here, the training-text convention).

Pure stdlib parsing inside ``mapInPandas`` — payload text never
crosses a shuffle; malformed cues are skipped fail-open (real
subtitle files are messy), a fully unparseable payload yields no
rows.

Reference scope: no ingestion tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_MAX_CUES = 100_000

_TS_RE = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_ARROW_RE = re.compile(
    r"^\s*(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})\s*-->\s*"
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_TAG_RE = re.compile(r"<[^>\n]*>")


def _ts_ms(h, m, s, ms) -> int:
    return (
        (int(h) if h else 0) * 3600_000
        + int(m) * 60_000 + int(s) * 1000 + int(ms)
    )


def parse_subtitles(text) -> Optional[list]:
    """Parse SRT or WebVTT: ``[{cue_idx, start_ms, end_ms, text}]``
    in file order (cue_idx is the 0-based position, not SRT's
    unreliable numbering).  None when the payload contains no
    parseable cue at all."""
    if text is None:
        return None
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", "replace")
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    cues = []
    i = 0
    n = len(lines)
    in_note = False
    while i < n and len(cues) < _MAX_CUES:
        line = lines[i]
        stripped = line.strip()
        if in_note:
            if stripped == "":
                in_note = False
            i += 1
            continue
        if stripped.startswith(("NOTE", "STYLE", "REGION")) and (
            "-->" not in stripped
        ):
            in_note = True
            i += 1
            continue
        m = _ARROW_RE.match(line)
        if not m:
            i += 1
            continue
        start = _ts_ms(*m.groups()[:4])
        end = _ts_ms(*m.groups()[4:])
        i += 1
        body = []
        while i < n and lines[i].strip() != "":
            body.append(_TAG_RE.sub("", lines[i]).strip())
            i += 1
        if end > start and body:
            cues.append({
                "cue_idx": len(cues), "start_ms": start,
                "end_ms": end, "text": "\n".join(body),
            })
    return cues or None


def encode_srt(cues: list) -> str:
    """Fixture writer: ``cues`` is ``[(start_ms, end_ms, text)]``."""
    def ts(ms):
        h, rem = divmod(ms, 3600_000)
        m, rem = divmod(rem, 60_000)
        s, ms = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"

    out = []
    for k, (a, b, t) in enumerate(cues):
        out.append(f"{k + 1}\n{ts(a)} --> {ts(b)}\n{t}\n")
    return "\n".join(out)


def encode_vtt(cues: list) -> str:
    """Fixture writer (WebVTT): dot decimals + header + a NOTE."""
    def ts(ms):
        h, rem = divmod(ms, 3600_000)
        m, rem = divmod(rem, 60_000)
        s, ms = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"

    out = ["WEBVTT", "", "NOTE generated fixture", ""]
    for k, (a, b, t) in enumerate(cues):
        out.append(f"{ts(a)} --> {ts(b)} align:start")
        out.append(t)
        out.append("")
    return "\n".join(out)


def subtitle_cues(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, cue_idx, start_ms, end_ms, duration_ms, text) — one row
    per cue, parsed map-side; unparseable rows skip fail-open."""
    out_schema = (
        f"{id_col} long, cue_idx int, start_ms long, end_ms long, "
        "duration_ms long, text string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                cues = parse_subtitles(payload)
                if cues is None:
                    continue
                for cue in cues:
                    rows.append((
                        int(rid), cue["cue_idx"], cue["start_ms"],
                        cue["end_ms"],
                        cue["end_ms"] - cue["start_ms"], cue["text"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "cue_idx", "start_ms", "end_ms",
                         "duration_ms", "text"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=(id_col, payload_col))
