"""SRT / WebVTT subtitle parsing tests."""

from __future__ import annotations

import numpy as np
import pytest

from deltalake2db_spark.operators.subtitles import (
    encode_srt,
    encode_vtt,
    parse_subtitles,
    subtitle_cues,
)

CUES = [
    (1000, 4000, "Hello world"),
    (4500, 8000, "Line one\nLine two"),
    (3661_500, 3665_000, "past the hour mark"),
]


def test_srt_and_vtt_roundtrip():
    for enc in (encode_srt, encode_vtt):
        got = parse_subtitles(enc(CUES))
        assert got is not None and len(got) == 3
        for g, (a, b, t) in zip(got, CUES):
            assert (g["start_ms"], g["end_ms"], g["text"]) == (a, b, t)


def test_vtt_blocks_tags_settings_and_bad_cues():
    vtt = (
        "WEBVTT\n\nNOTE a comment\nthat spans lines\n\n"
        "cue-1\n00:01.000 --> 00:02.500 position:10%\n"
        "<v Roger>Hi <b>there</b></v>\n\n"
        "00:03.000 --> 00:02.000\ninverted times dropped\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "00:05.000 --> 00:06.000\nlast cue\n"
    )
    got = parse_subtitles(vtt)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in got] == [
        (1000, 2500, "Hi there"), (5000, 6000, "last cue"),
    ]
    assert [c["cue_idx"] for c in got] == [0, 1]


def test_edge_inputs():
    assert parse_subtitles(None) is None
    assert parse_subtitles("") is None
    assert parse_subtitles("no cues at all") is None
    got = parse_subtitles(
        b"1\n00:00:01,000 --> 00:00:02,000\nbytes input\n"
    )
    assert got[0]["text"] == "bytes input"
    # fuzz: random mutations never crash
    rng = np.random.RandomState(1)
    valid = encode_srt(CUES).encode()
    for i in range(150):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = parse_subtitles(bytes(buf))
        assert out is None or isinstance(out, list)


def test_subtitle_cues_spark(spark):
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                cues = [(k * 2000, k * 2000 + 1500,
                         f"doc {i} cue {k}") for k in range(3)]
                enc = encode_srt if i % 2 == 0 else encode_vtt
                rows.append((i, enc(cues).encode()))
            rows.append((99, b"not subtitles"))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    df = spark.range(4).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
    rows = subtitle_cues(df).orderBy("media_id", "cue_idx").collect()
    assert len(rows) == 12
    assert rows[0].text == "doc 0 cue 0"
    assert rows[1].duration_ms == 1500
