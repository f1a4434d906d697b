"""Markdown flattening + sliding-window chunking tests."""

from __future__ import annotations

import pytest

from deltalake2db_spark.operators import markdown as MD
from deltalake2db_spark.operators.text import sliding_chunks


@pytest.fixture(scope="module")
def md_df(spark):
    md = (
        "# Title Here\n\n"
        "```python\npassword = SECRET\n```\n\n"
        "Intro **bold** and *ital* and `code` here.\n\n"
        "![logo](http://img) [click me](https://ex.com) and "
        "[ref link][1] end.\n\n"
        "- item one\n- item two\n1. numbered\n\n"
        "> quoted line\n\n---\n\n"
        '<div class="x">html gone</div> trailing words\n'
        "snake_case stays_here __dunder__ mid_word_underscores\n"
    )
    return spark.createDataFrame([(0, md)], ["doc_id", "text"])


def test_markdown_full_flatten(md_df):
    r = MD.extract_markdown(md_df).collect()[0]
    assert r.text == (
        "Title Here\n"
        "Intro bold and ital and code here.\n"
        "logo click me and ref link end.\n"
        "item one\nitem two\nnumbered\n"
        "quoted line\n"
        "html gone trailing words\n"
        "snake_case stays_here dunder mid_word_underscores"
    )
    assert r.n_md_lines == 9
    assert "SECRET" not in r.text


def test_markdown_keep_code(md_df):
    r = MD.extract_markdown(md_df, keep_code=True).collect()[0]
    assert "password = SECRET" in r.text
    assert "```" not in r.text and "python" not in r.text


def test_markdown_empty_and_crlf(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "# A\r\n\r\nB **c**\r\n")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in MD.extract_markdown(df).collect()}
    assert out[0].text == "" and out[0].n_md_lines == 0
    assert out[1].text == "A\nB c" and out[1].n_md_lines == 2


def test_sliding_chunks_windows(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, text), (1, "a b c"), (2, None), (3, "  ")],
        ["doc_id", "text"],
    )
    rows = sliding_chunks(
        df, chunk_words=4, stride_words=3
    ).orderBy("doc_id", "chunk_idx").collect()
    d0 = [r for r in rows if r.doc_id == 0]
    # n=10, w=4, s=3 -> starts 0,3,6 (1+ceil(6/3)=3)
    assert [r.start_word for r in d0] == [0, 3, 6]
    assert d0[0].chunk == "w0 w1 w2 w3"
    assert d0[1].chunk == "w3 w4 w5 w6"
    assert d0[2].chunk == "w6 w7 w8 w9"
    assert all(r.n_words == 4 for r in d0)
    d1 = [r for r in rows if r.doc_id == 1]
    assert len(d1) == 1 and d1[0].chunk == "a b c" and d1[0].n_words == 3
    assert not [r for r in rows if r.doc_id in (2, 3)]


def test_sliding_chunks_every_word_covered(spark):
    text = " ".join(f"t{i}" for i in range(53))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sliding_chunks(df, chunk_words=8, stride_words=5).collect()
    seen = set()
    for r in rows:
        for k, word in enumerate(r.chunk.split(" ")):
            assert word == f"t{r.start_word + k}"
            seen.add(r.start_word + k)
    assert seen == set(range(53))
    with pytest.raises(ValueError):
        sliding_chunks(df, chunk_words=0)


def test_fix_mojibake_cases(spark):
    from pyspark.sql import functions as F

    from deltalake2db_spark.operators.text import fix_mojibake

    def moj(s, enc):
        out = []
        for b in s.encode("utf-8"):
            try:
                out.append(bytes([b]).decode(enc))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    rows = [
        (0, moj("café résumé", "latin-1")),
        (1, moj("naïve – “quoted” … déjà", "cp1252")),
        (2, "déjà vu clean text"),
        (3, "plain ascii"),
        (4, "Ã is a letter on its own"),
        (5, moj("中文 mixed with ascii", "latin-1")),
        (6, ""),
        (7, "tâche fête São niño"),
        (8, moj("emoji 🎉 test", "latin-1")),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    out = {r.i: r.f for r in df.select(
        "i", fix_mojibake(F.col("t")).alias("f")
    ).collect()}
    assert out[0] == "café résumé"
    assert out[1] == "naïve – “quoted” … déjà"
    assert out[2] == "déjà vu clean text"      # real accents untouched
    assert out[3] == "plain ascii"
    assert out[4] == "Ã is a letter on its own"  # invalid recovery kept
    assert out[5] == "中文 mixed with ascii"
    assert out[6] == ""
    assert out[7] == "tâche fête São niño"     # â + ASCII: no marker
    assert out[8] == "emoji 🎉 test"
