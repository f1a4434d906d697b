"""Streaming dedup: exact cross-batch fingerprint dedup and the
incremental corpus-ingest loop (near-dup dedup in foreachBatch).

Reference parity note: bmsuisse/deltalake2db has no streaming surface;
this is the extension path composing its Delta-log machinery
(plans/meta.py derivatives) with Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deltalake2db_spark import scan_delta
from deltalake2db_spark.sources.delta_sink import write_delta
from deltalake2db_spark.sources.pyds import register
from deltalake2db_spark.streaming.dedup_stream import (
    fingerprint_dedup_stream,
    neardup_ingest_batch,
)

LSH = dict(n=2, num_hashes=32, bands=16, threshold=0.5)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _commit(spark, path, rows, first=False):
    write_delta(_docs(spark, rows), path, mode="error" if first else "append")


BASE = [
    (i, f"document number {i} talks about topic {i} in exactly nine words")
    for i in range(10)
]


def test_fingerprint_dedup_stream_drops_cross_batch_exact_dups(
    spark, tmp_path_factory
):
    t = str(tmp_path_factory.mktemp("sdedup") / "src")
    # commit 1: ids 0-4; commit 2: ids 5-9 where 7,8,9 repeat the TEXT
    # of 0,1,2 (different ids -> only the fingerprint can catch them).
    # Timestamps must sit ABOVE the initial watermark (epoch 0) or the
    # state store treats every row as late and drops it outright.
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    write_delta(
        _docs(spark, BASE[:5]).withColumn("ts", t0),
        t,
        mode="error",
    )
    dup_rows = BASE[5:8] + [(7 + k, BASE[k][1]) for k in range(3)]
    write_delta(
        _docs(spark, dup_rows).withColumn(
            "ts", t0 + F.expr("INTERVAL 1 SECOND")
        ),
        t,
        mode="append",
    )
    register(spark)
    reader = (
        spark.readStream.format("deltalake2db")
        .option("path", t)
        .option("startingVersion", 0)
        .option("maxFilesPerTrigger", 1)  # force one commit per batch
        .load()
    )
    deduped = fingerprint_dedup_stream(
        reader, key_cols=("text",), time_col="ts", delay="1 hour"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("s_fp_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM s_fp_dedup")
    # 5 (batch 1) + 3 novel texts in batch 2; 3 cross-batch text dups gone
    assert got.count() == 8
    texts = [r["text"] for r in got.collect()]
    assert len(set(texts)) == 8


def test_neardup_ingest_builds_clean_corpus(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sdedup2")
    src, corpus = str(root / "src"), str(root / "corpus")
    # commit 1 bootstraps: 10 base docs + 1 exact dup (id 10 = text of 0)
    # + 1 near-dup (id 11 = doc 1 minus its first word)
    near_1 = BASE[1][1].split(" ", 1)[1]
    _commit(spark, src, BASE + [(10, BASE[0][1]), (11, near_1)], first=True)
    # commit 2: near-dup of CORPUS doc 2 (cross-batch), one novel doc,
    # exact dup of corpus doc 3's text
    near_2 = BASE[2][1].split(" ", 1)[1]
    novel = "completely fresh content about an unrelated subject entirely"
    _commit(spark, src, [(20, near_2), (21, novel), (22, BASE[3][1])])
    register(spark)
    reader = (
        spark.readStream.format("deltalake2db")
        .option("path", src)
        .option("startingVersion", 0)
        .option("maxFilesPerTrigger", 1)
        .load()
    )
    q = (
        reader.writeStream.foreachBatch(
            neardup_ingest_batch(corpus, **LSH)
        )
        .option("checkpointLocation", str(root / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = scan_delta(spark, corpus)
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    # batch 1 admits the 10 base docs only (10 exact-dup, 11 near-dup
    # are intra-batch losers); batch 2 admits only the novel doc: 20 is
    # a near-dup of corpus doc 2, 22 an exact... near-dup of corpus doc
    # 3 (exact text match is jaccard 1.0, caught by the corpus check)
    assert ids == list(range(10)) + [21]
    # the corpus stayed exact-duplicate-free end to end
    n_texts = got.select("text").distinct().count()
    assert n_texts == len(ids)


def test_neardup_ingest_batch_is_idempotent_on_empty(spark, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("sdedup3") / "corpus")
    fn = neardup_ingest_batch(corpus, **LSH)
    fn(_docs(spark, []), 0)  # empty batch: no corpus created, no crash
    import os

    assert not os.path.exists(corpus)


def test_neardup_ingest_batch_replay_is_noop(spark, tmp_path_factory):
    """A retried micro-batch (same or lower batch_id) must not
    re-append: the txn (appId, batchId) marker committed with the data
    makes the replay a no-op, delta-spark streaming-sink style."""
    corpus = str(tmp_path_factory.mktemp("sdedup4") / "corpus")
    fn = neardup_ingest_batch(corpus, **LSH)
    fn(_docs(spark, BASE[:4]), 0)
    assert scan_delta(spark, corpus).count() == 4
    # exact replay of batch 0 — the LSH corpus check aside, the txn
    # guard alone must reject it
    fn(_docs(spark, BASE[:4]), 0)
    assert scan_delta(spark, corpus).count() == 4
    # distinct novel docs under an already-committed batch id: still a
    # no-op (at-least-once delivery only ever replays the same payload,
    # so skipping by id is safe and cheap)
    novel = [(90, "totally new words never seen before in this corpus")]
    fn(_docs(spark, novel), 0)
    assert scan_delta(spark, corpus).count() == 4
    # the next batch id lands normally
    fn(_docs(spark, novel), 1)
    assert scan_delta(spark, corpus).count() == 5


def test_streaming_quality_and_decontam_composition(spark, tmp_path_factory):
    """Map-side pipeline operators compose with Structured Streaming
    unchanged: a Delta doc stream flows through the gram-hash
    contamination screen (arrays_overlap against the broadcast bench
    gram set — pure codegen) and the quality text heuristics inside one
    readStream->transform->sink query.  No stateful machinery: per-row
    operators ARE the 100 TB streaming-ingest shape."""
    import pyspark.sql.functions as F  # noqa: F811

    from deltalake2db_spark.operators.contamination import word_ngram_hashes

    path = str(tmp_path_factory.mktemp("stream_pipe") / "tbl")
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "clean document with enough words to pass the gram screen"),
        (2, f"prefix {bench_text} suffix words"),         # contaminated
        (3, "another clean one that keeps different wording throughout"),
    ]
    _commit(spark, path, rows, first=True)

    bench_grams = [
        r[0]
        for r in spark.createDataFrame([(bench_text,)], ["text"])
        .select(F.explode(word_ngram_hashes(F.col("text"), 6)))
        .collect()
    ]
    register(spark)
    stream = (
        spark.readStream.format("deltalake2db")
        .option("path", path)
        .option("startingVersion", 0)
        .load()
    )
    out = (
        stream.withColumn("__g", word_ngram_hashes(F.col("text"), 6))
        .withColumn(
            "contaminated",
            F.arrays_overlap(
                "__g", F.lit(bench_grams).cast("array<bigint>")
            ),
        )
        .withColumn("n_words", F.size(F.split(F.trim("text"), "\\s+")))
        .select("doc_id", "contaminated", "n_words")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pipe_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: r
            for r in spark.sql("select * from pipe_sink").collect()
        }
    finally:
        q.stop()
    assert set(got) == {1, 2, 3}
    assert got[2]["contaminated"] and not got[1]["contaminated"]
    assert not got[3]["contaminated"]
    assert all(r["n_words"] >= 8 for r in got.values())
