"""A/B: chained mapInPandas kernels (synth -> decode as TWO Python
stages) vs the FUSED single-kernel composition, measured in one warm
session with clearCache + driver GC between samples (the r15 A/B
protocol).  This is the measurement behind the r16 kernel-fusion
change (guide §4.1/§4.2: every Python stage pays a JVM->worker->JVM
Arrow round trip of all payload bytes plus a per-stage setup floor;
composing adjacent kernels inside ONE mapInPandas removes the
intermediate round trip entirely).

Usage: python tools/ab_fusion.py [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

from deltalake2db_spark import get_spark  # noqa: E402


def timed(df, spark):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_fusion")
    from deltalake2db_spark.operators import multimodal as M
    from deltalake2db_spark.operators import pdf as P

    # --- pair 1: make_real_media(bmp) -> extract_image_features
    def synth_gen(fmt="bmp", n=100, width=16, height=12):
        # mirror make_real_media's kernel without importing private state
        import numpy as np

        y, x, c = __import__("numpy").meshgrid(
            np.arange(height), np.arange(width), np.arange(3),
            indexing="ij",
        )
        base = (x + y + c).astype("int64")
        enc = M.encode_bmp

        def gen(it):
            for pdf in it:
                rows = []
                for i in pdf["id"]:
                    arr = ((base + int(i)) % 256).astype("uint8")
                    rows.append((
                        int(i), "image", enc(arr),
                        {"mime": "image/bmp", "width": width,
                         "height": height, "duration_ms": None},
                    ))
                yield pd.DataFrame(
                    rows, columns=["media_id", "kind", "payload", "meta"]
                )

        return gen

    def feats_gen():
        def batches(it):
            for pdf in it:
                rows = []
                for mid, kind, payload, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"],
                    pdf["meta"],
                ):
                    if kind != "image":
                        continue
                    w = meta["width"] if meta is not None else None
                    h = meta["height"] if meta is not None else None
                    feat = M._decode_image(payload, w, h)
                    if feat is not None:
                        rows.append(
                            (mid, float(feat[0]), float(feat[1]),
                             int(feat[2]))
                        )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "mean_px", "fill_ratio",
                             "n_px"],
                )

        return batches

    g1, g2 = synth_gen(), feats_gen()
    feat_schema = (
        "media_id long, mean_px double, fill_ratio double, n_px long"
    )
    chained = (
        spark.range(100)
        .mapInPandas(g1, schema=M.MEDIA_SCHEMA)
        .select("media_id", "kind", "payload", "meta")
        .mapInPandas(g2, schema=feat_schema)
    )
    fused = spark.range(100).mapInPandas(
        lambda it: g2(g1(it)), schema=feat_schema
    )
    a = sorted(map(tuple, chained.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b, "fusion changed rows!"

    # --- pair 2: pdf typeset -> extract_pdf_pages over sf0.1 documents
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    from pyspark.sql import functions as F

    from deltalake2db_spark.operators.parallel import spread_scan

    docs = spread_scan(
        docs.filter(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        ).select("doc_id", "text"),
        chain_depth=2,
    )

    def pdf_gen(it):
        for pdf in it:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                words = str(text).split()
                pages = []
                for p0 in range(0, len(words), 12):
                    pw = words[p0 : p0 + 12]
                    lines = [
                        " ".join(pw[k : k + 4])
                        for k in range(0, len(pw), 4)
                    ]
                    pages.append("\n".join(lines))
                rows.append((int(did), P.encode_pdf(pages)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    def pdf_parse(it):
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                res = P.extract_pdf_text(bytes(payload))
                if res is None:
                    continue
                for k, ptext in enumerate(res["pages"]):
                    rows.append((
                        int(mid), k, res["n_pages"],
                        ptext.count("\n") + 1 if ptext else 0, ptext,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "page_idx", "n_pages", "n_lines",
                         "text"],
            )

    pdf_schema = (
        "media_id long, page_idx int, n_pages int, n_lines int, "
        "text string"
    )
    chained_pdf = (
        docs.mapInPandas(pdf_gen, schema="media_id long, payload binary")
        .select("media_id", "payload")
        .mapInPandas(pdf_parse, schema=pdf_schema)
    )
    fused_pdf = docs.mapInPandas(
        lambda it: pdf_parse(pdf_gen(it)), schema=pdf_schema
    )
    assert chained_pdf.count() == fused_pdf.count()

    results: dict[str, list[float]] = {
        "img_chained": [], "img_fused": [],
        "pdf_chained": [], "pdf_fused": [],
    }
    for _ in range(rounds):
        results["img_chained"].append(timed(chained, spark))
        results["img_fused"].append(timed(fused, spark))
        results["pdf_chained"].append(timed(chained_pdf, spark))
        results["pdf_fused"].append(timed(fused_pdf, spark))
    for k, v in results.items():
        v = sorted(v)
        print(f"{k}: min {v[0]:.3f} med {v[len(v)//2]:.3f} all "
              + "/".join(f"{x:.2f}" for x in v))


if __name__ == "__main__":
    main()
