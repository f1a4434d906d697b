"""Payload-count scaling draws for the media/ingestion kernels
(SCALE.md evidence; r11 verdict task carried to r13).

The media gates synthesize a FIXED payload count (their oracles
replay a fixed law), so the per-sf scaling_curve tool cannot stretch
them.  This tool re-runs the same operator pipelines with the payload
count swept 1x -> 10x -> 100x and reports wall-clock growth per 10x
step.  The kernels are mapInPandas map-side work: the expected curve
is ~10x cost per 10x payloads once clear of the scheduling floor
(linear, embarrassingly parallel — the 100 TB shape), with NO
driver-side involvement (the only action is count()).

Usage::

    python tools/media_scaling.py [video|webp|warc ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _video(spark, n):
    import pandas as _pd

    from deltalake2db_spark.operators import multimodal as M

    def gen(it):
        import numpy as _np

        from deltalake2db_spark.operators.vp8 import encode_vp8

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                frames = []
                for k in range(8):
                    y = _np.full((16, 16), (i + 29 * k) % 256, _np.uint8)
                    u = _np.full((8, 8), (2 * i + 13 * k) % 256, _np.uint8)
                    v = _np.full((8, 8), (3 * i + 5 * k) % 256, _np.uint8)
                    frames.append(encode_vp8(y, u, v, qi=0))
                rows.append((
                    i, "video",
                    M.encode_mp4_video(frames, 16, 16, frame_ms=33,
                                       codec=b"vp08"),
                    {"mime": "video/mp4", "width": 16, "height": 16,
                     "duration_ms": 264},
                ))
            yield _pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = spark.range(n).repartition(32).mapInPandas(
        gen, schema=M.MEDIA_SCHEMA
    )
    return M.decode_video_frames(media, every_n=2)


def _webp(spark, n):
    from deltalake2db_spark.operators import multimodal as M

    media = M.make_real_media(spark, n, width=32, height=32, fmt="vp8")
    return M.webp_lossy_plane_sums(media)


def _warc(spark, n):
    import pandas as _pd

    from deltalake2db_spark.operators import multimodal as M
    from deltalake2db_spark.operators import warc as W

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                recs = [
                    ("warcinfo", "urn:warcinfo", "2024-02-01T00:00:00Z",
                     None, "application/warc-fields", b"software: g\r\n"),
                    ("request", f"http://ex{i}.test/0",
                     "2024-02-01T00:00:00Z", None,
                     "application/http; msgtype=request",
                     b"GET / HTTP/1.1\r\n\r\n"),
                ]
                for k in range(4):
                    recs.append((
                        "response", f"http://ex{i}.test/{k}",
                        f"2024-02-01T00:00:{k:02d}Z",
                        200 if k % 2 == 0 else 301,
                        "text/plain" if k % 2 == 0 else "text/html",
                        f"doc {i} rec {k} " + "x" * (10 + (i + k) % 20),
                    ))
                rows.append((
                    i, "document", W.encode_warc(recs, gzip_members=True),
                    {"mime": "application/warc", "width": None,
                     "height": None, "duration_ms": None},
                ))
            yield _pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    media = spark.range(n).repartition(32).mapInPandas(
        gen, schema=M.MEDIA_SCHEMA
    )
    return W.warc_records(media)


BUILDERS = {
    # name -> (builder, 1x payload count — the gate's own count)
    "video": (_video, 50),
    "webp": (_webp, 100),
    "warc": (_warc, 60),
}


def main() -> None:
    from deltalake2db_spark import get_spark

    names = sys.argv[1:] or list(BUILDERS)
    spark = get_spark("media_scaling")
    for name in names:
        build, base = BUILDERS[name]
        # steady-state: warm the 1x shape first
        build(spark, base).count()
        times = []
        for mult in (1, 10, 100):
            n = base * mult
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                cnt = build(spark, n).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times.append(best)
            print(f"{name} {mult:>3}x (n={n:>6}, rows={cnt}): "
                  f"{best:.2f}s", flush=True)
        g1 = times[1] / times[0]
        g2 = times[2] / times[1]
        print(f"{name} growth per 10x: {g1:.2f}x then {g2:.2f}x "
              f"(linear=10, floor-dominated~1)", flush=True)


if __name__ == "__main__":
    main()
