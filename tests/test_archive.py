"""Archive-ingestion tests: zip/tar round-trips, bomb guards,
malformed-input fuzz, and the Spark map-side tier."""

from __future__ import annotations

import gzip
import io
import zipfile

import numpy as np
import pytest

from deltalake2db_spark.operators import archive as A

MEMBERS = [
    ("src/a.py", b"print(1)\n"),
    ("src/b.py", b"print(2)\n"),
    ("README.md", b"# hi\n"),
    ("bin/blob", bytes([0, 159, 146, 150])),
]


def test_roundtrip_all_formats():
    for payload, kind in (
        (A.encode_zip(MEMBERS), "zip"),
        (A.encode_tar(MEMBERS), "tgz"),
        (A.encode_tar(MEMBERS, gz=False), "tar"),
    ):
        assert A.sniff_archive(payload) == kind
        assert A.archive_member_list(payload) == MEMBERS


def test_bare_gzip_single_member():
    assert A.archive_member_list(gzip.compress(b"just text")) == [
        ("", b"just text")
    ]


def test_directories_skipped():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("dir/", b"")
        zf.writestr("dir/f.txt", b"x")
    got = A.archive_member_list(buf.getvalue())
    assert got == [("dir/f.txt", b"x")]


def test_bomb_guard_oversized_member_skipped():
    payload = A.encode_zip([
        ("big.bin", b"A" * 2048), ("ok.txt", b"fine")
    ])
    got = A._zip_members(payload, max_member=1024)
    assert got == [("ok.txt", b"fine")]
    tpayload = A.encode_tar([
        ("big.bin", b"A" * 2048), ("ok.txt", b"fine")
    ])
    got = A._tar_members(tpayload, max_member=1024)
    assert got == [("ok.txt", b"fine")]


def test_bomb_guard_total_budget():
    payload = A.encode_zip([
        (f"f{i}.bin", b"B" * 600) for i in range(10)
    ])
    got = A._zip_members(payload, max_total=2000)
    assert len(got) == 3  # stops once the running total exceeds


def test_malformed_fuzz_never_crashes():
    rng = np.random.RandomState(0)
    variants = [
        A.encode_zip(MEMBERS), A.encode_tar(MEMBERS),
        A.encode_tar(MEMBERS, gz=False),
    ]
    for i in range(300):
        buf = bytearray(variants[i % 3])
        if i % 4 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 6)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = A.archive_member_list(bytes(buf))
        assert out is None or isinstance(out, list)
    assert A.archive_member_list(b"garbage") is None
    assert A.archive_member_list(b"") is None


@pytest.mark.usefixtures("spark")
def test_archive_members_spark(spark):
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                members = [
                    (f"m{k}.txt", f"doc {i} member {k}".encode())
                    for k in range(2)
                ]
                members.append(("raw.bin", b"\xff\xfe\x00"))
                enc = A.encode_zip if i % 2 == 0 else A.encode_tar
                rows.append((i, enc(members)))
            rows.append((999, b"not an archive"))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    df = spark.range(6).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
    out = A.archive_members(df).orderBy("media_id", "member_idx")
    rows = out.collect()
    assert len(rows) == 18  # 6 archives x 3 members; 999 skipped
    assert rows[0].path == "m0.txt"
    assert rows[0].text == "doc 0 member 0"
    assert rows[2].path == "raw.bin" and rows[2].text is None
    assert rows[2].n_bytes == 3


def test_truncation_surfaced_not_silent(spark):
    """Budget-clipped archives flag every surviving row
    truncated=True (countable/quarantinable); clean archives flag
    False; a bare-gzip bomb is budget-rejected WITHOUT materializing
    (budgeted decompressobj, not gzip.decompress)."""
    import pandas as pd

    # zip with one member over the per-member cap -> flag
    clipped = A.encode_zip([
        ("big.bin", b"A" * (A._MAX_MEMBER_BYTES + 1)),
        ("ok.txt", b"fine"),
    ])
    m, t = A.archive_member_list(clipped, with_truncated=True)
    assert m == [("ok.txt", b"fine")] and t is True
    clean = A.encode_zip([("ok.txt", b"fine")])
    m, t = A.archive_member_list(clean, with_truncated=True)
    assert t is False
    # bare-gzip bomb: budget-rejected with the flag, prefix never
    # materialized past the cap
    import gzip
    # 0x01 fill: an all-zero stream would parse as an EMPTY tar
    # (zero blocks are the tar end marker) and never reach the
    # bare-gzip branch
    bomb = gzip.compress(b"\x01" * (A._MAX_MEMBER_BYTES + 100))
    m, t = A.archive_member_list(bomb, with_truncated=True)
    assert m is None and t is True
    # Spark tier: the flag is a per-payload column
    df = spark.createDataFrame(
        [(1, bytearray(clipped)), (2, bytearray(clean))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in A.archive_members(df).collect()}
    assert rows[1]["truncated"] is True
    assert rows[2]["truncated"] is False


def test_total_budget_counts_actual_bytes(monkeypatch):
    """A zip whose headers all declare tiny sizes must not bypass the
    total-inflated cap: the budget is charged with the ACTUAL bytes
    read, not the untrusted header's file_size."""
    members = [(f"f{i}.bin", b"C" * 500) for i in range(8)]
    payload = A.encode_zip(members)
    content = dict(members)
    real_zip = zipfile.ZipFile

    class LyingZip(real_zip):
        def infolist(self):
            infos = super().infolist()
            for i in infos:
                i.file_size = 1  # header lies: declares 1 byte
            return infos

        def open(self, info, *a, **k):
            # bypass zipfile's declared-size truncation to model a
            # decoder that inflates past the header's claim
            return io.BytesIO(content[info.filename])

    monkeypatch.setattr(A.zipfile, "ZipFile", LyingZip)
    got = A._zip_members(payload, max_total=1400)
    assert got is not None
    assert sum(len(d) for _, d in got) <= 1400
