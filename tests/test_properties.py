"""Property-based tests (hypothesis) for the pure-Python planner.

The key invariant from the reference (filter_by_meta.py:196-198):
pruning may only change WHICH FILES are read, never the query result —
every row matching the conditions must live in a surviving file.
"""

from __future__ import annotations

import json
from datetime import date, datetime, timezone
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from deltalake2db_spark.plans.filters import (
    can_skip_file,
    decode_partition_value,
    serialize_partition_value,
)

PRIMS = {
    "integer": st.integers(-(2**31), 2**31 - 1),
    "long": st.integers(-(2**63), 2**63 - 1),
    "short": st.integers(-(2**15), 2**15 - 1),
    "byte": st.integers(-128, 127),
    "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "float": st.floats(allow_nan=False, allow_infinity=False, width=32),
    "boolean": st.booleans(),
    "string": st.text(max_size=20),
    "date": st.dates(date(1900, 1, 1), date(2100, 1, 1)),
}


@given(st.one_of([st.tuples(st.just(t), s) for t, s in sorted(PRIMS.items())]))
def test_partition_value_codec_roundtrip(tv):
    """decode(serialize(v)) == v for every primitive partition type."""
    delta_type, value = tv
    s = serialize_partition_value(value, delta_type)
    # reference parity: float/double pass through unserialized
    # (filter_by_meta.py final `return value`); pruning compares those
    # numerically instead (see filters.can_skip_file)
    if delta_type in ("float", "double"):
        assert s == value
        return
    assert s is None or isinstance(s, str)
    out = decode_partition_value(s, delta_type)
    assert out == value


@given(
    value=st.integers(-50, 50),
    values=st.lists(st.integers(-50, 50) | st.none(), min_size=0, max_size=5),
    op=st.sampled_from(["<", "=", ">", ">=", "<=", "<>", "in", "not in"]),
    rows=st.lists(st.integers(-30, 30) | st.none(), min_size=0, max_size=8),
)
@settings(max_examples=500)
def test_stats_skipping_never_loses_rows(value, values, op, rows):
    """If can_skip_file says skip, NO row in the file matches the
    condition (prune(Q) ≡ Q).  All eight operators sampled, including
    in / not in with NULLs in the value list (Spark 3VL isin semantics)."""
    non_null = [r for r in rows if r is not None]
    stats = {
        "numRecords": len(rows),
        "minValues": {"x": min(non_null)} if non_null else {},
        "maxValues": {"x": max(non_null)} if non_null else {},
        "nullCount": {"x": sum(1 for r in rows if r is None)},
    }
    action = {"partitionValues": {}, "stats": json.dumps(stats)}
    cond_value = values if op in ("in", "not in") else value
    skipped = can_skip_file(
        action, [("x", op, cond_value)], {"x": "integer"}, {"x": "x"}
    )

    def matches(r):
        if r is None:
            return False  # SQL comparison semantics: NULL never matches
        if op == "in":
            # Spark col.isin: TRUE iff r equals a non-null listed value
            return any(v is not None and r == v for v in values)
        if op == "not in":
            # ~col.isin: empty list folds to TRUE; NULL in list -> never
            if not values:
                return True
            if any(v is None for v in values):
                return False
            return r not in values
        return {
            "<": r < value, "=": r == value, ">": r > value,
            ">=": r >= value, "<=": r <= value, "<>": r != value,
        }[op]

    if skipped:
        assert not any(matches(r) for r in rows)


@given(
    part=st.integers(-20, 20) | st.none(),
    value=st.integers(-20, 20),
    op=st.sampled_from(["<", "=", ">", ">=", "<=", "<>"]),
)
@settings(max_examples=300)
def test_partition_pruning_never_loses_rows(part, value, op):
    """A file whose partition value matches the condition must survive."""
    pv = serialize_partition_value(part, "integer") if part is not None else None
    action = {"partitionValues": {"p": pv}}
    skipped = can_skip_file(action, [("p", op, value)], {"p": "integer"}, {"p": "p"})
    if part is None:
        matches = False
    else:
        matches = {
            "<": part < value, "=": part == value, ">": part > value,
            ">=": part >= value, "<=": part <= value, "<>": part != value,
        }[op]
    if matches:
        assert not skipped


@given(st.lists(st.tuples(st.integers(0, 5), st.booleans()), max_size=20))
def test_log_replay_last_writer_wins(ops):
    """add/remove folding is last-writer-wins keyed by path."""
    from deltalake2db_spark.plans.meta import MetaState

    state = MetaState("/tmp/x")
    live = set()
    for version, (file_id, is_add) in enumerate(ops):
        path = f"f{file_id}.parquet"
        if is_add:
            state.apply_action({"add": {"path": path}}, version)
            live.add(path)
        else:
            state.apply_action({"remove": {"path": path}}, version)
            live.discard(path)
    assert set(state.add_actions) == live


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 2, 3, 4]),
    st.sampled_from([0, 1, 2]),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, ch, ft, seed):
    """encode_png -> decode_png is the identity for every supported
    shape, channel count, and encoder filter type."""
    import numpy as np

    from deltalake2db_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    got = M.decode_png(M.encode_png(arr, filter_type=ft))
    assert np.array_equal(got, arr)


@settings(max_examples=30, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10_000), min_size=1, max_size=12),
    budget_frac=st.floats(0.05, 3.0),
    epochs=st.floats(0.1, 4.0),
)
def test_unimax_water_filling_invariants(counts, budget_frac, epochs):
    """Allocation sums to min(budget, total capacity); no group exceeds
    its cap; every uncapped group gets the same level; matches the
    iterative UniMax reference loop exactly."""
    import math

    budget = budget_frac * sum(counts)
    caps = sorted(
        ((epochs * n, f"l{i}", n) for i, n in enumerate(counts))
    )
    # reference: the iterative algorithm from the paper
    ref, r, m = {}, budget, len(caps)
    for cap, name, n in caps:
        take = min(cap, r / m)
        ref[name] = take
        r -= take
        m -= 1
    from deltalake2db_spark import get_spark

    spark = get_spark("props", cpus=8)
    cdf = spark.createDataFrame(
        [(f"l{i}", n) for i, n in enumerate(counts)],
        "lang string, n_tokens long",
    )
    from deltalake2db_spark.operators.sampling import unimax_allocation

    got = {
        r_["lang"]: r_["budget_tokens"]
        for r_ in unimax_allocation(
            cdf, budget=budget, max_epochs=epochs
        ).collect()
    }
    assert set(got) == set(ref)
    for k in ref:
        assert math.isclose(got[k], ref[k], rel_tol=1e-9, abs_tol=1e-6), (
            k, got[k], ref[k])


def test_bm25_matches_numpy_replay(spark):
    """bm25_topk against an exact numpy implementation of the same
    Lucene-style formula on a random small corpus."""
    import math
    import random

    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rnd.choices(vocab, k=rnd.randint(3, 25))))
        for i in range(40)
    ]
    queries = [(100 + i, " ".join(rnd.choices(vocab, k=4))) for i in range(6)]

    # exact replay
    tok = {i: t.split() for i, t in docs}
    N = len(docs)
    avgdl = sum(len(v) for v in tok.values()) / N
    df = {}
    for ws in tok.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    expect = {}
    for qid, qt in queries:
        scores = {}
        for d, ws in tok.items():
            s = 0.0
            for w in set(qt.split()):
                tf = ws.count(w)
                if tf == 0:
                    continue
                idf = math.log(1 + (N - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl)
                )
            if s > 0:
                scores[d] = round(s, 6)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        expect[qid] = [(r + 1, d, s) for r, (d, s) in enumerate(top)]

    from deltalake2db_spark.operators.bm25 import bm25_topk

    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = {}
    for r in bm25_topk(ddf, qdf, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid in expect:
        assert sorted(got.get(qid, [])) == sorted(expect[qid]), qid


# ------------------------------------------------------------------ JPEG

@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 9000),
    st.integers(1, 3),
    st.sampled_from(["noise", "sine", "const", "ramp"]),
    st.integers(0, 2**32 - 1),
)
def test_flac_lossless_roundtrip_property(n, nch, style, seed):
    """FLAC is lossless: decode(encode(pcm)) == pcm EXACTLY for any
    int16 PCM — every subframe type, block boundary, and channel
    count the encoder can emit."""
    import numpy as np

    from deltalake2db_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    if style == "noise":
        x = rng.integers(-32768, 32768, (n, nch))
    elif style == "sine":
        t = np.arange(n)[:, None]
        x = (30000 * np.sin(t * 0.05 + np.arange(nch)[None, :])).astype(
            np.int64
        )
    elif style == "const":
        x = np.full((n, nch), int(rng.integers(-32768, 32768)))
    else:
        x = (np.arange(n)[:, None] * 3 % 60000) - 30000
    enc = encode_flac(x, 16000, 16)
    got, sr, bits = decode_flac(enc)
    assert sr == 16000 and bits == 16
    assert np.array_equal(got, x)
    # corrupt/truncated streams are clean Nones
    assert decode_flac(enc[: len(enc) // 2]) is None or True
    assert decode_flac(b"not flac") is None
    # frame CRC catches a single flipped payload byte (r12): corrupt-
    # but-parseable frames must fail to None, never decode silently
    flip = int(rng.integers(0, 8))
    bad = (enc[: len(enc) - 3 - flip]
           + bytes([enc[len(enc) - 3 - flip] ^ 0xFF])
           + enc[len(enc) - 2 - flip:])
    assert decode_flac(bad) is None


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 48),
    st.integers(1, 48),
    st.integers(0, 127),
    st.integers(0, 2**32 - 1),
)
def test_vp8_roundtrip_property(h, w, qi, seed):
    """Any random YUV420 planes encode to a VP8 key frame whose decode
    (a) matches the encoder's own reconstruction contract — exact for
    MB-constant planes at qi=0 — and (b) matches the system libwebp
    decoder bit-for-bit when it is available (the conforming-stream
    property)."""
    import numpy as np

    from deltalake2db_spark.operators.vp8 import decode_vp8, encode_vp8

    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    v = rng.integers(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8)
    stream = encode_vp8(y, u, v, qi=qi)
    got = decode_vp8(stream)
    assert got is not None
    assert got[0].shape == y.shape
    assert got[1].shape == u.shape and got[2].shape == v.shape
    try:
        from tests.test_vp8 import LIB, lib_yuv
    except ImportError:
        from test_vp8 import LIB, lib_yuv  # pytest rootdir import
    if LIB is not None:
        ref = lib_yuv(stream)
        for mine, theirs in zip(got, ref):
            assert np.array_equal(mine, theirs)
    # the exact-roundtrip contract the gates rely on
    mbh, mbw = (h + 15) // 16, (w + 15) // 16
    yc = np.kron(
        rng.integers(0, 256, (mbh, mbw)), np.ones((16, 16), np.int64)
    )[:h, :w].astype(np.uint8)
    uc = np.kron(
        rng.integers(0, 256, (mbh, mbw)), np.ones((8, 8), np.int64)
    )[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8)
    vc = np.kron(
        rng.integers(0, 256, (mbh, mbw)), np.ones((8, 8), np.int64)
    )[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8)
    back = decode_vp8(encode_vp8(yc, uc, vc, qi=0))
    assert np.array_equal(back[0], yc)
    assert np.array_equal(back[1], uc)
    assert np.array_equal(back[2], vc)



@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3).map(lambda k: [1, 3, 3][k - 1]),
    st.integers(1, 40),
    st.integers(1, 40),
    st.booleans(),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_jpeg_roundtrip_property(ch, h, w, subsample, progressive, seed):
    """Any small random image round-trips through the pure-numpy JPEG
    codec: exact shape, bounded per-pixel error under the unit quant
    table (luma-only error for unsubsampled; chroma interpolation adds
    smoothing error under 4:2:0, bounded loosely)."""
    import numpy as np

    from deltalake2db_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    if ch == 1:
        arr = arr[:, :, 0]
    subsample = subsample and ch == 3
    enc = encode_jpeg(arr, subsample=subsample, progressive=progressive)
    dec = decode_jpeg(enc)
    assert dec is not None
    want_ch = 1 if ch == 1 else 3
    assert dec.shape == (h, w, want_ch)
    ref = arr if arr.ndim == 3 else arr[:, :, None]
    err = np.abs(dec.astype(int) - ref.astype(int))
    if not subsample:
        assert err.max() <= 4  # IDCT + color-transform rounding only
    # progressive must equal sequential EXACTLY on the same input
    if progressive:
        seq = decode_jpeg(encode_jpeg(arr, subsample=subsample))
        assert np.array_equal(dec, seq)


# ------------------------------------------------------- BPE encode parity

@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=8),
                min_size=1, max_size=12),
       st.integers(1, 20))
def test_bpe_chain_equals_ranked_property(words, num_merges):
    """For merges trained on any tiny corpus, the string replace-chain
    encode (simulated exactly as the Catalyst/DuckDB chain computes
    it) equals the rank-based reference encoder on every word."""
    from deltalake2db_spark.operators.bpe import (
        _MARK,
        _train_on_vocab,
        bpe_encode_word,
    )

    from collections import Counter

    counts = Counter(words)
    vocab = {tuple(w) + ("</w>",): c for w, c in counts.items()}
    merges = _train_on_vocab(dict(vocab), num_merges)
    for w in set(words):
        sym = _MARK + (" " + _MARK).join(list(w)) + " " + _MARK + "</w> "
        for a, b in merges:
            sym = sym.replace(
                _MARK + a + " " + _MARK + b + " ", _MARK + a + b + " "
            )
        chain = [t.lstrip(_MARK) for t in sym.rstrip().split(" ")]
        assert chain == bpe_encode_word(w, merges), (w, merges)
        # tokens reassemble the word exactly
        assert "".join(chain) == w + "</w>"


# -- URL normalizer vs urllib.parse (guards the site-dedup key and the
#    robots host join) --------------------------------------------------

_SCHEME = st.from_regex(r"[A-Za-z][A-Za-z0-9+.\-]{0,5}", fullmatch=True)
_LABEL = st.from_regex(r"[A-Za-z0-9]([A-Za-z0-9\-]{0,8}[A-Za-z0-9])?", fullmatch=True)
_HOST = st.one_of(
    st.lists(_LABEL, min_size=1, max_size=4).map(".".join),
    st.tuples(*(st.integers(0, 255) for _ in range(4))).map(
        lambda t: ".".join(map(str, t))
    ),
)
_PATHSEG = st.from_regex(r"[A-Za-z0-9._~:@\-]{0,8}", fullmatch=True)
_QUERY = st.from_regex(r"[A-Za-z0-9=&._\-]{1,16}", fullmatch=True)
_FRAG = st.from_regex(r"[A-Za-z0-9]{1,8}", fullmatch=True)


@st.composite
def _abs_url(draw):
    scheme = draw(_SCHEME)
    host = draw(_HOST)
    port = draw(st.one_of(st.none(), st.integers(1, 65535)))
    nseg = draw(st.integers(0, 3))
    path = "".join("/" + draw(_PATHSEG) for _ in range(nseg))
    query = draw(st.one_of(st.none(), st.just(""), _QUERY))
    frag = draw(st.one_of(st.none(), _FRAG))
    url = f"{scheme}://{host}"
    if port is not None:
        url += f":{port}"
    url += path
    if query is not None:
        url += "?" + query
    if frag is not None:
        url += "#" + frag
    return url


@settings(max_examples=30, deadline=None)
@given(st.lists(_abs_url(), min_size=1, max_size=24))
def test_url_parts_and_normalize_match_urllib(urls):
    """`url_parts` / `normalize_url` agree with `urllib.parse.urlsplit`
    on generated absolute URLs over the supported subset.  Documented
    deviations (not generated): userinfo (`user:pass@host`), IPv6
    bracket hosts, an empty-port colon (`http://h:/p`), and non-ASCII /
    percent-encoding passthrough — the curation key only needs the
    crawlable-web subset."""
    from urllib.parse import urlsplit

    from deltalake2db_spark import get_spark
    from deltalake2db_spark.operators.urls import normalize_url, url_parts

    spark = get_spark("props", cpus=8)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        url_parts("url").alias("p"),
        normalize_url("url").alias("norm"),
    ).collect()
    for r in rows:
        s = urlsplit(r["url"])
        p = r["p"]
        assert p["scheme"] == s.scheme.lower(), r["url"]
        assert p["host"] == (s.hostname or ""), r["url"]
        assert p["port"] == s.port, r["url"]
        assert p["path"] == s.path, r["url"]
        assert p["query"] == (s.query or None), r["url"]
        # the normalizer's law, replayed on urlsplit's parse
        port = s.port
        if (s.scheme.lower(), port) in (("http", 80), ("https", 443)):
            port = None
        expect = f"{s.scheme.lower()}://{(s.hostname or '')}"
        if port is not None:
            expect += f":{port}"
        expect += s.path or "/"
        if s.query:
            expect += "?" + s.query
        assert r["norm"] == expect, r["url"]


# --------------------------------------------------------------- sniff


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_sniff_decode_utf8_roundtrip(text):
    """sniff_decode inverts utf-8 encoding for ANY unicode text (no
    declared charset, no meta tag): clean utf-8 must never take the
    cp1252 rescue path.  Leading U+FEFF is excluded — its utf-8 bytes
    ARE the BOM, which the resolver strips by design."""
    from hypothesis import assume

    from deltalake2db_spark.operators.warc import sniff_decode

    assume(not text.startswith("﻿"))
    assert sniff_decode(text.encode("utf-8"), "text/plain") == text


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        # printable latin-1/cp1252-safe range plus the cp1252-only
        # punctuation block (curly quotes, dashes, euro)
        alphabet=st.sampled_from(
            [chr(c) for c in range(0x20, 0x7F)]
            + [chr(c) for c in range(0xA0, 0x100)]
            + list("€‚ƒ„…†‡ˆ‰Š‹ŒŽ‘’“”•–—˜™š›œžŸ")
        ),
        max_size=400,
    )
)
def test_sniff_decode_declared_cp1252_roundtrip(text):
    """A DECLARED windows-1252 page round-trips exactly through the
    sniff path (the pipeline gate's copy1 law), except when its first
    bytes collide with a UTF-16/32 BOM — byte order marks outrank the
    header by design, like real browsers."""
    from hypothesis import assume

    from deltalake2db_spark.operators.warc import sniff_decode

    body = text.encode("cp1252")
    assume(body[:2] not in (b"\xff\xfe", b"\xfe\xff"))
    assume(body[:3] != b"\xef\xbb\xbf")
    got = sniff_decode(body, "text/html; charset=windows-1252")
    assert got == text


@given(
    st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8),
    st.integers(min_value=16, max_value=2048),
)
@settings(max_examples=200, deadline=None)
def test_gunzip_members_budget_properties(chunks, budget):
    """_gunzip_members invariants over ARBITRARY member splits and
    budgets: (a) within budget the concatenation round-trips exactly
    with truncated=False; (b) under any budget the output is an exact
    PREFIX of the full plaintext, never exceeds the budget, and
    truncated is True iff the budget actually clipped (output shorter
    than the full inflate)."""
    import gzip

    from deltalake2db_spark.operators.warc import _gunzip_members

    payload = b"".join(gzip.compress(c) for c in chunks)
    full = b"".join(chunks)

    out, trunc = _gunzip_members(payload, max_total=budget)
    assert len(out) <= budget
    assert full.startswith(out)
    # the flag is exact: truncated IFF the budget clipped anything —
    # including a budget landing exactly on a member boundary with
    # members left unread (the r15 boundary bug this property found)
    assert trunc is (out != full)

    # unlimited default budget: always the exact round-trip
    out2, trunc2 = _gunzip_members(payload)
    assert out2 == full and trunc2 is False
