"""Text-analysis operators for LLM-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM
codegen, no Python UDFs), so every operator scales linearly with
executors and keeps whole-stage codegen intact.  Regex patterns are
restricted to the common subset of Java regex (Spark) and RE2/PCRE
(DuckDB) so the DuckDB oracle computes identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately tiny, language-indicative stopword lists (public knowledge)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}

TOKEN_SPLIT = "\\s+"
WORD_RE = "[a-zA-Z]+"


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, TOKEN_SPLIT))
    )


def char_classes(text: Column) -> dict[str, Column]:
    """Counts of character classes via length-difference (codegen-only)."""
    n = F.length(text)
    return {
        "n_chars": n,
        "n_alpha": n - F.length(F.regexp_replace(text, "[a-zA-Z]", "")),
        "n_digit": n - F.length(F.regexp_replace(text, "[0-9]", "")),
        "n_space": n - F.length(F.regexp_replace(text, " ", "")),
        "n_punct": n - F.length(F.regexp_replace(text, "[.,;:!?]", "")),
    }


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """How many tokens are in the language's stopword list."""
    words = F.split(F.trim(text), TOKEN_SPLIT)
    sw = [F.lit(w) for w in STOPWORDS[lang]]
    return F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS[lang])))


def quality_score(text: Column) -> Column:
    """Deterministic 0-100 quality heuristic from length / word ratio /
    mean word length — integer arithmetic end-to-end so the oracle
    matches bit-for-bit.

    score = min(100, tokens) - penalties for extreme mean word length.
    """
    toks = token_count(text)
    chars = F.length(text)
    mean_word_len = F.when(toks > 0, (chars - toks + 1) / toks).otherwise(F.lit(0.0))
    base = F.least(toks, F.lit(100))
    penalty = F.when((mean_word_len < 2) | (mean_word_len > 12), F.lit(25)).otherwise(F.lit(0))
    return F.greatest(base - penalty, F.lit(0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-hit score per candidate language (n-gram-free heuristic:
    the deterministic token-membership variant that both engines can
    reproduce)."""
    return {lang: stopword_hits(text, lang) for lang in STOPWORDS}


def lang_id(text: Column) -> Column:
    """argmax over lang_scores with a fixed tie-break order (de < en <
    es < fr alphabetical), 'und' (undetermined) when all scores are 0.

    Note: each score filters the split-words array; Catalyst's
    subexpression elimination shares the split across the four filters,
    so this stays a single pass over the text.
    """
    scores = lang_scores(text)
    langs = sorted(scores)
    best = F.greatest(*[scores[l] for l in langs])
    expr = F.lit("und")
    for l in reversed(langs):
        expr = F.when(scores[l] == best, F.lit(l)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


BPE_ISH_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: word pieces + single digits + each
    punctuation mark count separately (a simplified GPT-2-style
    pre-tokenizer split), then scaled by an empirical 4-chars-per-token
    correction for long words.  Pure regexp_extract_all — codegen-able,
    no tokenizer library needed."""
    pieces = F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 0)
    long_word_extra = F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.when(F.length(p) > 4, (F.length(p) - 1) / 4).otherwise(F.lit(0)).cast("int"),
    )
    return F.size(pieces) + long_word_extra


def lang_id_from_scores(score_cols: dict[str, Column]) -> Column:
    """argmax over precomputed per-language score COLUMNS.

    Use with a prior projection that materializes the scores once:
    inlining ``lang_scores`` directly into the CASE chain repeats each
    list-filter ~5x and the generated code grows enough to thrash the
    whole-stage-codegen cache (measured: 1.3s -> 8.9s when many other
    queries share the session).
    """
    langs = sorted(score_cols)
    best = F.greatest(*[score_cols[l] for l in langs])
    expr = F.lit("und")
    for l in reversed(langs):
        expr = F.when(score_cols[l] == best, F.lit(l)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "pred") -> DataFrame:
    """Stopword-count lang-id via one JVM ``regexp_count`` per language.

    Each language's score counts whitespace-delimited tokens equal to a
    stopword: pattern ``(?:^|\\s)(?:\\Qw1\\E|...)(?=\\s|$)`` — the
    leading boundary consumes the separator, the trailing lookahead
    does not, so consecutive stopwords all count.  Exactly the
    ``split(TOKEN_SPLIT) + isin`` semantics, but the counting runs as a
    compiled JVM regex inside codegen instead of an ``aggregate``
    lambda fold, which evaluates interpreted per element (SCALE.md HOF
    findings; measured 618 → 452 ms for the sf0.1 gate, identical
    groupBy(lang, pred) output).  The scores are materialized in their
    own projection so the argmax CASE chain references columns — the
    codegen-cache trap ``lang_id_from_scores`` documents."""
    langs = sorted(STOPWORDS)
    lowered = F.lower(F.trim(F.col(text_col)))
    staged = df.select(
        "*",
        *[
            F.regexp_count(
                lowered,
                F.lit(
                    "(?:^|\\s)(?:"
                    + "|".join(f"\\Q{w}\\E" for w in STOPWORDS[l])
                    + ")(?=\\s|$)"
                ),
            ).alias(f"__s_{l}")
            for l in langs
        ],
    )
    pred = lang_id_from_scores({l: F.col(f"__s_{l}") for l in langs})
    return staged.select(*df.columns, pred.alias(out_col))


def doc_fingerprint(text: Column, normalize: bool = True) -> Column:
    """64-bit-ish document fingerprint: xxhash64 of the
    whitespace-normalized lowercased text.  Content-defined, stable
    across partitioning — the building block for exact dedup at scale
    (hash the normalized text, not the raw bytes)."""
    norm = text
    if normalize:
        norm = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.xxhash64(norm)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach token/char-class/quality columns to a documents frame."""
    t = F.col(text_col)
    cc = char_classes(t)
    return (
        df.withColumn("tokens", token_count(t))
        .withColumn("n_alpha", cc["n_alpha"])
        .withColumn("n_space", cc["n_space"])
        .withColumn("quality", quality_score(t))
    )


# ------------------------------------------------------------ PII redaction

# patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB): no lookarounds, no backrefs — so oracle parity holds
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{9,16}\b", "<ID>"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / phone numbers / long digit ids with
    typed placeholders — the standard pre-training scrub pass.  Pure
    ``regexp_replace`` chain: JVM-side, whole-stage codegen, zero
    Python, order fixed so results are deterministic (emails before the
    digit-run rule so the local-part's digits don't half-match)."""
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_hit_count(text: Column) -> Column:
    """How many PII spans redaction would replace (cheap audit metric:
    difference in occurrences, not a second scan in production — both
    columns compute in the same projection)."""
    out = F.lit(0)
    for pattern, _ in PII_PATTERNS:
        out = out + F.coalesce(
            F.size(F.split(text, pattern)) - 1, F.lit(0)
        )
    return out


def keyword_hits(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Blocklist / keyword screen (the C4 badwords-filter shape):
    ``(id, n_hits, n_terms, flagged)`` where ``n_hits`` counts every
    occurrence of any term (case-insensitive, WHOLE-WORD — multi-word
    phrases match as consecutive word runs), ``n_terms`` counts
    distinct matched terms, and ``flagged = n_hits >= min_hits``.
    Documents with no hits report (0, 0, false) — the screen must
    return a verdict for EVERY document.

    Spark-first: the term list is model-sized by contract; per phrase
    LENGTH present in it, the doc's word stream is sliced into L-word
    grams (native transform/slice — no UDF) and broadcast-joined
    against that length's terms.  One doc-keyed aggregate; the corpus
    text never shuffles.

    Matching is whitespace-token EXACT: words are the document split on
    whitespace, punctuation attached ("table." does not match "table").
    Callers wanting punctuation-insensitive screens should
    regexp_replace the text column first.
    """
    norm = sorted({" ".join(t.lower().split()) for t in terms})
    norm = [t for t in norm if t]
    if not norm:
        raise ValueError("keyword_hits: empty term list")
    by_len: dict[int, list[str]] = {}
    for t in norm:
        by_len.setdefault(len(t.split()), []).append(t)
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " "), " "
    )
    spark = df.sparkSession
    base = df.select(id_col, words.alias("__ws"))
    hits = None
    for L, ts in sorted(by_len.items()):
        k = F.size("__ws") - (L - 1)
        # sequence(0, -1) defaults step to -1 and yields [0, -1] (which
        # would drive slice(start=0) into a runtime error on any doc
        # shorter than the phrase) — gate the whole gram build on k > 0
        idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
            F.array().cast("array<int>")
        )
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice("__ws", i + 1, L))
        )
        tdf = F.broadcast(
            spark.createDataFrame([(t,) for t in ts], ["__term"])
        )
        h = (
            base.select(id_col, F.explode(grams).alias("__g"))
            .join(tdf, F.col("__g") == F.col("__term"))
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("__h"),
                F.countDistinct("__term").alias("__t"),
            )
        )
        hits = h if hits is None else hits.unionByName(h)
    agg = hits.groupBy(id_col).agg(
        F.sum("__h").cast("long").alias("n_hits"),
        F.sum("__t").cast("int").alias("n_terms"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
            (F.coalesce("n_hits", F.lit(0)) >= F.lit(min_hits)).alias(
                "flagged"
            ),
        )
    )


def sliding_chunks(
    df: DataFrame,
    chunk_words: int = 128,
    stride_words: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping context windows — the training/RAG windowing
    primitive (``chunk_table`` in dedup.py is the non-overlapping
    special case): ``(id, chunk_idx, start_word, n_words, chunk)``
    with windows starting every ``stride_words`` words, each
    ``chunk_words`` long (the final window holds the tail, so every
    word lands in at least one chunk and no start lies beyond the
    text).  n_starts = 1 + ceil(max(0, n - w) / s).

    Pure Column algebra: one split, one posexplode — the corpus text
    never shuffles, the explode factor is ~n/s by construction.

    The windows are sliced AFTER the explode (posexplode a start-index
    SEQUENCE, then ``slice``/``array_join`` on the carried word array)
    rather than inside a ``transform`` lambda: higher-order-function
    lambdas evaluate interpreted per element (SCALE.md HOF findings)
    while the post-explode slice runs in whole-stage codegen — measured
    1.9x at sf0.1 (0.55 -> 0.29 s min, identical rows).  The carried
    word array never crosses a shuffle: the Generate and the projection
    that consumes it sit in the same stage, so there is no
    amplification hazard at scale."""
    if chunk_words < 1 or stride_words < 1:
        raise ValueError("chunk_words and stride_words must be >= 1")
    w, s = F.lit(chunk_words), F.lit(stride_words)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    # Materialize the word array in its OWN projection below the
    # posexplode: aliasing it in the same select as the generator lets
    # the analyzer (ExtractGenerator) hoist the alias into the Project
    # ABOVE the Generate, where split(trim(text)) re-runs once per
    # CHUNK ROW instead of once per document (the shipped r15 plan had
    # exactly that shape — `__ws = split(...)` in operator (5) above
    # the Generate).  Two-step select keeps it a child column; the
    # Generate then carries an array reference, O(1) per output row.
    base = df.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(id_col, words.alias("__ws"))
    n = F.size(F.col("__ws"))
    n_starts = (
        F.lit(1)
        + F.ceil(F.greatest(n - w, F.lit(0)) / s).cast("int")
    )
    out = base.select(
        id_col,
        "__ws",
        F.posexplode(F.sequence(F.lit(0), n_starts - F.lit(1))).alias(
            "chunk_idx", "__i"
        ),
    )
    chunk = F.array_join(
        F.slice(F.col("__ws"), F.col("__i") * s + F.lit(1), w), " "
    )
    # n_words by arithmetic on the carried array instead of
    # size(split(chunk)) — re-splitting the assembled window doubled
    # the per-chunk string work.  The slice holds
    # min(w, n - start) elements; the greatest(..., 1) guard matches
    # split("", " ", -1) == [""] on the degenerate stride>chunk case
    # where a start can lie past the last word (empty slice).
    return out.select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * s).alias("start_word"),
        F.greatest(
            F.least(w, n - F.col("__i") * s), F.lit(1)
        ).alias("n_words"),
        chunk.alias("chunk"),
    )


_MOJIBAKE_MARKER = (
    # any UTF-8 lead byte (0xC2-0xF4) seen through latin-1 eyes,
    # followed by a continuation byte seen through latin-1 (raw
    # \x80-\xBF) or cp1252 (its remapped punctuation) eyes
    "[\u00c2-\u00f4]"
    "[\u0080-\u00bf\u0152\u0153\u0160\u0161\u0178\u017d\u017e"
    "\u0192\u02c6\u02dc\u2013\u2014\u2018-\u201e\u2020-\u2022"
    "\u2026\u2030\u2039\u203a\u20ac\u2122]"
)


def fix_mojibake(text: Column) -> Column:
    """Repair UTF-8-read-as-latin-1 double encoding (the dominant
    web-crawl mojibake class; ftfy's core fix) in pure Column algebra:
    re-encode the text as latin-1 and re-decode the bytes as UTF-8.
    Three guards keep it surgical and total:

    1. only strings showing a mojibake MARKER (a latin-1 char in the
       UTF-8 lead-byte range followed by a continuation-range char)
       are touched — clean text, including real French/Spanish
       accents, passes through untouched;
    2. only strings wholly representable in latin-1 (after the cp1252
       bridge) are re-encoded — chars above U+00FF mean it was never
       a latin-1 misread, and Spark's ``encode`` would throw on them;
    3. the recovered bytes must be valid UTF-8 (``is_valid_utf8``),
       else the original survives (a lone legitimate 'Ã' never
       corrupts).

    Real-world mojibake usually came through cp1252, whose printable
    0x80-0x9F punctuation (curly quotes, dashes, euro) is NOT
    latin-1-representable — so those chars are first bridged back to
    their byte values via ``translate`` (the standard windows-1252 /
    latin-1 bridge), making the latin-1 re-encode total."""
    c = text
    cp1252 = [
        (0x80, 0x20AC), (0x82, 0x201A), (0x83, 0x0192), (0x84, 0x201E),
        (0x85, 0x2026), (0x86, 0x2020), (0x87, 0x2021), (0x88, 0x02C6),
        (0x89, 0x2030), (0x8A, 0x0160), (0x8B, 0x2039), (0x8C, 0x0152),
        (0x8E, 0x017D), (0x91, 0x2018), (0x92, 0x2019), (0x93, 0x201C),
        (0x94, 0x201D), (0x95, 0x2022), (0x96, 0x2013), (0x97, 0x2014),
        (0x98, 0x02DC), (0x99, 0x2122), (0x9A, 0x0161), (0x9B, 0x203A),
        (0x9C, 0x0153), (0x9E, 0x017E), (0x9F, 0x0178),
    ]
    src = "".join(chr(u) for _b, u in cp1252)
    dst = "".join(chr(b) for b, _u in cp1252)
    bridged = F.translate(c, src, dst)
    latin1_safe = bridged.rlike("^[\u0000-\u00ff]*$")
    marker = c.rlike(_MOJIBAKE_MARKER)
    raw = F.encode(bridged, "ISO-8859-1")
    return F.when(
        marker & latin1_safe & F.is_valid_utf8(raw),
        F.decode(raw, "UTF-8"),
    ).otherwise(c)
