"""Byte-pair-encoding tokenizer: train + distributed encode.

BPE (Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016 — the GPT/LLaMA tokenizer family's training
algorithm) learns a merge list over a word-frequency dictionary and
tokenizes by applying the merges in training order.

Spark-first design
------------------
* **Train** runs on the WORD-FREQUENCY dictionary, not the corpus: one
  ``groupBy(word)`` shuffle reduces 100 TB of text to a vocabulary-
  sized table (Heaps' law), the top-``max_words`` rows (bounded in
  rows AND bytes) collect to the driver, and the classic
  incremental-pair-count loop learns the merges there — the same
  driver-sized-model shape as ``pq_train``/``kmeans_fit``.  Counts
  preserve the learning signal exactly, so this is equivalent to
  training on the raw text restricted to the collected vocabulary.
* **Encode** exploits the same dictionary structure: merges only ever
  apply WITHIN a word, so the corpus path is
  ``words -> join(word -> n_tokens map)`` and only DISTINCT words are
  ever tokenized.  Two impls, verified equal:

  - ``impl='column'`` — a pure-Catalyst replace chain.  Each word
    becomes a marker-delimited symbol string (``\\x01h \\x01i``) and
    every merge ``(a, b)`` is one native ``replace('\\x01a \\x01b' ->
    '\\x01ab')``.  The ``\\x01`` marker makes multi-char symbols
    unambiguous (``'\\x01ab \\x01c'`` does NOT contain ``'\\x01b
    \\x01c'``), and replace-all left-to-right is exactly the merge
    rule's simultaneous application; pairs created by a merge always
    belong to LATER rules, so one ordered pass is the full algorithm.
    SQL-replayable (the correctness oracle runs the identical chain in
    DuckDB) — suited to demonstration-sized merge lists; a 32k-rule
    chain would exceed plan limits.
  - ``impl='arrow'`` — rank-based greedy merging per DISTINCT word
    inside one ``mapInArrow`` kernel: repeatedly merge the
    lowest-rank adjacent pair.  Handles real vocabulary sizes; the
    per-word cost is O(len · merges-applied), and the kernel runs
    over the distinct-word table, not the corpus.

Words containing the ``\\x01`` marker byte are rejected (raise) — it
cannot occur in text tokenized from any sane source, and silently
mis-tokenizing would be worse.

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no text operators (SURVEY.md §2.5); this is a north-star extension for
LLM training-data pipelines (token counting, vocabulary studies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "\x01"
_EOW = "</w>"


def _words(text_col):
    return F.split(F.trim(text_col), "\\s+")


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 100_000,
    max_word_bytes: int = 64 << 20,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Deterministic: the word dictionary is the top ``max_words`` words
    by (count DESC, word ASC); each step merges the pair with the
    highest total count, ties to the lexicographically smallest pair.
    Stops early when no pair occurs twice.
    """
    wdf = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_words)
    )
    rows = wdf.collect()
    total_b = 0
    vocab: dict[tuple, int] = {}
    for r in rows:
        total_b += len(r["w"])
        if total_b > max_word_bytes:
            break
        if _MARK in r["w"]:
            raise ValueError("bpe_train: text contains the \\x01 marker")
        vocab[tuple(r["w"]) + (_EOW,)] = int(r["n"])
    return _train_on_vocab(vocab, num_merges)


def _train_on_vocab(vocab: dict, num_merges: int) -> list[tuple[str, str]]:
    """Incremental-update BPE training loop over {symbol-tuple: count}."""
    from collections import defaultdict

    pair_counts: dict[tuple, int] = defaultdict(int)
    pair_words: dict[tuple, set] = defaultdict(set)
    words = list(vocab.items())  # [(symbols tuple, count)]
    for wi, (syms, n) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += n
            pair_words[(a, b)].add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c >= 2 and (
                best is None
                or c > pair_counts[best]
                or (c == pair_counts[best] and p < best)
            ):
                best = p
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        touched = list(pair_words.pop(best, ()))
        pair_counts.pop(best, None)
        for wi in touched:
            syms, n = words[wi]
            # remove old adjacencies of this word
            for pa, pb in zip(syms, syms[1:]):
                if (pa, pb) != best and (pa, pb) in pair_counts:
                    pair_counts[(pa, pb)] -= n
                    if pair_counts[(pa, pb)] <= 0:
                        del pair_counts[(pa, pb)]
                        pair_words.pop((pa, pb), None)
                    else:
                        pair_words[(pa, pb)].discard(wi)
            # merge all occurrences left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new = tuple(out)
            words[wi] = (new, n)
            for pa, pb in zip(new, new[1:]):
                if (pa, pb) != best:
                    pair_counts[(pa, pb)] += n
                    pair_words[(pa, pb)].add(wi)
    return merges


def _symbolize(word_col):
    """``hi`` -> ``\\x01h \\x01i \\x01</w> `` — every symbol is
    marker-PREFIXED and space-SUFFIXED (note the trailing space), so a
    merge pattern ``\\x01a \\x01b `` can match neither a symbol that
    merely starts with ``a``/``b`` nor one that continues past ``b``
    (``e`` vs ``e</w>`` — the one-sided guard's failure case)."""
    return F.concat(
        F.lit(_MARK),
        F.array_join(F.split(word_col, ""), " " + _MARK),
        F.lit(" " + _MARK + _EOW + " "),
    )


def _apply_merges_column(sym_col, merges):
    for a, b in merges:
        sym_col = F.replace(
            sym_col,
            F.lit(_MARK + a + " " + _MARK + b + " "),
            F.lit(_MARK + a + b + " "),
        )
    return sym_col


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference single-word encode (rank-based greedy, driver-side)."""
    return _encode_ranked(word, {p: i for i, p in enumerate(merges)}, merges)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "column",
) -> DataFrame:
    """``(id, n_words, n_tokens)`` per document under the merge list.

    ``impl='column'`` tokenizes every word occurrence with the native
    replace chain (zero Python, SQL-replayable); ``impl='arrow'``
    tokenizes each DISTINCT word once in an Arrow kernel and
    broadcast-joins the (word -> n_tokens) map back — the real-
    vocabulary path (chain depth doesn't scale past demonstration
    sizes).  Both return identical values.
    """
    if impl not in ("column", "arrow"):
        raise ValueError(f"impl={impl!r}: expected column|arrow")
    from .parallel import spread_scan

    words = spread_scan(df.select(id_col, text_col)).select(
        id_col, F.explode(_words(F.col(text_col))).alias("w")
    ).filter(F.length("w") > 0)
    if impl == "column":
        nt = F.size(
            F.split(
                F.rtrim(
                    _apply_merges_column(_symbolize(F.col("w")), merges)
                ),
                " ",
            )
        )
        # same contract as the arrow path: a word containing the \x01
        # symbol marker would be silently mis-symbolized — raise instead
        nt = F.when(
            F.contains(F.col("w"), F.lit(_MARK)),
            F.raise_error(
                F.lit("bpe_token_counts: text contains the \\x01 marker")
            ).cast("int"),
        ).otherwise(nt)
        per_word = words.select(id_col, nt.alias("nt"))
    else:
        rank = {p: i for i, p in enumerate(merges)}
        distinct = words.select("w").distinct()

        def enc(batches):
            import pyarrow as pa

            for b in batches:
                ws = b.column(0).to_pylist()
                counts = []
                for w in ws:
                    if _MARK in w:
                        raise ValueError(
                            "bpe_token_counts: text contains the \\x01 marker"
                        )
                    counts.append(len(_encode_ranked(w, rank, merges)))
                yield pa.RecordBatch.from_arrays(
                    [b.column(0), pa.array(counts, type=pa.int32())],
                    names=["w", "nt"],
                )

        wmap = distinct.mapInArrow(enc, "w string, nt int")
        per_word = words.join(F.broadcast(wmap), "w").select(id_col, "nt")
    return per_word.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_words"),
        F.sum("nt").cast("long").alias("n_tokens"),
    )


def _encode_ranked(word: str, rank: dict, merges: list) -> list[str]:
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_r = None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r = r
        if best_r is None:
            break
        a, b = merges[best_r]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
