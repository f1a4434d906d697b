"""BPE tokenizer tests (operators/bpe.py)."""

from __future__ import annotations

import pytest

from deltalake2db_spark.operators.bpe import (
    _train_on_vocab,
    bpe_encode_word,
    bpe_token_counts,
    bpe_train,
)


def test_train_textbook_corpus(spark):
    """Sennrich's example family: frequent suffix 'est' and stem 'low'
    merge first; encode of an UNSEEN word composes learned subwords."""
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                      + ["widest"] * 3))],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=10)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert ("l", "o") in merges and ("lo", "w") in merges
    # unseen word: composed from learned subwords
    assert bpe_encode_word("lowest", merges) == ["low", "est</w>"]
    assert bpe_encode_word("low", merges) == ["low</w>"]


def test_train_deterministic_ties():
    """Equal counts break to the lexicographically smallest pair."""
    vocab = {("a", "b", "</w>"): 3, ("c", "d", "</w>"): 3}
    merges = _train_on_vocab(dict(vocab), 1)
    assert merges == [("a", "b")]


def test_train_stops_when_dry():
    vocab = {("a", "b", "</w>"): 1}  # no pair reaches count 2
    assert _train_on_vocab(dict(vocab), 5) == []


def test_encode_impls_agree(spark):
    """Replace-chain (column) and rank-based (arrow) tokenization are
    value-identical — including multi-char-symbol boundary hazards
    ('e' vs 'e</w>') and adjacent-run overlaps ('aaaa')."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "the quick brown fox jumps over the lazy dog",
            "five vexing wizards jump quickly aaaa aaa aa",
            "sphinx of black quartz judge my vow",
        ])],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, num_merges=40)
    a = sorted(map(tuple, bpe_token_counts(docs, merges, impl="column").collect()))
    b = sorted(map(tuple, bpe_token_counts(docs, merges, impl="arrow").collect()))
    assert a == b and len(a) == 3
    # tokens < chars: the merges actually compress
    for _, n_words, n_tokens in a:
        assert n_tokens >= n_words  # at least one token per word
    # per-word spot check against the reference encoder
    total = sum(
        len(bpe_encode_word(w, merges))
        for _, t in docs.collect() for w in t.split()
    )
    assert total == sum(r[2] for r in a)


def test_marker_byte_rejected(spark):
    docs = spark.createDataFrame(
        [(1, "bad\x01word here")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="marker"):
        bpe_train(docs, num_merges=2)
    with pytest.raises(Exception, match="marker"):
        bpe_token_counts(docs, [("a", "b")], impl="arrow").collect()


def test_encode_without_merges_is_chars(spark):
    docs = spark.createDataFrame(
        [(1, "ab cde")], "doc_id long, text string"
    )
    out = bpe_token_counts(docs, [], impl="column").collect()[0]
    # chars + </w> per word: (2+1) + (3+1) = 7
    assert (out["n_words"], out["n_tokens"]) == (2, 7)
