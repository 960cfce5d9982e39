"""BPE tokenizer: hand-computed merges, roundtrip invariants, Spark path."""

import pytest

from sparkdu.bpe import (
    END,
    bpe_apply_word,
    bpe_encode,
    bpe_train,
    bpe_word_counts,
)


def test_bpe_train_hand_computed():
    """The classic Sennrich example: {'low':5,'lower':2,'newest':6,
    'widest':3}. First merges are driven by 'est</w>' in newest/widest
    (9 occurrences of s-t and t-</w> ... verify the exact deterministic
    sequence)."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(wc, n_merges=4)
    # pair counts round 1: ('s','t')=9, ('t',END)=9, ('e','s')=9, ('w','e')=8(2+6)...
    # deterministic tiebreak on equal 9: lexicographically smallest pair
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    # round 4: 'l','o' = 7 (low 5 + lower 2) beats 'w','est</w>'=6...
    assert merges[3] == ("l", "o")


def test_bpe_apply_word_follows_rank_order():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(wc, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # a trained word collapses far; an OOV word still uses learned pieces
    assert "".join(bpe_apply_word("newest", ranks)) == "newest" + END
    assert bpe_apply_word("slowest", ranks)[-1].endswith(END)
    # chars never reorder or drop: concatenation is the identity
    for w in ("low", "lowest", "unseen", "xyzzy", "w"):
        assert "".join(bpe_apply_word(w, ranks)) == w + END


def test_bpe_train_determinism_and_exhaustion():
    wc = [("ab", 3), ("ba", 2)]
    m1 = bpe_train(wc, n_merges=50)
    m2 = bpe_train(list(reversed(wc)), n_merges=50)
    assert m1 == m2  # input order must not matter
    # exhaustion: a tiny vocab runs out of pairs before 50 merges
    assert len(m1) < 50


def test_bpe_spark_fit_encode_roundtrip(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = bpe_word_counts(docs, max_words=5000)
    merges = bpe_train(wc, n_merges=100)
    assert len(merges) == 100 and all(len(p) == 2 for p in merges)
    enc = bpe_encode(docs, merges).cache()
    try:
        rows = {r["doc_id"]: r for r in enc.collect()}
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        # every doc with at least one word is present, counts consistent
        for did, text in texts.items():
            words = [w for w in text.split() if w]
            if not words:
                assert did not in rows
                continue
            r = rows[did]
            assert r["n_words"] == len(words)
            assert r["n_tokens"] == len(r["tokens"]) >= r["n_words"]
            # roundtrip: stripping END markers reconstructs the exact text
            joined = "".join(r["tokens"])
            assert joined == "".join(w + END for w in words)
        # compression: merges actually fire (tokens << raw chars)
        total_tok = sum(r["n_tokens"] for r in rows.values())
        total_chars = sum(len(w) + 1 for t in texts.values() for w in t.split())
        assert total_tok < 0.8 * total_chars, (total_tok, total_chars)
    finally:
        enc.unpersist()


def test_bpe_word_counts_truncation_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    top = bpe_word_counts(docs, max_words=10).collect()
    assert len(top) == 10
    cnts = [r["cnt"] for r in top]
    assert cnts == sorted(cnts, reverse=True)
    again = bpe_word_counts(docs, max_words=10).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]
