"""Byte-pair-encoding tokenizer: distributed fit, broadcast-join encode.

The training-data pipeline's tokenizer stage, shaped for 100 TB the same
way ivf_fit is (two-phase frozen-artifact rule):

- ``bpe_word_counts``: the DISTRIBUTED phase — one shuffle aggregates the
  corpus into a word-frequency dictionary, optionally truncated to the
  top-``max_words`` words (the classic BPE trainer operates on this dict,
  not the corpus; Sennrich et al. 2016, public algorithm).
- ``bpe_train``: driver-side merge learning over the (bounded) dict —
  deterministic: best pair by (count desc, pair asc), so reruns and
  engines agree exactly.
- ``bpe_encode``: applies the frozen merge ranks corpus-wide WITHOUT
  running Python per token occurrence: distinct words are encoded once
  (the Python cost is O(|vocab|), not O(corpus)), then a broadcast join
  maps every occurrence to its subword sequence — pure JVM on the hot
  path. At 10^12 docs the distinct-word table is still dictionary-sized.

Upstream locus: TranskribusDU tokenizes node text for its CRF/ECN feature
extraction [U tasks/, crf/]; BPE is the modern LLM-pipeline analogue.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (standard BPE; keeps merges word-bounded)


def bpe_word_counts(df: DataFrame, text_col: str = "text",
                    max_words: int = 100_000) -> DataFrame:
    """Distributed word-frequency dictionary: whitespace words, one
    groupBy shuffle, deterministic top-``max_words`` truncation by
    (count desc, word asc). Map-side partial aggregation collapses the
    per-partition stream before the shuffle."""
    words = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count("*").alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(max_words)
    )


def _pair_stats(vocab: dict) -> dict:
    stats: dict = {}
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + cnt
    return stats


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(word_counts, n_merges: int = 200) -> list:
    """Learn ``n_merges`` BPE merges from a word-frequency dictionary
    (DataFrame[word, cnt] or iterable of (word, cnt)). Driver-side by
    design — the dict is bounded by ``max_words``, and this is the ONLY
    driver action (two-phase rule; cf. dedup.ivf_fit). Deterministic:
    ties broken by lexicographically smallest pair. Returns
    [(left, right), ...] in merge order."""
    if isinstance(word_counts, DataFrame):
        rows = word_counts.collect()
        word_counts = [(r["word"], r["cnt"]) for r in rows]
    vocab = {}
    for w, c in word_counts:
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(s, best): c for s, c in vocab.items()}
    return merges


def bpe_apply_word(word: str, ranks: dict) -> list:
    """Encode ONE word with frozen merge ranks: repeatedly merge the
    lowest-rank adjacent pair (the standard greedy BPE apply)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(df: DataFrame, merges: list, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus-wide BPE encode, broadcast-join shaped: Python runs once per
    DISTINCT word (a scalar pandas_udf over the deduplicated word table),
    then every word occurrence picks up its subword array via a broadcast
    join and per-doc results re-assemble in word order with JVM
    aggregation. Returns (id_col, n_words, n_tokens, tokens) where
    ``tokens`` is the flattened subword sequence of the document.

    Scale shape: one explode + two shuffles (distinct words; the per-doc
    regroup keyed by id — same key as extraction). The pandas_udf side is
    O(|distinct words|) regardless of corpus size."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode_word(words: pd.Series) -> pd.Series:
        return words.map(lambda w: bpe_apply_word(w, ranks))

    occ = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("pos", "word"),
    )
    distinct_words = occ.select("word").distinct()
    encoded = distinct_words.select("word", encode_word("word").alias("subs"))
    return (
        occ.join(F.broadcast(encoded), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "subs"))),
                    lambda s: s["subs"],
                )
            ).alias("tokens"),
        )
        .select(
            id_col, "n_words",
            F.size("tokens").cast("long").alias("n_tokens"), "tokens",
        )
    )
