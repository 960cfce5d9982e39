"""Bloom-filter membership prefilter for incremental dedup.

The scale path for "is this url/document already in the corpus?" when the
reference set is too big to broadcast raw: build an m-bit Bloom filter
over the reference keys DISTRIBUTED (map-side partial bitmaps folded with
bit_or — never a driver-side scan of the keys), then test candidates with
a broadcast join against the m/64-row bitmap table. A hit on all k
probe positions means "probably present" (forward to the exact check); a
miss on any position is a GUARANTEED absent — the no-false-negative
property that makes it a safe prefilter in front of the exact anti-join.

Everything stays JVM-side: probe positions are xxhash64(key, i) mod m,
bit packing is shiftleft/bit_or aggregation, membership is a broadcast
hash join + bitwise test. Sizing: fp rate ~= (1 - e^(-k n / m))^k; the
caller picks m for the target rate (m ~= -n ln(p) / ln(2)^2 bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _positions(col: str, m_bits: int, k: int):
    """Array of k probe positions in [0, m_bits) for `col`."""
    return F.array(*[
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ])


def bloom_build(keys: DataFrame, col: str, m_bits: int = 1 << 17,
                k: int = 5) -> DataFrame:
    """Aggregate the reference keys into a (word, mask) bitmap table.

    m_bits/64 rows; the groupBy(word) agg gets a map-side partial bit_or,
    so each input partition contributes one ~m/8-byte bitmap to the
    shuffle regardless of its row count — the build cost is one scan of
    the keys plus a constant-size merge, exactly the mergeable-sketch
    shape (same contract as count_min_sketch / HLL)."""
    pos = keys.select(
        F.explode(_positions(col, m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("mask")
        )
    )


def bloom_maybe_contains(candidates: DataFrame, col: str, bitmap: DataFrame,
                         m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """Tag candidate rows with maybe_member (true = all k bits set).

    The bitmap table is broadcast (m_bits/64 rows — a few thousand for any
    practical m); candidates explode to k probe rows, join the bitmap on
    word, and a row is a member iff every probe found its bit. One
    broadcast join + one groupBy on the candidate key; the exact
    verification join downstream then runs only on the maybe-members."""
    probes = candidates.select(
        F.col(col),
        F.explode(_positions(col, m_bits, k)).alias("pos"),
    ).select(
        col,
        (F.col("pos") / 64).cast("long").alias("word"),
        (F.col("pos") % 64).cast("int").alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bitmap), "word", "left")
        .select(
            col,
            F.when(
                F.expr("(shiftright(mask, bit) & 1) = 1"), 1
            ).otherwise(0).alias("hit"),
        )
    )
    return hits.groupBy(col).agg(
        (F.min("hit") == 1).alias("maybe_member")
    )
