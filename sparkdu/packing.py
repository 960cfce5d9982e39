"""Token-budget sequence packing for training-data pipelines.

Packs documents into fixed-token-budget training sequences two ways:

- `pack_chunks` (SQL-expressible, oracle-checked as `pack_seq_chunks`):
  sequential chunking — docs in deterministic order, chunk boundary every
  `budget` cumulative tokens. One window + one agg; the 100 TB shape.
- `pack_greedy` (applyInPandas, pytest-gated): true greedy next-fit — a doc
  opens a new bin when it would overflow the current one, so no bin ever
  exceeds the budget unless a single oversized doc is alone in its bin.
  Grouped per `group_col` so state never crosses a partition; within a
  group the pandas loop is sequential by construction (packing is a
  running-reset recurrence, not a cumsum), but groups pack in parallel
  across executors and each group is one Arrow batch — no per-row Python
  UDF over the table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tok", T.LongType()),
    ]
)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count as a JVM expression (no Python crossing)."""
    return df.withColumn("n_tok", F.size(F.split(F.col(text_col), " ")).cast("long"))


def pack_chunks(df: DataFrame, budget: int, group_col: str = "source",
                order_col: str = "doc_id") -> DataFrame:
    """Sequential chunking: chunk_id = cumulative-tokens-before // budget.
    Pure window + agg; an approximation of packing that a SQL oracle can
    replicate exactly (see the `pack_seq_chunks` harness key)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col).orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        df.withColumn("chunk_id", (before / budget).cast("long"))
        .groupBy(group_col, "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("chunk_tokens"),
        )
    )


def pack_greedy(df: DataFrame, budget: int, group_col: str = "source",
                order_col: str = "doc_id") -> DataFrame:
    """Greedy next-fit packing per group: deterministic (docs visited in
    `order_col` order), bins never exceed `budget` except when one doc is
    itself over budget (it sits alone in its own bin). Returns one row per
    doc with its assigned bin."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        bins, cur_bin, cur_tok = [], 0, 0
        for n in pdf["n_tok"]:
            n = int(n)
            if cur_tok > 0 and cur_tok + n > budget:
                cur_bin += 1
                cur_tok = 0
            bins.append(cur_bin)
            cur_tok += n
        return pd.DataFrame(
            {
                "group_key": pdf[group_col].astype(str),
                "bin_id": pd.array(bins, dtype="int64"),
                "doc_id": pdf[order_col].astype("int64"),
                "n_tok": pdf["n_tok"].astype("int64"),
            }
        )

    return (
        df.select(group_col, order_col, "n_tok")
        .groupBy(group_col)
        .applyInPandas(pack, schema=PACK_SCHEMA)
    )
