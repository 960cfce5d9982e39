"""Staged operator path (SURVEY SS7 M2): the fused pipeline unrolled into
individually checkable DataFrame operators, all JVM-side after the S2 parse.

Must produce output byte-identical to api.extract_pages (differential test
T3). Each function maps to a SURVEY SS2 inventory row (P6, W1, W2, W5, D3-as-
Catalyst) and mirrors an upstream locus noted in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import parse as P
from .api import ExtractConfig, dedup_latest, parse_nodes_df

BOILER_TAG_LIST = sorted(P.BOILER_TAGS)


def with_layout(nodes: DataFrame) -> DataFrame:
    """P6 — synthetic geometry (SPEC SS6); re-expression of the reference's
    pixel bbox [U xml_formats/PageXml points parse + Block ctor] for HTML.

    Window cumulative sum per (url, part_id) in node_id order — one shuffle
    on url, reused by every later per-url window (same partitioning).
    """
    w = (
        Window.partitionBy("url", "part_id")
        .orderBy("node_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        nodes.withColumn(
            "y1", F.coalesce(F.sum(F.col("n_chars") + 1).over(w), F.lit(0)).cast("double")
        )
        .withColumn("y2", F.col("y1") + F.col("n_chars"))
        .withColumn("x1", F.col("depth").cast("double"))
        .withColumn("x2", F.col("x1") + 1.0)
    )


def classify_rule(nodes: DataFrame) -> DataFrame:
    """P7 + SS4 rule stage [U tasks NodeType label maps — content vs OTHER]."""
    return nodes.withColumn(
        "is_content", (~F.col("anc_boiler")) & (F.col("link_density") <= 0.5)
    )


def with_reading_order(nodes: DataFrame, content_only: bool = True) -> DataFrame:
    """W1 — reading-order rank [U graph/Block sort cmp; B:6]."""
    w = Window.partitionBy("url").orderBy("part_id", "node_id")
    df = nodes.filter("is_content") if content_only else nodes
    return df.withColumn("block_seq", F.row_number().over(w))


def with_spans(content_nodes: DataFrame) -> DataFrame:
    """W5 — running text offsets with an explicit frame (SPEC SS5)."""
    w = (
        Window.partitionBy("url")
        .orderBy("block_seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return content_nodes.withColumn(
        "text_start", F.coalesce(F.sum(F.col("n_chars") + 1).over(w), F.lit(0)).cast("long")
    ).withColumn("text_end", (F.col("text_start") + F.col("n_chars")).cast("long"))


def with_paragraphs(nodes: DataFrame, gap: float = 40.0) -> DataFrame:
    """W2 — merge vertically-adjacent blocks into paragraphs when the layout
    gap is under threshold [U ObjectModel line/paragraph grouping].
    Sessionization-by-gap: lag -> break flag -> running sum = paragraph id.
    """
    w = Window.partitionBy("url", "part_id").orderBy("node_id")
    prev_y2 = F.lag("y2").over(w)
    brk = F.when(prev_y2.isNull() | ((F.col("y1") - prev_y2) > gap), 1).otherwise(0)
    return nodes.withColumn("_brk", brk).withColumn(
        "paragraph_id", F.sum("_brk").over(
            Window.partitionBy("url", "part_id").orderBy("node_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    ).drop("_brk")


def assemble(spark: SparkSession, pages: DataFrame, content_nodes: DataFrame,
             version: str = P.PIPELINE_VERSION_RULE) -> DataFrame:
    """D3-as-Catalyst — deterministic per-url text assembly, fully JVM-side.

    collect_list is unordered under parallel merge, so ordering is imposed
    with array_sort on a (block_seq-first) struct — deterministic regardless
    of partitioning (SURVEY SS4.4). Left join keeps zero-block pages.
    """
    agg = (
        content_nodes.groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("block_seq", "node_id", "text_start", "text_end", "text")
                )
            ).alias("_blocks")
        )
        .select(
            "url",
            F.array_join(F.expr("transform(_blocks, b -> b.text)"), "\n").alias("_body"),
            F.expr(
                "transform(_blocks, b -> struct(b.node_id as node_id,"
                " b.text_start as start, b.text_end as end))"
            ).alias("spans"),
            F.size("_blocks").alias("n_blocks"),
        )
    )
    marker = F.lit(P.TRUNCATION_MARKER)
    base = pages.select(
        "url",
        "warc_ts",
        # coalesce: NULL html (spec: -> '') must not fall through the
        # when-chain into the truncation-marker branch
        F.coalesce(F.length("html") > P.MAX_HTML_BYTES, F.lit(False)).alias("_trunc"),
    )
    body = F.coalesce(F.col("_body"), F.lit(""))
    text = (
        F.when(~F.col("_trunc"), body)
        .when(F.coalesce(F.col("n_blocks"), F.lit(0)) > 0, F.concat(body, F.lit("\n"), marker))
        .otherwise(marker)
    )
    return base.join(agg, "url", "left").select(
        "url",
        "warc_ts",
        text.alias("extracted_text"),
        F.coalesce(F.col("n_blocks"), F.lit(0)).cast("int").alias("n_blocks"),
        F.coalesce(F.col("spans"), F.expr("array()").cast(
            "array<struct<node_id:int,start:bigint,end:bigint>>")).alias("spans"),
        F.lit(version).alias("pipeline_version"),
    )


def extract_pages_staged(
    spark: SparkSession, pages: DataFrame, cfg: ExtractConfig = ExtractConfig()
) -> DataFrame:
    """Full staged pipeline: S2 -> P6 -> rule -> W1 -> W5 -> assemble."""
    deduped = dedup_latest(pages.select("url", "warc_ts", "html")) if cfg.dedup else pages
    nodes = parse_nodes_df(spark, deduped, ExtractConfig(dedup=False,
                                                         num_partitions=cfg.num_partitions,
                                                         model_path=cfg.model_path))
    if cfg.model_path:
        from .classify import classify_model

        nodes = classify_model(with_layout(nodes), cfg.model_path)
    else:
        nodes = classify_rule(with_layout(nodes))
    content = with_spans(with_reading_order(nodes))
    if cfg.model_path:
        from .classify import load_artifact

        version = P.model_version(load_artifact(cfg.model_path))
    else:
        version = P.PIPELINE_VERSION_RULE
    return assemble(spark, deduped, content, version)
