"""Structured Streaming demonstration (SURVEY SS2.10 — optional).

The reference is batch-only [U]; the north rule is batch [B:14]. This module
exists to show the engine's operators compose with streaming ingestion: a
file-source stream of `events`-shaped parquet, watermarked 10-minute tumbling
windows per event_type, and a streaming variant of the extraction stage
(pages arriving as files -> mapInPandas extraction -> append sink).

Never on the correctness path; covered by tests/test_streaming.py using
Trigger.AvailableNow so it runs bounded in CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .api import ExtractConfig, fused_extract_udf
from .tables import EXTRACTED_SCHEMA, PAGES_SCHEMA


def windowed_event_counts(spark: SparkSession, src_dir: str, schema) -> DataFrame:
    """10-min tumbling window counts with 15-min watermark for late data."""
    stream = spark.readStream.schema(schema).parquet(src_dir)
    return (
        stream.withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "total_value",
        )
    )


def streaming_extract(spark: SparkSession, pages_dir: str,
                      cfg: ExtractConfig = ExtractConfig()) -> DataFrame:
    """Streaming flagship: pages files -> fused extraction (same UDF as
    batch; dedup is a batch concern — streaming appends latest crawl)."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    return stream.select("url", "warc_ts", "html").mapInPandas(
        fused_extract_udf(cfg), schema=EXTRACTED_SCHEMA
    )


def run_available_now(df: DataFrame, out_dir: str, checkpoint_dir: str,
                      mode: str = "append") -> None:
    """Drain everything currently available, then stop (bounded run)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
