"""CLI extraction job — the engine's `--run` entry point (SURVEY SS3.4).

spark-submit --py-files dist/sparkdu.zip sparkdu/jobs/extract_job.py \
    --input <pages parquet/Iceberg dir> --output <dir> --run-id r1 \
    [--partitions 256] [--waves 8] [--model artifacts/clf_v1.json] [--resume]

Local smoke: python -m sparkdu.jobs.extract_job --input fixtures_data/pages.parquet \
    --output /tmp/sparkdu_run --run-id local1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--model", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--format", default="html",
                    choices=("html", "pagexml", "pdf", "warc"),
                    help="input collection format: html pages parquet "
                         "(url/warc_ts/html), a native PAGE-XML/PDF "
                         "collection parquet (doc_id + xml/pdf binary), "
                         "or WARC/1.0 shards (shard_id + payload binary) "
                         "— warc feeds the html pipeline after container "
                         "extraction, so --model applies")
    args = ap.parse_args(argv)
    if args.format in ("pagexml", "pdf") and args.model:
        ap.error("--model applies to --format html/warc only (the native "
                 "PAGE-XML/PDF legs use their format's content rule)")

    from pyspark.sql import functions as F

    from sparkdu.lineage import ExtractJobConfig, run_extract_job
    from sparkdu.session import get_spark
    from sparkdu.tables import PAGES_SCHEMA

    spark = get_spark(app=f"sparkdu-extract-{args.run_id}", master=args.master)
    if args.format == "html":
        pages = spark.read.schema(PAGES_SCHEMA).parquet(args.input)
    elif args.format == "warc":
        # WARC/1.0 shards -> HTTP-200 text/html pages -> the HTML
        # pipeline (wave machinery, model, resume all apply). Fail-whole
        # drops corrupt shards SILENTLY at the record level, so account
        # them here at shard granularity — an invisible coverage hole is
        # the one thing a crawl-scale job must never have.
        from sparkdu.warc import shard_error_accounting, warc_pages

        shards = spark.read.parquet(args.input)
        n_shards, n_failed = shard_error_accounting(shards)
        print(f"warc: shards={n_shards} shard_errors={n_failed}")
        pages = warc_pages(shards)
    else:
        # native collection: synthesize the url/warc_ts key so the wave
        # machinery (salting, J9 sort, checkpoints, resume) is shared
        payload_col = "xml" if args.format == "pagexml" else "pdf"
        # a NULL doc_id would make url NULL and be silently swallowed by
        # the J9 dedup sort — fail loud instead (lineage accounts every doc)
        pages = spark.read.parquet(args.input).select(
            F.when(
                F.col("doc_id").isNotNull(),
                F.concat(F.lit(args.format + "://"),
                         F.col("doc_id").cast("string")),
            ).otherwise(
                F.raise_error(F.lit("native input row has NULL doc_id"))
            ).alias("url"),
            F.timestamp_seconds(F.lit(0)).alias("warc_ts"),
            F.col(payload_col).alias("html"),
        )
    cfg = ExtractJobConfig(
        run_id=args.run_id,
        out_dir=args.output,
        num_partitions=args.partitions,
        waves=args.waves,
        model_path=args.model,
        resume=args.resume,
        # warc is a container around html pages: downstream extraction is
        # the HTML pipeline
        input_format=("html" if args.format == "warc" else args.format),
    )
    t0 = time.time()
    total = run_extract_job(spark, pages, cfg)
    dt = time.time() - t0
    print(
        f"run_id={args.run_id} pages={total['n_pages']} nodes={total['n_nodes']} "
        f"errors={total['n_errors']} waves={total['waves_run']} "
        f"wall={dt:.1f}s rate={total['n_pages']/max(dt,1e-9):.0f} docs/s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
