"""CLI WAT job — per-page metadata + resolved outlinks from raw HTML.

The WAT half of the crawl-dump triad (WET text = extract_job, CDX index
= warc_cdx_index): one pass over the pages produces two tables,

    <output>/doc_meta   url, title, meta_description, canonical_url,
                        og_title, html_lang, charset, n_meta_fields
    <output>/outlinks   url, dst_url, anchor_text, external

Both transforms are pure JVM codegen maps (sparkdu.webmeta) — the job
plan is scan -> map -> write with ZERO shuffles by default, so at 100 TB
it runs at scan speed and parallelism is purely the input split count.
``--by-host`` adds the one optional shuffle: outlinks repartitioned by
dst_url host so downstream host-graph consumers (frontier, indegree,
PageRank) read co-located partitions without re-shuffling.

spark-submit --py-files dist/sparkdu.zip sparkdu/jobs/wat_job.py \
    --input <pages parquet dir> --output <dir> --run-id w1 \
    [--format html|warc] [--partitions N] [--by-host]

Local smoke: python -m sparkdu.jobs.wat_job \
    --input fixtures_data/pages_meta.parquet --output /tmp/sparkdu_wat \
    --run-id local1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def run_wat_job(spark, pages, out_dir: str, partitions: int = 0,
                by_host: bool = False) -> dict:
    """Write doc_meta + outlinks for ``pages`` (url, html) under
    ``out_dir``; returns row counts. The input is cached for the job's
    duration so both sinks consume ONE scan+parse of the pages (at crawl
    scale, materialize the pages once and run this from that table — the
    cache is the in-sandbox stand-in). Atomicity: the parquet job-commit
    protocol makes each FIRST write into a fresh ``out_dir`` all-or-
    nothing (_SUCCESS present iff complete); a rerun in overwrite mode
    is NOT atomic over a previous table, so point each run at its own
    directory — or use the snapshots module when readers need an atomic
    pointer swap."""
    from pyspark.sql import functions as F

    from sparkdu import webmeta as WM

    pages = pages.cache()
    try:
        meta = WM.doc_meta(pages)
        links = WM.outlinks(pages)
        if partitions:
            # split-count control without a shuffle (coalesce only
            # narrows); under --by-host the links layout comes from the
            # repartition instead — coalescing first would throttle the
            # scan+parse stage to `partitions` tasks for no layout gain
            meta = meta.coalesce(partitions)
            if not by_host:
                links = links.coalesce(partitions)
        if by_host:
            n = partitions or spark.sparkContext.defaultParallelism
            links = links.repartition(
                n, F.lower(F.regexp_extract("dst_url", WM.HOST, 1)))
        meta.write.mode("overwrite").parquet(os.path.join(out_dir, "doc_meta"))
        links.write.mode("overwrite").parquet(
            os.path.join(out_dir, "outlinks"))
    finally:
        pages.unpersist()
    meta_out = spark.read.parquet(os.path.join(out_dir, "doc_meta"))
    links_out = spark.read.parquet(os.path.join(out_dir, "outlinks"))
    n_links, n_external = links_out.agg(
        F.count(F.lit(1)), F.coalesce(F.sum("external"), F.lit(0))
    ).collect()[0]
    return {
        "n_pages": meta_out.count(),
        "n_links": n_links,
        "n_external": int(n_external),
    }


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--by-host", action="store_true",
                    help="repartition outlinks by destination host "
                         "(one shuffle) for co-located host-graph reads")
    ap.add_argument("--master", default=None)
    ap.add_argument("--format", default="html", choices=("html", "warc"),
                    help="html pages parquet (url + html binary) or "
                         "WARC/1.0 shards (container-extracted first, "
                         "with shard-granularity error accounting)")
    args = ap.parse_args(argv)

    from sparkdu.session import get_spark

    spark = get_spark(app=f"sparkdu-wat-{args.run_id}", master=args.master)
    if args.format == "warc":
        from sparkdu.warc import shard_error_accounting, warc_pages

        shards = spark.read.parquet(args.input)
        n_shards, n_failed = shard_error_accounting(shards)
        print(f"warc: shards={n_shards} shard_errors={n_failed}")
        # run_wat_job caches its input, so the container extraction also
        # parses once, not once per sink
        pages = warc_pages(shards).select("url", "html")
    else:
        pages = spark.read.parquet(args.input).select("url", "html")
    t0 = time.time()
    total = run_wat_job(spark, pages, args.output,
                        partitions=args.partitions, by_host=args.by_host)
    dt = time.time() - t0
    print(
        f"run_id={args.run_id} pages={total['n_pages']} "
        f"links={total['n_links']} external={total['n_external']} "
        f"wall={dt:.1f}s rate={total['n_pages']/max(dt,1e-9):.0f} docs/s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
