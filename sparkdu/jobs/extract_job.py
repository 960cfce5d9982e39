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
    args = ap.parse_args(argv)

    from sparkdu.lineage import ExtractJobConfig, run_extract_job
    from sparkdu.session import get_spark
    from sparkdu.tables import PAGES_SCHEMA

    spark = get_spark(app=f"sparkdu-extract-{args.run_id}", master=args.master)
    pages = spark.read.schema(PAGES_SCHEMA).parquet(args.input)
    cfg = ExtractJobConfig(
        run_id=args.run_id,
        out_dir=args.output,
        num_partitions=args.partitions,
        waves=args.waves,
        model_path=args.model,
        resume=args.resume,
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
