"""CLI incremental-extraction job — the steady-state consumer loop
(SURVEY §10 item 34): each invocation consumes ONLY the pages appended to
the source snapshot table since the last run's checkpoint, extracts them,
and MERGEs the results by url into the extracted snapshot table. O(new
data) per run, never O(table); a lost checkpoint replays the same appends
and the merge converges (idempotent by key).

spark-submit --py-files dist/sparkdu.zip sparkdu/jobs/incremental_job.py \
    --source <pages snapshot dir> --output <extracted snapshot dir> \
    [--partitions 16] [--model artifacts/clf_v1.json] [--run-id incx]

Local smoke: python -m sparkdu incremental --source /tmp/src --output /tmp/out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True,
                    help="snapshot-committed pages table (sparkdu.snapshots)")
    ap.add_argument("--output", required=True,
                    help="extracted snapshot table dir (created on first run)")
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--model", default=None)
    ap.add_argument("--dedup-state", default=None, metavar="DIR",
                    help="chain cross-increment dedup: extracted docs are "
                         "checked against the state tables under DIR and "
                         "only survivors merge (state grows per increment)")
    ap.add_argument("--run-id", default="incx")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sparkdu.incremental import run_incremental_extract
    from sparkdu.session import get_spark

    spark = get_spark(app=f"sparkdu-incremental-{args.run_id}",
                      master=args.master)
    t0 = time.time()
    r = run_incremental_extract(
        spark, args.source, args.output,
        num_parts=args.partitions, model_path=args.model, run_id=args.run_id,
        dedup_state=args.dedup_state,
    )
    dt = time.time() - t0
    if r["noop"]:
        print(f"run_id={args.run_id} noop=1 src_id={r['src_to']} "
              f"wall={dt:.1f}s (nothing appended since checkpoint)")
    else:
        dd = (f" dedup_dropped={r['dedup_dropped']}"
              if args.dedup_state else "")
        print(
            f"run_id={args.run_id} src={r['src_from']}->{r['src_to']} "
            f"pages={r['pages_in']} new={r['rows_new']} "
            f"updated={r['rows_matched']} snapshot={r['snapshot_id']}"
            f"{dd} wall={dt:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
