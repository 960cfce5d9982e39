"""Snapshot inspection + maintenance CLI (sparkdu.snapshots front end).

    python -m sparkdu snapshots --dir /path/to/run            # history
    python -m sparkdu snapshots --dir ... --expire-keep 2     # expiry
    python -m sparkdu snapshots --dir ... --read 3            # row count
                                                              # at snap 3

No Spark session unless --read is given.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="sparkdu snapshots")
    ap.add_argument("--dir", required=True, help="extract-job output dir")
    ap.add_argument("--expire-keep", type=int, default=None,
                    help="expire all but the newest N snapshots")
    ap.add_argument("--read", type=int, default=None,
                    help="read this snapshot id and print its row count")
    ap.add_argument("--compact", type=int, default=None, metavar="MIN_FILES",
                    help="rewrite partitions with >= MIN_FILES files as one "
                         "file each and commit a replace snapshot")
    ap.add_argument("--fold-deletes", action="store_true",
                    help="fold pending MOR tombstones into the data files")
    ap.add_argument("--publish-branch", default=None, metavar="NAME",
                    help="fast-forward main to a staged branch head")
    ap.add_argument("--drop-branch", default=None, metavar="NAME",
                    help="discard a staged branch (manifests + files)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from sparkdu import snapshots as S

    cur = S.current_snapshot_id(args.dir)
    for m in S.snapshot_history(args.dir):
        n_files = sum(len(v) for v in m["partition_keys"].values())
        mark = " <- current" if m["snapshot_id"] == cur else ""
        print(f"snap {m['snapshot_id']:>4}  run={m['run_id']} wave={m['wave']} "
              f"parts={len(m['partition_keys'])} files={n_files} "
              f"ts={m['created_ts']}{mark}")

    # read BEFORE expiry: --read N --expire-keep M in one command must not
    # expire the snapshot it was asked to read
    if args.read is not None:
        from sparkdu.session import get_spark

        spark = get_spark(app="snapshot-read", master=args.master)
        df = S.read_snapshot(spark, args.dir, snapshot_id=args.read)
        print(f"snapshot {args.read}: rows={df.count()}")
        spark.stop()

    # compact BEFORE expiry so `--compact N --expire-keep M` in one command
    # can immediately GC the files the compaction superseded
    if args.compact is not None:
        from sparkdu.session import get_spark

        spark = get_spark(app="snapshot-compact", master=args.master)
        res = S.compact_partitions(spark, args.dir, min_files=args.compact)
        print(
            f"compacted partitions={res['partitions']} "
            f"files {res['files_before']} -> {res['files_after']} "
            f"snapshot={res['snapshot_id']}"
        )
        spark.stop()

    if args.fold_deletes:
        from sparkdu.session import get_spark

        spark = get_spark(app="snapshot-fold", master=args.master)
        res = S.fold_deletes(spark, args.dir)
        print(f"folded partitions={res['partitions']} "
              f"rows_deleted={res['rows_deleted']} "
              f"snapshot={res['snapshot_id']}")
        spark.stop()

    if args.publish_branch is not None:
        sid = S.publish_branch(args.dir, args.publish_branch)
        print(f"published branch {args.publish_branch!r} -> snapshot {sid}")

    if args.drop_branch is not None:
        res = S.drop_branch(args.dir, args.drop_branch)
        print(f"dropped branch {args.drop_branch!r}: "
              f"manifests={res['manifests_dropped']} "
              f"files_deleted={res['deleted_files']}")

    if args.expire_keep is not None:
        res = S.expire_snapshots(args.dir, keep_last=args.expire_keep)
        print(f"expired={res['expired']} deleted_files={res['deleted_files']}")
        print("history after expiry:")
        for m in S.snapshot_history(args.dir):
            print(f"  snap {m['snapshot_id']}")


if __name__ == "__main__":
    main()
