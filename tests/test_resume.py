"""T5 — lineage/checkpoint/resume exactness (SURVEY SS5.2)."""

import os

import pytest
from pyspark.sql import functions as F

from sparkdu.lineage import ExtractJobConfig, run_extract_job


def _texts(spark, d):
    df = spark.read.parquet(os.path.join(d, "extracted"))
    return {
        r["url"]: (r["extracted_text"], r["n_blocks"])
        for r in df.select("url", "extracted_text", "n_blocks").collect()
    }


def test_resume_exact(spark, pages_df, tmp_path):
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "partial")

    cfg = ExtractJobConfig(run_id="r1", out_dir=full_dir, num_partitions=16, waves=4)
    total = run_extract_job(spark, pages_df, cfg)
    assert total["waves_run"] == 4
    full = _texts(spark, full_dir)

    # inject failure after 2 waves
    cfg2 = ExtractJobConfig(
        run_id="r1", out_dir=part_dir, num_partitions=16, waves=4, fail_after_waves=2
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extract_job(spark, pages_df, cfg2)

    cp = spark.read.parquet(os.path.join(part_dir, "checkpoints"))
    done_before = cp.filter("status = 'done'").count()
    assert 0 < done_before < 16

    # resume with the same run_id completes the remainder
    cfg3 = ExtractJobConfig(
        run_id="r1", out_dir=part_dir, num_partitions=16, waves=4, resume=True
    )
    run_extract_job(spark, pages_df, cfg3)

    resumed = _texts(spark, part_dir)
    assert resumed == full  # byte-identical union

    cp = spark.read.parquet(os.path.join(part_dir, "checkpoints"))
    # no duplicate lineage rows; counters add up
    assert cp.count() == cp.select("run_id", "partition_key").distinct().count() == 16
    n_pages = cp.agg(F.sum("n_pages")).first()[0]
    assert n_pages == len(full)
    assert cp.filter("status != 'done'").count() == 0


def test_lineage_counters(spark, pages_df, tmp_path):
    d = str(tmp_path / "cnt")
    run_extract_job(
        spark, pages_df, ExtractJobConfig(run_id="c1", out_dir=d, num_partitions=8, waves=2)
    )
    cp = spark.read.parquet(os.path.join(d, "checkpoints"))
    row = cp.agg(
        F.sum("n_pages").alias("p"), F.sum("n_nodes").alias("n"),
        F.sum("n_bytes_in").alias("b"), F.sum("n_errors").alias("e"),
    ).first()
    n_urls = pages_df.select("url").distinct().count()
    assert row["p"] == n_urls
    assert row["n"] > 0 and row["b"] > 0
    assert row["e"] == 0


def test_observe_metrics(spark, pages_df, tmp_path):
    """A6: observe() counters agree with the checkpoint-table counters."""
    d = str(tmp_path / "obs")
    total = run_extract_job(
        spark, pages_df, ExtractJobConfig(run_id="o1", out_dir=d, num_partitions=8, waves=2)
    )
    observed = total["observed"]
    assert len(observed) == 2
    n_urls = pages_df.select("url").distinct().count()
    assert sum(o["rows_out"] for o in observed) == n_urls
    assert sum(o["errors"] for o in observed) == 0
    assert all(o["bytes_in"] > 0 for o in observed)


def test_snapshot_commit_and_time_travel(spark, pages_df, tmp_path):
    """Table-format commit semantics (sparkdu.snapshots): kill a run
    mid-wave, verify the current snapshot is consistent before AND after
    resume, stray uncommitted files stay invisible, and every historical
    snapshot id remains readable (time travel)."""
    from sparkdu import snapshots as S

    d = str(tmp_path / "snap")
    cfg = ExtractJobConfig(
        run_id="s1", out_dir=d, num_partitions=16, waves=4, fail_after_waves=2
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extract_job(spark, pages_df, cfg)

    # crash state: 2 committed snapshots; current reads only checkpointed keys
    sid = S.current_snapshot_id(d)
    assert sid == 2
    cp = spark.read.parquet(os.path.join(d, "checkpoints"))
    done_keys = {r[0] for r in cp.filter("status='done'").select("partition_key").collect()}
    snap_before = S.read_snapshot(spark, d)
    keys_before = {r[0] for r in snap_before.select("partition_key").distinct().collect()}
    assert keys_before == done_keys
    rows_before = {r["url"]: r["extracted_text"] for r in snap_before.collect()}

    # a stray in-flight file in a committed partition dir is invisible to
    # snapshot readers (but WOULD be visible to a naive directory read)
    some_key = sorted(done_keys)[0]
    stray_dir = os.path.join(d, "extracted", f"partition_key={some_key}")
    spark.createDataFrame(
        [("http://stray/", None, "STRAY", 0, [], "9.9.9")],
        snap_before.drop("partition_key").schema,
    ).coalesce(1).write.mode("append").parquet(stray_dir)
    assert "http://stray/" not in {
        r["url"] for r in S.read_snapshot(spark, d).select("url").collect()
    }

    # resume: remaining waves commit snapshots 3..; final view is complete
    run_extract_job(spark, pages_df, ExtractJobConfig(
        run_id="s1", out_dir=d, num_partitions=16, waves=4, resume=True))
    hist = S.snapshot_history(d)
    assert [m["snapshot_id"] for m in hist] == list(range(1, len(hist) + 1))
    assert S.current_snapshot_id(d) == len(hist)
    final = S.read_snapshot(spark, d)
    n_urls = pages_df.select("url").distinct().count()
    assert final.count() == n_urls
    assert "http://stray/" not in {r["url"] for r in final.select("url").collect()}

    # time travel: snapshot 2 still reads exactly the pre-crash rows
    tt = S.read_snapshot(spark, d, snapshot_id=2)
    assert {r["url"]: r["extracted_text"] for r in tt.collect()} == rows_before

    # a wave re-commit replaces, not duplicates: no url appears twice
    assert final.groupBy("url").count().filter("count > 1").count() == 0


def test_expire_snapshots(spark, pages_df, tmp_path):
    """Iceberg expire_snapshots analogue: old manifests drop, data files
    referenced by no surviving manifest are deleted, every kept snapshot
    still reads consistently, and re-expiry is a no-op."""
    import glob

    from sparkdu import snapshots as S

    d = str(tmp_path / "exp")
    run_extract_job(spark, pages_df, ExtractJobConfig(
        run_id="e1", out_dir=d, num_partitions=16, waves=4))
    hist = S.snapshot_history(d)
    assert len(hist) == 4
    n_files_before = len(glob.glob(os.path.join(d, "extracted", "*", "*.parquet")))
    final_rows = {r["url"] for r in S.read_snapshot(spark, d).select("url").collect()}

    res = S.expire_snapshots(d, keep_last=2)
    assert res["expired"] == 2
    hist2 = S.snapshot_history(d)
    assert [m["snapshot_id"] for m in hist2] == [3, 4]
    # wave overwrites replace whole partitions, so snapshots 1-2 reference
    # only files that snapshots 3-4 also reference (same partitions never
    # rewritten here) — nothing dead yet unless a partition was replaced;
    # with disjoint wave keys, 0 deletions is the correct answer
    assert res["deleted_files"] == 0
    assert len(glob.glob(os.path.join(d, "extracted", "*", "*.parquet"))) == n_files_before

    # re-run into the same table without resume: dynamic overwrite replaces
    # every partition's files AT WRITE TIME (the documented time-travel
    # bound), so expiry finds the old manifests but their files are already
    # gone — deleted_files stays 0 under this writer
    run_extract_job(spark, pages_df, ExtractJobConfig(
        run_id="e2", out_dir=d, num_partitions=16, waves=4))
    res2 = S.expire_snapshots(d, keep_last=1)
    assert res2["expired"] >= 1
    assert res2["deleted_files"] == 0
    cur = S.read_snapshot(spark, d)
    assert {r["url"] for r in cur.select("url").collect()} == final_rows
    # every file the current manifest references still exists
    m = S.load_manifest(d)
    for fl in m["partition_keys"].values():
        for f in fl:
            assert os.path.exists(os.path.join(d, f)), f
    # expiring again changes nothing
    assert S.expire_snapshots(d, keep_last=1)["expired"] == 0


def test_expire_snapshots_gc_unit(tmp_path):
    """The GC half of expire_snapshots, exercised directly with hand-built
    manifests (an append-only writer produces this state: a file referenced
    only by expired manifests must be deleted; shared files survive)."""
    import json

    from sparkdu import snapshots as S

    d = str(tmp_path / "gcu")
    part = os.path.join(d, "extracted", "partition_key=0")
    os.makedirs(part)
    os.makedirs(os.path.join(d, "snapshots"))
    for name in ("a.parquet", "b.parquet", "shared.parquet"):
        with open(os.path.join(part, name), "w") as f:
            f.write("x")
    rel = lambda n: os.path.join("extracted", "partition_key=0", n)  # noqa: E731

    def manifest(sid, files):
        m = {"snapshot_id": sid, "parent_id": sid - 1 if sid > 1 else None,
             "run_id": "gc", "wave": sid - 1, "created_ts": "t",
             "partition_keys": {"0": [rel(f) for f in files]}}
        S._atomic_write(S._snap_path(d, sid), json.dumps(m))

    manifest(1, ["a.parquet", "shared.parquet"])
    manifest(2, ["b.parquet", "shared.parquet"])
    S._atomic_write(os.path.join(d, "snapshots", "_current"), "2")

    res = S.expire_snapshots(d, keep_last=1)
    assert res == {"expired": 1, "deleted_files": 1}
    assert not os.path.exists(os.path.join(part, "a.parquet"))
    assert os.path.exists(os.path.join(part, "b.parquet"))
    assert os.path.exists(os.path.join(part, "shared.parquet"))
    assert [m["snapshot_id"] for m in S.snapshot_history(d)] == [2]


def test_compaction_rewrites_small_files_preserving_history(spark, tmp_path):
    """rewrite_data_files analogue: a multi-file partition compacts to one
    file under a replace snapshot; rows identical, time travel to the
    pre-compaction snapshot still resolves the OLD files, and
    expire_snapshots afterwards GCs them."""
    import glob as g
    import os

    from pyspark.sql import functions as F

    from sparkdu import snapshots as S
    from sparkdu.harness import fx
    from sparkdu.tables import PAGES_SCHEMA

    out = str(tmp_path / "table")
    pages = (
        spark.read.schema(PAGES_SCHEMA).parquet(fx("pages")).limit(40)
        .select("url", "warc_ts", "html")
    )
    pdir = os.path.join(out, "extracted", "partition_key=0")
    pages.repartition(4).write.mode("overwrite").parquet(pdir)
    S.commit_wave_snapshot(out, "w", 0, [0])
    before = S.load_manifest(out)
    assert len(before["partition_keys"]["0"]) == 4

    stats = S.compact_partitions(spark, out, min_files=2)
    assert stats["partitions"] == 1 and stats["files_before"] == 4
    assert stats["files_after"] == 1
    after = S.load_manifest(out)
    assert after["operation"] == "compact"
    assert len(after["partition_keys"]["0"]) == 1
    # identical rows through the current snapshot
    cur = S.read_snapshot(spark, out)
    assert cur.count() == pages.count()
    assert {r["url"] for r in cur.select("url").collect()} == {
        r["url"] for r in pages.select("url").collect()
    }
    # time travel: the pre-compaction snapshot still reads its 4 old files
    old = S.read_snapshot(spark, out, snapshot_id=before["snapshot_id"])
    assert old.count() == pages.count()
    # idempotence: a second compaction finds nothing to do
    assert S.compact_partitions(spark, out, min_files=2)["partitions"] == 0
    # expiry GCs the now-unreferenced originals but keeps the compacted file
    n_files_before_gc = len(g.glob(os.path.join(pdir, "*.parquet")))
    res = S.expire_snapshots(out, keep_last=1)
    assert res["expired"] == 1 and res["deleted_files"] == 4
    assert len(g.glob(os.path.join(pdir, "*.parquet"))) == n_files_before_gc - 4
    assert S.read_snapshot(spark, out).count() == pages.count()


def test_snapshot_diff_cdc(spark, tmp_path):
    """CDC diff between wave snapshots: wave-2 urls appear as inserts,
    untouched partitions are pruned at the manifest level (no files of
    theirs read), updates are detected via the value fingerprint, and a
    self-diff refuses with 'no changed partitions'."""
    import os

    import pytest as _pytest

    from sparkdu import snapshots as S
    from sparkdu.harness import fx
    from sparkdu.lineage import ExtractJobConfig, run_extract_job
    from sparkdu.tables import PAGES_SCHEMA
    from pyspark.sql import functions as F

    pages = (
        spark.read.schema(PAGES_SCHEMA).parquet(fx("pages"))
        .filter(F.pmod(F.xxhash64(F.concat(F.col("url"), F.lit("s"))), F.lit(4)) == 0)
    )
    d = str(tmp_path / "cdc")
    run_extract_job(spark, pages, ExtractJobConfig(
        run_id="t", out_dir=d, num_partitions=8, waves=2))
    hist = S.snapshot_history(d)
    s1, s2 = hist[0]["snapshot_id"], hist[-1]["snapshot_id"]

    diff = S.snapshot_diff(spark, d, s1, s2, ["url"]).collect()
    assert diff and all(r["change_type"] == "insert" for r in diff)
    n1 = S.read_snapshot(spark, d, snapshot_id=s1).count()
    n2 = S.read_snapshot(spark, d, snapshot_id=s2).count()
    assert len(diff) == n2 - n1

    # reverse direction: the same rows come back as deletes
    rev = S.snapshot_diff(spark, d, s2, s1, ["url"]).collect()
    assert len(rev) == len(diff)
    assert all(r["change_type"] == "delete" for r in rev)

    with _pytest.raises(ValueError, match="no changed partitions"):
        S.snapshot_diff(spark, d, s2, s2, ["url"])

    # update detection: rewrite one committed file with a mutated row,
    # commit as a replace snapshot, and diff
    m = S.load_manifest(d, s2)
    pk, files = next((k, v) for k, v in m["partition_keys"].items() if v)
    full = os.path.join(d, files[0])
    part = spark.read.option(
        "basePath", os.path.join(d, "extracted")).parquet(full)
    mutated = part.withColumn(
        "n_blocks",
        F.when(F.col("url") == part.limit(1).collect()[0]["url"],
               F.col("n_blocks") + 1).otherwise(F.col("n_blocks")),
    ).drop("partition_key")
    newdir = os.path.join(d, "extracted", f"partition_key={int(pk)}_v2")
    mutated.coalesce(1).write.parquet(newdir)
    newfiles = sorted(
        os.path.relpath(os.path.join(newdir, f), d)
        for f in os.listdir(newdir) if f.endswith(".parquet")
    )
    S.commit_replace_snapshot(d, "t", {pk: newfiles})
    upd = S.snapshot_diff(spark, d, s2, s2 + 1, ["url"]).collect()
    assert [r["change_type"] for r in upd].count("update") == 1


def test_snapshot_merge_upsert(spark, tmp_path):
    """Copy-on-write MERGE: updates route to their url-hash partition;
    only those partitions are rewritten (untouched partitions keep the
    very same files at the manifest level), matched keys take the new
    values, unmatched keys append, and time travel still reads the
    pre-merge rows."""
    import os

    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")
    K = 4
    base = spark.createDataFrame(
        [(f"u{i}", i) for i in range(40)], "url string, v int"
    ).withColumn(
        "partition_key", F.pmod(F.xxhash64("url"), F.lit(K)).cast("int")
    )
    for k in range(K):
        base.filter(F.col("partition_key") == k).drop(
            "partition_key"
        ).write.mode("overwrite").parquet(
            os.path.join(out, "extracted", f"partition_key={k}")
        )
    S.commit_wave_snapshot(out, "w", 0, list(range(K)))
    before = S.load_manifest(out)

    updates = spark.createDataFrame(
        [("u3", 300), ("u7", 700), ("new1", 1000)], "url string, v int"
    )
    res = S.merge_upsert(spark, out, updates, ["url"], num_parts=K)
    assert res["rows_matched"] == 2 and res["rows_new"] == 1

    after = S.load_manifest(out)
    touched = {
        r["partition_key"]
        for r in updates.withColumn(
            "partition_key",
            F.pmod(F.xxhash64("url"), F.lit(K)).cast("int"),
        ).select("partition_key").distinct().collect()
    }
    assert res["partitions_touched"] == len(touched)
    for k in range(K):
        same = after["partition_keys"][str(k)] == before["partition_keys"][str(k)]
        assert same == (k not in touched), k

    cur = {r["url"]: r["v"] for r in S.read_snapshot(spark, out).collect()}
    assert len(cur) == 41
    assert cur["u3"] == 300 and cur["u7"] == 700 and cur["new1"] == 1000
    assert cur["u5"] == 5  # untouched key keeps its value
    # time travel: the pre-merge snapshot still shows the old values
    old = {r["url"]: r["v"] for r in
           S.read_snapshot(spark, out, before["snapshot_id"]).collect()}
    assert old["u3"] == 3 and "new1" not in old and len(old) == 40
    # idempotence: re-merging the same updates changes no values
    res2 = S.merge_upsert(spark, out, updates, ["url"], num_parts=K)
    assert res2["rows_matched"] == 3 and res2["rows_new"] == 0
    cur2 = {r["url"]: r["v"] for r in S.read_snapshot(spark, out).collect()}
    assert cur2 == cur


def test_snapshot_delete_keys(spark, tmp_path):
    """Copy-on-write DELETE: matching rows vanish from the live view,
    untouched partitions keep their files, an emptied partition commits
    an empty file list, and time travel still reads everything."""
    import os

    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")
    K = 4
    base = spark.createDataFrame(
        [(f"u{i}", i) for i in range(40)], "url string, v int"
    ).withColumn(
        "partition_key", F.pmod(F.xxhash64("url"), F.lit(K)).cast("int")
    )
    for k in range(K):
        base.filter(F.col("partition_key") == k).drop(
            "partition_key"
        ).write.mode("overwrite").parquet(
            os.path.join(out, "extracted", f"partition_key={k}")
        )
    S.commit_wave_snapshot(out, "w", 0, list(range(K)))
    before = S.load_manifest(out)

    # delete one whole partition's keys plus one key from another
    pk_of = {
        r["url"]: r["partition_key"] for r in base.collect()
    }
    victim_pk = pk_of["u0"]
    whole = [u for u, k in pk_of.items() if k == victim_pk]
    other = next(u for u, k in pk_of.items() if k != victim_pk)
    keys = spark.createDataFrame(
        [(u,) for u in whole + [other, "ghost"]], "url string"
    )
    res = S.delete_keys(spark, out, keys, ["url"], num_parts=K)
    assert res["rows_deleted"] == len(whole) + 1  # ghost matches nothing

    after = S.load_manifest(out)
    assert after["partition_keys"][str(victim_pk)] == []  # emptied out
    untouched = [k for k in range(K)
                 if k not in {victim_pk, pk_of[other]}]
    for k in untouched:
        assert after["partition_keys"][str(k)] == before["partition_keys"][str(k)]

    cur = {r["url"] for r in S.read_snapshot(spark, out).collect()}
    assert cur == set(pk_of) - set(whole) - {other}
    old = S.read_snapshot(spark, out, before["snapshot_id"])
    assert old.count() == 40  # time travel unaffected


def test_snapshot_refs_and_stats_pruning(spark, tmp_path):
    """Tags survive _current moving on; min/max footer stats prune
    non-overlapping files without opening them, and the pruned read
    returns exactly what a full scan + filter returns."""
    import os

    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")
    # 4 partitions with DISJOINT value ranges -> stats can discriminate
    for k in range(4):
        spark.createDataFrame(
            [(f"u{k}_{i}", k * 100 + i) for i in range(20)],
            "url string, v long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "extracted", f"partition_key={k}")
        )
    S.commit_wave_snapshot(out, "w", 0, list(range(4)))
    sid1 = S.current_snapshot_id(out)
    S.set_ref(out, "prod", sid1)

    # move _current on via a merge; the tag must keep resolving to sid1
    S.merge_upsert(
        spark, out,
        spark.createDataFrame([("u0_0", 9999)], "url string, v long"),
        ["url"], num_parts=4,
    )
    assert S.current_snapshot_id(out) != sid1
    assert S.resolve_ref(out, "prod") == sid1
    old = S.read_snapshot(spark, out, S.resolve_ref(out, "prod"))
    assert old.filter("url = 'u0_0'").first()["v"] == 0

    # stats + pruning on the tagged snapshot
    stats = S.annotate_stats(out, ["v"], snapshot_id=sid1)
    assert all("v" in s for s in stats.values())
    plan = S.plan_files(out, "v", 150, 260, snapshot_id=sid1)
    # ranges per file: k=0 -> 0..19, k=1 -> 100..119, k=2 -> 200..219,
    # k=3 -> 300..319; only k=2 overlaps [150, 260]
    assert plan["skipped"] == 3 and len(plan["files"]) == 1
    got = sorted(
        r["v"] for r in
        S.read_snapshot_range(spark, out, "v", 150, 260, sid1).collect()
    )
    full = sorted(
        r["v"] for r in S.read_snapshot(spark, out, sid1)
        .filter("v between 150 and 260").collect()
    )
    assert got == full and len(got) == 20


def test_snapshot_incremental_append_read(spark, tmp_path):
    """A consumer checkpointed at snapshot 1 reads ONLY wave-2's rows
    from the incremental scan; with nothing new it raises instead of
    rescanning the table."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")
    spark.createDataFrame(
        [(f"a{i}", i) for i in range(10)], "url string, v long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "extracted", "partition_key=0")
    )
    S.commit_wave_snapshot(out, "w", 0, [0])
    sid1 = S.current_snapshot_id(out)
    spark.createDataFrame(
        [(f"b{i}", i) for i in range(7)], "url string, v long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "extracted", "partition_key=1")
    )
    S.commit_wave_snapshot(out, "w", 1, [1])

    inc = S.read_appends_since(spark, out, sid1)
    assert sorted(r["url"] for r in inc.collect()) == [f"b{i}" for i in range(7)]
    with pytest.raises(ValueError, match="no files appended"):
        S.read_appends_since(spark, out, S.current_snapshot_id(out))


def test_snapshot_merge_rejects_duplicate_keys_and_typed_stats(spark, tmp_path):
    """Duplicate-key updates raise (Iceberg MERGE INTO semantics);
    timestamp column stats round-trip TYPED so datetime range scans
    prune instead of raising TypeError; steady-state incremental polls
    return an empty frame with schema=."""
    import datetime as dt
    import os

    import pytest
    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")
    t0 = dt.datetime(2026, 1, 1)
    for k in range(2):
        spark.createDataFrame(
            [(f"u{k}_{i}", t0 + dt.timedelta(days=30 * k + i))
             for i in range(10)],
            "url string, warc_ts timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "extracted", f"partition_key={k}")
        )
    S.commit_wave_snapshot(out, "w", 0, [0, 1])
    sid = S.current_snapshot_id(out)

    dup = spark.createDataFrame(
        [("u0_0", t0), ("u0_0", t0)], "url string, warc_ts timestamp"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        S.merge_upsert(spark, out, dup, ["url"], num_parts=2)

    S.annotate_stats(out, ["warc_ts"], snapshot_id=sid)
    plan = S.plan_files(
        out, "warc_ts", dt.datetime(2026, 2, 1), dt.datetime(2026, 3, 1),
        snapshot_id=sid,
    )
    assert plan["skipped"] == 1 and len(plan["files"]) == 1  # k=0 pruned
    got = S.read_snapshot_range(
        spark, out, "warc_ts",
        dt.datetime(2026, 2, 1), dt.datetime(2026, 3, 1), sid,
    ).count()
    assert got == 9  # k=1 days 31..39 => 2026-01-31 excluded

    empty = S.read_appends_since(
        spark, out, sid, schema="url string, warc_ts timestamp"
    )
    assert empty.count() == 0


def test_mor_delete_fold_and_guards(spark, tmp_path):
    """Merge-on-read DELETE (equality tombstones): the delete commits
    WITHOUT touching any data file (manifest file lists identical),
    readers apply tombstones, deletes stack, time travel to the
    pre-delete snapshot still sees the rows, copy-on-write DML refuses
    to run over pending tombstones, fold_deletes rewrites + clears them
    (after which CoW DML works again), and expire GCs old data files
    AND tombstones."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")
    K = 4
    base = spark.createDataFrame(
        [(f"u{i}", i) for i in range(40)], "url string, v int"
    ).withColumn(
        "partition_key", F.pmod(F.xxhash64("url"), F.lit(K)).cast("int")
    )
    for k in range(K):
        base.filter(F.col("partition_key") == k).drop(
            "partition_key"
        ).write.mode("overwrite").parquet(
            os.path.join(out, "extracted", f"partition_key={k}")
        )
    sid0 = S.commit_wave_snapshot(out, "w", 0, list(range(K)))

    keys1 = spark.createDataFrame([("u3",), ("u7",), ("u11",)], "url string")
    r1 = S.delete_keys_mor(spark, out, keys1, ["url"], num_parts=K)
    assert r1["tombstone_rows"] == 3
    # zero data movement: the data file lists are IDENTICAL to sid0's
    m0, m1 = S.load_manifest(out, sid0), S.load_manifest(out)
    assert m1["partition_keys"] == m0["partition_keys"]
    assert S.read_snapshot(spark, out).count() == 37
    assert S.read_snapshot(spark, out, sid0).count() == 40  # time travel
    live = {r["url"] for r in S.read_snapshot(spark, out).collect()}
    assert {"u3", "u7", "u11"}.isdisjoint(live)

    # stacked second MOR delete
    keys2 = spark.createDataFrame([("u0",), ("u1",)], "url string")
    S.delete_keys_mor(spark, out, keys2, ["url"], num_parts=K)
    assert S.read_snapshot(spark, out).count() == 35
    mor_sid = S.current_snapshot_id(out)

    # stats-pruned range read applies tombstones too
    S.annotate_stats(out, ["v"])
    pruned = S.read_snapshot_range(spark, out, "v", 0, 39)
    assert pruned.count() == 35

    # CDC between pre-delete and post-delete snapshots = pure deletes
    diff = S.snapshot_diff(spark, out, sid0, mor_sid, ["url"])
    got = {(r["url"], r["change_type"]) for r in diff.collect()}
    assert got == {(f"u{i}", "delete") for i in (3, 7, 11, 0, 1)}

    # CoW DML refuses to rewrite partitions with pending tombstones
    upd = spark.createDataFrame([("u3", 300)], "url string, v int")
    with _pytest.raises(ValueError, match="pending MOR tombstones"):
        S.merge_upsert(spark, out, upd, ["url"], num_parts=K)
    with _pytest.raises(ValueError, match="fold before switching"):
        S.delete_keys_mor(
            spark, out,
            spark.createDataFrame([("u5", 5)], "url string, v int"),
            ["url", "v"], num_parts=K,
        )

    # fold: rewrite + clear; live view unchanged, pre-fold MOR snapshot
    # and pre-delete snapshot both still read correctly
    rf = S.fold_deletes(spark, out)
    assert rf["rows_deleted"] == 5 and rf["partitions"] >= 1
    assert S.pending_delete_files(out) == {}
    assert S.read_snapshot(spark, out).count() == 35
    assert S.read_snapshot(spark, out, mor_sid).count() == 35
    assert S.read_snapshot(spark, out, sid0).count() == 40
    # CoW DML works again after the fold
    res = S.merge_upsert(spark, out, upd, ["url"], num_parts=K)
    assert res["rows_new"] == 1  # u3 was deleted; the merge re-inserts it

    # expiry GCs replaced data files and folded tombstones
    n_tombs = len(list((tmp_path / "table" / "deletes").rglob("*.parquet")))
    assert n_tombs > 0
    S.expire_snapshots(out, keep_last=1)
    left = len(list((tmp_path / "table" / "deletes").rglob("*.parquet")))
    assert left == 0
    assert S.read_snapshot(spark, out).count() == 36  # 35 + re-inserted u3


def test_wap_branch_stage_publish_drop(spark, tmp_path):
    """Write-audit-publish: a wave staged on a branch is invisible to
    main readers, publishes by fast-forward (ref removed), refuses to
    publish over a diverged main, and a dropped branch GCs its staged
    manifests AND files."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")

    def land(lo, hi, keys):
        df = spark.createDataFrame(
            [(f"u{i}", i) for i in range(lo, hi)], "url string, v int"
        )
        for k in keys:
            df.filter(F.pmod(F.xxhash64("url"), F.lit(len(keys))) == k - keys[0]) \
              .write.mode("overwrite").parquet(
                  os.path.join(out, "extracted", f"partition_key={k}"))

    land(0, 40, [0, 1, 2, 3])
    S.commit_wave_snapshot(out, "w", 0, [0, 1, 2, 3])
    assert S.read_snapshot(spark, out).count() == 40

    # stage on a branch: disjoint partition keys, main untouched
    land(40, 60, [4, 5])
    staged = S.commit_wave_snapshot(out, "stage", 1, [4, 5], branch="audit")
    assert S.read_snapshot(spark, out).count() == 40            # main view
    assert S.read_snapshot(spark, out, staged).count() == 60    # audit view
    pub = S.publish_branch(out, "audit")
    assert pub == staged
    assert S.read_snapshot(spark, out).count() == 60
    with _pytest.raises(ValueError):
        S.resolve_ref(out, "audit")                             # ref removed

    # drop path: staged files vanish from disk, main unaffected
    land(60, 70, [6])
    S.commit_wave_snapshot(out, "stage2", 2, [6], branch="audit2")
    staged_files = list(
        (tmp_path / "table" / "extracted" / "partition_key=6").glob("*.parquet")
    )
    assert staged_files
    r = S.drop_branch(out, "audit2")
    assert r["manifests_dropped"] == 1 and r["deleted_files"] >= 1
    assert not list(
        (tmp_path / "table" / "extracted" / "partition_key=6").glob("*.parquet")
    )
    assert S.read_snapshot(spark, out).count() == 60

    # non-fast-forward: main moves after the fork -> publish refuses
    land(70, 80, [7])
    S.commit_wave_snapshot(out, "stage3", 3, [7], branch="audit3")
    land(80, 90, [8])
    S.commit_wave_snapshot(out, "main-moves", 4, [8])
    with _pytest.raises(ValueError, match="cannot fast-forward"):
        S.publish_branch(out, "audit3")


def test_schema_evolution_add_column(spark, tmp_path):
    """Add-column evolution: a later append carries an extra column; a
    merge-schema read returns the union schema with nulls backfilled for
    pre-evolution files, and time travel to the pre-evolution snapshot
    reads the old schema untouched."""
    from sparkdu import snapshots as S

    out = str(tmp_path / "t")
    v1 = spark.createDataFrame([(f"u{i}", i) for i in range(6)],
                               "url string, v int")
    sid1 = S.append_rows_snapshot(spark, out, v1, num_parts=2)
    v2 = spark.createDataFrame([(f"w{i}", i, f"en-{i}") for i in range(4)],
                               "url string, v int, lang string")
    S.append_rows_snapshot(spark, out, v2, num_parts=2)

    cur = S.read_snapshot(spark, out, merge_schema=True)
    assert set(cur.columns) >= {"url", "v", "lang"}
    assert cur.count() == 10
    assert cur.filter("lang IS NULL").count() == 6      # backfilled
    assert cur.filter("lang IS NOT NULL").count() == 4
    old = S.read_snapshot(spark, out, sid1)
    assert "lang" not in old.columns and old.count() == 6


def test_expire_keeps_ref_chains(spark, tmp_path):
    """Refs are GC roots (ADVICE r3): a staged WAP branch whose fork point
    has rotated past keep_last must survive expire_snapshots — branch head,
    every branch-ancestor manifest, their data files — and publish_branch
    must still fast-forward. A tag likewise keeps its snapshot readable."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")

    def land(lo, hi, keys):
        df = spark.createDataFrame(
            [(f"u{i}", i) for i in range(lo, hi)], "url string, v int"
        )
        for k in keys:
            df.filter(F.pmod(F.xxhash64("url"), F.lit(len(keys))) == k - keys[0]) \
              .write.mode("overwrite").parquet(
                  os.path.join(out, "extracted", f"partition_key={k}"))

    land(0, 20, [0, 1])
    m1 = S.commit_wave_snapshot(out, "w", 0, [0, 1])
    S.set_ref(out, "v1", m1)                       # tag at m1

    # two staged commits on one branch: b2 -> b1 -> m1
    land(20, 30, [2])
    S.commit_wave_snapshot(out, "stage", 1, [2], branch="audit")
    land(30, 40, [3])
    b2 = S.commit_wave_snapshot(out, "stage", 2, [3], branch="audit")

    # keep_last=1 would previously unlink b1 (and m1): branch-ancestor
    # manifests gone -> publish's ancestry walk breaks; staged files GC'd
    res = S.expire_snapshots(out, keep_last=1)
    assert res["expired"] == 0                     # every manifest is a root
    assert S.read_snapshot(spark, out, S.resolve_ref(out, "v1")).count() == 20
    assert S.read_snapshot(spark, out, b2).count() == 40

    pub = S.publish_branch(out, "audit")           # legit fast-forward holds
    assert pub == b2
    assert S.read_snapshot(spark, out).count() == 40

    # after publish the branch ref is gone; the tag still pins m1 and its
    # chain, everything else behind last-1 expires
    res2 = S.expire_snapshots(out, keep_last=1)
    assert res2["expired"] > 0
    assert S.read_snapshot(spark, out, S.resolve_ref(out, "v1")).count() == 20
    assert S.read_snapshot(spark, out).count() == 40


def test_wave_commit_guard_refuses_staged_partitions(spark, tmp_path):
    """The glob-listing WAP escape (ADVICE r3): a MAIN wave commit onto a
    partition holding staged-branch files must raise (it would silently
    absorb unaudited rows); disjoint-partition main commits still work."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from sparkdu import snapshots as S

    out = str(tmp_path / "table")

    def land(lo, hi, keys):
        df = spark.createDataFrame(
            [(f"u{i}", i) for i in range(lo, hi)], "url string, v int"
        )
        for k in keys:
            df.filter(F.pmod(F.xxhash64("url"), F.lit(len(keys))) == k - keys[0]) \
              .write.mode("overwrite").parquet(
                  os.path.join(out, "extracted", f"partition_key={k}"))

    land(0, 20, [0, 1])
    S.commit_wave_snapshot(out, "w", 0, [0, 1])
    land(20, 30, [4])
    S.commit_wave_snapshot(out, "stage", 1, [4], branch="audit")

    with _pytest.raises(ValueError, match="would glob in"):
        S.commit_wave_snapshot(out, "main", 2, [4])
    # disjoint keys commit fine while the stage is pending
    land(30, 40, [5])
    sid = S.commit_wave_snapshot(out, "main", 2, [5])
    assert S.read_snapshot(spark, out, sid).count() == 30  # 20 + 10, no staged
