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
