"""Randomized state-machine differential for the snapshot layer.

A seeded random sequence of table operations — wave upserts, CoW deletes,
MOR tombstone deletes, folds, compaction, CoW merges, branch
stage/publish/drop — runs against BOTH the real implementation (tmpdir +
Spark) and a trivial in-memory Python model of the table's VISIBLE state
({url: v} plus a history of committed views). After every op the live
read, and at the end every still-readable historical snapshot, must equal
the model. This is the strongest practical gate on the interaction
surface (tombstones x folds x branches x compaction) where pairwise tests
can miss composition bugs.

Op preconditions mirror the documented contracts (e.g. CoW DML refuses
over pending tombstones — the model only issues legal sequences, and one
dedicated step asserts the refusal fires).
"""

import os
import random

from pyspark.sql import functions as F

from sparkdu import snapshots as S

K = 4  # partitions


class Model:
    """Visible-state model: dict url -> v, with per-snapshot copies."""

    def __init__(self):
        self.live: dict[str, int] = {}
        self.history: dict[int, dict[str, int]] = {}
        self.tombstones: set[str] = set()
        self.branch: dict[str, int] | None = None  # url->v staged view

    def snap(self, sid: int):
        self.history[sid] = dict(self.visible())

    def visible(self) -> dict[str, int]:
        return {u: v for u, v in self.live.items()
                if u not in self.tombstones}


def _write_partition(spark, out, rows, keys):
    df = spark.createDataFrame(rows, "url string, v int").withColumn(
        "partition_key", F.pmod(F.xxhash64("url"), F.lit(K)).cast("int")
    )
    for k in keys:
        df.filter(F.col("partition_key") == k).drop(
            "partition_key"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "extracted", f"partition_key={k}")
        )


def _read_live(spark, out, sid=None) -> dict[str, int]:
    return {
        r["url"]: r["v"]
        for r in S.read_snapshot(spark, out, snapshot_id=sid)
        .select("url", "v").collect()
    }


def test_snapshot_state_machine_differential(spark, tmp_path):
    rng = random.Random(1234)
    out = str(tmp_path / "t")
    model = Model()

    # bootstrap: full table of 24 urls over all K partitions
    init_rows = [(f"u{i}", i) for i in range(24)]
    _write_partition(spark, out, init_rows, list(range(K)))
    sid = S.commit_wave_snapshot(out, "init", 0, list(range(K)))
    model.live = dict(init_rows)
    model.snap(sid)
    unreadable: set[int] = set()   # snapshots invalidated by rewrites
    next_u = [100]

    def fresh_urls(n):
        urls = [(f"u{next_u[0] + i}", next_u[0] + i) for i in range(n)]
        next_u[0] += n
        return urls

    def op_merge():
        # CoW merge: update 2 existing + insert 1 (illegal over tombstones
        # -> fold first in the model-driven sequence)
        if model.tombstones:
            op_fold()
        vis = model.visible()
        if len(vis) < 2:
            return
        ups = rng.sample(sorted(vis), 2)
        ins = fresh_urls(1)
        rows = [(u, vis[u] + 1000) for u in ups] + ins
        df = spark.createDataFrame(rows, "url string, v int")
        r = S.merge_upsert(spark, out, df, ["url"], num_parts=K)
        for u, v in rows:
            model.live[u] = v
        model.snap(r["snapshot_id"])

    def op_delete_cow():
        if model.tombstones:
            op_fold()
        vis = model.visible()
        if not vis:
            return
        victim = rng.choice(sorted(vis))
        r = S.delete_keys(
            spark, out, spark.createDataFrame([(victim,)], "url string"),
            ["url"], num_parts=K,
        )
        model.live.pop(victim, None)
        model.snap(r["snapshot_id"])

    def op_delete_mor():
        vis = model.visible()
        if not vis:
            return
        victims = rng.sample(sorted(vis), min(2, len(vis)))
        r = S.delete_keys_mor(
            spark, out,
            spark.createDataFrame([(u,) for u in victims], "url string"),
            ["url"], num_parts=K,
        )
        model.tombstones.update(victims)
        model.snap(r["snapshot_id"])

    def op_fold():
        if not S.pending_delete_files(out):
            return
        r = S.fold_deletes(spark, out)
        for u in model.tombstones:
            model.live.pop(u, None)
        model.tombstones.clear()
        # fold rewrote partitions: parents referencing replaced files
        # still readable (old files kept) — nothing becomes unreadable
        model.snap(r["snapshot_id"])

    def op_compact():
        if model.tombstones:
            op_fold()
        r = S.compact_partitions(spark, out, min_files=2)
        if r["snapshot_id"] is not None:
            model.snap(r["snapshot_id"])

    def op_branch_cycle():
        # stage fresh rows on NEW urls routed anywhere -> must stay
        # invisible to main until publish; 50/50 publish vs drop.
        rows = fresh_urls(3)
        df = spark.createDataFrame(rows, "url string, v int")
        # explicit-file append commit: immune to the glob aliasing that a
        # wave commit would hit on partitions CoW rewrites ever touched
        staged = S.append_rows_snapshot(spark, out, df, num_parts=K,
                                        run_id="stage", branch="wap")
        assert _read_live(spark, out) == model.visible(), "stage leaked"
        staged_view = _read_live(spark, out, staged)
        want = dict(model.visible())
        want.update(dict(rows))
        assert staged_view == want, "staged view wrong"
        if rng.random() < 0.5:
            S.publish_branch(out, "wap")
            model.live.update(dict(rows))
            model.snap(staged)
        else:
            S.drop_branch(out, "wap")

    tags: dict[str, int] = {}    # name -> sid pinned by a ref (GC roots)
    n_tag = [0]

    def op_tag():
        # tag the current snapshot: it must stay readable through any
        # later expiry (refs + parent chains are GC roots)
        sid = S.current_snapshot_id(out)
        if sid is None or sid not in model.history:
            return
        name = f"tag{n_tag[0]}"
        n_tag[0] += 1
        S.set_ref(out, name, sid)
        tags[name] = sid

    def op_expire():
        if model.tombstones:
            op_fold()
        S.expire_snapshots(out, keep_last=rng.choice([1, 2]))
        # every tag must still resolve and read back its pinned view
        for name, sid in tags.items():
            assert S.resolve_ref(out, name) == sid
            assert _read_live(spark, out, sid) == model.history[sid], (
                f"tag {name} unreadable after expiry"
            )

    def op_branch_cycle_staged_expiry():
        # the ADVICE r3 scenario randomized: expiry runs WHILE a branch is
        # staged; the staged chain must survive and still publish (or drop)
        rows = fresh_urls(2)
        df = spark.createDataFrame(rows, "url string, v int")
        staged = S.append_rows_snapshot(spark, out, df, num_parts=K,
                                        run_id="stage", branch="wap")
        S.expire_snapshots(out, keep_last=1)
        assert _read_live(spark, out) == model.visible(), "stage leaked"
        assert _read_live(spark, out, staged) == {
            **model.visible(), **dict(rows)
        }, "staged view lost to expiry"
        if rng.random() < 0.5:
            S.publish_branch(out, "wap")
            model.live.update(dict(rows))
            model.snap(staged)
        else:
            S.drop_branch(out, "wap")

    ops = [op_merge, op_delete_cow, op_delete_mor, op_fold, op_compact,
           op_branch_cycle, op_tag, op_expire, op_branch_cycle_staged_expiry]
    for step in range(24):
        rng.choice(ops)()
        got = _read_live(spark, out)
        assert got == model.visible(), f"live mismatch after step {step}"

    # the documented CoW-over-tombstones refusal actually fires
    op_delete_mor()
    if model.tombstones:
        import pytest

        with pytest.raises(ValueError, match="pending MOR tombstones"):
            S.merge_upsert(
                spark, out,
                spark.createDataFrame([("zz", 1)], "url string, v int")
                .unionByName(spark.createDataFrame(
                    [(sorted(model.tombstones)[0], 2)], "url string, v int")),
                ["url"], num_parts=K,
            )
        op_fold()

    # every historical snapshot still on disk reads back its model view
    checked = 0
    for m in S.snapshot_history(out):
        hid = m["snapshot_id"]
        if hid in model.history and hid not in unreadable:
            try:
                got = _read_live(spark, out, hid)
            except Exception:
                continue  # files GC'd by a dropped branch — acceptable
            assert got == model.history[hid], f"time travel wrong at {hid}"
            checked += 1
    # expiry ops legitimately shrink the on-disk history (keep_last=1/2),
    # so the floor is small — but every TAGGED snapshot is a GC root and
    # must still read its pinned view at the very end
    assert checked >= 2
    for name, sid in tags.items():
        assert S.resolve_ref(out, name) == sid
        assert _read_live(spark, out, sid) == model.history[sid], (
            f"tag {name} lost its view by the end"
        )
