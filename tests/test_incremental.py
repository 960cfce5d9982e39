"""Cross-increment dedup + incremental extraction (sparkdu/incremental.py).

Semantics under test, each with hand-planted corpora:
- exact raw-hash dedup across committed increments and within a batch;
- short-doc token-normalized routing (curate parity) across increments;
- MinHash-LSH near-dup vs committed history (no history rescan) and
  in-batch, deterministic lowest-id-wins;
- crash-safety: stray state files (write landed, commit didn't) are swept
  and never change a decision; re-running an uncommitted increment
  reproduces the identical survivor set;
- incremental extraction: appends-only consumption, merge idempotence
  across a lost checkpoint, final table == one-shot batch extraction.
"""

import os
import shutil

import pytest

from sparkdu import incremental as I
from sparkdu import snapshots as S


@pytest.fixture()
def state_dir(tmp_path):
    d = str(tmp_path / "state")
    I.init_state(d)
    return d


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 20
LONG_B = "one two three four five six seven eight nine ten eleven " * 20
LONG_C = "red orange yellow green blue indigo violet ultra infra deep " * 20


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


class TestDedupIncrement:
    def test_exact_across_increments_and_in_batch(self, spark, state_dir):
        h = _docs(spark, [(1, "the quick brown fox"), (2, "unique history")])
        r0 = I.dedup_increment(spark, h, state_dir, near=False, commit=True)
        assert _ids(r0["survivors"]) == [1, 2]
        batch = _docs(spark, [
            (10, "the quick brown fox"),   # exact copy of committed doc 1
            (11, "fresh text"),
            (12, "fresh text"),            # in-batch copy: 11 wins
        ])
        r1 = I.dedup_increment(spark, batch, state_dir, near=False,
                               commit=False)
        assert _ids(r1["survivors"]) == [11]
        assert _ids(r1["dropped_exact_hist"]) == [10]
        assert _ids(r1["dropped_exact_batch"]) == [12]

    def test_near_vs_history_and_in_batch(self, spark, state_dir):
        hist = _docs(spark, [(1, LONG_A), (2, LONG_B)])
        I.dedup_increment(spark, hist, state_dir, commit=True, run_id="h")
        batch = _docs(spark, [
            # near-dup of history doc 1: tail appended past the prefix
            (20, LONG_A + " trailing novelty words"),
            # fresh long doc
            (21, LONG_C),
            # in-batch near pair: 21 survives (lowest id), 22 drops
            (22, LONG_C + " more trailing novelty"),
        ])
        r = I.dedup_increment(spark, batch, state_dir, max_text_chars=256,
                              commit=True, run_id="b", wave=1)
        assert _ids(r["dropped_near_hist"]) == [20]
        assert _ids(r["dropped_near_batch"]) == [22]
        assert _ids(r["survivors"]) == [21]
        # exactly-once growth: the committed batch fully drops on replay
        rerun = I.dedup_increment(spark, batch, state_dir,
                                  max_text_chars=256, commit=False)
        assert _ids(rerun["survivors"]) == []

    def test_short_doc_normalized_route(self, spark, state_dir):
        hist = _docs(spark, [(1, "Hi There")])
        I.dedup_increment(spark, hist, state_dir, commit=True)
        batch = _docs(spark, [
            (30, "hi   there"),    # whitespace/case variant of history
            (31, "bye now"),
            (32, "BYE    NOW"),    # in-batch variant: 31 wins
        ])
        r = I.dedup_increment(spark, batch, state_dir, commit=False)
        assert _ids(r["dropped_norm"]) == [30, 32]
        assert _ids(r["survivors"]) == [31]

    def test_stray_state_files_swept_and_harmless(self, spark, state_dir):
        b1 = _docs(spark, [(1, LONG_A)])
        # simulate a crash: state files written, manifest commit lost
        I.dedup_increment(spark, b1, state_dir, commit=True)
        hist = S.snapshot_history(state_dir)
        os.unlink(S._snap_path(state_dir, hist[-1]["snapshot_id"]))
        S._atomic_write(
            os.path.join(S._snap_dir(state_dir), "_current"),
            str(hist[-2]["snapshot_id"]),
        )
        # doc 1's state rows are now strays: decisions must NOT see them
        r = I.dedup_increment(spark, b1, state_dir, near=False, commit=False)
        assert _ids(r["survivors"]) == [1]
        # and the next commit sweeps the strays before writing
        swept = I._clean_stray(state_dir)
        assert swept >= 1

    def test_state_is_o_new_per_increment(self, spark, state_dir):
        """State rows appended = survivors' rows only (hash + bands)."""
        bands = 8
        b = _docs(spark, [(1, LONG_A), (2, LONG_A + " x"), (3, "tiny doc")])
        I.dedup_increment(spark, b, state_dir, bands=bands,
                          max_text_chars=256, commit=True)
        # doc 2 near-drops vs doc 1 in-batch; survivors = {1 (long), 3 (short)}
        exact = I.read_exact_state(spark, state_dir)
        assert exact.filter("kind = 0").count() == 2
        assert exact.filter("kind = 1").count() == 1   # short doc 3 only
        near = I.read_near_state(spark, state_dir)
        assert near.count() == bands                    # doc 1 only
        assert set(r["doc"] for r in near.collect()) == {"1"}
        # atomicity: ALL of an increment's state rows (raw hashes, norm
        # hashes, bands) land in ONE snapshot commit — no crash window in
        # which part of an increment's state is visible (the two-table
        # design had exactly that window)
        assert len(S.snapshot_history(state_dir)) == 2  # init + increment


class TestIncrementalExtract:
    def _land(self, spark, src, pages, wave, k=4):
        from pyspark.sql import functions as F

        routed = pages.withColumn(
            "partition_key", F.pmod(F.xxhash64("url"), F.lit(k)).cast("int")
        )
        routed.write.mode("append").partitionBy("partition_key").parquet(
            os.path.join(src, "extracted")
        )
        keys = sorted(r["partition_key"]
                      for r in routed.select("partition_key").distinct()
                      .collect())
        S.commit_wave_snapshot(src, "land", wave, keys)

    def test_two_waves_equal_batch_and_crash_replays(self, spark, pages_df,
                                                     tmp_path):
        from pyspark.sql import functions as F

        from sparkdu.api import ExtractConfig, extract_pages

        src, out = str(tmp_path / "src"), str(tmp_path / "out")
        wave_a = pages_df.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
        wave_b = pages_df.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
        self._land(spark, src, wave_a, 0)
        r1 = I.run_incremental_extract(spark, src, out, num_parts=4)
        assert r1["rows_new"] > 0 and not r1["noop"]
        self._land(spark, src, wave_b, 1)
        r2 = I.run_incremental_extract(spark, src, out, num_parts=4)
        assert r2["rows_new"] > 0 and r2["rows_matched"] == 0
        # steady-state poll: nothing appended
        assert I.run_incremental_extract(spark, src, out, num_parts=4)["noop"]

        full = extract_pages(spark, pages_df, ExtractConfig(num_partitions=4))
        final = S.read_snapshot(spark, out)
        cols = ["url", "extracted_text", "n_blocks"]
        assert final.select(cols).exceptAll(full.select(cols)).count() == 0
        assert full.select(cols).exceptAll(final.select(cols)).count() == 0

        # crash between merge commit and checkpoint write: the checkpoint
        # is lost, the run replays the same appends — merge idempotence
        # converges the table to the same state
        os.unlink(I._cp_path(out))
        pre = {r["url"]: r["extracted_text"]
               for r in final.select("url", "extracted_text").collect()}
        r4 = I.run_incremental_extract(spark, src, out, num_parts=4)
        assert not r4["noop"]
        post = {r["url"]: r["extracted_text"]
                for r in S.read_snapshot(spark, out)
                .select("url", "extracted_text").collect()}
        assert post == pre

    def test_missing_source_raises(self, spark, tmp_path):
        with pytest.raises(ValueError):
            I.run_incremental_extract(spark, str(tmp_path / "nosrc"),
                                      str(tmp_path / "out"))


def test_zorder_prune_planted_grid(spark, tmp_path):
    """snapshot_zorder_prune on a planted 2-D permutation grid (both
    dimensions uniform, zero correlation): the z-ordered layout must let
    footer-stats planning skip files on the SECOND dimension while the
    row-id layout skips none, and both pruned reads must equal
    full-scan + filter."""
    import pandas as pd

    import sparkdu.staging as G

    n = 1024
    pd.DataFrame({
        "doc_id": list(range(n)),
        "n_chars": [(i * 37) % 1024 for i in range(n)],
        "text": ["x"] * n,
    }).to_parquet(tmp_path / "documents.parquet")
    rows = {r["metric"]: r["n"]
            for r in G.snapshot_zorder_prune(spark, str(tmp_path)).collect()}
    assert rows["rowid_files_skipped"] == 0
    assert rows["zorder_files_skipped"] >= 4
    assert rows["zorder_pruned_read_exact"] == 1
    assert rows["rowid_pruned_read_exact"] == 1


def test_incremental_orchestration_differential(spark, tmp_path):
    """Seeded-random 3-increment corpus vs an independent Python simulator
    of the decision rules (exact first-id-wins -> anti vs history; short
    docs on the token-normalized hash; near-dup drop on any shared
    (band, bsig) bucket with history or a smaller-id batch doc; state
    grows by survivors only). The simulator replays the SET LOGIC on the
    engine's own band signatures — hashing is gated elsewhere; this gate
    is the cross-increment orchestration, which is where state bugs
    (wrong growth, wrong join side, leaked drops) would live."""
    import hashlib
    import random

    from sparkdu.dedup import minhash_banded

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    K, PREFIX = 3, 256

    def make_doc():
        n = rng.randint(1, 80)
        return " ".join(rng.choice(vocab) for _ in range(n))

    next_id = [0]
    pool: list[str] = []

    def make_batch(n):
        docs = []
        for _ in range(n):
            r = rng.random()
            if pool and r < 0.25:
                text = rng.choice(pool)                      # exact copy
            elif pool and r < 0.45:
                text = rng.choice(pool) + " zz tail"         # near/tail copy
            elif pool and r < 0.55:
                text = rng.choice(pool).upper()              # case variant
            else:
                text = make_doc()
            pool.append(text)
            docs.append((next_id[0], text))
            next_id[0] += 1
        return docs

    batches = [make_batch(40) for _ in range(3)]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def norm_tokens(s):
        return [t for t in s.lower()[:PREFIX].split() if t]

    # engine-side band signatures per doc (pure function of text)
    def bands_of(docs):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        b = minhash_banded(df, max_text_chars=PREFIX, shingle_k=K,
                           shingle_mode="word")
        out = {}
        for r in b.collect():
            out.setdefault(r["doc_id"], set()).add((r["band"], r["bsig"]))
        return out

    # independent simulator
    hist_h, hist_hn, hist_bands = set(), set(), set()
    expected = []
    for docs in batches:
        bands = bands_of(docs)
        firsts = {}
        for i, t in sorted(docs):
            firsts.setdefault(md5(t), i)
        kept = [(i, t) for i, t in docs
                if firsts[md5(t)] == i and md5(t) not in hist_h]
        survivors = []
        long_remaining = []
        for i, t in kept:
            tk = norm_tokens(t)
            if len(tk) < K:
                hn = md5(" ".join(tk))
                nfirst = min(j for j, u in kept
                             if len(norm_tokens(u)) < K
                             and md5(" ".join(norm_tokens(u))) == hn)
                if hn not in hist_hn and nfirst == i:
                    survivors.append((i, t, "short"))
            else:
                if bands.get(i, set()) & hist_bands:
                    continue
                long_remaining.append(i)
        buckets = {}
        for i in long_remaining:
            for bb in bands[i]:
                buckets.setdefault(bb, []).append(i)
        for i in long_remaining:
            if any(min(buckets[bb]) < i for bb in bands[i]):
                continue
            t = dict(docs)[i]
            survivors.append((i, t, "long"))
        for i, t, kind in survivors:
            hist_h.add(md5(t))
            if kind == "short":
                hist_hn.add(md5(" ".join(norm_tokens(t))))
            else:
                hist_bands |= bands[i]
        expected.append(sorted(i for i, _, _ in survivors))

    # engine run
    from sparkdu import incremental as I

    d = str(tmp_path / "state")
    I.init_state(d)
    for wave, (docs, exp) in enumerate(zip(batches, expected)):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        r = I.dedup_increment(spark, df, d, max_text_chars=PREFIX,
                              shingle_k=K, commit=True, wave=wave)
        got = sorted(x["doc_id"] for x in r["survivors"].collect())
        assert got == exp, (wave, got, exp)


def test_incremental_extract_with_dedup_state(spark, pages_rows, tmp_path):
    """--dedup-state chaining: a wave-B page whose html duplicates a
    wave-A page extracts to identical text and is dropped against the
    committed state, so it never reaches the merged table; a lost
    checkpoint replays the full source but converges (state already
    holds the batch -> empty merge over the already-merged table)."""
    from pyspark.sql import functions as F  # noqa: F401

    from sparkdu.tables import PAGES_SCHEMA

    # 5 distinct-url, distinct-html pages from the fixture corpus
    seen, rows = set(), []
    for r in pages_rows:
        if r["url"] not in seen and r["html"]:
            seen.add(r["url"])
            rows.append(r)
        if len(rows) == 5:
            break
    wave_a = rows[:3]
    dup = dict(rows[0])
    dup["url"] = "https://dup.example/copy-of-first"
    wave_b = [dup, rows[3]]

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    land = TestIncrementalExtract()._land
    land(spark, src, spark.createDataFrame(wave_a, PAGES_SCHEMA), 0)
    r1 = I.run_incremental_extract(spark, src, out, num_parts=4,
                                   dedup_state=state)
    assert r1["rows_new"] == 3 and r1["dedup_dropped"] == 0
    land(spark, src, spark.createDataFrame(wave_b, PAGES_SCHEMA), 1)
    r2 = I.run_incremental_extract(spark, src, out, num_parts=4,
                                   dedup_state=state)
    assert r2["rows_new"] == 1              # only the fresh page merged
    assert r2["dedup_dropped"] == 1         # the cross-increment copy
    final = {r["url"] for r in S.read_snapshot(spark, out).collect()}
    assert final == {r["url"] for r in wave_a} | {rows[3]["url"]}

    # crash window: checkpoint lost after everything committed
    os.unlink(I._cp_path(out))
    r3 = I.run_incremental_extract(spark, src, out, num_parts=4,
                                   dedup_state=state)
    assert not r3["noop"]
    assert r3["rows_new"] == 0 and r3["rows_matched"] == 0
    assert {r["url"] for r in S.read_snapshot(spark, out).collect()} == final


def test_remove_orphans_table_wide(spark, tmp_path):
    """snapshots.remove_orphans: unreferenced data AND tombstone files
    are swept; referenced ones survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "t")
    df = spark.createDataFrame([("u1", 1)], "url string, v int")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "extracted", "partition_key=0"))
    S.commit_wave_snapshot(out, "w", 0, [0])
    # plant orphans in both trees
    for sub in ("extracted", "deletes"):
        d = os.path.join(out, sub, "partition_key=0")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({"url": ["zz"]}),
                       os.path.join(d, "orphan.parquet"))
    r = S.remove_orphans(out)
    assert r["deleted_files"] == 2
    assert S.read_snapshot(spark, out).count() == 1


def test_incremental_recrawl_arbitration(spark, tmp_path):
    """Poison-increment fix (ADVICE r3): one consumed increment spanning two
    source commits that recrawl the SAME url with changed html used to put
    duplicate url keys in the update batch — merge_upsert raised, and the
    post-merge checkpoint meant every retry replayed the same raise. The
    consumer now arbitrates keep-latest-per-url (warc_ts desc) before
    merging; the table ends at the later capture's extraction."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from sparkdu import incremental as I
    from sparkdu import snapshots as S
    from sparkdu.api import ExtractConfig, extract_pages
    from sparkdu.tables import PAGES_SCHEMA

    def page(url, ts, body):
        html = (f"<html><head><title>t</title></head><body>"
                f"<p>{body}</p></body></html>").encode()
        return {"url": url, "warc_ts": ts, "html": html,
                "text": body, "lang": "en"}

    t0 = dt.datetime(2025, 1, 1)
    t1 = dt.datetime(2025, 2, 1)
    t2 = dt.datetime(2025, 3, 1)

    src, out = str(tmp_path / "src"), str(tmp_path / "out")

    def land(rows, wave, k=4):
        df = spark.createDataFrame(rows, PAGES_SCHEMA)
        routed = df.withColumn(
            "partition_key", F.pmod(F.xxhash64("url"), F.lit(k)).cast("int")
        )
        routed.write.mode("append").partitionBy("partition_key").parquet(
            os.path.join(src, "extracted"))
        keys = sorted(r["partition_key"]
                      for r in routed.select("partition_key")
                      .distinct().collect())
        S.commit_wave_snapshot(src, "land", wave, keys)

    # bootstrap increment
    land([page("http://a.test/x", t0, "first crawl of x"),
          page("http://a.test/y", t0, "page y")], 0)
    r1 = I.run_incremental_extract(spark, src, out, num_parts=4)
    assert r1["rows_new"] == 2

    # two further source commits recrawl the SAME url — consumed as ONE
    # increment (the poison shape)
    land([page("http://a.test/x", t1, "second crawl of x")], 1)
    land([page("http://a.test/x", t2, "third crawl of x"),
          page("http://a.test/z", t2, "page z")], 2)
    r2 = I.run_incremental_extract(spark, src, out, num_parts=4)
    assert not r2["noop"]
    assert r2["rows_new"] == 1 and r2["rows_matched"] == 1  # z new, x updated

    # the winning capture is the LATEST (t2), matching a fresh extraction
    want = extract_pages(
        spark,
        spark.createDataFrame([page("http://a.test/x", t2,
                                    "third crawl of x")], PAGES_SCHEMA),
        ExtractConfig(num_partitions=2),
    ).select("url", "extracted_text").collect()[0]
    got = {r["url"]: r["extracted_text"]
           for r in S.read_snapshot(spark, out)
           .select("url", "extracted_text").collect()}
    assert len(got) == 3
    assert got["http://a.test/x"] == want["extracted_text"]

    # noop path returns the full counter shape (ADVICE r3, low #4)
    r3 = I.run_incremental_extract(spark, src, out, num_parts=4)
    assert r3["noop"] and r3["rows_new"] == 0 and r3["rows_matched"] == 0
    assert r3["pages_in"] == 0 and r3["dedup_dropped"] == 0
    assert r3["snapshot_id"] == S.current_snapshot_id(out)
