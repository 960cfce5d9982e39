"""Cross-increment (stateful) pipeline ops — the per-crawl-increment shape.

At 10^12 documents the corpus is never processed in one run: each crawl
increment must (a) extract only the new pages — O(new), via the snapshot
appends scan — and (b) dedup the new batch against the ENTIRE historical
corpus without rescanning it. History is consulted only through compact,
snapshot-committed SIDE TABLES (sparkdu.snapshots commit protocol: atomic
manifest + ``_current`` swap, time travel, expiry):

  exact state  (kind tinyint, h string)   one md5 row per surviving doc
                                          (kind=0), plus one token-
                                          normalized md5 row (kind=1) per
                                          SHORT surviving doc — the same
                                          short-doc routing rule as
                                          curate_job (dedup.word_tokens
                                          over the same signature prefix,
                                          so no doc escapes both paths)
  near state   (band int, bsig bigint,    `bands` MinHash band-signature
               doc string)                rows per surviving LONG doc

Both tables are APPEND-ONLY: an increment appends exactly its survivors'
rows as one wave commit. Set-membership semantics make replays harmless —
a crash between the data write and the manifest commit leaves stray files
that ``_clean_stray`` removes before the next write, and re-running the
same increment recomputes the identical (deterministic) survivor set.

At 10^12 scale: the state tables are bucketed by their join key
(partition_key = pmod(xxhash64(h | bsig), K)), so probing them shuffles
only the new batch; history-vs-history work never happens — the O(N^2)
trap of re-running global dedup per increment. State size is ~45 bytes +
~12*bands bytes per surviving doc (~0.05% of a 10 KB-doc corpus).

Upstream locus: the reference has no incremental story at all (single
process, restart-from-zero — SURVEY §0/§1.1); this module is the
Spark-first capability the north rule's 10^12-document framing demands.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import snapshots as S
from .dedup import minhash_banded, minhash_lsh_pairs, word_tokens

EXACT_STATE_SCHEMA = "kind tinyint, h string"
NEAR_STATE_SCHEMA = "band int, bsig bigint, doc string"

# curate_job parity: same shingle prefix / width / mode so an incremental
# run and a batch curate run partition the corpus identically
SHINGLE_K = 3
MAX_TEXT_CHARS = 4096


def _exact_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "exact")


def _near_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "near")


def init_state(state_dir: str) -> None:
    """Bootstrap both state tables as committed EMPTY snapshots (so the
    first increment reads a well-defined empty history instead of a
    missing-manifest error). Idempotent."""
    for d in (_exact_dir(state_dir), _near_dir(state_dir)):
        os.makedirs(os.path.join(d, "extracted"), exist_ok=True)
        if S.current_snapshot_id(d) is None:
            S.commit_wave_snapshot(d, "init", 0, [])


def _clean_stray(out_dir: str) -> int:
    """Remove data files in the table directory that NO committed manifest
    references — the leftovers of a crash between a state write and its
    commit. Readers never see strays (read_snapshot reads manifest files
    only), but commit_wave_snapshot re-LISTS partition dirs, so strays must
    be swept before the next append touches the same partitions.
    Delegates to snapshots.remove_orphans (the table-wide maintenance op
    with the identical contract)."""
    return S.remove_orphans(out_dir)["deleted_files"]


def _append_state(spark: SparkSession, out_dir: str, df: DataFrame,
                  key_col: str, num_parts: int, run_id: str, wave: int) -> int:
    """Append `df` rows to the state table bucketed by `key_col` and commit
    one wave snapshot covering the touched partitions. Returns snapshot id."""
    _clean_stray(out_dir)
    routed = df.withColumn(
        "partition_key", F.pmod(F.xxhash64(key_col), F.lit(num_parts)).cast("int")
    )
    routed.write.mode("append").partitionBy("partition_key").parquet(
        os.path.join(out_dir, "extracted")
    )
    # the touched-key list is bounded by num_parts (driver-small by design)
    keys = sorted(
        r["partition_key"]
        for r in routed.select("partition_key").distinct().collect()
    )
    return S.commit_wave_snapshot(out_dir, run_id, wave, keys)


def read_exact_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return S.read_snapshot(spark, _exact_dir(state_dir),
                           schema=EXACT_STATE_SCHEMA)


def read_near_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return S.read_snapshot(spark, _near_dir(state_dir),
                           schema=NEAR_STATE_SCHEMA)


def dedup_increment(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = SHINGLE_K,
    max_text_chars: Optional[int] = MAX_TEXT_CHARS,
    num_parts: int = 16,
    near: bool = True,
    commit: bool = True,
    run_id: str = "inc",
    wave: int = 0,
) -> dict:
    """Dedup one batch against the committed historical state AND within
    itself, then (optionally) append the survivors' state rows as one wave
    commit per state table.

    Decision order (each stage sees the previous stage's survivors):
      1. exact raw-hash:   in-batch first-id-wins, then anti-join vs the
                           kind=0 history hashes;
      2. short-doc route:  docs with < shingle_k tokens inside the
                           signature prefix dedup on the TOKEN-NORMALIZED
                           hash (in-batch first-id-wins, then anti vs the
                           kind=1 history hashes) — curate_job's fallback,
                           shared tokenizer and prefix;
      3. near (long docs): MinHash band signatures; any doc sharing a
                           (band, bsig) bucket with HISTORY drops, then
                           in-batch LSH candidate pairs drop the higher id
                           of each pair (curate_job's pair-local rule).

    All decisions are deterministic (first/lowest id wins, frozen hash
    families), so a crashed increment re-runs to the identical survivor
    set — together with _clean_stray this makes the commit exactly-once
    in effect. Returns dict with the survivor DataFrame, per-stage drop
    DataFrames (lazy — count() them for metrics), committed snapshot
    ids (None when commit=False), and a `commit_state` callable: with
    commit=False, callers that persist the survivors elsewhere (e.g.
    run_incremental_extract's merge) invoke it strictly AFTER their own
    commit, so a crash in between replays to the same survivors and a
    convergent merge instead of losing the batch to its own state rows.
    """
    ids = F.col(id_col)
    hist_exact = read_exact_state(spark, state_dir)
    b = batch.select(id_col, text_col).filter(F.col(text_col).isNotNull())
    b = b.withColumn("_h", F.md5(F.col(text_col).cast("binary")))

    # 1. exact: one shuffle on the raw hash; lowest id is the batch keeper
    w = Window.partitionBy("_h").orderBy(ids.asc())
    ranked = b.withColumn("_rn", F.row_number().over(w))
    dropped_exact_batch = ranked.filter(F.col("_rn") > 1).select(id_col)
    firsts = ranked.filter(F.col("_rn") == 1).drop("_rn")
    dropped_exact_hist = firsts.join(
        hist_exact.filter(F.col("kind") == 0).select(F.col("h").alias("_h")),
        "_h", "left_semi",
    ).select(id_col)
    ex_kept = firsts.join(
        hist_exact.filter(F.col("kind") == 0).select(F.col("h").alias("_h")),
        "_h", "left_anti",
    )

    if not near:
        survivors = ex_kept
        out = {
            "survivors": survivors.select(id_col, text_col, "_h"),
            "dropped_exact_batch": dropped_exact_batch,
            "dropped_exact_hist": dropped_exact_hist,
            "dropped_norm": None, "dropped_near_hist": None,
            "dropped_near_batch": None,
            "exact_snapshot_id": None, "near_snapshot_id": None,
        }
        def _commit():
            state_rows = survivors.select(
                F.lit(0).cast("tinyint").alias("kind"), F.col("_h").alias("h")
            )
            out["exact_snapshot_id"] = _append_state(
                spark, _exact_dir(state_dir), state_rows, "h",
                num_parts, run_id, wave,
            )
            return out["exact_snapshot_id"]

        out["commit_state"] = _commit
        if commit:
            _commit()
        return out

    # 2. short-doc routing (curate_job parity: same tokenizer, same prefix)
    toks = word_tokens(text_col, max_text_chars)
    ex_kept = ex_kept.withColumn("_nw", F.size(toks)).withColumn(
        "_hn", F.md5(F.concat_ws(" ", toks).cast("binary"))
    ).persist()
    short = ex_kept.filter(F.col("_nw") < shingle_k)
    long_docs = ex_kept.filter(F.col("_nw") >= shingle_k)
    wn = Window.partitionBy("_hn").orderBy(ids.asc())
    sranked = short.withColumn("_rn", F.row_number().over(wn))
    hist_norm = hist_exact.filter(F.col("kind") == 1).select(
        F.col("h").alias("_hn")
    )
    dropped_norm = sranked.filter(F.col("_rn") > 1).select(id_col).unionByName(
        sranked.filter(F.col("_rn") == 1)
        .join(hist_norm, "_hn", "left_semi").select(id_col)
    )
    short_kept = (
        sranked.filter(F.col("_rn") == 1)
        .join(hist_norm, "_hn", "left_anti").drop("_rn")
    )

    # 3. near-dup for long docs: banding is the heavy stage — computed ONCE,
    # reused for the history probe, the in-batch pairs, and the state append
    banded = minhash_banded(
        long_docs, id_col=id_col, text_col=text_col, n_hashes=n_hashes,
        bands=bands, max_text_chars=max_text_chars, shingle_k=shingle_k,
        shingle_mode="word",
    ).persist()
    hist_near = read_near_state(spark, state_dir)
    dropped_near_hist = (
        banded.join(hist_near.select("band", "bsig"), ["band", "bsig"],
                    "left_semi")
        .select(id_col).distinct()
    )
    remaining_banded = banded.join(dropped_near_hist, id_col, "left_anti")
    pairs = minhash_lsh_pairs(
        long_docs, id_col=id_col, text_col=text_col, banded=remaining_banded
    )
    dropped_near_batch = pairs.select(F.col("b_id").alias(id_col)).distinct()
    long_kept = (
        long_docs.join(dropped_near_hist, id_col, "left_anti")
        .join(dropped_near_batch, id_col, "left_anti")
    )

    survivors = long_kept.unionByName(short_kept).persist()
    out = {
        "survivors": survivors.select(id_col, text_col),
        "dropped_exact_batch": dropped_exact_batch,
        "dropped_exact_hist": dropped_exact_hist,
        "dropped_norm": dropped_norm,
        "dropped_near_hist": dropped_near_hist,
        "dropped_near_batch": dropped_near_batch,
        "exact_snapshot_id": None,
        "near_snapshot_id": None,
    }
    def _commit():
        exact_rows = survivors.select(
            F.lit(0).cast("tinyint").alias("kind"), F.col("_h").alias("h")
        ).unionByName(
            survivors.filter(F.col("_nw") < shingle_k).select(
                F.lit(1).cast("tinyint").alias("kind"),
                F.col("_hn").alias("h"),
            )
        )
        out["exact_snapshot_id"] = _append_state(
            spark, _exact_dir(state_dir), exact_rows, "h",
            num_parts, run_id, wave,
        )
        near_rows = banded.join(
            survivors.select(id_col), id_col, "left_semi"
        ).select("band", "bsig", ids.cast("string").alias("doc"))
        out["near_snapshot_id"] = _append_state(
            spark, _near_dir(state_dir), near_rows, "bsig",
            num_parts, run_id, wave,
        )
        return out["exact_snapshot_id"]

    out["commit_state"] = _commit
    if commit:
        _commit()
    return out


# -- incremental extraction (appends-scan -> extract -> MERGE) ---------------


def _cp_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_incr_source_id.json")


def last_consumed_source_id(out_dir: str) -> Optional[int]:
    try:
        with open(_cp_path(out_dir)) as f:
            return int(json.load(f)["src_id"])
    except (FileNotFoundError, ValueError, KeyError):
        return None


def run_incremental_extract(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    *,
    num_parts: int = 16,
    model_path: Optional[str] = None,
    run_id: str = "incx",
    dedup_state: Optional[str] = None,
) -> dict:
    """Consume the pages APPENDED to the source snapshot table since the
    last processed snapshot, extract only those — O(new data), never
    O(table) — and MERGE the results into the extracted snapshot table by
    url. The consumed source snapshot id is checkpointed (atomic rename)
    strictly AFTER the merge commit: a crash between the two re-reads the
    same appends and re-merges the same keys to the same values — the
    merge is idempotent by key, so the table converges regardless.

    First run bootstraps: reads the full current source snapshot and
    commits the extracted table as wave 0. Steady-state no-op (nothing
    appended) returns without committing. Returns counters.

    `dedup_state=` chains CROSS-INCREMENT dedup between extract and
    merge: the extracted batch runs dedup_increment against the state
    tables under that dir (keyed by url over extracted_text) and only
    survivors merge. Ordering is merge -> state commit -> checkpoint, so
    every crash window converges: a replayed batch re-derives the same
    survivors (state not yet updated) and the merge is idempotent, or
    the state already contains the batch and the replayed merge is an
    empty no-op over an already-merged table.
    """
    from .api import ExtractConfig, extract_pages
    from .tables import PAGES_SCHEMA

    cur_src = S.current_snapshot_id(src_dir)
    if cur_src is None:
        raise ValueError(f"no committed source snapshot under {src_dir}")
    last = last_consumed_source_id(out_dir)
    if last is None:
        new_pages = S.read_snapshot(spark, src_dir, schema=PAGES_SCHEMA)
    else:
        if last == cur_src:
            return {"pages_in": 0, "noop": True, "src_from": last,
                    "src_to": cur_src}
        new_pages = S.read_appends_since(
            spark, src_dir, last, schema=PAGES_SCHEMA
        ).select([f.name for f in PAGES_SCHEMA.fields])

    # persist: the parse UDF is the expensive stage, and BOTH commit paths
    # execute the batch several times (merge's duplicate-key probe, the
    # affected-partition collect, and the write itself) — without the cache
    # the 25k-doc bench wave re-parsed 3x (measured 476 docs/s vs 1,4xx)
    extracted = extract_pages(
        spark, new_pages,
        ExtractConfig(num_partitions=num_parts, model_path=model_path),
    ).persist()
    cached = extracted
    commit_state = None
    n_dropped = 0
    pre_dedup = None
    if dedup_state is not None:
        init_state(dedup_state)
        pre_dedup = extracted  # parsed once: feeds dedup + merge
        dd = dedup_increment(
            spark,
            pre_dedup.select("url", F.col("extracted_text").alias("text")),
            dedup_state, id_col="url", text_col="text",
            num_parts=num_parts, commit=False, run_id=run_id, wave=cur_src,
        )
        extracted = pre_dedup.join(
            dd["survivors"].select("url"), "url", "left_semi"
        )
        commit_state = dd["commit_state"]
    if S.current_snapshot_id(out_dir) is None:
        routed = extracted.withColumn(
            "partition_key",
            F.pmod(F.xxhash64("url"), F.lit(num_parts)).cast("int"),
        )
        os.makedirs(os.path.join(out_dir, "extracted"), exist_ok=True)
        routed.write.mode("overwrite").partitionBy("partition_key").parquet(
            os.path.join(out_dir, "extracted")
        )
        keys = sorted(
            r["partition_key"]
            for r in routed.select("partition_key").distinct().collect()
        )
        sid = S.commit_wave_snapshot(out_dir, run_id, 0, keys)
        stats = {"rows_new": S.read_snapshot(spark, out_dir).count(),
                 "rows_matched": 0, "snapshot_id": sid,
                 "partitions_touched": len(keys)}
    else:
        stats = S.merge_upsert(
            spark, out_dir, extracted, key_cols=["url"],
            num_parts=num_parts, route_col="url", run_id=run_id,
        )
    if commit_state is not None:
        # state commit strictly AFTER the merge (see docstring ordering)
        commit_state()
        n_dropped = (
            pre_dedup.count() - stats["rows_new"] - stats["rows_matched"]
        )
    # checkpoint strictly after the table commit (atomic rename)
    fd, tmp = tempfile.mkstemp(dir=out_dir, prefix="_incr_cp_")
    with os.fdopen(fd, "w") as f:
        json.dump({"src_id": cur_src}, f)
    os.replace(tmp, _cp_path(out_dir))
    stats.update({"src_from": last, "src_to": cur_src,
                  "pages_in": stats["rows_new"] + stats["rows_matched"],
                  "dedup_dropped": n_dropped,
                  "noop": False})
    cached.unpersist()
    return stats
