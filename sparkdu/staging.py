"""Round-3 staging registry.

New operators added after the round-3 registry freeze register here (via the
same ``@q`` decorator) so the frozen ``DRIVER_PRIORITY`` ordering in
sparkdu/harness.py is never perturbed mid-round: keys named in the priority
list slot into the driver window; anything else appends after the banked
round-2 greens.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sparkdu.harness import FIX, f, fx, q

_ART = os.path.join(os.path.dirname(FIX), "artifacts")

with open(os.path.join(_ART, "clf_v2.json")) as _f:
    _IDF_OOV = float(json.load(_f)["idf_oov"])


@q(
    "extract_model_v3",
    f"""SELECT url, decode(extracted_text) AS extracted_text, n_blocks
        FROM read_parquet('{fx("golden_extracted_model_v3")}')""",
)
def extract_model_v3(spark, sf_dir):
    """clf_v3 gate: fused pipeline with iterated message passing over the
    part-local neighbor graph (SPEC SS4 mp, pipeline v1.2.0 — the public-API
    analogue of upstream CRF/ECN loopy inference) vs the oracle-computed
    golden. Uses the clf_v3_hi artifact, whose decisions DIFFER from clf_v2
    on this corpus, so byte-identity here genuinely discriminates the
    message-passing implementation (the quality-optimal clf_v3 artifact
    flips no decision on the saturated fixture corpus; its score-level
    exactness is pytest-gated in tests/test_extract_spark.py)."""
    from .api import ExtractConfig, extract_pages
    from .tables import PAGES_SCHEMA

    art = os.path.join(_ART, "clf_v3_hi.json")
    pages = spark.read.schema(PAGES_SCHEMA).parquet(fx("pages"))
    return extract_pages(spark, pages, ExtractConfig(model_path=art)).select(
        "url", "extracted_text", F.col("n_blocks").cast("int").alias("n_blocks")
    )


@q(
    "fn_tfidf_vec",
    f"""SELECT t.url, t.node_id,
               round(avg(coalesce(i.idf, {_IDF_OOV!r})), 6) AS tfidf_mean
        FROM (SELECT url, node_id, unnest(string_split(text, ' ')) AS token
              FROM read_parquet('{fx("nodes")}')) t
        LEFT JOIN read_parquet('{fx("idf")}') i USING (token)
        GROUP BY t.url, t.node_id""",
)
def fn_tfidf_vec(spark, sf_dir):
    """Vectorized TF-IDF mean (VERDICT r2 item 5): explode tokens ->
    broadcast join against the frozen IDF table -> avg. The JVM-side twin
    of classify._tfidf_mean_py (which stays as the byte-identity scoring
    path); 1e-12 agreement is pytest-gated in tests/test_extract_spark.py.
    At scale: the IDF table is the broadcast side (|vocab| rows), tokens
    never shuffle — the groupBy is url-partitioned, same key as extraction.
    """
    from .classify import tfidf_mean_vec

    nodes = f(spark, "nodes").select("url", "node_id", "text")
    idf = f(spark, "idf")
    return tfidf_mean_vec(nodes, idf, _IDF_OOV).select(
        "url", "node_id", F.round("tfidf_mean", 6).alias("tfidf_mean")
    )


@q("snapshot_read")  # rows-only: commit protocol + local tmp dir are engine-side
def snapshot_read(spark, sf_dir):
    """Table-format commit semantics end-to-end (sparkdu.snapshots): run a
    2-wave extract job over a slice of the fixture corpus, then read EVERY
    committed snapshot id (time travel) and return (snapshot_id, n_rows,
    n_partition_keys) per snapshot — monotone rows, final row = full slice.
    Kill/resume + stray-file invisibility are pytest-gated
    (tests/test_resume.py::test_snapshot_commit_and_time_travel)."""
    import tempfile

    from . import snapshots as S
    from .lineage import ExtractJobConfig, run_extract_job
    from .tables import PAGES_SCHEMA

    # slice hash salted with 's' so it is independent of the job's
    # partition_key = pmod(xxhash64(url), 8) — every key stays populated
    pages = (
        spark.read.schema(PAGES_SCHEMA).parquet(fx("pages"))
        .filter(F.pmod(F.xxhash64(F.concat(F.col("url"), F.lit("s"))), F.lit(4)) == 0)
    )
    d = tempfile.mkdtemp(prefix="sparkdu_snap_")
    run_extract_job(spark, pages, ExtractJobConfig(
        run_id="harness", out_dir=d, num_partitions=8, waves=2))
    rows = []
    for m in S.snapshot_history(d):
        df = S.read_snapshot(spark, d, snapshot_id=m["snapshot_id"])
        rows.append((m["snapshot_id"], df.count(),
                     len([k for k, v in m["partition_keys"].items() if v])))
    return spark.createDataFrame(
        rows, "snapshot_id int, n_rows long, n_partition_keys int"
    ).orderBy("snapshot_id")


@q("stream_sessionize_once")  # rows-only: stateful streaming is engine-side
def stream_sessionize_once(spark, sf_dir):
    """Custom stateful streaming operator, driver-executed: gap-based
    sessionization per user (applyInPandasWithState) over the events table
    as a bounded availableNow stream. Output = CLOSED sessions only (open
    state is deterministic too, but only closures emit in a bounded drain).
    Exactness vs a batch window-gap sessionization is pytest-gated
    (tests/test_streaming.py)."""
    import shutil
    import tempfile

    from .streaming import run_available_now, sessionize_events

    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    d = tempfile.mkdtemp(prefix="sparkdu_stream_")
    src = os.path.join(d, "src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))
    # idle_timeout=False: pending processing-time timeouts would keep the
    # availableNow query alive for gap_seconds — a bounded drain must stop
    # on its own; data-driven session closures still emit
    sess = sessionize_events(spark, src, schema, gap_seconds=600,
                             idle_timeout=False)
    run_available_now(sess, os.path.join(d, "out"), os.path.join(d, "ckpt"))
    return (
        spark.read.parquet(os.path.join(d, "out"))
        .orderBy("user_id", "session_start")
    )


@q("stream_dedup_once")  # rows-only: watermark state eviction is engine-side
def stream_dedup_once(spark, sf_dir):
    """Watermarked streaming dedup (J9's online analogue), driver-executed:
    dropDuplicatesWithinWatermark over the pages fixture as a bounded
    availableNow stream; returns the distinct urls that survived (unique by
    construction — the within-watermark guarantee)."""
    import shutil
    import tempfile

    from .streaming import run_available_now, streaming_dedup_pages

    d = tempfile.mkdtemp(prefix="sparkdu_stream_")
    src = os.path.join(d, "src")
    os.makedirs(src)
    shutil.copy(fx("pages"), os.path.join(src, "pages.parquet"))
    deduped = streaming_dedup_pages(spark, src, watermark="2 days")
    run_available_now(deduped.select("url", "warc_ts"),
                      os.path.join(d, "out"), os.path.join(d, "ckpt"))
    return spark.read.parquet(os.path.join(d, "out")).select("url").orderBy("url")


@q("curate_pipeline")  # rows-only: composite job; stage logic pytest-gated
def curate_pipeline(spark, sf_dir):
    """The full curation pipeline (python -m sparkdu curate) on the fixture
    corpus, one row per stage with its surviving row count — extraction,
    quality filter, exact dedup, short-doc fallback (< SHINGLE_K words ->
    token-normalized hash dedup, VERDICT r2 item 8), MinHash-LSH near-dup.
    Short-doc exactness is pytest-gated (tests/test_dedup.py)."""
    from .jobs.curate_job import curate
    from .tables import PAGES_SCHEMA

    pages = spark.read.schema(PAGES_SCHEMA).parquet(fx("pages"))
    stages = curate(spark, pages)
    stages.pop("_lsh_stats")
    cached = stages.pop("_cached")
    rows = [(name, stages[name].count()) for name in
            ("extracted", "kept", "exact_deduped", "short_kept", "curated")]
    for c in cached:
        c.unpersist()
    return spark.createDataFrame(rows, "stage string, n_rows long")
