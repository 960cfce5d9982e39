"""PageRank vs numpy power iteration; Bloom-filter guarantees; the
Gopher quality rules and DSIR weights' discriminative behavior."""

import math
import os

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkdu.bloom import bloom_build, bloom_maybe_contains
from sparkdu.rank import pagerank

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures_data"
)


def _numpy_pagerank(edges, d=0.85, iters=20):
    """Independent dense power iteration: same damping/dangling recipe."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t in edges:
        M[idx[t], idx[s]] += 1.0
    outdeg = M.sum(axis=0)
    has_out = outdeg > 0
    M[:, has_out] /= outdeg[has_out]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = M @ r
        dangling = d * (1.0 - c.sum())
        r = (1.0 - d) / n + d * c + dangling / n
    return {h: r[idx[h]] for h in nodes}


def _fixture_host_edges():
    t = pq.read_table(os.path.join(FIXDIR, "links.parquet"))
    return [
        (s.split("/")[2], h)
        for s, h, nf in zip(
            t["src_url"].to_pylist(),
            t["dst_host"].to_pylist(),
            t["nofollow"].to_pylist(),
        )
        if not nf
    ]


def test_pagerank_matches_power_iteration(spark):
    edges = _fixture_host_edges()
    expect = _numpy_pagerank(edges)
    got = {
        r["host"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    assert set(got) == set(expect)
    for h in expect:
        assert abs(got[h] - expect[h]) < 1e-9, h
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # preferential attachment => site0 is the rank-1 hub by a wide margin
    top = max(got, key=got.get)
    assert top == "site0.example"
    assert got[top] > 2 * sorted(got.values())[-2]


def test_pagerank_dangling_mass(spark):
    # star into a sink: the sink has no out-links; ranks must still sum
    # to 1 and the sink must outrank the leaves
    edges = [(f"leaf{i}", "sink") for i in range(5)]
    expect = _numpy_pagerank(edges)
    got = {
        r["host"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for h in expect:
        assert abs(got[h] - expect[h]) < 1e-9, h
    assert got["sink"] > got["leaf0"]


def test_bloom_no_false_negatives_and_fp_bound(spark):
    M, K = 4096, 5
    ref = spark.range(400).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    test = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bitmap = bloom_build(ref, "k", m_bits=M, k=K)
    tagged = {
        r["k"]: r["maybe_member"]
        for r in bloom_maybe_contains(test, "k", bitmap, m_bits=M, k=K).collect()
    }
    assert len(tagged) == 2000
    # Bloom guarantee: every true member is flagged
    for i in range(400):
        assert tagged[f"key-{i}"] is True
    # fp rate among the 1600 true negatives stays near theory
    fp = sum(tagged[f"key-{i}"] for i in range(400, 2000))
    theory = (1.0 - math.exp(-K * 400 / M)) ** K
    assert fp / 1600 < max(4 * theory, 0.02), (fp, theory)


def test_bloom_bitmap_is_constant_size(spark):
    bitmap = bloom_build(
        spark.range(5000).select(F.col("id").cast("string").alias("k")), "k",
        m_bits=4096, k=5,
    )
    n_words = bitmap.count()
    assert n_words <= 4096 // 64  # never more rows than bitmap words


def test_gopher_rules_consistent(spark):
    import sparkdu.staging  # noqa: F401 — registers the staging keys
    from sparkdu.harness import QUERIES

    rows = QUERIES["text_quality_gopher"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    kept_vals = {r["kept"] for r in rows}
    assert kept_vals == {True, False}  # the filter actually discriminates
    for r in rows:
        expect = (
            10 <= r["n_words"] <= 10000
            and 3.0 <= r["mean_word_len"] <= 10.0
            and r["n_stop"] >= 2
        )
        # mean_word_len is rounded; re-derive kept from the emitted inputs
        assert r["kept"] == expect or abs(r["mean_word_len"] - 3.0) < 1e-5 \
            or abs(r["mean_word_len"] - 10.0) < 1e-5, r


def test_dsir_weights_favor_target(spark):
    import sparkdu.staging  # noqa: F401 — registers the staging keys
    from sparkdu.harness import QUERIES

    w = QUERIES["text_dsir_weight"](spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    means = {
        r["is_en"]: r["m"]
        for r in w.join(docs, "doc_id")
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    }
    assert means[True] > means[False] + 0.5  # target tilts positive
