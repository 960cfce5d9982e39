"""Connected components: large-star/small-star vs an independent
union-find, across adversarial graph shapes (long chains stress the
diameter-independence claim; cliques stress dedup's usual shape)."""

import random

from pyspark.sql import functions as F

from sparkdu.cc import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


def _run(spark, n_nodes, edges):
    verts = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    if edges:
        e = spark.createDataFrame(edges, "src long, dst long")
    else:
        e = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(verts, e).collect()
    }
    assert got == _union_find(n_nodes, edges)
    return got


def test_cc_chain_diameter_independent(spark):
    """A 120-node path: min-label propagation would need 120 rounds; the
    alternating algorithm must finish within the 50-round cap."""
    edges = [(i, i + 1) for i in range(119)]
    got = _run(spark, 121, edges)  # node 120 isolated
    assert all(got[i] == 0 for i in range(120))
    assert got[120] == 120


def test_cc_cliques_and_bridges(spark):
    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]       # clique 0-4
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]  # 10-13
        + [(4, 10)]                                               # bridge
        + [(20, 21), (21, 22)]                                    # small chain
    )
    got = _run(spark, 25, edges)
    assert {got[i] for i in list(range(5)) + list(range(10, 14))} == {0}
    assert got[20] == got[21] == got[22] == 20
    assert got[7] == 7  # isolated


def test_cc_random_graphs_match_union_find(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(60)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _run(spark, n, edges)


def test_cc_empty_and_self_edges(spark):
    _run(spark, 5, [])
    # self-loops and duplicate/reversed edges must be harmless
    verts = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 0), (1, 2), (2, 1), (1, 2)], "src long, dst long"
    )
    got = {r["id"]: r["component"] for r in connected_components(verts, e).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 3}


def test_cc_cluster_canonical_dedup_policy(spark):
    """End-to-end dedup policy: collapse each component to its canonical
    (min doc_id) survivor — the cluster-level rule LSH pairs feed at scale."""
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    e = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "src long, dst long")
    cc = connected_components(verts, e)
    survivors = sorted(
        r["component"] for r in cc.select("component").distinct().collect()
    )
    assert survivors == [0, 3, 4, 6, 7]
    dropped = cc.filter(F.col("id") != F.col("component")).count()
    assert dropped == 3


def test_curate_cc_policy_refines_pair_policy(spark):
    """Cluster-canonical (--cc) curation: survivors are a subset of the
    pair-policy survivors (CC removes every non-minimal cluster member,
    pair policy only removes pair-local maxima) and exactly one doc
    survives per duplicate cluster."""
    from sparkdu.cc import connected_components
    from sparkdu.harness import fx
    from sparkdu.jobs.curate_job import curate
    from sparkdu.tables import PAGES_SCHEMA

    pages = (
        spark.read.schema(PAGES_SCHEMA).parquet(fx("pages"))
        .filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
    )
    pair_stages = curate(spark, pages, min_quality=0.2, min_chars=50)
    cc_stages = curate(spark, pages, min_quality=0.2, min_chars=50,
                       cc_clusters=True)
    pair_surv = {r["url"] for r in pair_stages["curated"].select("url").collect()}
    cc_surv = {r["url"] for r in cc_stages["curated"].select("url").collect()}
    for st in (pair_stages, cc_stages):
        for df_ in st.pop("_cached"):
            df_.unpersist()
    assert cc_surv <= pair_surv
    assert len(cc_surv) > 0
