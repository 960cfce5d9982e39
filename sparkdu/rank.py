"""Host-graph PageRank over crawl link edges.

The link-authority signal a web corpus pipeline derives from WAT-style
link records (upstream locus: TranskribusDU has no link graph — this is
training-data-pipeline surface, like dedup/quality; the algorithm is the
public Page et al. 1999 formulation with uniform teleport).

Scale shape (10^12 edges): the per-iteration work is one shuffle — edges
joined to ranks on src (both sides pre-partitioned on src, so co-located
after the first iteration), contributions aggregated on dst. The rank
table is |hosts| rows (~10^8 at web scale), orders of magnitude smaller
than the edge table; edges are read once, cached, and re-partitioned on
src exactly once. Dangling mass (hosts with no out-links) is folded back
uniformly each iteration so the ranks stay a probability distribution —
computed as 1 - sum(contributed mass), a single scalar agg on the small
rank table, not a scan of the edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 20,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Iterate r' = (1-d)/N + d * (M r + dangling/N) for `iters` rounds.

    `edges` rows are directed (src, dst) pairs; parallel edges act as
    weight (a host linking twice contributes twice the mass share).
    Returns (host, rank) with ranks summing to 1.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    # weighted out-degree once, up front; per-edge share = w / outdeg
    w = e.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outdeg = w.groupBy("src").agg(F.sum("w").alias("outdeg"))
    share = (
        w.join(outdeg, "src")
        .select("src", "dst", (F.col("w") / F.col("outdeg")).alias("share"))
        .repartition("src")
        .cache()
    )
    n_nodes = nodes.count()

    ranks = nodes.select("host", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iters):
        contrib = (
            share.join(ranks, share.src == ranks.host)
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("rank")).alias("c"))
        )
        new = nodes.join(
            contrib, nodes.host == contrib.dst, "left"
        ).select("host", F.coalesce("c", F.lit(0.0)).alias("c"))
        # dangling + numeric-drift mass: whatever of d's share didn't land
        dangling = new.agg(
            (F.lit(damping) * (1.0 - F.sum("c"))).alias("m")
        )
        ranks = new.crossJoin(F.broadcast(dangling)).select(
            "host",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping) * F.col("c")
                + F.col("m") / n_nodes
            ).alias("rank"),
        )
        # cut the lineage each round: 20 chained joins would otherwise
        # build a plan Catalyst re-analyzes quadratically (and at scale,
        # recomputes); localCheckpoint materializes the small rank table
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(edges: DataFrame, iters: int = 20,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) by power iteration.

    auth'(j) = sum_i w(i,j) hub(i);  hub'(i) = sum_j w(i,j) auth'(j);
    each vector L1-normalized per half-step (sum = 1 — scale-free and
    deterministic, unlike L2 whose sqrt is the only non-rational step).
    Parallel edges act as weight. Returns (host, hub, auth).

    Scale shape mirrors pagerank(): the weighted edge table is built and
    repartitioned on its join key once per direction and cached; each
    half-step is one broadcast-able join of the |hosts|-row score table
    against a co-located edge table plus a groupBy on the other endpoint.
    Normalization is a scalar agg on the small score table. localCheckpoint
    per round stops quadratic plan growth.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    w = e.groupBy("src", "dst").agg(F.count("*").cast("double").alias("w"))
    fwd = w.repartition("src").cache()   # hub -> auth step joins on src
    rev = w.repartition("dst").cache()   # auth -> hub step joins on dst
    n_nodes = nodes.count()

    hub = nodes.select("host", F.lit(1.0 / n_nodes).alias("hub"))
    auth = None
    for _ in range(iters):
        a_raw = (
            fwd.join(hub, fwd.src == hub.host)
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("hub")).alias("a"))
        )
        a_tot = a_raw.agg(F.sum("a").alias("s"))
        auth = (
            nodes.join(a_raw, nodes.host == a_raw.dst, "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "host",
                (F.coalesce("a", F.lit(0.0)) / F.col("s")).alias("auth"),
            )
            .localCheckpoint(eager=False)
        )
        h_raw = (
            rev.join(auth, rev.dst == auth.host)
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("auth")).alias("h"))
        )
        h_tot = h_raw.agg(F.sum("h").alias("s"))
        hub = (
            nodes.join(h_raw, nodes.host == h_raw.src, "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "host",
                (F.coalesce("h", F.lit(0.0)) / F.col("s")).alias("hub"),
            )
            .localCheckpoint(eager=False)
        )
    return hub.join(auth, "host")


def trustrank(edges: DataFrame, seeds: list, damping: float = 0.85,
              iters: int = 20, src: str = "src",
              dst: str = "dst") -> DataFrame:
    """TrustRank (Gyongyi et al. 2004): PageRank with teleport biased to
    a trusted seed set instead of uniform — trust flows out from seeds
    along links, so link-farm hosts unreachable from trusted hosts score
    ~0 however densely they interlink. r' = (1-d)*s + d*(M r + m*s)
    where s is uniform over `seeds` and m is the dangling/drift mass
    (teleported to seeds too, keeping sum(r)=1). Same per-iteration
    shape as pagerank(): one co-located share-join + groupBy(dst), a
    scalar agg for the lost mass, localCheckpoint per round."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    w = e.groupBy("src", "dst").agg(F.count("*").alias("w"))
    outdeg = w.groupBy("src").agg(F.sum("w").alias("outdeg"))
    share = (
        w.join(outdeg, "src")
        .select("src", "dst", (F.col("w") / F.col("outdeg")).alias("share"))
        .repartition("src")
        .cache()
    )
    seed_mass = F.when(
        F.col("host").isin(list(seeds)), 1.0 / len(seeds)
    ).otherwise(0.0)
    ranks = nodes.select("host", seed_mass.alias("rank"))
    for _ in range(iters):
        contrib = (
            share.join(ranks, share.src == ranks.host)
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("rank")).alias("c"))
        )
        new = nodes.join(
            contrib, nodes.host == contrib.dst, "left"
        ).select("host", F.coalesce("c", F.lit(0.0)).alias("c"))
        lost = new.agg(
            (F.lit(damping) * (1.0 - F.sum("c"))).alias("m")
        )
        ranks = (
            new.crossJoin(F.broadcast(lost))
            .select(
                "host",
                (
                    (F.lit(1.0 - damping) + F.col("m")) * seed_mass
                    + F.lit(damping) * F.col("c")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
