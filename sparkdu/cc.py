"""Distributed connected components over a pair graph.

The missing last stage of near-duplicate deduplication: MinHash-LSH /
Jaccard stages emit PAIRS, but cluster-level policies (keep one canonical
doc per duplicate cluster) need the transitive closure. This implements the
alternating large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — O(log^2 n) rounds, each
round a constant number of shuffles keyed on node id, state only the edge
list itself. That is the 100 TB-correct shape: no per-component state, no
diameter-bound round count (plain min-label propagation needs O(diameter)
rounds and a chain of borderline near-dups can be long).

Driver-side control: the convergence loop necessarily runs on the driver
(one tiny agg per round — a count+checksum, not data), mirroring the
frozen-centroid two-phase rule in dedup.ivf_fit. `localCheckpoint` cuts
the plan each round so lineage doesn't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list: (src > dst), no self-loops, distinct."""
    s, d = F.col("src"), F.col("dst")
    return (
        edges.select(
            F.greatest(s, d).alias("src"), F.least(s, d).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor to
    min(N(u) + {u})."""
    nbrs = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = nbrs.groupBy("src").agg(F.min("dst").alias("mnd")).select(
        "src", F.least("mnd", "src").alias("mn")
    )
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small, then connect u and all its smaller
    neighbors to the minimum of the group."""
    oriented = _canon(edges)  # src > dst by construction
    m = oriented.groupBy("src").agg(F.min("dst").alias("mn"))
    j = oriented.join(m, "src")
    out = j.select(F.col("dst").alias("src"), F.col("mn").alias("dst")).union(
        j.select("src", F.col("mn").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _signature(edges: DataFrame):
    """(n_edges, order-independent checksum) — one tiny driver-side agg per
    round, used only for convergence detection."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)
        ).alias("h"),
    ).first()
    return row["n"], row["h"]


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_rounds: int = 50) -> DataFrame:
    """Label every vertex with the minimum vertex id of its component.

    vertices: one column `id` (long). edges: columns `src`, `dst` (long).
    Returns (id, component). Isolated vertices map to themselves.
    """
    e = _canon(edges).localCheckpoint(eager=True)
    sig = _signature(e)
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sig = _signature(e)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    # converged edge list is a star forest: src -> component root
    labels = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    return (
        vertices.select("id")
        .join(labels, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


def duplicate_drop_list(pairs: DataFrame, a_col: str = "a_id",
                        b_col: str = "b_id") -> DataFrame:
    """Cluster-canonical dedup policy: connected components over a near-dup
    pair list, drop everything but the minimum id of each component.

    Strictly stronger than per-pair drop-the-larger: pair policy keeps every
    LOCAL minimum (a chain b-a, a-c with a < b and a < c but with a second
    local min elsewhere in the component survives twice), CC keeps exactly
    one survivor per duplicate cluster. Ids may be any orderable type
    (urls/strings included). Returns one column `id` — the docs to drop."""
    verts = (
        pairs.select(F.col(a_col).alias("id"))
        .union(pairs.select(F.col(b_col).alias("id")))
        .distinct()
    )
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    comp = connected_components(verts, edges)
    return comp.filter(F.col("id") != F.col("component")).select("id")
