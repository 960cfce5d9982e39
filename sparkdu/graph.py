"""Neighbor-graph construction — J1/J2/J3 (SURVEY SS2.3).

Re-expression of the reference's per-document imperative neighbor search
[U graph/Block.findPageNeighborEdges, graph/Edge.HorizontalEdge/VerticalEdge/
CrossPageEdge] in two equivalent forms:

- `build_edges_grouped`: group-local O(n·k) visibility sweep inside
  ``groupBy(url).applyInPandas`` (D3) — the scale path. One shuffle on url;
  documents are self-contained so no cross-partition traffic. Catalyst would
  plan the theta form as BNL/cartesian per url — avoided (SURVEY SS4.1).
- `build_edges_join`: pure DataFrame range-join + NOT-EXISTS formulation —
  SQL-checkable against the DuckDB oracle (T2), and the form AQE skew-join
  can split if ever used at scale.

Edge semantics (normative, both forms + oracle SQL agree):

  v-edge (a,b): same url+part, x-ranges overlap (min(x2)-max(x1) > 0),
  a.y2 <= b.y1, and NO c in the same part with x-overlap of BOTH a and b
  and a.y2 <= c.y1 and c.y2 <= b.y1.  dist = b.y1 - a.y2,
  overlap = min(a.x2,b.x2) - max(a.x1,b.x1).  h-edge: axes transposed.
  xpart-edge (a in part p, b in part p+1): a in the bottom band of p
  (a.y2 >= max(y2 of p) - BAND), b in the top band of p+1
  (b.y1 <= min(y1 of p+1) + BAND); dist = (max_y2_p - a.y2) + (b.y1 -
  min_y1_p1), overlap = 0.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tables import EDGES_SCHEMA

XPART_BAND = 200.0

_GEOM_COLS = ["url", "part_id", "node_id", "x1", "y1", "x2", "y2"]


def _sweep_axis(pdf: pd.DataFrame, transpose: bool) -> Iterable[tuple]:
    """Exact visibility sweep for one (url, part): emit (src, dst, dist,
    overlap). transpose=False -> v-edges (scan in y), True -> h-edges."""
    if transpose:
        lo = pdf["x1"].to_numpy()
        hi = pdf["x2"].to_numpy()
        olo = pdf["y1"].to_numpy()
        ohi = pdf["y2"].to_numpy()
    else:
        lo = pdf["y1"].to_numpy()
        hi = pdf["y2"].to_numpy()
        olo = pdf["x1"].to_numpy()
        ohi = pdf["x2"].to_numpy()
    ids = pdf["node_id"].to_numpy()
    n = len(ids)
    order = sorted(range(n), key=lambda i: (lo[i], ids[i]))
    for ai_pos, ai in enumerate(order):
        passed: list[int] = []  # candidates after a that overlap a (blocker pool)
        for bi in order[ai_pos + 1 :]:
            if lo[bi] < hi[ai]:
                continue  # not strictly after a on the scan axis
            b_ov = min(ohi[ai], ohi[bi]) - max(olo[ai], olo[bi])
            if b_ov > 0:
                blocked = any(
                    hi[c] <= lo[bi]
                    and (min(ohi[c], ohi[bi]) - max(olo[c], olo[bi])) > 0
                    for c in passed
                )
                if not blocked:
                    yield (int(ids[ai]), int(ids[bi]), float(lo[bi] - hi[ai]), float(b_ov))
                passed.append(bi)
            # early exit: if blockers strictly below current b fully cover a
            # we could break; kept simple-and-exact (k stays small in practice)


def _xpart_edges(pdf: pd.DataFrame) -> Iterable[tuple]:
    parts = sorted(pdf["part_id"].unique())
    by_part = {p: pdf[pdf["part_id"] == p] for p in parts}
    for p, p_next in zip(parts, parts[1:]):
        if p_next != p + 1:
            continue
        a_pdf, b_pdf = by_part[p], by_part[p_next]
        max_y2 = a_pdf["y2"].max()
        min_y1 = b_pdf["y1"].min()
        a_band = a_pdf[a_pdf["y2"] >= max_y2 - XPART_BAND]
        b_band = b_pdf[b_pdf["y1"] <= min_y1 + XPART_BAND]
        for aid, ay2 in zip(a_band["node_id"], a_band["y2"]):
            for bid, by1 in zip(b_band["node_id"], b_band["y1"]):
                yield (int(aid), int(bid), float((max_y2 - ay2) + (by1 - min_y1)), 0.0)


def _edges_for_url(key, pdf: pd.DataFrame) -> pd.DataFrame:
    url = key[0]
    rows = []
    for _, part_pdf in pdf.groupby("part_id", sort=True):
        for s, d, dist, ov in _sweep_axis(part_pdf, transpose=False):
            rows.append((url, s, d, "v", dist, ov))
        for s, d, dist, ov in _sweep_axis(part_pdf, transpose=True):
            rows.append((url, s, d, "h", dist, ov))
    for s, d, dist, ov in _xpart_edges(pdf):
        rows.append((url, s, d, "xpart", dist, ov))
    return pd.DataFrame(
        rows, columns=["url", "src_node_id", "dst_node_id", "edge_type", "dist", "overlap"]
    )


def build_edges_grouped(nodes: DataFrame) -> DataFrame:
    """Scale path: one grouped-map Arrow pass per url (D3)."""
    return (
        nodes.select(*_GEOM_COLS)
        .groupBy("url")
        .applyInPandas(_edges_for_url, schema=EDGES_SCHEMA)
    )


def _axis_join(nodes: DataFrame, edge_type: str) -> DataFrame:
    """Join-form J1/J2: self range-join + anti-join blocker elimination."""
    if edge_type == "v":
        scan_lo, scan_hi, o_lo, o_hi = "y1", "y2", "x1", "x2"
    else:
        scan_lo, scan_hi, o_lo, o_hi = "x1", "x2", "y1", "y2"
    a = nodes.select(*_GEOM_COLS).alias("a")
    b = nodes.select(*_GEOM_COLS).alias("b")
    c = nodes.select(*_GEOM_COLS).alias("c")
    A, B, C = (lambda s: F.col(f"a.{s}")), (lambda s: F.col(f"b.{s}")), (lambda s: F.col(f"c.{s}"))
    ov = F.least(A(o_hi), B(o_hi)) - F.greatest(A(o_lo), B(o_lo))
    pairs = a.join(
        b,
        (A("url") == B("url"))
        & (A("part_id") == B("part_id"))
        & (A(scan_hi) <= B(scan_lo))
        & (ov > 0),
    ).select(
        A("url").alias("url"),
        A("part_id").alias("part_id"),
        A("node_id").alias("src_node_id"),
        B("node_id").alias("dst_node_id"),
        (B(scan_lo) - A(scan_hi)).alias("dist"),
        ov.alias("overlap"),
        A(o_lo).alias("a_olo"), A(o_hi).alias("a_ohi"),
        B(o_lo).alias("b_olo"), B(o_hi).alias("b_ohi"),
        A(scan_hi).alias("a_hi"), B(scan_lo).alias("b_lo"),
    )
    p = pairs.alias("p")
    P_ = lambda s: F.col(f"p.{s}")
    blocked = p.join(
        c,
        (P_("url") == C("url"))
        & (P_("part_id") == C("part_id"))
        & (P_("a_hi") <= C(scan_lo))
        & (C(scan_hi) <= P_("b_lo"))
        & (F.least(P_("a_ohi"), C(o_hi)) > F.greatest(P_("a_olo"), C(o_lo)))
        & (F.least(P_("b_ohi"), C(o_hi)) > F.greatest(P_("b_olo"), C(o_lo))),
        "left_semi",
    ).select("url", "src_node_id", "dst_node_id")
    return pairs.join(
        blocked, ["url", "src_node_id", "dst_node_id"], "left_anti"
    ).select(
        "url", "src_node_id", "dst_node_id",
        F.lit(edge_type).alias("edge_type"), "dist", "overlap",
    )


def build_edges_join(nodes: DataFrame) -> DataFrame:
    """SQL-checkable join form: union of v, h and xpart edge queries."""
    v = _axis_join(nodes, "v")
    h = _axis_join(nodes, "h")

    stats = nodes.groupBy("url", "part_id").agg(
        F.max("y2").alias("max_y2"), F.min("y1").alias("min_y1")
    )
    n = nodes.select(*_GEOM_COLS)
    a = (
        n.join(stats, ["url", "part_id"])
        .filter(F.col("y2") >= F.col("max_y2") - XPART_BAND)
        .select("url", "part_id", "node_id", "y2", "max_y2")
    )
    b = (
        n.join(stats, ["url", "part_id"])
        .filter(F.col("y1") <= F.col("min_y1") + XPART_BAND)
        .select(
            "url",
            (F.col("part_id") - 1).alias("part_id"),
            F.col("node_id").alias("dst_node_id"),
            "y1", "min_y1",
        )
    )
    x = a.join(b, ["url", "part_id"]).select(
        "url",
        F.col("node_id").alias("src_node_id"),
        "dst_node_id",
        F.lit("xpart").alias("edge_type"),
        ((F.col("max_y2") - F.col("y2")) + (F.col("y1") - F.col("min_y1"))).alias("dist"),
        F.lit(0.0).alias("overlap"),
    )
    return v.unionByName(h).unionByName(x)


def with_neighbor_counts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """W4 — per-node #h / #v neighbors [U graph/Transformer
    NodeTransformerNeighbors]; computed as agg + broadcast-free equi join J5."""
    cnt = (
        edges.select("url", F.col("src_node_id").alias("node_id"), "edge_type")
        .unionByName(edges.select("url", F.col("dst_node_id").alias("node_id"), "edge_type"))
        .groupBy("url", "node_id")
        .agg(
            F.sum(F.when(F.col("edge_type") == "h", 1).otherwise(0)).alias("n_h_neighbors"),
            F.sum(F.when(F.col("edge_type") == "v", 1).otherwise(0)).alias("n_v_neighbors"),
        )
    )
    return nodes.join(cnt, ["url", "node_id"], "left").fillna(
        {"n_h_neighbors": 0, "n_v_neighbors": 0}
    )
