"""Generate fixtures_data/layout_edges.parquet and freeze
artifacts/clf_edges_v1.json — the learned EDGE-classification stage on the
native-layout leg: TranskribusDU's signature method.

Upstream locus: the upstream's distinctive contribution is segmentation by
CONJUGATE-GRAPH edge classification — instead of labeling nodes, label the
EDGES between adjacent layout elements (same-logical-unit vs boundary) and
recover the segmentation as the connected components of the positive
edges (its ECN/conjugate models). This is the edge-level dual of the
BIESO line tagger (tools/fit_line_classifier.py): the line tagger scores
lines in isolation; the edge classifier scores the RELATION between a
consecutive line pair, which is where the geometric signal actually lives
(the gap, the next line's indent, the previous line's shortfall).

Fixture: consecutive-line edges inside text regions, features derived
from HIDDEN paragraph structure with the same planted ambiguity recipe as
the sibling fitters (15% two-axis redraw, 5% label noise). Binary softmax
trained on a DISJOINT doc split, weights frozen to 6-decimal literals —
scoring arithmetic is engine-invariant, shared verbatim by Spark and the
DuckDB oracle. Paragraph recovery from predicted edges is a pure window
cumsum (the chain's connected components), SQL-expressible in BOTH
engines — see staging.layout_edge_paragraphs.

Run: python tools/fit_edge_classifier.py   (from repo root; deterministic)
"""

from __future__ import annotations

import json
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CLASSES = ["boundary", "same"]  # edge label: new paragraph starts at dst?

# feature expressions over the fixture columns — THE SINGLE SOURCE OF
# TRUTH, consumed verbatim by sparkdu/staging.py and the DuckDB oracle.
FEATURE_EXPRS = [
    "(gap / line_h)",
    "indent_next",
    "rel_width_prev",
    "CAST(punct_prev AS DOUBLE)",
    "CAST(upper_next AS DOUBLE)",
    "(CAST(n_chars_prev AS DOUBLE) / 40.0)",
]


def _features_py(r: dict) -> list:
    return [
        r["gap"] / r["line_h"],
        r["indent_next"],
        r["rel_width_prev"],
        float(r["punct_prev"]),
        float(r["upper_next"]),
        float(r["n_chars_prev"]) / 40.0,
    ]


def gen_edges(n_docs: int = 170) -> list:
    rng = random.Random(20260818 + 7)
    rows = []
    for did in range(n_docs):
        for rid in range(rng.randint(2, 4)):
            line_h = rng.uniform(10.0, 18.0)
            # hidden structure: paragraphs of lines within the region
            paras = [rng.randint(1, 6) for _ in range(rng.randint(1, 4))]
            # per-line attributes drawn from the position within its
            # hidden paragraph (the same conditional recipe as the BIESO
            # fitter, so the two stages see one world)
            lines = []
            for p, n in enumerate(paras):
                for li in range(n):
                    first, last = li == 0, li == n - 1
                    lines.append({
                        "para": p,
                        "first": first,
                        "indent": (rng.uniform(0.03, 0.09) if first
                                   else rng.uniform(0.0, 0.015)),
                        "rel_width": (rng.uniform(0.30, 0.90) if last
                                      else rng.uniform(0.85, 1.0)),
                        "punct": int(rng.random() < (0.85 if last else 0.15)),
                        "upper": int(rng.random() < (0.9 if first else 0.3)),
                        "n_chars": (rng.randint(10, 70) if last
                                    else rng.randint(30, 90)),
                    })
            for k in range(1, len(lines)):
                prev, nxt = lines[k - 1], lines[k]
                same = int(prev["para"] == nxt["para"])
                gap = line_h * (rng.uniform(0.15, 0.45) if same
                                else rng.uniform(1.0, 2.2))
                indent_next = nxt["indent"]
                rel_width_prev = prev["rel_width"]
                punct_prev = prev["punct"]
                upper_next = nxt["upper"]
                n_chars_prev = prev["n_chars"]
                u = rng.random()
                if u < 0.05:  # irreducible label noise
                    gap = line_h * rng.uniform(0.15, 2.2)
                    indent_next = rng.uniform(0.0, 0.09)
                    rel_width_prev = rng.uniform(0.02, 1.0)
                elif u < 0.20:  # two feature axes redrawn
                    for axis in rng.sample(["gap", "ind", "rw", "nc"], 2):
                        if axis == "gap":
                            gap = line_h * rng.uniform(0.15, 2.2)
                        elif axis == "ind":
                            indent_next = rng.uniform(0.0, 0.09)
                        elif axis == "rw":
                            rel_width_prev = rng.uniform(0.02, 1.0)
                        else:
                            n_chars_prev = rng.randint(1, 90)
                rows.append({
                    "doc_id": did, "region_id": rid,
                    "edge_id": k - 1, "src_line": k - 1, "dst_line": k,
                    "line_h": round(line_h, 2),
                    "gap": round(gap, 2),
                    "indent_next": round(indent_next, 4),
                    "rel_width_prev": round(rel_width_prev, 4),
                    "punct_prev": punct_prev,
                    "upper_next": upper_next,
                    "n_chars_prev": n_chars_prev,
                    "same": same,
                })
    return rows


def main() -> None:
    from fit_region_classifier import train_softmax

    rows = gen_edges()
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "region_id": pa.array([r["region_id"] for r in rows], pa.int32()),
        "edge_id": pa.array([r["edge_id"] for r in rows], pa.int32()),
        "src_line": pa.array([r["src_line"] for r in rows], pa.int32()),
        "dst_line": pa.array([r["dst_line"] for r in rows], pa.int32()),
        "line_h": pa.array([r["line_h"] for r in rows], pa.float64()),
        "gap": pa.array([r["gap"] for r in rows], pa.float64()),
        "indent_next": pa.array(
            [r["indent_next"] for r in rows], pa.float64()),
        "rel_width_prev": pa.array(
            [r["rel_width_prev"] for r in rows], pa.float64()),
        "punct_prev": pa.array([r["punct_prev"] for r in rows], pa.int32()),
        "upper_next": pa.array([r["upper_next"] for r in rows], pa.int32()),
        "n_chars_prev": pa.array(
            [r["n_chars_prev"] for r in rows], pa.int32()),
        "same": pa.array([r["same"] for r in rows], pa.int32()),
    })
    out = os.path.join(ROOT, "fixtures_data", "layout_edges.parquet")
    pq.write_table(tbl, out, compression="zstd")
    print(f"wrote layout_edges.parquet: {tbl.num_rows} rows")

    X = np.array([_features_py(r) for r in rows])
    y = np.array([r["same"] for r in rows])  # class idx == same flag
    is_test = np.array([r["doc_id"] % 5 == 0 for r in rows])
    W, b = train_softmax(X[~is_test], y[~is_test], len(CLASSES))
    W, b = np.round(W, 6), np.round(b, 6)

    def acc(mask):
        pred = (X[mask] @ W.T + b).argmax(axis=1)
        return float((pred == y[mask]).mean())

    def boundary_f1(mask):
        pred = (X[mask] @ W.T + b).argmax(axis=1)
        tp = int(((pred == 0) & (y[mask] == 0)).sum())
        fp = int(((pred == 0) & (y[mask] == 1)).sum())
        fn = int(((pred == 1) & (y[mask] == 0)).sum())
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        return 2 * p * r / max(p + r, 1e-9)

    art = {
        "kind": "softmax_edge_classifier",
        "version": "edges-1.0.0",
        "classes": CLASSES,
        "feature_exprs": FEATURE_EXPRS,
        "W": [[float(v) for v in row] for row in W],
        "b": [float(v) for v in b],
        "train_split": "doc_id % 5 != 0",
        "train_acc": acc(~is_test),
        "test_acc": acc(is_test),
        "test_boundary_f1": boundary_f1(is_test),
        "n_train": int((~is_test).sum()),
        "n_test": int(is_test.sum()),
    }
    path = os.path.join(ROOT, "artifacts", "clf_edges_v1.json")
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"froze clf_edges_v1.json  train_acc={art['train_acc']:.4f}  "
          f"test_acc={art['test_acc']:.4f}  "
          f"boundary_f1={art['test_boundary_f1']:.4f}  "
          f"(test n={art['n_test']})")


if __name__ == "__main__":
    main()
