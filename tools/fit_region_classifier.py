"""Generate fixtures_data/layout_regions.parquet and freeze
artifacts/clf_regions_v1.json — the LEARNED region-TYPE classification
stage on the engine's native-layout leg.

Upstream locus: TranskribusDU's core task is zone/region classification —
predicting a TextRegion's semantic type (paragraph / heading / marginalia /
page-number) from layout features (geometry, text statistics, reading-order
membership), via trained models over PAGE-XML collections. The existing
clf_v1/v2/v3 artifacts cover the HTML leg's binary content decision; this
artifact covers the native-layout MULTICLASS decision over REAL geometry.

Two-phase rule (SPEC §4): training happens HERE, offline, on a committed
fixture; extraction-time scoring is a pure map with frozen weights. The
fixture plants class-conditional geometry distributions the way real
documents exhibit them (paragraphs wide+tall, headings wide+short+high,
marginalia narrow+edge-aligned, page-numbers tiny+bottom) WITH overlap
noise, and the trainer fits softmax regression on a DISJOINT doc split
(train: doc_id % 5 != 0; held-out test: doc_id % 5 == 0) so the reported
accuracy is generalization, not memorization. Weights are rounded to 6
decimals before freezing so both engines can inline them as exact decimal
literals (the scoring arithmetic is then pure IEEE +,*,/ in identical
association order — no transcendentals — and argmax is engine-invariant).

Run: python tools/fit_region_classifier.py   (from repo root; deterministic)
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

CLASSES = ["paragraph", "heading", "marginalia", "page-number"]

# feature expressions over the fixture columns — THE SINGLE SOURCE OF
# TRUTH, consumed verbatim by sparkdu/staging.py (Spark selectExpr) and by
# the DuckDB oracle; Python twins below must mirror them exactly.
FEATURE_EXPRS = [
    "((x2 - x1) / page_w)",
    "((y2 - y1) / page_h)",
    "(y1 / page_h)",
    "(((x1 + x2) / 2.0) / page_w)",
    "(CAST(n_chars AS DOUBLE) / 100.0)",
    "CAST(n_lines AS DOUBLE)",
    "CAST(has_ro AS DOUBLE)",
]


def _features_py(r: dict) -> list:
    return [
        (r["x2"] - r["x1"]) / r["page_w"],
        (r["y2"] - r["y1"]) / r["page_h"],
        r["y1"] / r["page_h"],
        ((r["x1"] + r["x2"]) / 2.0) / r["page_w"],
        float(r["n_chars"]) / 100.0,
        float(r["n_lines"]),
        float(r["has_ro"]),
    ]


def gen_regions(n_docs: int = 150) -> list:
    rng = random.Random(20260818)
    rows = []
    for did in range(n_docs):
        pw, ph = float(rng.randint(600, 1400)), float(rng.randint(800, 2000))
        for nid in range(rng.randint(6, 10)):
            cls = rng.choices(CLASSES, weights=[45, 20, 20, 15])[0]
            if cls == "paragraph":
                w = rng.uniform(0.60, 0.90)
                h = rng.uniform(0.08, 0.25)
                y = rng.uniform(0.05, 0.78 - h if h < 0.7 else 0.05)
                cx = rng.uniform(0.45, 0.55)
                n_chars = rng.randint(80, 400)
                n_lines = rng.randint(2, 6)
                has_ro = 1 if rng.random() < 0.9 else 0
            elif cls == "heading":
                w = rng.uniform(0.35, 0.75)
                h = rng.uniform(0.015, 0.05)
                y = rng.uniform(0.0, 0.30)
                cx = rng.uniform(0.40, 0.60)
                n_chars = rng.randint(10, 60)
                n_lines = 1
                has_ro = 1 if rng.random() < 0.8 else 0
            elif cls == "marginalia":
                w = rng.uniform(0.05, 0.18)
                h = rng.uniform(0.10, 0.40)
                y = rng.uniform(0.10, 0.55)
                cx = (rng.uniform(0.05, 0.11) if rng.random() < 0.5
                      else rng.uniform(0.89, 0.95))
                n_chars = rng.randint(10, 80)
                n_lines = rng.randint(1, 3)
                has_ro = 0 if rng.random() < 0.8 else 1
            else:  # page-number
                w = rng.uniform(0.02, 0.08)
                h = rng.uniform(0.010, 0.030)
                y = rng.uniform(0.88, 0.965)
                cx = rng.uniform(0.20, 0.80)
                n_chars = rng.randint(1, 4)
                n_lines = 1
                has_ro = 0
            # ambiguity: 15% of regions get TWO geometry axes redrawn from
            # the global range (class overlap, decision stays statistical),
            # and 5% get fully class-atypical geometry (irreducible label
            # noise, the scanning/annotation errors real corpora carry) —
            # a fit that memorized planted bands would score ~1.0; an
            # honest geometric posterior cannot
            u = rng.random()
            if u < 0.05:
                w = rng.uniform(0.02, 0.90)
                h = rng.uniform(0.010, 0.25)
                y = min(rng.uniform(0.0, 0.95), 0.99 - h)
                n_chars = rng.randint(1, 400)
                n_lines = rng.randint(1, 6)
            elif u < 0.20:
                for axis in rng.sample(["w", "h", "y", "chars"], 2):
                    if axis == "w":
                        w = rng.uniform(0.05, 0.90)
                    elif axis == "h":
                        h = rng.uniform(0.010, 0.25)
                    elif axis == "y":
                        y = min(rng.uniform(0.0, 0.95), 0.99 - h)
                    else:
                        n_chars = rng.randint(1, 400)
            x1 = max(0.0, (cx - w / 2.0)) * pw
            x2 = min(1.0, (cx + w / 2.0)) * pw
            y1 = y * ph
            y2 = min(1.0, y + h) * ph
            rows.append({
                "doc_id": did, "node_id": nid,
                "page_w": pw, "page_h": ph,
                "x1": round(x1, 1), "y1": round(y1, 1),
                "x2": round(x2, 1), "y2": round(y2, 1),
                "n_lines": n_lines, "n_chars": n_chars, "has_ro": has_ro,
                "rtype": cls,
            })
    return rows


def train_softmax(X: np.ndarray, y: np.ndarray, n_cls: int,
                  iters: int = 4000, lr: float = 0.8):
    """Full-batch softmax GD on standardized features, folded back to raw
    weights; deterministic (zero init, fixed schedule)."""
    mu, sigma = X.mean(axis=0), X.std(axis=0)
    sigma[sigma == 0] = 1.0
    Xs = (X - mu) / sigma
    n, d = Xs.shape
    W = np.zeros((n_cls, d))
    b = np.zeros(n_cls)
    Y = np.eye(n_cls)[y]
    for _ in range(iters):
        Z = Xs @ W.T + b
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = P - Y
        W -= lr * (G.T @ Xs) / n
        b -= lr * G.mean(axis=0)
    W_raw = W / sigma
    b_raw = b - (W * mu / sigma).sum(axis=1)
    return W_raw, b_raw


def main() -> None:
    rows = gen_regions()
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "node_id": pa.array([r["node_id"] for r in rows], pa.int32()),
        "page_w": pa.array([r["page_w"] for r in rows], pa.float64()),
        "page_h": pa.array([r["page_h"] for r in rows], pa.float64()),
        "x1": pa.array([r["x1"] for r in rows], pa.float64()),
        "y1": pa.array([r["y1"] for r in rows], pa.float64()),
        "x2": pa.array([r["x2"] for r in rows], pa.float64()),
        "y2": pa.array([r["y2"] for r in rows], pa.float64()),
        "n_lines": pa.array([r["n_lines"] for r in rows], pa.int32()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int32()),
        "has_ro": pa.array([r["has_ro"] for r in rows], pa.int32()),
        "rtype": pa.array([r["rtype"] for r in rows], pa.string()),
    })
    out = os.path.join(ROOT, "fixtures_data", "layout_regions.parquet")
    pq.write_table(tbl, out, compression="zstd")
    print(f"wrote layout_regions.parquet: {tbl.num_rows} rows")

    X = np.array([_features_py(r) for r in rows])
    y = np.array([CLASSES.index(r["rtype"]) for r in rows])
    is_test = np.array([r["doc_id"] % 5 == 0 for r in rows])
    W, b = train_softmax(X[~is_test], y[~is_test], len(CLASSES))
    W, b = np.round(W, 6), np.round(b, 6)  # exact decimal literals

    def acc(mask):
        pred = (X[mask] @ W.T + b).argmax(axis=1)
        return float((pred == y[mask]).mean())

    art = {
        "kind": "softmax_region_classifier",
        "version": "regions-1.0.0",
        "classes": CLASSES,
        "feature_exprs": FEATURE_EXPRS,
        "W": [[float(v) for v in row] for row in W],
        "b": [float(v) for v in b],
        "train_split": "doc_id % 5 != 0",
        "train_acc": acc(~is_test),
        "test_acc": acc(is_test),
        "n_train": int((~is_test).sum()),
        "n_test": int(is_test.sum()),
    }
    path = os.path.join(ROOT, "artifacts", "clf_regions_v1.json")
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"froze clf_regions_v1.json  train_acc={art['train_acc']:.4f}  "
          f"test_acc={art['test_acc']:.4f}  (test n={art['n_test']})")


if __name__ == "__main__":
    main()
