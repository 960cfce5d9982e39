"""Freeze global artifacts (M5): train the logistic region classifier.

The "train" analogue of the reference's ``--trn`` path [U graph/Model train:
fit feature pipeline -> OneSlackSSVM.fit -> pickle], rebuilt as: Spark
assembles the (features, label) matrix JVM-side; a deterministic full-batch
gradient descent (numpy, float64, fixed iterations, no randomness) fits the
weights; standardization is folded back into raw-feature weights so scoring
needs no preprocessing; the artifact is JSON (weights + feature names).

Run: python -m sparkdu.jobs.fit_artifacts
Output: artifacts/clf_v1.json (+ README.md documenting the float recipe).

Training data: the committed fixtures (nodes.parquet x labels.parquet),
restricted to rule-accepted nodes — the model only refines the rule stage
(SPEC SS4), so boiler-by-rule rows never reach it.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ART = os.path.join(REPO, "artifacts")

FEATURES = [
    "n_chars", "n_links", "link_density", "punct_ratio",
    "digit_ratio", "caps_ratio", "depth",
]


def train(X: np.ndarray, y: np.ndarray, iters: int = 400, lr: float = 0.5):
    """Full-batch logistic GD on standardized features; deterministic."""
    mu = X.mean(axis=0)
    sigma = X.std(axis=0)
    sigma[sigma == 0] = 1.0
    Xs = (X - mu) / sigma
    n, d = Xs.shape
    w = np.zeros(d)
    b = 0.0
    # class-balance weights so the rare boiler class matters
    pos = y.mean()
    sw = np.where(y == 1, 0.5 / max(pos, 1e-9), 0.5 / max(1 - pos, 1e-9))
    sw = sw / sw.mean()
    for _ in range(iters):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) * sw
        w -= lr * (Xs.T @ g) / n
        b -= lr * g.mean()
    # fold standardization into raw-feature weights
    w_raw = w / sigma
    b_raw = b - float((w * mu / sigma).sum())
    return w_raw, b_raw, mu, sigma


def main() -> None:
    from sparkdu.harness import fx
    from sparkdu.session import get_spark

    spark = get_spark(app="fit-artifacts", master="local[8]")
    from pyspark.sql import functions as F

    nodes = spark.read.parquet(fx("nodes"))
    labels = spark.read.parquet(fx("labels"))
    rule_ok = (~F.col("anc_boiler")) & (F.col("link_density") <= 0.5)
    df = (
        nodes.filter(rule_ok)
        .join(labels, ["url", "node_id"])
        .select(*FEATURES, (F.col("gt_label") == "content").cast("int").alias("y"))
    )
    pdf = df.toPandas()
    spark.stop()

    X = pdf[FEATURES].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    w, b, mu, sigma = train(X, y)

    z = X @ w + b
    pred = (1.0 / (1.0 + np.exp(-z))) >= 0.5
    tp = int(((pred == 1) & (y == 1)).sum())
    fp = int(((pred == 1) & (y == 0)).sum())
    fn = int(((pred == 0) & (y == 1)).sum())
    tn = int(((pred == 0) & (y == 0)).sum())
    print(f"train n={len(y)} pos={y.mean():.3f}  tp={tp} fp={fp} fn={fn} tn={tn}")
    print(f"precision={tp/max(tp+fp,1):.4f} recall={tp/max(tp+fn,1):.4f}")

    os.makedirs(ART, exist_ok=True)
    art = {
        "version": "clf_v1",
        "features": FEATURES,
        "w": [float(x) for x in w],
        "b": float(b),
        "train_stats": {"n": int(len(y)), "tp": tp, "fp": fp, "fn": fn, "tn": tn},
    }
    with open(os.path.join(ART, "clf_v1.json"), "w") as f:
        json.dump(art, f, indent=1)
    print(f"wrote {os.path.join(ART, 'clf_v1.json')}")


if __name__ == "__main__":
    main()
