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
import pandas as pd

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


DERIVED_BASES = ["n_chars", "link_density", "punct_ratio"]
FEATURES_V2 = (
    FEATURES
    + ["nb_mean_" + b for b in DERIVED_BASES]
    + ["tfidf_mean"]
)
IDF_MIN_DF = 3


def _confusion(pred: np.ndarray, y: np.ndarray) -> dict:
    return {
        "tp": int(((pred == 1) & (y == 1)).sum()),
        "fp": int(((pred == 1) & (y == 0)).sum()),
        "fn": int(((pred == 0) & (y == 1)).sum()),
        "tn": int(((pred == 0) & (y == 0)).sum()),
    }


def _fit_and_report(X: np.ndarray, y: np.ndarray, names: list, tag: str):
    w, b, mu, sigma = train(X, y)
    z = X @ w + b
    pred = (1.0 / (1.0 + np.exp(-z))) >= 0.5
    cm = _confusion(pred, y)
    prec = cm["tp"] / max(cm["tp"] + cm["fp"], 1)
    rec = cm["tp"] / max(cm["tp"] + cm["fn"], 1)
    print(f"{tag}: n={len(y)} {cm} precision={prec:.4f} recall={rec:.4f}")
    return w, b, cm, prec, rec


def _mp_graph(pdf) -> tuple:
    """Grid-invariant neighbor structure for _mp_eval: prev/next gather
    indices per (url, part_id, depth) chain. Computed ONCE — only the
    (T, alpha) sigmoid updates depend on the grid point."""
    idx = pd.Series(np.arange(len(pdf)), index=pdf.index)
    g = idx.groupby([pdf["url"], pdf["part_id"], pdf["depth"]], sort=False)
    prev = g.shift(1).to_numpy()
    nxt = g.shift(-1).to_numpy()
    has_p, has_n = ~np.isnan(prev), ~np.isnan(nxt)
    pi = np.where(has_p, prev, 0).astype(np.int64)
    ni = np.where(has_n, nxt, 0).astype(np.int64)
    return pi, ni, has_p, has_n


def _mp_eval(z0: np.ndarray, graph: tuple, T: int, alpha: float) -> np.ndarray:
    """Vectorized SPEC §4 clf_v3 recipe over the whole training frame,
    given the precomputed base scores z0 and _mp_graph structure. Returns
    the final per-node score s_T (float64). Used only to SELECT
    hyperparameters at fit time — the frozen artifact is what scoring
    paths consume."""
    pi, ni, has_p, has_n = graph
    s = 1.0 / (1.0 + np.exp(-z0))
    for _ in range(T):
        sp = np.where(has_p, s[pi], 0.0)
        sn = np.where(has_n, s[ni], 0.0)
        m = np.where(has_p & has_n, (sp + sn) / 2,
                     np.where(has_p, sp, np.where(has_n, sn, s)))
        s = 1.0 / (1.0 + np.exp(-(z0 + alpha * (2.0 * m - 1.0))))
    return s


def main() -> None:
    from sparkdu.harness import fx
    from sparkdu.session import get_spark

    spark = get_spark(app="fit-artifacts", master="local[8]")
    from pyspark.sql import functions as F

    nodes = spark.read.parquet(fx("nodes"))
    labels = spark.read.parquet(fx("labels"))

    # --- frozen IDF table (two-phase rule): the A2/J6 operators run at FIT
    # time over the same corpus; extraction then only does dict lookups.
    toks = nodes.select("url", F.explode(F.split("text", " ")).alias("token"))
    n_docs = toks.select("url").distinct().count()
    vocab_rows = (
        toks.groupBy("token")
        .agg(F.countDistinct("url").alias("df"))
        .filter(F.col("df") >= IDF_MIN_DF)
        .collect()
    )
    import math

    idf = {r["token"]: math.log(n_docs / r["df"]) for r in vocab_rows}
    idf_oov = math.log(float(n_docs))
    print(f"idf vocab: {len(idf)} tokens over {n_docs} docs")

    # --- derived feature columns via the SAME code path the staged pipeline
    # uses at scoring time (sparkdu.classify.with_derived_features)
    from sparkdu.classify import with_derived_features

    pseudo = {"features": FEATURES_V2, "idf": idf, "idf_oov": idf_oov}
    nodes_d = with_derived_features(nodes, pseudo)

    rule_ok = (~F.col("anc_boiler")) & (F.col("link_density") <= 0.5)
    df = (
        nodes_d.filter(rule_ok)
        .join(labels, ["url", "node_id"])
        .select(*FEATURES_V2, (F.col("gt_label") == "content").cast("int").alias("y"))
    )
    pdf = df.toPandas()

    # all emitted nodes (labels left-joined): clf_v3 message passing runs
    # over the full graph, so hyperparameter evaluation needs every node,
    # not just the rule-accepted labeled ones
    df_all = nodes_d.join(labels, ["url", "node_id"], "left").select(
        "url", "part_id", "node_id", "anc_boiler", *FEATURES_V2,
        (F.col("gt_label") == "content").cast("int").alias("y"),
    )
    pdf_all = df_all.toPandas()
    spark.stop()

    y = pdf["y"].to_numpy(dtype=np.float64)
    X1 = pdf[FEATURES].to_numpy(dtype=np.float64)
    X2 = pdf[FEATURES_V2].to_numpy(dtype=np.float64)

    os.makedirs(ART, exist_ok=True)

    w1, b1, cm1, p1, r1 = _fit_and_report(X1, y, FEATURES, "clf_v1")
    art1 = {
        "version": "clf_v1",
        "features": FEATURES,
        "w": [float(x) for x in w1],
        "b": float(b1),
        "train_stats": {"n": int(len(y)), **cm1},
    }
    with open(os.path.join(ART, "clf_v1.json"), "w") as f:
        json.dump(art1, f, indent=1)
    print(f"wrote {os.path.join(ART, 'clf_v1.json')}")

    # clf_v2: neighbor-smoothing + TF-IDF (the CRF/ECN + FeatureDefinition
    # structured-model residue, SURVEY SS7 M5 / VERDICT r1 item 5+9)
    w2, b2, cm2, p2, r2 = _fit_and_report(X2, y, FEATURES_V2, "clf_v2")
    art2 = {
        "version": "clf_v2",
        "features": FEATURES_V2,
        "w": [float(x) for x in w2],
        "b": float(b2),
        "idf": idf,
        "idf_oov": idf_oov,
        "train_stats": {"n": int(len(y)), **cm2},
    }
    with open(os.path.join(ART, "clf_v2.json"), "w") as f:
        json.dump(art2, f, indent=1)
    print(f"wrote {os.path.join(ART, 'clf_v2.json')}")

    # clf_v3: same frozen weights + iterated message passing (SPEC SS4 mp);
    # grid-search (T, alpha) on the training corpus, deterministic tie-break
    # (first grid entry wins at equal error count)
    pdf_all = pdf_all.sort_values(["url", "node_id"]).reset_index(drop=True)
    rule_all = (~pdf_all["anc_boiler"].to_numpy()) & (
        pdf_all["link_density"].to_numpy(dtype=np.float64) <= 0.5
    )
    lab = pdf_all["y"].notna().to_numpy() & rule_all
    y_all = pdf_all["y"].to_numpy(dtype=np.float64)
    X_all = pdf_all[FEATURES_V2].to_numpy(dtype=np.float64)
    z0_all = X_all @ w2 + b2
    graph = _mp_graph(pdf_all)
    s_v2 = 1.0 / (1.0 + np.exp(-z0_all))
    pred_v2_all = rule_all & (s_v2 >= 0.5)
    best = None
    for T in (2, 3):
        for alpha in (0.25, 0.5, 0.75, 1.0, 1.5, 2.0):
            s = _mp_eval(z0_all, graph, T, alpha)
            pred_all = rule_all & (s >= 0.5)
            cm = _confusion(pred_all[lab].astype(int), y_all[lab])
            errs = cm["fp"] + cm["fn"]
            # among minimal-error grid points, prefer the one whose full-
            # corpus decisions differ MOST from clf_v2: the frozen golden
            # then discriminates the mp implementation (a buggy message
            # pass can't coincide with plain clf_v2 output)
            flips = int((pred_all != pred_v2_all).sum())
            if best is None or (errs, -flips) < (best[0], -best[4]):
                best = (errs, T, alpha, cm, flips)
    errs3, T3, alpha3, cm3, flips3 = best
    print(f"clf_v3 decision flips vs clf_v2 over all nodes: {flips3}")
    p3 = cm3["tp"] / max(cm3["tp"] + cm3["fp"], 1)
    r3 = cm3["tp"] / max(cm3["tp"] + cm3["fn"], 1)
    print(f"clf_v3: T={T3} alpha={alpha3} {cm3} precision={p3:.4f} recall={r3:.4f}")
    art3 = {
        "version": "clf_v3",
        "features": FEATURES_V2,
        "w": [float(x) for x in w2],
        "b": float(b2),
        "idf": idf,
        "idf_oov": idf_oov,
        "mp": {"T": int(T3), "alpha": float(alpha3)},
        "train_stats": {"n": int(lab.sum()), **cm3},
    }
    with open(os.path.join(ART, "clf_v3.json"), "w") as f:
        json.dump(art3, f, indent=1)
    print(f"wrote {os.path.join(ART, 'clf_v3.json')}")

    # clf_v3_hi: high-alpha variant frozen ONLY so the golden fixture
    # discriminates the mp stage — the fixture corpus is so separable
    # (median |z0| ~ 4.3) that quality-optimal alphas flip no decision vs
    # clf_v2, which would let a buggy message pass coincide with v2 output.
    # Not a production artifact; extract_model_v3 + tests use it for
    # byte-identity, score-level exactness is tested on clf_v3 itself.
    art3h = dict(art3)
    art3h["version"] = "clf_v3_hi"
    art3h["mp"] = {"T": 3, "alpha": 8.0}
    s_hi = _mp_eval(z0_all, graph, 3, 8.0)
    flips_hi = int(((rule_all & (s_hi >= 0.5)) != pred_v2_all).sum())
    art3h["train_stats"] = {"n": int(lab.sum()), "decision_flips_vs_v2": flips_hi}
    with open(os.path.join(ART, "clf_v3_hi.json"), "w") as f:
        json.dump(art3h, f, indent=1)
    print(f"wrote clf_v3_hi.json (flips vs v2: {flips_hi})")

    report3 = {
        "n": int(lab.sum()),
        "clf_v2": {**cm2, "precision": p2, "recall": r2},
        "clf_v3": {**cm3, "precision": p3, "recall": r3, "T": int(T3),
                   "alpha": float(alpha3), "decision_flips_vs_v2": flips3},
        "delta": {"precision": p3 - p2, "recall": r3 - r2,
                  "errors_v2": cm2["fp"] + cm2["fn"], "errors_v3": errs3},
    }
    with open(os.path.join(ART, "clf_v3_report.json"), "w") as f:
        json.dump(report3, f, indent=1)
    print(f"v3 report: {json.dumps(report3['delta'])}")

    # A3-style quality report: v1 vs v2 delta on the same training corpus
    report = {
        "n": int(len(y)),
        "clf_v1": {**cm1, "precision": p1, "recall": r1},
        "clf_v2": {**cm2, "precision": p2, "recall": r2},
        "delta": {"precision": p2 - p1, "recall": r2 - r1,
                  "errors_v1": cm1["fp"] + cm1["fn"],
                  "errors_v2": cm2["fp"] + cm2["fn"]},
    }
    with open(os.path.join(ART, "clf_v2_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report: {json.dumps(report['delta'])}")


if __name__ == "__main__":
    main()
