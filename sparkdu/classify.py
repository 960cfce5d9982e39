"""D5 — learned region classifier scoring (SURVEY SS7 M5).

From-scratch logistic model over node features: the public-API stand-in for
the reference's structured learners [U graph/Model_SSVM_AD3 (pystruct CRF),
gcn/gcn_models.py (ECN/GAT)]. Weights are a frozen artifact produced by
jobs/fit_artifacts.py BEFORE any extract run (two-phase rule, SURVEY SS4.4)
and are an *input* to both the Spark pipeline and the oracle, so byte-identity
holds with the model enabled.

Float recipe (must match oracle/extract.py::_model_score exactly):
float64 throughout; z starts at b, then accumulates w_i * f_i LEFT TO RIGHT
in artifact feature order; score = 1/(1+exp(-z)); content iff score >= 0.5.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_artifact(path: str) -> dict:
    with open(path) as f:
        art = json.load(f)
    assert len(art["w"]) == len(art["features"])
    return art


def score_udf(model: dict):
    """Iterator pandas_udf: struct of features -> content bool.

    Accumulation is columnwise left-to-right over float64 numpy arrays —
    elementwise IEEE adds in the same order as the oracle's scalar loop,
    hence bit-identical decisions.
    """
    feats = model["features"]
    ws = [float(w) for w in model["w"]]
    b = float(model["b"])

    @F.pandas_udf(T.BooleanType())
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            z = np.full(len(pdf), b, dtype=np.float64)
            for name, w in zip(feats, ws):
                z = z + w * pdf[name].to_numpy(dtype=np.float64)
            yield pd.Series(1.0 / (1.0 + np.exp(-z)) >= 0.5)

    return fn


def _tfidf_mean_py(txt: str, idf: dict, oov: float) -> float:
    toks = txt.split(" ")
    s = 0.0
    for t in toks:
        s += idf.get(t, oov)
    return s / len(toks)


def tfidf_mean_vec(nodes: DataFrame, idf: DataFrame, oov: float) -> DataFrame:
    """JVM-side twin of _tfidf_mean_py: explode tokens -> broadcast IDF
    join -> avg per node. Exact up to float summation order (pytest-gated
    at 1e-12); the Python loop remains the byte-identity scoring path.
    Returns (url, node_id, tfidf_mean)."""
    toks = nodes.select(
        "url", "node_id", F.explode(F.split("text", " ")).alias("token")
    )
    return (
        toks.join(F.broadcast(idf), "token", "left")
        .groupBy("url", "node_id")
        .agg(F.avg(F.coalesce(F.col("idf"), F.lit(float(oov)))).alias("tfidf_mean"))
    )


def with_derived_features(nodes: DataFrame, model: dict) -> DataFrame:
    """clf_v2 derived features (SPEC SS4) as DataFrame columns.

    nb_mean_<raw>: lag/lead window over (url, part_id) ordered by node_id —
    JVM doubles, same IEEE sequence as the oracle's (prev+next)/2.
    tfidf_mean: frozen-IDF lookup in a pandas UDF, token-order accumulation
    identical to the oracle loop. Both stay per-document (window keys are
    url-local), so this adds no shuffle beyond the url partitioning the
    staged path already has.
    """
    from pyspark.sql import Window

    feats = model["features"]
    nb_bases = [f[len("nb_mean_"):] for f in feats if f.startswith("nb_mean_")]
    df = nodes
    if nb_bases:
        w = Window.partitionBy("url", "part_id").orderBy("node_id")
        for base in nb_bases:
            prev = F.lag(F.col(base).cast("double")).over(w)
            nxt = F.lead(F.col(base).cast("double")).over(w)
            df = df.withColumn(
                "nb_mean_" + base,
                F.when(prev.isNotNull() & nxt.isNotNull(), (prev + nxt) / 2)
                .when(prev.isNotNull(), prev)
                .when(nxt.isNotNull(), nxt)
                .otherwise(F.col(base).cast("double")),
            )
    if "tfidf_mean" in feats:
        idf = {k: float(v) for k, v in model["idf"].items()}
        oov = float(model["idf_oov"])

        @F.pandas_udf(T.DoubleType())
        def tfidf_fn(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in it:
                yield s.map(lambda txt: _tfidf_mean_py(txt, idf, oov))

        df = df.withColumn("tfidf_mean", tfidf_fn(F.col("text")))
    return df


def _mp_grouped_udf(model: dict):
    """clf_v3 staged form (SPEC SS4 mp): grouped-map message passing, one
    pandas group per (url, part_id) — the D3 shape, same as the neighbor
    sweep; the graph is part-local so no cross-group traffic exists.

    Float recipe matches the oracle exactly: z0 columnwise left-to-right
    (float64), neighbor mean gathers prev-then-next (ascending node_id),
    np.exp ≡ math.exp elementwise (both libm, same contract score_udf
    already relies on).
    """
    feats = model["features"]
    ws = [float(w) for w in model["w"]]
    b = float(model["b"])
    T = int(model["mp"]["T"])
    alpha = float(model["mp"]["alpha"])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("node_id").reset_index(drop=True)
        n = len(pdf)
        z0 = np.full(n, b, dtype=np.float64)
        for name, w in zip(feats, ws):
            z0 = z0 + w * pdf[name].to_numpy(dtype=np.float64)
        s = 1.0 / (1.0 + np.exp(-z0))
        # neighbor chain: consecutive same-depth nodes (J1∪J2 under SS6)
        depth = pdf["depth"].to_numpy()
        prev = np.full(n, -1, dtype=np.int64)
        nxt = np.full(n, -1, dtype=np.int64)
        last: dict = {}
        for i in range(n):
            j = last.get(depth[i])
            if j is not None:
                prev[i] = j
                nxt[j] = i
            last[depth[i]] = i
        has_p, has_n = prev >= 0, nxt >= 0
        for _ in range(T):
            sp = np.where(has_p, s[prev], 0.0)
            sn = np.where(has_n, s[nxt], 0.0)
            m = np.where(
                has_p & has_n, (sp + sn) / 2,
                np.where(has_p, sp, np.where(has_n, sn, s)),
            )
            s = 1.0 / (1.0 + np.exp(-(z0 + alpha * (2.0 * m - 1.0))))
        rule_ok = (~pdf["anc_boiler"].to_numpy()) & (
            pdf["link_density"].to_numpy(dtype=np.float64) <= 0.5
        )
        pdf["is_content"] = rule_ok & (s >= 0.5)
        return pdf

    return fn


def classify_model(nodes: DataFrame, model_path: str) -> DataFrame:
    """Rule stage then model refinement (SPEC SS4, pipeline >= 1.1.0;
    clf_v3 artifacts additionally run iterated message passing, >= 1.2.0)."""
    model = load_artifact(model_path)
    nodes = with_derived_features(nodes, model)
    if model.get("mp"):
        out_schema = T.StructType(
            list(nodes.schema.fields) + [T.StructField("is_content", T.BooleanType())]
        )
        return nodes.groupBy("url", "part_id").applyInPandas(
            _mp_grouped_udf(model), schema=out_schema
        )
    rule_ok = (~F.col("anc_boiler")) & (F.col("link_density") <= 0.5)
    scored = score_udf(model)(F.struct(*model["features"]))
    return nodes.withColumn("is_content", rule_ok & scored)
