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


def classify_model(nodes: DataFrame, model_path: str) -> DataFrame:
    """Rule stage then model refinement (SPEC SS4, pipeline >= 1.1.0)."""
    model = load_artifact(model_path)
    rule_ok = (~F.col("anc_boiler")) & (F.col("link_density") <= 0.5)
    scored = score_udf(model)(F.struct(*model["features"]))
    return nodes.withColumn("is_content", rule_ok & scored)
