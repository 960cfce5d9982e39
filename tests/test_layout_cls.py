"""Gates for the learned region-TYPE classifier on the native-layout leg
(layout_region_classify): held-out accuracy (the artifact was trained on
doc_id % 5 != 0 only), plan shape (zero-exchange pure map), and artifact
hygiene (decimal-literal weights, recorded split + accuracies)."""

import json
import re

from pyspark.sql import functions as F

import sparkdu.staging  # noqa: F401
from sparkdu.harness import QUERIES, fx

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_heldout_accuracy(spark):
    df = QUERIES["layout_region_classify"](spark, SF)
    test = df.join(
        spark.read.parquet(fx("layout_regions")).select("doc_id", "node_id"),
        ["doc_id", "node_id"],
    ).filter(F.col("doc_id") % 5 == 0)
    n = test.count()
    ok = test.filter(F.col("pred_rtype") == F.col("rtype")).count()
    art = json.load(open("artifacts/clf_regions_v1.json"))
    assert n == art["n_test"] > 200
    acc = ok / n
    assert acc >= 0.92, acc
    assert abs(acc - art["test_acc"]) < 1e-9  # frozen = reproducible
    # and it genuinely generalizes: train acc must not be perfect while
    # test collapses (no memorization artifact possible — linear model —
    # but pin the recorded gap as a sanity bound)
    assert art["train_acc"] - art["test_acc"] < 0.05


def test_every_class_predicted_and_confusable(spark):
    """All four classes appear in predictions, and the planted 5% label
    noise means SOME rows disagree — a classifier echoing rtype would be
    a leak (pred must come from geometry, not the label column)."""
    df = QUERIES["layout_region_classify"](spark, SF)
    preds = {r["pred_rtype"] for r in df.select("pred_rtype")
             .distinct().collect()}
    assert preds == {"paragraph", "heading", "marginalia", "page-number"}
    n_wrong = df.filter(F.col("pred_rtype") != F.col("rtype")).count()
    assert n_wrong > 0


def test_scoring_is_zero_exchange_pure_map(spark):
    plan = _plan(QUERIES["layout_region_classify"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # JVM-side whole-stage-codegen scoring


def test_artifact_weights_are_decimal_literals():
    art = json.load(open("artifacts/clf_regions_v1.json"))
    assert art["train_split"] == "doc_id % 5 != 0"
    assert len(art["W"]) == len(art["classes"]) == 4
    for row in art["W"]:
        for w in row:
            assert round(w, 6) == w  # exact decimal literal both engines
    assert len(art["feature_exprs"]) == len(art["W"][0]) == 7


def test_table_grid_exact_recovery(spark):
    """2-D grid recovery: interval islands per axis must reproduce the
    generator's row/col indices exactly on every cell — ragged heights/
    widths, jittered insets, ~10% sparse cells included (1-based island
    ids vs 0-based truth)."""
    pred = QUERIES["layout_table_grid"](spark, SF)
    truth = spark.read.parquet(fx("table_cells")).select(
        "doc_id", "cell_id", "true_row", "true_col")
    j = pred.join(truth, ["doc_id", "cell_id"])
    n = j.count()
    assert n == truth.count() == 2509
    bad = j.filter(
        (F.col("row_id") != F.col("true_row") + 1)
        | (F.col("col_id") != F.col("true_col") + 1)).count()
    assert bad == 0
