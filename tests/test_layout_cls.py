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


from tests.conftest import plan_of as _plan


def test_heldout_accuracy(spark):
    df = QUERIES["layout_region_classify"](spark, SF)
    test = df.filter(F.col("doc_id") % 5 == 0)
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


def test_table_spans_exact_recovery(spark):
    """Span-aware structure: every cell's (row_start,row_end,col_start,
    col_end) — merged cells included — must equal generator truth; and
    the fixture must actually contain spans (else the test gates
    nothing)."""
    pred = QUERIES["layout_table_spans"](spark, SF)
    truth = spark.read.parquet(fx("table_span_cells"))
    j = pred.join(
        truth.select("doc_id", "cell_id",
                     F.col("row_start").alias("t_rs"),
                     F.col("row_end").alias("t_re"),
                     F.col("col_start").alias("t_cs"),
                     F.col("col_end").alias("t_ce")),
        ["doc_id", "cell_id"])
    assert j.count() == truth.count() == 2113
    n_span = truth.filter(
        (F.col("row_end") > F.col("row_start"))
        | (F.col("col_end") > F.col("col_start"))).count()
    assert n_span > 100
    bad = j.filter(
        (F.col("row_start") != F.col("t_rs"))
        | (F.col("row_end") != F.col("t_re"))
        | (F.col("col_start") != F.col("t_cs"))
        | (F.col("col_end") != F.col("t_ce"))).count()
    assert bad == 0


def test_plain_islands_would_fail_on_spans(spark):
    """Negative control: the non-span-aware islands operator applied to
    the span fixture MUST disagree with truth somewhere — proving the
    anchor-band algorithm is load-bearing, not redundant."""
    cells = spark.read.parquet(fx("table_span_cells")).select(
        "doc_id", F.lit(0).alias("part_id"),
        F.col("cell_id").alias("node_id"), "y1", "y2")
    from sparkdu.staging import _geom_vblocks

    merged = _geom_vblocks(cells, 3.0)
    truth = spark.read.parquet(fx("table_span_cells")).select(
        F.col("doc_id"), F.col("cell_id").alias("node_id"),
        (F.col("row_start") + 1).alias("want"))
    n_bad = merged.join(truth, ["doc_id", "node_id"]).filter(
        F.col("block_id") != F.col("want")).count()
    assert n_bad > 0


# ------------------- line-level BIESO classifier ----------------------

def test_line_heldout_accuracy(spark):
    df = QUERIES["layout_line_classify"](spark, SF)
    test = df.filter(F.col("doc_id") % 5 == 0)
    n = test.count()
    ok = test.filter(F.col("pred_label") == F.col("label")).count()
    art = json.load(open("artifacts/clf_lines_v1.json"))
    assert n == art["n_test"] > 500
    acc = ok / n
    assert acc >= 0.88, acc
    assert abs(acc - art["test_acc"]) < 1e-9  # frozen = reproducible
    assert art["train_acc"] - art["test_acc"] < 0.05


def test_line_every_class_predicted_and_confusable(spark):
    """All five BIESO labels appear in predictions, and the planted noise
    means SOME rows disagree (pred must come from geometry/typography,
    not the label column)."""
    df = QUERIES["layout_line_classify"](spark, SF)
    preds = {r["pred_label"] for r in df.select("pred_label")
             .distinct().collect()}
    assert preds == {"B", "I", "E", "S", "O"}
    assert df.filter(F.col("pred_label") != F.col("label")).count() > 0


def test_line_scoring_is_zero_exchange_pure_map(spark):
    plan = _plan(QUERIES["layout_line_classify"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan


def test_line_artifact_weights_are_decimal_literals():
    art = json.load(open("artifacts/clf_lines_v1.json"))
    assert art["train_split"] == "doc_id % 5 != 0"
    assert len(art["W"]) == len(art["classes"]) == 5
    assert art["classes"] == ["B", "I", "E", "S", "O"]
    for row in art["W"]:
        for w in row:
            assert round(w, 6) == w
    assert len(art["feature_exprs"]) == len(art["W"][0]) == 7


# --------------- conjugate-edge classifier + recovery -----------------

def test_edge_heldout_accuracy_and_boundary_f1(spark):
    df = QUERIES["layout_edge_classify"](spark, SF)
    test = df.filter(F.col("doc_id") % 5 == 0).collect()
    art = json.load(open("artifacts/clf_edges_v1.json"))
    assert len(test) == art["n_test"] > 500
    acc = sum(r["pred_same"] == r["same"] for r in test) / len(test)
    assert acc >= 0.93, acc
    assert abs(acc - art["test_acc"]) < 1e-9  # frozen = reproducible
    tp = sum(1 for r in test if r["pred_same"] == 0 and r["same"] == 0)
    fp = sum(1 for r in test if r["pred_same"] == 0 and r["same"] == 1)
    fn = sum(1 for r in test if r["pred_same"] == 1 and r["same"] == 0)
    p, rcl = tp / max(tp + fp, 1), tp / max(tp + fn, 1)
    f1 = 2 * p * rcl / max(p + rcl, 1e-9)
    assert f1 >= 0.85, f1
    assert abs(f1 - art["test_boundary_f1"]) < 1e-9


def test_edge_paragraph_recovery(spark):
    """Segmentation recovered from PREDICTED edges vs the HIDDEN truth
    paragraphs (same cumsum over the truth `same` flags): on held-out
    docs, most lines must land in exactly the right paragraph index —
    a misclassified edge shifts every later line in its region, so this
    is a strict compounding metric."""
    from pyspark.sql import Window

    pred = QUERIES["layout_edge_paragraphs"](spark, SF)
    e = spark.read.parquet(fx("layout_edges"))
    w = (Window.partitionBy("doc_id", "region_id").orderBy("edge_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    truth_dst = e.select(
        "doc_id", "region_id", F.col("dst_line").alias("line_id"),
        F.sum(1 - F.col("same")).over(w).cast("int").alias("true_idx"),
    )
    truth_first = e.select("doc_id", "region_id").distinct().select(
        "doc_id", "region_id", F.lit(0).cast("int").alias("line_id"),
        F.lit(0).cast("int").alias("true_idx"))
    truth = truth_dst.unionByName(truth_first)
    joined = pred.join(truth, ["doc_id", "region_id", "line_id"]).filter(
        F.col("doc_id") % 5 == 0)
    n = joined.count()
    ok = joined.filter(F.col("para_idx") == F.col("true_idx")).count()
    assert n > 600
    assert ok / n >= 0.85, ok / n


def test_edge_scoring_is_zero_exchange(spark):
    plan = _plan(QUERIES["layout_edge_classify"](spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "codegen id" in plan


def test_edge_artifact_weights_are_decimal_literals():
    art = json.load(open("artifacts/clf_edges_v1.json"))
    assert art["train_split"] == "doc_id % 5 != 0"
    assert art["classes"] == ["boundary", "same"]
    for row in art["W"]:
        for w in row:
            assert round(w, 6) == w
    assert len(art["feature_exprs"]) == len(art["W"][0]) == 6
