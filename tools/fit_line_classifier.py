"""Generate fixtures_data/layout_lines.parquet and freeze
artifacts/clf_lines_v1.json — the LEARNED line-level labeling stage on the
engine's native-layout leg (VERDICT r4 #5).

Upstream locus: TranskribusDU's textline tasks tag each text LINE with its
role inside a logical paragraph (BIESO: Begin / Inside / End / Single /
Outside) so paragraphs can be RE-segmented inside text regions whose
blocking doesn't match the logical structure — the line-level sibling of
the zone/region-type task. The honest formulation: a region's lines carry
NO paragraph ids; the only signals are per-line geometry and typography
(inter-line gaps, first-line indent, last-line shortfall, terminal
punctuation, initial capitalization, line length), exactly the features
the upstream's CRF models consume.

Two-phase rule (SPEC §4), identical to tools/fit_region_classifier.py:
training happens HERE, offline, on a committed fixture whose labels derive
from HIDDEN paragraph structure the features only correlate with (planted
ambiguity: 15% of lines get two feature axes redrawn from global ranges,
5% are fully atypical label noise); softmax regression is fit on a
DISJOINT doc split (train: doc_id % 5 != 0) and the weights are rounded to
6 decimals so both engines inline them as exact decimal literals — the
scoring arithmetic is pure IEEE +,*,/ in identical association order and
the argmax is engine-invariant.

Run: python tools/fit_line_classifier.py   (from repo root; deterministic)
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

CLASSES = ["B", "I", "E", "S", "O"]

# feature expressions over the fixture columns — THE SINGLE SOURCE OF
# TRUTH, consumed verbatim by sparkdu/staging.py (Spark selectExpr) and by
# the DuckDB oracle; the Python twin below must mirror them exactly.
FEATURE_EXPRS = [
    "(gap_above / line_h)",
    "(gap_below / line_h)",
    "indent",
    "rel_width",
    "CAST(ends_punct AS DOUBLE)",
    "CAST(starts_upper AS DOUBLE)",
    "(CAST(n_chars AS DOUBLE) / 40.0)",
]


def _features_py(r: dict) -> list:
    return [
        r["gap_above"] / r["line_h"],
        r["gap_below"] / r["line_h"],
        r["indent"],
        r["rel_width"],
        float(r["ends_punct"]),
        float(r["starts_upper"]),
        float(r["n_chars"]) / 40.0,
    ]


def gen_lines(n_docs: int = 180) -> list:
    rng = random.Random(20260818 + 5)
    rows = []
    for did in range(n_docs):
        nid = 0
        for _region in range(rng.randint(2, 4)):
            line_h = rng.uniform(10.0, 18.0)
            # hidden logical structure: paragraphs of lines, plus
            # occasional Outside noise lines (catchwords / signature
            # marks) between them — labels derive from THIS, features
            # only correlate
            units: list = []
            for _p in range(rng.randint(1, 4)):
                units.append(("para", rng.randint(1, 5)))
                if rng.random() < 0.12:
                    units.append(("noise", 1))
            region_gap = line_h * rng.uniform(1.0, 3.0)
            prev_gap = region_gap  # gap above the first unit
            flat: list = []  # (label, gap_above placeholder resolved below)
            for kind, n in units:
                if kind == "noise":
                    flat.append(("O", line_h * rng.uniform(1.2, 2.6)))
                    continue
                para_gap = line_h * rng.uniform(1.0, 2.2)
                pitch = lambda: line_h * rng.uniform(0.15, 0.45)  # noqa: E731
                if n == 1:
                    flat.append(("S", para_gap))
                else:
                    flat.append(("B", para_gap))
                    for _ in range(n - 2):
                        flat.append(("I", pitch()))
                    flat.append(("E", pitch()))
            for k, (label, gap_above) in enumerate(flat):
                if k == 0:
                    gap_above = prev_gap
                gap_below = (flat[k + 1][1] if k + 1 < len(flat)
                             else line_h * rng.uniform(1.0, 3.0))
                if label == "B":
                    indent = rng.uniform(0.03, 0.09)
                    rel_width = rng.uniform(0.85, 1.0)
                    ends_punct = 1 if rng.random() < 0.15 else 0
                    starts_upper = 1 if rng.random() < 0.9 else 0
                    n_chars = rng.randint(30, 90)
                elif label == "I":
                    indent = rng.uniform(0.0, 0.015)
                    rel_width = rng.uniform(0.85, 1.0)
                    ends_punct = 1 if rng.random() < 0.15 else 0
                    starts_upper = 1 if rng.random() < 0.3 else 0
                    n_chars = rng.randint(30, 90)
                elif label == "E":
                    indent = rng.uniform(0.0, 0.015)
                    rel_width = rng.uniform(0.30, 0.90)
                    ends_punct = 1 if rng.random() < 0.85 else 0
                    starts_upper = 1 if rng.random() < 0.3 else 0
                    n_chars = rng.randint(10, 70)
                elif label == "S":
                    indent = rng.uniform(0.02, 0.08)
                    rel_width = rng.uniform(0.40, 0.95)
                    ends_punct = 1 if rng.random() < 0.85 else 0
                    starts_upper = 1 if rng.random() < 0.9 else 0
                    n_chars = rng.randint(15, 80)
                else:  # O
                    indent = rng.uniform(0.0, 0.5)
                    rel_width = rng.uniform(0.02, 0.12)
                    ends_punct = 0 if rng.random() < 0.9 else 1
                    starts_upper = 1 if rng.random() < 0.5 else 0
                    n_chars = rng.randint(1, 6)
                # planted ambiguity, same recipe as the region fitter:
                # 5% fully atypical (irreducible label noise), 15% two
                # feature axes redrawn from global ranges
                u = rng.random()
                if u < 0.05:
                    gap_above = line_h * rng.uniform(0.15, 3.0)
                    gap_below = line_h * rng.uniform(0.15, 3.0)
                    indent = rng.uniform(0.0, 0.09)
                    rel_width = rng.uniform(0.02, 1.0)
                    n_chars = rng.randint(1, 90)
                elif u < 0.20:
                    for axis in rng.sample(
                            ["ga", "gb", "ind", "rw", "nc"], 2):
                        if axis == "ga":
                            gap_above = line_h * rng.uniform(0.15, 3.0)
                        elif axis == "gb":
                            gap_below = line_h * rng.uniform(0.15, 3.0)
                        elif axis == "ind":
                            indent = rng.uniform(0.0, 0.09)
                        elif axis == "rw":
                            rel_width = rng.uniform(0.02, 1.0)
                        else:
                            n_chars = rng.randint(1, 90)
                rows.append({
                    "doc_id": did, "node_id": nid,
                    "line_h": round(line_h, 2),
                    "gap_above": round(gap_above, 2),
                    "gap_below": round(gap_below, 2),
                    "indent": round(indent, 4),
                    "rel_width": round(rel_width, 4),
                    "ends_punct": ends_punct,
                    "starts_upper": starts_upper,
                    "n_chars": n_chars,
                    "label": label,
                })
                nid += 1
    return rows


def main() -> None:
    from fit_region_classifier import train_softmax

    rows = gen_lines()
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "node_id": pa.array([r["node_id"] for r in rows], pa.int32()),
        "line_h": pa.array([r["line_h"] for r in rows], pa.float64()),
        "gap_above": pa.array([r["gap_above"] for r in rows], pa.float64()),
        "gap_below": pa.array([r["gap_below"] for r in rows], pa.float64()),
        "indent": pa.array([r["indent"] for r in rows], pa.float64()),
        "rel_width": pa.array([r["rel_width"] for r in rows], pa.float64()),
        "ends_punct": pa.array([r["ends_punct"] for r in rows], pa.int32()),
        "starts_upper": pa.array(
            [r["starts_upper"] for r in rows], pa.int32()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int32()),
        "label": pa.array([r["label"] for r in rows], pa.string()),
    })
    out = os.path.join(ROOT, "fixtures_data", "layout_lines.parquet")
    pq.write_table(tbl, out, compression="zstd")
    print(f"wrote layout_lines.parquet: {tbl.num_rows} rows")

    X = np.array([_features_py(r) for r in rows])
    y = np.array([CLASSES.index(r["label"]) for r in rows])
    is_test = np.array([r["doc_id"] % 5 == 0 for r in rows])
    W, b = train_softmax(X[~is_test], y[~is_test], len(CLASSES))
    W, b = np.round(W, 6), np.round(b, 6)  # exact decimal literals

    def acc(mask):
        pred = (X[mask] @ W.T + b).argmax(axis=1)
        return float((pred == y[mask]).mean())

    art = {
        "kind": "softmax_line_classifier",
        "version": "lines-1.0.0",
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
    path = os.path.join(ROOT, "artifacts", "clf_lines_v1.json")
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"froze clf_lines_v1.json  train_acc={art['train_acc']:.4f}  "
          f"test_acc={art['test_acc']:.4f}  (test n={art['n_test']})")


if __name__ == "__main__":
    main()
