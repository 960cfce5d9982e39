"""T1 (Spark byte-identity), T3 (fused ≡ staged), T4 (determinism) — SURVEY SS5.2."""

import pytest

from oracle import extract as orc
from sparkdu.api import ExtractConfig, extract_pages
from sparkdu.staged import extract_pages_staged


def _by_url(df):
    return {r["url"]: r.asDict() for r in df.collect()}


def _spans(row):
    return [(d["node_id"], d["start"], d["end"]) for d in row["spans"]]


@pytest.fixture(scope="module")
def fused(spark, pages_df):
    return _by_url(extract_pages(spark, pages_df))


def test_t1_byte_identity_vs_oracle(fused, latest_rows):
    assert len(fused) == len(latest_rows)
    for url, r in latest_rows.items():
        o = orc.extract_page(url, r["html"])
        s = fused[url]
        assert o["extracted_text"].encode("utf-8") == s["extracted_text"].encode("utf-8"), url
        assert o["n_blocks"] == s["n_blocks"]
        assert [(d["node_id"], d["start"], d["end"]) for d in o["spans"]] == _spans(s)


def test_t3_fused_equals_staged(spark, pages_df, fused):
    staged = _by_url(extract_pages_staged(spark, pages_df))
    assert set(staged) == set(fused)
    for url, s in staged.items():
        f = fused[url]
        assert s["extracted_text"].encode("utf-8") == f["extracted_text"].encode("utf-8"), url
        assert s["n_blocks"] == f["n_blocks"]
        assert _spans(s) == _spans(f)


def test_t3b_null_html_fused_staged_oracle(spark):
    """Spec SS1: NULL html -> ''. The staged path's _trunc predicate is NULL
    for NULL html; without coalesce it fell through to the truncation marker
    (ADVICE r1) — pin all three implementations to the spec."""
    import datetime

    from sparkdu.tables import PAGES_SCHEMA

    rows = [
        {"url": "https://null.example/", "warc_ts": datetime.datetime(2024, 1, 1),
         "html": None, "text": None, "lang": "en"},
        {"url": "https://tiny.example/", "warc_ts": datetime.datetime(2024, 1, 1),
         "html": b"<html><body><p>hello world</p></body></html>", "text": None,
         "lang": "en"},
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    fused_m = _by_url(extract_pages(spark, df))
    staged_m = _by_url(extract_pages_staged(spark, df))
    for impl in (fused_m, staged_m):
        o = orc.extract_page("https://null.example/", None)
        s = impl["https://null.example/"]
        assert s["extracted_text"] == o["extracted_text"] == ""
        assert s["n_blocks"] == 0 and _spans(s) == []


def test_t4_determinism_across_partitionings(spark, pages_df, fused):
    import hashlib

    for nparts in (3, 17):
        alt = _by_url(
            extract_pages(spark, pages_df.repartition(5), ExtractConfig(num_partitions=nparts))
        )
        h = {
            u: hashlib.sha256(r["extracted_text"].encode("utf-8")).hexdigest()
            for u, r in alt.items()
        }
        base = {
            u: hashlib.sha256(r["extracted_text"].encode("utf-8")).hexdigest()
            for u, r in fused.items()
        }
        assert h == base


def test_dedup_semantics(spark, pages_df, pages_rows, fused):
    # fixture has a 2% duplicate-url tail; dedup keeps max warc_ts
    n_urls = len({r["url"] for r in pages_rows})
    assert len(fused) == n_urls < len(pages_rows)


def test_span_validity_spark(fused):
    for url, r in fused.items():
        txt = r["extracted_text"]
        for nid, start, end in _spans(r):
            assert 0 <= start <= end <= len(txt)
            seg = txt[start:end]
            assert "\n" not in seg


def test_model_path_fused_and_staged(spark, pages_df):
    """M5: fused+model == staged+model == oracle+model, byte-for-byte."""
    import os

    from oracle import extract as orc

    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "artifacts", "clf_v2.json")
    if not os.path.exists(art):
        pytest.skip("artifact not trained")
    model = orc.load_model(art)
    cfg = ExtractConfig(model_path=art)
    fused_m = _by_url(extract_pages(spark, pages_df, cfg))
    staged_m = _by_url(extract_pages_staged(spark, pages_df, cfg))
    rows = {r["url"]: r for r in pages_df.collect()}
    latest = {}
    for r in rows.values():
        if r["url"] not in latest or r["warc_ts"] > latest[r["url"]]["warc_ts"]:
            latest[r["url"]] = r
    assert set(fused_m) == set(staged_m)
    for url, fr in fused_m.items():
        o = orc.extract_page(url, bytes(latest[url]["html"]), model)
        assert fr["extracted_text"].encode() == o["extracted_text"].encode(), url
        assert staged_m[url]["extracted_text"].encode() == o["extracted_text"].encode(), url
        assert fr["pipeline_version"] == "1.1.0"


def _artifact(name):
    import os

    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "artifacts", name)
    return p if os.path.exists(p) else None


@pytest.mark.parametrize("artifact", ["clf_v3.json", "clf_v3_hi.json"])
def test_model_v3_fused_staged_oracle(spark, pages_df, artifact):
    """clf_v3 (SPEC SS4 mp): fused == staged == oracle byte-for-byte, for
    both the production artifact and the high-alpha variant whose decisions
    differ from clf_v2 (so agreement here cannot be a v2 coincidence)."""
    from oracle import extract as orc

    art = _artifact(artifact)
    if art is None:
        pytest.skip("artifact not trained")
    model = orc.load_model(art)
    assert model["mp"]
    cfg = ExtractConfig(model_path=art)
    fused_m = _by_url(extract_pages(spark, pages_df, cfg))
    staged_m = _by_url(extract_pages_staged(spark, pages_df, cfg))
    latest = {}
    for r in pages_df.collect():
        if r["url"] not in latest or r["warc_ts"] > latest[r["url"]]["warc_ts"]:
            latest[r["url"]] = r
    assert set(fused_m) == set(staged_m)
    for url, fr in fused_m.items():
        o = orc.extract_page(url, bytes(latest[url]["html"]), model)
        assert fr["extracted_text"].encode() == o["extracted_text"].encode(), url
        assert staged_m[url]["extracted_text"].encode() == o["extracted_text"].encode(), url
        assert fr["pipeline_version"] == "1.2.0"
        assert staged_m[url]["pipeline_version"] == "1.2.0"


def test_model_v3_hi_differs_from_v2(spark):
    """The v3_hi golden gate has discriminating power: at least one doc's
    extraction differs between clf_v2 and clf_v3_hi (the flipped node lives
    in the full 1000-page fixture corpus, not the 300-page test slice)."""
    from sparkdu import fixtures
    from sparkdu.tables import PAGES_SCHEMA

    art2, art3 = _artifact("clf_v2.json"), _artifact("clf_v3_hi.json")
    if art2 is None or art3 is None:
        pytest.skip("artifacts not trained")
    full = spark.createDataFrame(fixtures.gen_rows(1000), PAGES_SCHEMA)
    out2 = _by_url(extract_pages(spark, full, ExtractConfig(model_path=art2)))
    out3 = _by_url(extract_pages(spark, full, ExtractConfig(model_path=art3)))
    assert any(out2[u]["extracted_text"] != out3[u]["extracted_text"] for u in out2)


def test_mp_graph_reduction_equals_sweep():
    """SPEC SS4 clf_v3 graph: the same-depth-chain reduction equals the
    normative J1∪J2 interval sweep on SS6 synthetic geometry (and h-edges
    are empty there), on nodes with multiple parts and repeated depths."""
    import pandas as pd

    from oracle.extract import _mp_neighbors
    from sparkdu.graph import _sweep_axis

    # synthetic layout per SPEC SS6: y = running text offsets, x = depth
    nodes = []
    nid = 0
    off = 0
    for part in (0, 1):
        for depth, n_chars in [(2, 5), (3, 7), (2, 4), (2, 9), (5, 3), (3, 2)]:
            nodes.append({"node_id": nid, "part_id": part, "depth": depth,
                          "y1": float(off), "y2": float(off + n_chars),
                          "x1": float(depth), "x2": float(depth + 1)})
            nid += 1
            off += n_chars + 1
    order = sorted(nodes, key=lambda d: d["node_id"])
    chain = _mp_neighbors(order)
    # sweep per part: v-edges (transpose=False) + h-edges (transpose=True)
    sweep_edges = set()
    for part in (0, 1):
        pdf = pd.DataFrame([n for n in order if n["part_id"] == part])
        for src, dst, _d, _o in _sweep_axis(pdf, transpose=False):
            sweep_edges.add((src, dst))
        assert list(_sweep_axis(pdf, transpose=True)) == [], "h-edges must be empty"
    chain_edges = {
        (order[j]["node_id"], order[i]["node_id"])
        for i, js in enumerate(chain) for j in js if j < i
    }
    assert chain_edges == sweep_edges and len(sweep_edges) > 0


def test_tfidf_vec_twin(spark):
    """VERDICT r2 item 5: the JVM broadcast-join TF-IDF twin agrees with
    the byte-identity Python loop to 1e-12 on the fixture nodes."""
    import os

    from sparkdu.classify import _tfidf_mean_py, tfidf_mean_vec
    from sparkdu.harness import fx

    if not os.path.exists(fx("idf")):
        pytest.skip("idf fixture missing")
    import json

    art = json.load(open(_artifact("clf_v2.json")))
    idf_map = {k: float(v) for k, v in art["idf"].items()}
    oov = float(art["idf_oov"])
    nodes = spark.read.parquet(fx("nodes")).select("url", "node_id", "text")
    idf_df = spark.read.parquet(fx("idf"))
    got = {(r["url"], r["node_id"]): r["tfidf_mean"]
           for r in tfidf_mean_vec(nodes, idf_df, oov).collect()}
    rows = nodes.collect()
    assert len(got) == len(rows) > 0
    for r in rows:
        want = _tfidf_mean_py(r["text"], idf_map, oov)
        assert abs(got[(r["url"], r["node_id"])] - want) < 1e-12, r["url"]


def test_mp_corrects_noisy_node(spark, tmp_path):
    """Why clf_v3 exists: a borderline node whose base score falls just
    below threshold is pulled back by confident same-depth neighbors —
    message passing recovers content a one-shot classifier drops. Uses a
    hand-made artifact (features [n_chars], weights chosen so the short
    middle sibling scores ~0.45 alone) and asserts fused == staged == the
    v2-style no-mp decision everywhere EXCEPT the rescued node."""
    import datetime as dt
    import json

    from sparkdu.tables import PAGES_SCHEMA

    # three same-depth <p> siblings: long, short (borderline), long
    html = ("<html><body>"
            "<p>" + "long content word " * 8 + "</p>"
            "<p>tiny</p>"
            "<p>" + "more long content " * 8 + "</p>"
            "</body></html>").encode()
    pages = spark.createDataFrame(
        [("http://mp/", dt.datetime(2026, 1, 1), html, None, None)], PAGES_SCHEMA
    )
    # sigmoid(b + w*n_chars): tiny (4 chars) -> z = -0.2 (score 0.45, drops);
    # long (~100+ chars) -> z >> 0 (score ~1). alpha=1: rescued node gets
    # z + 1*(2*~1-1) ~ +0.8 -> kept.
    base = {"features": ["n_chars"], "w": [0.05], "b": -0.4}
    art_v2 = dict(base, version="t_v2")
    art_v3 = dict(base, version="t_v3", mp={"T": 2, "alpha": 1.0})
    p2, p3 = str(tmp_path / "v2.json"), str(tmp_path / "v3.json")
    json.dump(art_v2, open(p2, "w"))
    json.dump(art_v3, open(p3, "w"))

    out2 = _by_url(extract_pages(spark, pages, ExtractConfig(model_path=p2)))
    out3f = _by_url(extract_pages(spark, pages, ExtractConfig(model_path=p3)))
    out3s = _by_url(extract_pages_staged(spark, pages, ExtractConfig(model_path=p3)))

    assert "tiny" not in out2["http://mp/"]["extracted_text"]
    assert "tiny" in out3f["http://mp/"]["extracted_text"]  # rescued by mp
    assert out3f["http://mp/"]["extracted_text"] == out3s["http://mp/"]["extracted_text"]
    assert out3f["http://mp/"]["n_blocks"] == out2["http://mp/"]["n_blocks"] + 1

    from oracle import extract as orc

    o = orc.extract_page("http://mp/", html, orc.load_model(p3))
    assert out3f["http://mp/"]["extracted_text"].encode() == o["extracted_text"].encode()
