"""CLI-leg gates for the native-format extraction (`extract_job --format
pagexml|pdf`): the wave-committed, resumable lineage job must produce
byte-identical per-document text to the registry's DataFrame-agg assembly
(`pagexml_extract_text` / `pdf_extract_text`), account fail-whole parses
as had_error rows (one output row per input document), and resume to a
no-op. Also pins the pure-Python assemble_doc_text twins against the
DataFrame-agg form directly (the MUST-stay-identical contract in their
docstrings)."""

import pytest

from pyspark.sql import functions as F

import sparkdu.staging  # noqa: F401  (registers the staged QUERIES keys)
from sparkdu.harness import QUERIES, fx
from sparkdu.lineage import ExtractJobConfig, run_extract_job

SF = "/root/testdata/sf0.01"


def _native_pages(spark, fmt):
    payload_col = "xml" if fmt == "pagexml" else "pdf"
    return spark.read.parquet(fx(fmt)).select(
        F.concat(F.lit(fmt + "://"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(0)).alias("warc_ts"),
        F.col(payload_col).alias("html"),
    )


@pytest.mark.parametrize("fmt,key", [("pagexml", "pagexml_extract_text"),
                                     ("pdf", "pdf_extract_text")])
def test_cli_leg_matches_registry_assembly(spark, tmp_path, fmt, key):
    pages = _native_pages(spark, fmt)
    cfg = ExtractJobConfig(run_id=f"nat-{fmt}", out_dir=str(tmp_path),
                           num_partitions=8, waves=2, input_format=fmt)
    total = run_extract_job(spark, pages, cfg)
    assert total["n_pages"] == 90          # one row per input document
    assert total["n_errors"] == 8          # the truncated fail-whole docs

    got = {
        int(r["url"].split("://")[1]): (r["extracted_text"], r["n_blocks"])
        for r in spark.read.parquet(f"{tmp_path}/extracted").collect()
    }
    assert len(got) == 90
    want = {r["doc_id"]: r["doc_text"]
            for r in QUERIES[key](spark, SF).collect()}
    assert len(want) == 82
    for did, (txt, nb) in got.items():
        if did in want:
            assert txt.encode("utf-8") == want[did].encode("utf-8"), did
            assert nb > 0
        else:                              # fail-whole: empty lineage row
            assert (txt, nb) == ("", 0)

    # resume: every checkpoint done -> nothing re-runs
    total2 = run_extract_job(
        spark, pages,
        ExtractJobConfig(run_id=f"nat-{fmt}", out_dir=str(tmp_path),
                         num_partitions=8, waves=2, input_format=fmt,
                         resume=True))
    assert total2["n_pages"] == 0 and total2["waves_run"] == 0


def test_assemble_twins_match_dataframe_agg(spark):
    """Direct differential: per-doc pure-Python assembly == DataFrame
    array_sort assembly, every fixture document, both formats."""
    from sparkdu.pagexml import (assemble_doc_text as px_asm,
                                 pagexml_doc_text, pagexml_nodes)
    from sparkdu.pdf import (assemble_doc_text as pdf_asm, pdf_doc_text,
                             pdf_runs)

    regions = pagexml_nodes(
        spark.read.parquet(fx("pagexml"))).filter(
        (F.col("kind") == "region")
        & F.col("rtype").isin("paragraph", "heading"))
    agg = {r["doc_id"]: r["doc_text"]
           for r in pagexml_doc_text(regions).collect()}
    rows = regions.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r.asDict())
    assert set(by_doc) == set(agg)
    for did, nodes in by_doc.items():
        txt, nb, spans = px_asm(nodes)
        assert txt == agg[did] and nb == len(nodes)
        assert all(s[2] - s[1] == len(n) for s, n in
                   zip(spans, txt.split("\n")))

    runs = pdf_runs(spark.read.parquet(fx("pdf"))).filter(
        F.col("size") >= 9.0)
    agg = {r["doc_id"]: r["doc_text"] for r in pdf_doc_text(runs).collect()}
    by_doc = {}
    for r in runs.collect():
        by_doc.setdefault(r["doc_id"], []).append(r.asDict())
    assert set(by_doc) == set(agg)
    for did, rs in by_doc.items():
        txt, nb, _ = pdf_asm(rs)
        assert txt == agg[did] and nb == len(rs)


def test_assemble_twins_fuzz(spark):
    """Seeded fuzz differential: 200 random documents with DELIBERATE ties
    on every sort key except the unique id (part_id, ro_index, y, x drawn
    from tiny value sets; duplicate texts) — the pure-Python twins must
    still match the DataFrame array_sort assembly exactly, proving the
    trailing struct fields never influence either order."""
    import random

    from sparkdu.pagexml import (assemble_doc_text as px_asm,
                                 pagexml_doc_text)
    from sparkdu.pdf import assemble_doc_text as pdf_asm, pdf_doc_text

    rng = random.Random(20260818)
    texts = ["alpha", "beta", "alpha", "x y", ""]
    px_rows, pdf_rows = [], []
    for did in range(200):
        for nid in range(rng.randrange(1, 9)):
            px_rows.append({
                "doc_id": did, "part_id": rng.randrange(2),
                "node_id": nid, "parent_id": -1, "kind": "region",
                "rtype": rng.choice(["paragraph", "heading"]),
                "text": rng.choice(texts),
                "ro_index": rng.choice([-1, 0, 0, 1, 2]),
                "y1": float(rng.choice([100, 100, 200])),
                "x1": float(rng.choice([10, 10, 50])),
                "x2": 900.0, "y2": 300.0,
            })
            pdf_rows.append({
                "doc_id": did, "part_id": rng.randrange(2),
                "run_id": nid,
                "page_w": 612.0, "page_h": 792.0,
                "x": float(rng.choice([72, 72, 300])),
                "y": float(rng.choice([720, 720, 24])),
                "size": float(rng.choice([7, 12, 12, 14])),
                "text": rng.choice(texts),
            })

    px_df = spark.createDataFrame(
        px_rows, "doc_id long, part_id int, node_id int, parent_id int, "
        "kind string, rtype string, text string, ro_index int, "
        "y1 double, x1 double, x2 double, y2 double")
    agg = {r["doc_id"]: r["doc_text"]
           for r in pagexml_doc_text(px_df).collect()}
    by_doc = {}
    for r in px_rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, nodes in by_doc.items():
        assert px_asm(nodes)[0] == agg[did], f"pagexml doc {did}"

    keep = [r for r in pdf_rows if r["size"] >= 9.0]
    pdf_df = spark.createDataFrame(
        keep, "doc_id long, part_id int, run_id int, page_w double, "
        "page_h double, x double, y double, size double, text string")
    agg = {r["doc_id"]: r["doc_text"]
           for r in pdf_doc_text(pdf_df).collect()}
    by_doc = {}
    for r in pdf_rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in by_doc.items():
        if did in agg:
            assert pdf_asm(rs)[0] == agg[did], f"pdf doc {did}"
        else:
            assert pdf_asm(rs)[0] == ""      # every run below size 9


def test_null_doc_id_fails_loud(spark, tmp_path):
    """A NULL doc_id would synthesize a NULL url and be silently swallowed
    by the J9 dedup sort — the job must fail loud instead (extract_job
    guards with raise_error)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkdu.jobs.extract_job import main

    bad = str(tmp_path / "bad.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0, None], pa.int64()),
                  "xml": pa.array([b"<x/>", b"<y/>"], pa.binary())}), bad)
    with pytest.raises(Exception, match="NULL doc_id"):
        main(["--input", bad, "--output", str(tmp_path / "out"),
              "--run-id", "nullcase", "--format", "pagexml",
              "--partitions", "2", "--waves", "1",
              "--master", "local[2]"])


def test_model_flag_rejected_for_native_formats(tmp_path):
    from sparkdu.jobs.extract_job import main

    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", str(tmp_path), "--run-id", "m",
              "--format", "pdf", "--model", "artifacts/clf_v1.json"])


def test_cli_pdf15_matches_classic_byte_identical(spark, tmp_path):
    """The CLI pdf leg over the PDF 1.5 fixture (xref streams + object
    streams + /Prev updates) must produce byte-identical extracted text
    to the classic-1.4 fixture — the same 90 logical documents in two
    physical formats, through the full wave/lineage job machinery."""
    def run(fixture, run_id, out):
        pages = spark.read.parquet(fx(fixture)).select(
            F.concat(F.lit("pdf://"),
                     F.col("doc_id").cast("string")).alias("url"),
            F.timestamp_seconds(F.lit(0)).alias("warc_ts"),
            F.col("pdf").alias("html"),
        )
        cfg = ExtractJobConfig(run_id=run_id, out_dir=str(out),
                               num_partitions=8, waves=2,
                               input_format="pdf")
        total = run_extract_job(spark, pages, cfg)
        assert total["n_pages"] == 90 and total["n_errors"] == 8
        return {r["url"]: (r["extracted_text"], r["n_blocks"])
                for r in spark.read.parquet(f"{out}/extracted").collect()}

    got14 = run("pdf", "x14", tmp_path / "v14")
    got15 = run("pdf15", "x15", tmp_path / "v15")
    assert got14.keys() == got15.keys() and len(got14) == 90
    for url in got14:
        t14, n14 = got14[url]
        t15, n15 = got15[url]
        assert t14.encode("utf-8") == t15.encode("utf-8"), url
        assert n14 == n15
