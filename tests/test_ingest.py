"""SS3.3 ingest toolchain: round trips + pipeline linkage (SPEC SS2 parts)."""

import pytest
from pyspark.sql import functions as F

from sparkdu import fixtures
from sparkdu.ingest import merge_parts, split_parts, validate_fragments


@pytest.fixture(scope="module")
def frags(spark):
    rows = []
    for doc_id in range(60):
        b = fixtures.gen_page_html(doc_id)
        try:
            s = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if fixtures.PART_SEP not in s:
            continue
        for i, fr in enumerate(s.split(fixtures.PART_SEP)):
            rows.append((f"u{doc_id}", i, fr, s))
    assert rows, "generator produced no multi-part page in range"
    return spark.createDataFrame(rows, "url string, part_seq long, frag string, whole string").cache()


def test_merge_restores_original_bytes(spark, frags):
    merged = merge_parts(frags.select("url", "part_seq", "frag"))
    orig = frags.select("url", "whole").distinct()
    j = merged.join(orig, "url")
    assert j.count() == orig.count()
    assert j.filter(F.col("doc") != F.col("whole")).count() == 0


def test_split_merge_identity_any_partitioning(spark, frags):
    base = frags.select("url", "part_seq", "frag")
    rt = split_parts(merge_parts(base.repartition(7)))
    diff = rt.exceptAll(base).unionAll(base.exceptAll(rt))
    assert diff.count() == 0


def test_validate_flags_gaps_and_dups(spark):
    rows = [("ok", 0, "a"), ("ok", 1, "b"),
            ("gap", 0, "a"), ("gap", 2, "b"),
            ("dup", 0, "a"), ("dup", 0, "b"),
            ("off", 1, "a"), ("off", 2, "b")]
    df = spark.createDataFrame(rows, "url string, part_seq long, frag string")
    got = {r["url"]: r["valid"] for r in validate_fragments(df).collect()}
    assert got == {"ok": True, "gap": False, "dup": False, "off": False}


def test_merged_doc_parses_into_matching_parts(spark, frags):
    """Pipeline linkage: a merged multi-part document's parser part count
    equals its fragment count (merge -> SPEC SS2 pagination -> parts)."""
    from sparkdu import parse as P

    merged = {r["url"]: r["doc"] for r in
              merge_parts(frags.select("url", "part_seq", "frag")).collect()}
    n_frags = {r["url"]: r["n"] for r in
               frags.groupBy("url").agg(F.count("*").alias("n")).collect()}
    for url, doc in merged.items():
        blocks = P.parse_blocks(doc)
        max_part = max(r[-1] for r in blocks)
        assert max_part == n_frags[url] - 1, url
