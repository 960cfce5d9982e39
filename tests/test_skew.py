"""T6 — mega-page skew tail and byte-cap truncation through Spark
(SURVEY SS5.2; FIXTURES.md SS3 bench-tier shapes)."""

import pytest

from oracle import extract as orc
from sparkdu import fixtures
from sparkdu import parse as sp
from sparkdu.api import ExtractConfig, extract_pages


@pytest.fixture(scope="module")
def skew_rows():
    # bench-tier generator quirks: doc 42 = over-cap (>8 MiB), 499 = mega
    ids = list(range(40, 45)) + list(range(495, 505))
    return [fixtures.gen_row(i, 10**6, bench_skew=True) for i in ids]


def test_mega_and_overcap_shapes(skew_rows):
    sizes = {r["url"]: len(r["html"]) for r in skew_rows}
    big = [s for s in sizes.values() if s > sp.MAX_HTML_BYTES]
    mega = [s for s in sizes.values() if 400_000 < s <= sp.MAX_HTML_BYTES]
    assert len(big) == 1  # doc 42
    assert len(mega) >= 1  # doc 499


def test_skew_rows_byte_identity_spark(spark, skew_rows):
    from sparkdu.tables import PAGES_SCHEMA

    df = spark.createDataFrame(skew_rows, PAGES_SCHEMA)
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(spark, df, ExtractConfig(num_partitions=4)).collect()
    }
    assert len(got) == len(skew_rows)
    for r in skew_rows:
        o = orc.extract_page(r["url"], r["html"])
        assert got[r["url"]].encode("utf-8") == o["extracted_text"].encode("utf-8")
    over_cap_url = [r["url"] for r in skew_rows if len(r["html"]) > sp.MAX_HTML_BYTES][0]
    assert got[over_cap_url].endswith(sp.TRUNCATION_MARKER)
