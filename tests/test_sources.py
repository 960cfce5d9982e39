"""Custom WARC-ish Python DataSource: roundtrip, parallelism, error paths."""

import datetime

import pytest

from sparkdu.sources import WarcishDataSource, read_shard, write_shard


def test_shard_roundtrip(tmp_path):
    rows = [
        ("https://a.example/1", datetime.datetime(2026, 1, 1, 12, 0, 0), b"<p>x</p>"),
        ("https://b.example/é", datetime.datetime(2026, 2, 3, 4, 5, 6), b""),
        ("https://c.example/3", datetime.datetime(2026, 1, 1), b"\x00\xff" * 100),
    ]
    p = str(tmp_path / "s.warcish")
    assert write_shard(p, rows) == 3
    got = list(read_shard(p))
    assert got == rows


def test_read_shard_rejects_corruption(tmp_path):
    p = str(tmp_path / "bad.warcish")
    with open(p, "wb") as f:
        f.write(b"NOTWARC 1 2 3\nxyz")
    with pytest.raises(ValueError, match="bad record header"):
        list(read_shard(p))
    p2 = str(tmp_path / "trunc.warcish")
    with open(p2, "wb") as f:
        f.write(b"WARCISH1 5 100 1700000000000000\nhttp1only-a-few-bytes")
    with pytest.raises(ValueError, match="truncated"):
        list(read_shard(p2))


def test_datasource_extraction_matches_golden(spark, pages_rows, latest_rows, tmp_path):
    """pages rows through the custom source -> flagship extraction must be
    byte-identical to the oracle (source format cannot affect semantics)."""
    from oracle import extract as orc
    from sparkdu.api import extract_pages

    d = tmp_path / "shards"
    d.mkdir()
    per = (len(pages_rows) + 2) // 3
    for s in range(3):
        chunk = pages_rows[s * per : (s + 1) * per]
        write_shard(str(d / f"s{s}.warcish"),
                    ((r["url"], r["warc_ts"], r["html"]) for r in chunk))

    spark.dataSource.register(WarcishDataSource)
    df = spark.read.format("warcish").load(str(d))
    assert df.rdd.getNumPartitions() == 3  # one partition per shard
    out = {r["url"]: r["extracted_text"] for r in extract_pages(spark, df).collect()}
    assert len(out) == len(latest_rows)
    for url, r in list(latest_rows.items())[:40]:
        o = orc.extract_page(url, r["html"])
        assert out[url].encode() == o["extracted_text"].encode(), url


def test_datasource_write_then_read_roundtrip(spark, pages_df, tmp_path):
    """S3' sink: df.write.format('warcish') -> read back -> identical rows
    (two-phase commit: shards land atomically with _SUCCESS)."""
    import os

    spark.dataSource.register(WarcishDataSource)
    out = str(tmp_path / "wout")
    src = pages_df.limit(200).select("url", "warc_ts", "html")
    src.repartition(5).write.format("warcish").option("path", out).mode("append").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]
    back = spark.read.format("warcish").load(out)
    a = src.selectExpr("url", "cast(warc_ts as string) ts", "hex(html) h")
    b = back.selectExpr("url", "cast(warc_ts as string) ts", "hex(html) h")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_datasource_overwrite_replaces(spark, pages_df, tmp_path):
    from sparkdu.sources import WarcishWriter

    spark.dataSource.register(WarcishDataSource)
    out = str(tmp_path / "ow")
    src = pages_df.limit(50).select("url", "warc_ts", "html")
    src.write.format("warcish").option("path", out).mode("append").save()
    n1 = spark.read.format("warcish").load(out).count()
    # overwrite must REPLACE, not append beside the old shards
    src.limit(20).write.format("warcish").option("path", out).mode("overwrite").save()
    n2 = spark.read.format("warcish").load(out).count()
    assert (n1, n2) == (50, 20)
    # abort with None commit messages (failed tasks) must not raise
    WarcishWriter({"path": out}).abort([None, None])
