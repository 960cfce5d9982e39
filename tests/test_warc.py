"""WARC/1.0 ingest gates (sparkdu/warc.py).

The fixture keys (scan_warc_records / warc_http_pages) cross-check parser
vs generator — same-author twins — so the load-bearing gates here are
HAND-TYPED byte vectors against ISO 28500 (version line, case-insensitive
named headers, Content-Length framing, CRLF CRLF terminators, HTTP
payload split, member-gzip), plus the malformed-rejection matrix, the
extract-pipeline composition, and the zero-exchange plan shape.
"""

import zlib

import pytest

from sparkdu.warc import (
    _gunzip_members,
    parse_warc,
    synth_warc_bytes,
    warc_pages,
)

CRLF = b"\r\n"

# One response record, every byte typed out. Body is the 27-byte HTML;
# the HTTP block is status line + 2 headers + blank + body = 92 bytes.
HAND_BODY = b"<html><body>x</body></html>"
HAND_HTTP = (b"HTTP/1.1 200 OK" + CRLF
             + b"Content-Type: text/html; charset=utf-8" + CRLF
             + b"Server: t" + CRLF + CRLF + HAND_BODY)
HAND_RECORD = (b"WARC/1.0" + CRLF
               + b"warc-TYPE: response" + CRLF          # case-insensitive
               + b"WARC-Record-ID: <urn:uuid:1>" + CRLF
               + b"WARC-Target-URI: https://h.test/a" + CRLF
               + b"WARC-Date: 2026-08-18T00:00:00Z" + CRLF
               + b"Content-Type: application/http; msgtype=response" + CRLF
               + b"Content-Length: %d" % len(HAND_HTTP) + CRLF + CRLF
               + HAND_HTTP + CRLF + CRLF)
HAND_INFO = (b"WARC/1.0" + CRLF
             + b"WARC-Type: warcinfo" + CRLF
             + b"WARC-Record-ID: <urn:uuid:0>" + CRLF
             + b"WARC-Date: 2026-08-18T00:00:00Z" + CRLF
             + b"Content-Length: 4" + CRLF + CRLF
             + b"s: 1" + CRLF + CRLF)


def test_hand_vector_record_exact():
    recs = parse_warc(HAND_INFO + HAND_RECORD)
    assert recs is not None and len(recs) == 2
    info, resp = recs
    assert (info["rec_type"], info["url"], info["status"]) == (
        "warcinfo", None, None)
    assert resp["rec_type"] == "response"
    assert resp["url"] == "https://h.test/a"
    assert resp["warc_date"] == "2026-08-18T00:00:00Z"
    assert resp["status"] == 200
    assert resp["mime"] == "text/html"
    assert resp["n_body"] == len(HAND_BODY)
    assert resp["_body"] == HAND_BODY
    # seek extents, hand-computed: info starts at 0, response follows it
    assert (info["offset"], info["length"]) == (0, len(HAND_INFO))
    assert (resp["offset"], resp["length"]) == (len(HAND_INFO),
                                                len(HAND_RECORD))


def test_hand_vector_gzip_members_roundtrip():
    def member(b):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(b) + c.flush()

    gz = member(HAND_INFO) + member(HAND_RECORD)
    assert _gunzip_members(gz) == HAND_INFO + HAND_RECORD
    recs = parse_warc(gz)
    assert recs is not None and recs[1]["_body"] == HAND_BODY
    # gzip extents are in the COMPRESSED domain: re-inflating the second
    # record's extent alone must yield exactly that record
    off, ln = recs[1]["offset"], recs[1]["length"]
    assert (off, off + ln) == (len(member(HAND_INFO)), len(gz))
    d = zlib.decompressobj(31)
    assert d.decompress(gz[off:off + ln]) + d.flush() == HAND_RECORD


@pytest.mark.parametrize("mutate", [
    lambda b: b.replace(b"WARC/1.0", b"WARC/9.9", 1),      # version
    lambda b: b.replace(b"WARC-Date: ", b"X-Date: "),      # mandatory hdr
    lambda b: b.replace(b"Content-Length: %d"
                        % len(HAND_HTTP),
                        b"Content-Length: 99999"),          # overrun
    lambda b: b[:-2],                                       # terminator
    lambda b: b[: len(b) // 2],                             # truncated
    # WARC-Date deviations from the 1.0 SS5.4 uniform form: wrong shape,
    # valid shape but impossible calendar date, valid shape + bad hour
    lambda b: b.replace(b"2026-08-18T00:00:00Z",
                        b"Tue, 18 Aug 2026 00:00:00 GMT"),
    lambda b: b.replace(b"2026-08-18T00:00:00Z", b"2026-02-30T00:00:00Z"),
    lambda b: b.replace(b"2026-08-18T00:00:00Z", b"2026-08-18T25:00:00Z"),
    # LWS continuation line before any header field
    lambda b: b.replace(b"WARC/1.0" + CRLF + b"warc-TYPE",
                        b"WARC/1.0" + CRLF + b" folded" + CRLF
                        + b"warc-TYPE", 1),
])
def test_malformed_fail_whole(mutate):
    assert parse_warc(mutate(HAND_INFO + HAND_RECORD)) is None


def test_header_folding_joined_with_space():
    # ISO 28500 header grammar allows LWS continuation lines; the folded
    # Content-Type must still be recognized as an HTTP response payload
    folded = HAND_RECORD.replace(
        b"Content-Type: application/http; msgtype=response" + CRLF,
        b"Content-Type: application/http;" + CRLF
        + b"\t msgtype=response" + CRLF, 1)
    assert folded != HAND_RECORD
    recs = parse_warc(HAND_INFO + folded)
    assert recs is not None and len(recs) == 2
    resp = recs[1]
    assert (resp["status"], resp["mime"]) == (200, "text/html")
    assert resp["_body"] == HAND_BODY


def test_corrupt_gzip_member_fails_whole():
    def member(b):
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        return c.compress(b) + c.flush()

    gz = member(HAND_INFO) + member(HAND_RECORD)
    assert parse_warc(gz[: len(gz) - 8]) is None           # truncated member
    assert parse_warc(gz[:40] + b"\x00" * 8 + gz[48:]) is None


def test_generator_parser_differential():
    """Every synthetic shard roundtrips exactly (the Spark fixture keys
    check the same thing through the registry; this is the direct form)."""
    for i in range(40):
        payload, truth = synth_warc_bytes(i)
        recs = parse_warc(payload)
        if i % 9 == 5:
            assert recs is None and truth == []
            continue
        got = [{k: r[k] for k in r if k != "_body"} for r in recs]
        assert got == truth, i


def test_warc_pages_feeds_extract_pipeline(spark):
    """Composition: WARC shards -> pages shape -> the flagship extract.
    Every HTTP-200 text/html record must come out the far end with
    non-empty extracted text and its url intact."""
    from pyspark.sql import functions as F

    from sparkdu.api import ExtractConfig, extract_pages
    from sparkdu.harness import fx

    shards = spark.read.parquet(fx("warc")).limit(20)
    pages = warc_pages(shards)
    want_urls = {r["url"] for r in pages.select("url").collect()}
    assert len(want_urls) > 20
    out = extract_pages(spark, pages, ExtractConfig(model_path=None))
    got = {r["url"]: r["extracted_text"] for r in out.collect()}
    assert set(got) == want_urls
    n_nonempty = sum(1 for t in got.values() if t)
    assert n_nonempty == len(got)  # every synth page carries content


def test_cdx_index_sorted_and_seekable(spark):
    """The CDX rows come back globally sorted by (urlkey, ts14), and a
    sampled extent really fetches its record from the shard bytes."""
    import pyarrow.parquet as pq

    import sparkdu.staging  # noqa: F401
    from sparkdu.harness import QUERIES, fx

    rows = QUERIES["warc_cdx_index"](spark, "/root/testdata/sf0.01").collect()
    keys = [(r["urlkey"], r["ts14"]) for r in rows]
    assert keys == sorted(keys) and len(rows) > 300
    assert all(r["urlkey"].startswith("test,") for r in rows[:5])
    shards = {r["shard_id"]: bytes(r["payload"])
              for r in pq.read_table(fx("warc")).to_pylist()}
    for r in rows[:10]:
        ext = shards[r["shard_id"]][r["offset"]:r["offset"] + r["length"]]
        if ext[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(31)
            ext = d.decompress(ext) + d.flush()
        assert ext.startswith(b"WARC/1.0")
        assert r["url"].encode() in ext


def test_scan_is_zero_exchange(spark):
    import re

    import sparkdu.staging  # noqa: F401
    from sparkdu.harness import QUERIES
    from tests.conftest import plan_of

    plan = plan_of(QUERIES["scan_warc_records"](spark, "/root/testdata/sf0.01"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "MapInPandas" in plan


def test_warc_cli_leg_end_to_end(spark, tmp_path):
    """`--format warc` through the wave/lineage machinery: every HTTP-200
    text/html record lands in the output with its url and non-empty text;
    request/404/301/text-plain records and the 9 truncated shards fall
    away; resume re-runs nothing."""
    from pyspark.sql import functions as F  # noqa: F401

    from sparkdu.harness import QUERIES, fx
    from sparkdu.lineage import ExtractJobConfig, run_extract_job

    pages = warc_pages(spark.read.parquet(fx("warc")))
    cfg = ExtractJobConfig(run_id="warc-e2e", out_dir=str(tmp_path),
                           num_partitions=8, waves=2, input_format="html")
    total = run_extract_job(spark, pages, cfg)
    want = {r["url"] for r in
            QUERIES["warc_http_pages"](spark, "/root/testdata/sf0.01")
            .select("url").collect()}
    assert total["n_pages"] == len(want) and total["n_errors"] == 0
    got = {r["url"]: r["extracted_text"] for r in
           spark.read.parquet(f"{tmp_path}/extracted").collect()}
    assert set(got) == want
    assert all(got.values())

    total2 = run_extract_job(
        spark, pages,
        ExtractJobConfig(run_id="warc-e2e", out_dir=str(tmp_path),
                         num_partitions=8, waves=2, input_format="html",
                         resume=True))
    assert total2["n_pages"] == 0 and total2["waves_run"] == 0


def test_parse_never_raises_fuzz():
    """Total-function contract: arbitrary byte mutations of a valid shard
    (and raw garbage) must yield None or a valid record list — never an
    exception escaping parse_warc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = HAND_INFO + HAND_RECORD

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=64), st.integers(0, len(base) - 1),
           st.integers(0, 32))
    def run(junk, cut, drop):
        for b in (junk, base[:cut] + junk + base[cut + drop:]):
            out = parse_warc(b)
            assert out is None or isinstance(out, list)

    run()


def test_streaming_warc_pipeline_matches_batch(spark, tmp_path):
    """The streaming crawl-ingestion composition must commit exactly the
    batch path's rows: same urls, byte-identical extracted text; a replay
    drain with no new shards commits zero epochs."""
    import shutil

    from sparkdu.api import ExtractConfig, extract_pages
    from sparkdu.harness import fx
    from sparkdu.snapshots import read_snapshot
    from sparkdu.streaming import streaming_warc_to_snapshots

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(fx("warc"), src / "warc.parquet")
    out, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    e1 = streaming_warc_to_snapshots(spark, str(src), out, "sw", ckpt)
    assert e1 >= 1
    assert streaming_warc_to_snapshots(spark, str(src), out, "sw", ckpt) == 0

    got = {r["url"]: r["extracted_text"]
           for r in read_snapshot(spark, out).collect()}
    pages = warc_pages(spark.read.parquet(fx("warc")))
    want = {r["url"]: r["extracted_text"]
            for r in extract_pages(
                spark, pages, ExtractConfig(model_path=None)).collect()}
    assert set(got) == set(want) and len(got) > 250
    for url, txt in want.items():
        assert got[url].encode("utf-8") == txt.encode("utf-8"), url
