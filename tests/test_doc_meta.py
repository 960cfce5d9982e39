"""Gates for the WAT-analogue legs (sparkdu.webmeta via the
extract_doc_meta / extract_outlinks / crawl_frontier_from_html keys):
hand vectors for every adversarial markup shape the fixture plants
(quote styles, flipped attribute order, mixed case, entities, traps,
body decoys, head scoping, each href form), full-fixture agreement with
an independent stdlib-re reference, plan shapes (zero-exchange codegen
maps; broadcast anti-join), and totality over hostile bytes."""

import re

from pyspark.sql import Row

import sparkdu.staging  # noqa: F401  (registers the keys)
from pyspark.sql import functions as F
from sparkdu import webmeta as WM
from sparkdu.harness import QUERIES, f
from tests.conftest import plan_of

SF = "/root/testdata/sf0.01"


# shared stdlib-re helpers for the independent references (same public
# regex dialect as webmeta; kept reference-side so both _py_ref and
# outlinks_py_ref stay in lockstep)
def _ex(pat, s, g=1):
    m = re.search(pat, s)
    return m.group(g) if m else ""


def _rpick(pats, s):
    for p in pats:
        v = _ex(p, s)
        if v:
            return v
    return ""


def _runesc(s):
    for a, b in WM.ENTS:
        s = s.replace(a, b)
    return s


def _rnorm(s):
    return re.sub(r"\s+", " ", _runesc(s)).strip()


def _df(spark, html_rows):
    return spark.createDataFrame(
        [Row(url=u, html=h if isinstance(h, bytes) else h.encode())
         for u, h in html_rows],
        "url string, html binary",
    )


def test_hand_vectors(spark):
    got = {r["url"]: r.asDict() for r in WM.doc_meta(_df(spark, [
        # flipped attr order + entity in desc + single quotes + XHTML close
        ("u1", "<html lang='de'><head><title>A &amp; B</title>"
               "<meta content='d1 &amp; d2' id='x' name='description' />"
               "<link href='https://c/1' rel='canonical'/>"
               "<meta content='og1' property='og:title'>"
               "<meta charset=utf-8></head><body></body></html>"),
        # mixed-case tags/attrs + whitespace inside title
        ("u2", '<html LANG="EN"><head><TITLE>  T\n\n  x\t</TITLE>'
               '<meta NAME="Description" CONTENT="D2">'
               '<META charset="ISO-8859-1"></head><body></body></html>'),
        # traps: description-alt prefix, body decoys, escaped title in body
        ("u3", '<html><head><meta name="description-alt" content="TRAP">'
               "</head><body>"
               '<meta name="description" content="BODY DECOY">'
               '<link rel="canonical" href="https://decoy/x">'
               "&lt;title&gt;fake&lt;/title&gt;</body></html>"),
        # nothing at all
        ("u4", "<html><head></head><body><p>hi</p></body></html>"),
    ])).collect()}
    assert got["u1"] == {
        "url": "u1", "title": "A & B", "meta_description": "d1 & d2",
        "canonical_url": "https://c/1", "og_title": "og1",
        "html_lang": "de", "charset": "utf-8", "n_meta_fields": 6,
    }
    assert got["u2"]["title"] == "T x"
    assert got["u2"]["meta_description"] == "D2"
    assert got["u2"]["html_lang"] == "en"
    assert got["u2"]["charset"] == "iso-8859-1"
    assert got["u2"]["n_meta_fields"] == 4
    u3 = got["u3"]
    assert u3["meta_description"] == ""  # neither trap nor body decoy
    assert u3["canonical_url"] == ""     # body decoy ignored
    assert u3["title"] == ""             # escaped body text is not a title
    assert u3["n_meta_fields"] == 0
    assert got["u4"]["n_meta_fields"] == 0


def _py_ref(url, html):
    """Independent stdlib-re reference (same public regex dialect)."""
    h = re.sub(WM.COMMENT, "", html.decode() if html is not None else "")
    head = _ex(WM.HEAD, h)
    title = _rnorm(_ex(WM.TITLE, head))
    desc = _rnorm(_rpick(WM.DESC_PATS, head))
    canon = _runesc(_rpick(WM.CANON_PATS, head)).strip()
    og = _rnorm(_rpick(WM.OG_PATS, head))
    lang = _rpick(WM.LANG_PATS, h).strip().lower()
    cs = _ex(WM.CHARSET, head).lower()
    vals = [title, desc, canon, og, lang, cs]
    return (url, *vals, sum(1 for v in vals if v))


def test_full_fixture_vs_reference(spark):
    from sparkdu import fixtures

    rows = fixtures.gen_head_meta()
    expected = {r[0]: _py_ref(*[r[0], r[1]]) for r in rows}
    got = QUERIES["extract_doc_meta"](spark, SF).collect()
    assert len(got) == len(rows) == 240
    for r in got:
        assert tuple(r) == expected[r["url"]], r["url"]
    # the fixture genuinely exercises presence variation on every field
    for i in range(1, 7):
        n = sum(1 for e in expected.values() if e[i])
        assert 0 < n < len(rows), i


def test_plan_single_codegen_map(spark):
    plan = plan_of(QUERIES["extract_doc_meta"](spark, SF))
    assert "Exchange" not in plan          # pure per-row map at scan speed
    assert "BatchEvalPython" not in plan   # zero Python in the plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "WholeStageCodegen" in plan or "[codegen id :" in plan


# ---------------------------------------------------------------------
# extract_outlinks
# ---------------------------------------------------------------------

def test_outlink_resolution_vectors(spark):
    got = sorted(tuple(r) for r in WM.outlinks(_df(spark, [
        ("https://h.example/a/b/page.html",
         "<html><head></head><body>"
         '<a href="https://x.example/p">abs</a>'
         "<a href='//y.example/q'>proto</a>"
         '<a href="/r">root</a>'
         '<a href="s.html">sib</a>'
         '<a href="../t">up</a>'
         '<a href="u?k=1&amp;j=2#sec">qf</a>'
         '<a href="#only">no1</a>'
         '<a href="mailto:z@h">no2</a>'
         "<a href='JavaScript:x()'>no3</a>"
         '<a href="">no4</a>'
         '<!-- <a href="https://c.example/n">no5</a> -->'
         "</body></html>"),
        # url with no path: relative resolves against scheme://host/
        ("https://bare.example",
         '<body><a href="p/1">rel\n x</a></body>'),
    ])).collect())
    assert got == sorted([
        ("https://h.example/a/b/page.html", "https://x.example/p", "abs", 1),
        ("https://h.example/a/b/page.html", "https://y.example/q", "proto", 1),
        ("https://h.example/a/b/page.html", "https://h.example/r", "root", 0),
        ("https://h.example/a/b/page.html", "https://h.example/a/b/s.html",
         "sib", 0),
        ("https://h.example/a/b/page.html", "https://h.example/a/t", "up", 0),
        ("https://h.example/a/b/page.html",
         "https://h.example/a/b/u?k=1&j=2", "qf", 0),
        ("https://bare.example", "https://bare.example/p/1", "rel x", 0),
    ])


def outlinks_py_ref(url, html):
    """Independent stdlib-re reference for outlinks."""
    h = re.sub(WM.COMMENT, "", html.decode() if html is not None else "")
    scheme = _ex(WM.SCHEME, url).lower()
    host = _ex(WM.HOST, url)
    base = _ex(WM.BASE, url) or f"{scheme}://{host}/"
    out = []
    for m in re.finditer(WM.ANCHOR, h):
        elem = m.group(0)
        href = _runesc(_rpick(WM.HREF_PATS, elem)).strip()
        text = _rnorm(_ex(WM.ATEXT, elem))
        if (not href or href.startswith("#")
                or (re.match(WM.ANY_SCHEME, href)
                    and not re.match(WM.HTTP_ABS, href))):
            continue
        if re.match(WM.HTTP_ABS, href):
            dst = href
        elif href.startswith("//"):
            dst = f"{scheme}:{href}"
        elif href.startswith("/"):
            dst = f"{scheme}://{host}{href}"
        else:
            dst = base + href
        defrag = re.sub(r"#.*$", "", dst)
        pre = _ex(WM.PRE_QUERY, defrag)
        auth = _ex(WM.AUTHORITY, pre)
        path = re.sub(WM.AUTH_STRIP, "", pre)
        for _ in range(WM.DOT_PASSES):
            path = re.sub(WM.ROOT_DOTDOT, "/", re.sub(
                WM.DOTDOT, "/", re.sub(WM.DOTSLASH, "/", path)))
        dst = auth + path + _ex(WM.QUERY, defrag)
        out.append((url, dst, text,
                    int(_ex(WM.HOST, dst).lower() != host.lower())))
    return out


def test_outlinks_full_fixture_vs_reference(spark):
    from sparkdu import fixtures

    expected = []
    for u, h in fixtures.gen_head_meta():
        expected.extend(outlinks_py_ref(u, h))
    got = sorted(tuple(r) for r in
                 QUERIES["extract_outlinks"](spark, SF).collect())
    assert got == sorted(expected)
    assert len(got) > 500
    # fixture exercises internal AND external links, and no junk leaks
    assert {g[3] for g in got} == {0, 1}
    assert not any("#" in g[1] or "commented.example" in g[1] for g in got)
    assert not any("/../" in g[1] for g in got)


def test_outlinks_plan_shape(spark):
    plan = plan_of(QUERIES["extract_outlinks"](spark, SF))
    assert "Exchange" not in plan          # map + generate, no shuffle
    assert "Generate" in plan              # the explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


# ---------------------------------------------------------------------
# crawl_frontier_from_html
# ---------------------------------------------------------------------

def test_frontier_drops_crawled_destinations(spark):
    ol = QUERIES["extract_outlinks"](spark, SF)
    fr = QUERIES["crawl_frontier_from_html"](spark, SF)
    total_edges = ol.count()
    crawled_edges = ol.join(
        f(spark, "pages_meta").select(F.col("url").alias("dst_url")),
        "dst_url").count()
    assert crawled_edges == 120      # the planted same-host /p/<n> links
    agg = fr.agg(F.sum("n_edges")).collect()[0][0]
    assert agg == total_edges - crawled_edges
    # no frontier host may be reachable only via crawled urls
    assert fr.filter(F.col("n_frontier_urls") <= 0).count() == 0
    # distinct-url counts never exceed edge counts
    assert fr.filter(
        F.col("n_frontier_urls") > F.col("n_edges")).count() == 0


def test_frontier_plan_shape(spark):
    plan = plan_of(QUERIES["crawl_frontier_from_html"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly the aggregation shuffles (partial agg map-side first);
    # the anti-join side is broadcast, never shuffled
    assert plan.count("Exchange hashpartitioning") <= 2


# ---------------------------------------------------------------------
# robustness: the regex legs are total functions over garbage input
# ---------------------------------------------------------------------

def test_adversarial_bytes_never_throw(spark):
    """webmeta transforms over hostile rows: invalid UTF-8, unterminated
    tags, nested quotes, pathological repetition, urls with no
    scheme/host. Must not raise, and invariants must hold (no fragments
    in dst_url, flags in {0,1})."""
    hostile = [
        ("u-badutf8", b"<html><head><title>a\xff\xfe\x80b</title></head>"
                      b'<body><a href="/x">t</a></body></html>'),
        ("u-unterminated", b"<html><head><title>never closed"),
        ("u-nested-quotes", b"""<html><head><meta name="description" """
                            b"""content="a 'b' c"></head><body></body>"""),
        ("u-no-head", b"<html><body><a href='//h.example/p'>x</a></body>"),
        ("u-repeat", b"<a href='/r'>t</a>" * 2000),
        ("u-empty", b""),
        ("not-a-url", b"<html lang='xx'><head></head>"
                      b"<body><a href='rel/p'>r</a></body></html>"),
        ("https://ok.example/d/", b"<body><a href='../../../../up'>u</a>"
                                  b"<a href='#'>f</a></body>"),
    ]
    df = _df(spark, hostile)
    m = WM.doc_meta(df).collect()                          # must not raise
    links_df = WM.outlinks(df)
    links = links_df.collect()                             # must not raise
    frontier = WM.frontier_hosts(links_df, df).collect()   # must not raise
    assert len(m) == len(hostile)
    assert all(r["n_meta_fields"] >= 0 for r in m)
    assert all("#" not in r["dst_url"] for r in links)
    assert all(r["external"] in (0, 1) for r in links)
    assert all(r["n_frontier_urls"] >= 1 for r in frontier)
    # the 2000-anchor page exploded fully
    assert sum(1 for r in links if r["url"] == "u-repeat") == 2000


# ---------------------------------------------------------------------
# wat_job CLI leg
# ---------------------------------------------------------------------

def test_wat_job_html_matches_registry(spark, tmp_path):
    from sparkdu.jobs.wat_job import run_wat_job

    pages = f(spark, "pages_meta")
    total = run_wat_job(spark, pages, str(tmp_path), partitions=4)
    meta = spark.read.parquet(f"{tmp_path}/doc_meta")
    links = spark.read.parquet(f"{tmp_path}/outlinks")
    # written tables byte-equal the registry keys' output
    reg_meta = QUERIES["extract_doc_meta"](spark, SF)
    reg_links = QUERIES["extract_outlinks"](spark, SF)
    assert meta.exceptAll(reg_meta).count() == 0
    assert reg_meta.exceptAll(meta).count() == 0
    assert links.exceptAll(reg_links).count() == 0
    assert reg_links.exceptAll(links).count() == 0
    assert total["n_pages"] == 240
    assert total["n_links"] == links.count()
    assert 0 < total["n_external"] < total["n_links"]
    # rerun is idempotent (overwrite + job-commit protocol)
    again = run_wat_job(spark, pages, str(tmp_path), partitions=4)
    assert again == total


def test_wat_job_by_host_colocates(spark, tmp_path):
    from sparkdu.jobs.wat_job import run_wat_job

    run_wat_job(spark, f(spark, "pages_meta"), str(tmp_path),
                partitions=8, by_host=True)
    links = spark.read.parquet(f"{tmp_path}/outlinks")
    # every destination host lives in exactly one file
    hosts_per_file = (
        links
        .withColumn("fname", F.input_file_name())
        .withColumn("dst_host",
                    F.lower(F.regexp_extract("dst_url", WM.HOST, 1)))
        .groupBy("dst_host")
        .agg(F.countDistinct("fname").alias("nf"))
    )
    assert hosts_per_file.filter(F.col("nf") > 1).count() == 0


def test_wat_job_warc_leg(spark, tmp_path):
    """WARC shards -> container extraction -> WAT tables: one row per
    HTTP-200 text/html capture; the fixture's minimal payloads carry no
    head metadata or anchors, which must yield empty-string fields and
    zero links (not errors)."""
    from sparkdu.jobs.wat_job import run_wat_job
    from sparkdu.warc import warc_pages

    pages = warc_pages(
        spark.read.parquet("fixtures_data/warc.parquet")
    ).select("url", "html")
    n_pages = pages.count()
    total = run_wat_job(spark, pages, str(tmp_path))
    assert total["n_pages"] == n_pages > 0
    assert total["n_links"] == 0
    meta = spark.read.parquet(f"{tmp_path}/doc_meta")
    assert meta.filter("n_meta_fields != 0").count() == 0


# ---------------------------------------------------------------------
# streaming WAT leg
# ---------------------------------------------------------------------

def test_streaming_wat_equals_batch_and_replays_idempotent(spark, tmp_path):
    """Two-wave page stream drained twice: after both drains the sink
    tables byte-equal the batch transforms over all pages; a third drain
    with no new files appends nothing; a drain over a not-yet-created
    source returns zeros instead of erroring. Counts are per-drain NEW
    rows (sink progress totals), never a table re-scan."""
    from sparkdu.streaming import streaming_wat

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # empty / not-yet-created source: zero rows, no error
    c0 = streaming_wat(spark, src, out, ckpt)
    assert c0 == {"doc_meta": 0, "outlinks": 0}

    pages = f(spark, "pages_meta")
    wave_a = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    wave_b = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    n_a = wave_a.count()

    wave_a.write.mode("append").parquet(src)
    c1 = streaming_wat(spark, src, out, ckpt)
    wave_b.write.mode("append").parquet(src)
    c2 = streaming_wat(spark, src, out, ckpt)
    c3 = streaming_wat(spark, src, out, ckpt)     # no new files -> no-op

    batch_meta = WM.doc_meta(pages)
    batch_links = WM.outlinks(pages)
    assert c1["doc_meta"] == n_a
    assert c1["doc_meta"] + c2["doc_meta"] == 240
    assert c1["outlinks"] + c2["outlinks"] == batch_links.count()
    assert c3 == {"doc_meta": 0, "outlinks": 0}
    got_meta = spark.read.parquet(f"{out}/doc_meta")
    got_links = spark.read.parquet(f"{out}/outlinks")
    assert got_meta.exceptAll(batch_meta).count() == 0
    assert batch_meta.exceptAll(got_meta).count() == 0
    assert got_links.exceptAll(batch_links).count() == 0
    assert batch_links.exceptAll(got_links).count() == 0


# ---------------------------------------------------------------------
# dedup_canonical_cluster
# ---------------------------------------------------------------------

def test_canonical_cluster_semantics(spark):
    rows = QUERIES["dedup_canonical_cluster"](spark, SF).collect()
    assert len(rows) > 0
    meta = {r["url"]: r["canonical_url"]
            for r in QUERIES["extract_doc_meta"](spark, SF).collect()}
    for r in rows:
        # interesting clusters only: multi-capture or uncaptured canonical
        assert r["n_pages"] > 1 or r["has_self_capture"] == 0
        # representative is a real capture that maps to this key
        rep = r["representative_url"]
        assert rep in meta
        assert (meta[rep] or rep) == r["canon_key"]
    # fixture canonicals point at /canonical/<i> urls that were never
    # crawled -> every declared-canonical cluster lacks a self capture
    declared = [r for r in rows if "/canonical/" in r["canon_key"]]
    assert declared and all(r["has_self_capture"] == 0 for r in declared)


# ---------------------------------------------------------------------
# review-fix vectors (round-5 code review on webmeta/wat_job)
# ---------------------------------------------------------------------

def test_review_fix_vectors(spark):
    meta = {r["url"]: r.asDict() for r in WM.doc_meta(_df(spark, [
        # commented-out head tags are NOT live metadata
        ("m1", "<html><head><!-- <title>draft</title>"
               '<meta name="description" content="C"> -->'
               "<title>Real</title></head><body></body></html>"),
        # value containing the other quote char is captured whole
        ("m2", '<html><head><meta name="description" '
               'content="it\'s a test"></head><body></body></html>'),
    ])).collect()}
    assert meta["m1"]["title"] == "Real"
    assert meta["m1"]["meta_description"] == ""
    assert meta["m2"]["meta_description"] == "it's a test"

    # NULL html: empty row, never NULL fields (totality contract)
    from pyspark.sql import Row
    null_df = spark.createDataFrame([Row(url="n1", html=None)],
                                    "url string, html binary")
    r = WM.doc_meta(null_df).collect()[0]
    assert r["n_meta_fields"] == 0 and r["title"] == ""
    assert WM.outlinks(null_df).count() == 0

    links = sorted(tuple(x) for x in WM.outlinks(_df(spark, [
        # query string containing '/' must NOT join the resolution base,
        # and dot-removal must not touch the query
        ("https://ex.com/dir/page?img=/icons/a.png",
         '<body><a href="next.html">n</a>'
         '<a href="go?to=/a/../b">q</a></body>'),
        # non-http(s) schemes dropped; uppercase scheme kept + same-host
        ("https://ex.com/d/",
         '<body><a href="tel:+15551234567">t</a>'
         '<a href="data:text/html,x">d</a>'
         "<a href='ftp://files/f'>f</a>"
         '<a href="HTTPS://EX.com/Upper">u</a>'
         '<a href="././z">z</a>'
         "<a href=\"/a?x=1>2\">gt</a>"
         "<a href=\"it's here\">mixed</a></body>"),
    ])).collect())
    assert links == sorted([
        ("https://ex.com/dir/page?img=/icons/a.png",
         "https://ex.com/dir/next.html", "n", 0),
        ("https://ex.com/dir/page?img=/icons/a.png",
         "https://ex.com/dir/go?to=/a/../b", "q", 0),
        ("https://ex.com/d/", "HTTPS://EX.com/Upper", "u", 0),  # ci same-host
        ("https://ex.com/d/", "https://ex.com/d/z", "z", 0),
        ("https://ex.com/d/", "https://ex.com/a?x=1>2", "gt", 0),
        ("https://ex.com/d/", "https://ex.com/d/it's here", "mixed", 0),
    ])


def test_third_review_fix_vectors(spark):
    """Round-5 third review pass: authority-safe ../ clamping, canonical
    entity-unescape, quote-aware pre-href scan, unquoted hrefs."""
    links = sorted(tuple(x) for x in WM.outlinks(_df(spark, [
        # ../ past the root must clamp, never delete the hostname
        ("https://a.example/about",
         '<body><a href="../contact">c</a>'
         '<a href="../../../deep">d</a></body>'),
        # '>' inside a quoted attribute BEFORE href; unquoted href
        ("https://b.example/p/",
         '<body><a title="a > b" href="/titled">t</a>'
         "<a href=/unq>u</a></body>"),
    ])).collect())
    assert links == sorted([
        ("https://a.example/about", "https://a.example/contact", "c", 0),
        ("https://a.example/about", "https://a.example/deep", "d", 0),
        ("https://b.example/p/", "https://b.example/titled", "t", 0),
        ("https://b.example/p/", "https://b.example/unq", "u", 0),
    ])

    meta = {r["url"]: r.asDict() for r in WM.doc_meta(_df(spark, [
        # canonical entity-unescape: self-canonical must match the url
        ("https://a.example/p?x=1&y=2",
         '<html><head><link rel="canonical" '
         'href="https://a.example/p?x=1&amp;y=2"></head><body></body></html>'),
    ])).collect()}
    assert (meta["https://a.example/p?x=1&y=2"]["canonical_url"]
            == "https://a.example/p?x=1&y=2")

    # ...and dedup_canonical_cluster no longer reports that page as a gap
    from pyspark.sql import Row
    kc = QUERIES["dedup_canonical_cluster"](spark, SF).collect()
    fixture_self = [r for r in kc if "?x=" in r["canon_key"]]
    # fixture entity-canonicals point at /c?x=N&y=2 (never crawled) —
    # unescaped correctly they appear as plain-& keys
    assert fixture_self and all("&amp;" not in r["canon_key"]
                                for r in fixture_self)
    assert all("&y=2" in r["canon_key"] for r in fixture_self)


def test_fixture_traps_discriminate(spark):
    """The fixture must contain pages where a buggy extractor would
    differ: trap-only pages (prefix over-match would surface TRAP) and
    quote-value pages (loose value class would truncate)."""
    from sparkdu import fixtures

    got = {r["url"]: r.asDict()
           for r in QUERIES["extract_doc_meta"](spark, SF).collect()}
    trap_only = quote_val = 0
    for u, h in fixtures.gen_head_meta():
        s = h.decode()
        real_desc = re.search(
            "(?i)name=[\"']description[\"']", s.replace("description-alt", ""))
        if "description-alt" in s and not real_desc:
            trap_only += 1
            assert got[u]["meta_description"] == ""
        if "it's page" in s:
            quote_val += 1
            assert got[u]["meta_description"].startswith("it's page")
    assert trap_only > 0 and quote_val > 0
