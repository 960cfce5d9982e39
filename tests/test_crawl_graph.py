"""Differential tests for the crawl-politeness (robots.txt) evaluator and
the HITS link-analysis operator.

Both get an independently-written oracle: robots decisions are re-derived
by a line-walking pure-Python evaluator that shares no parsing code with
sparkdu.crawl (it never tokenizes into directive/value regexes — it walks
lines imperatively); HITS is checked against a dense numpy power
iteration with the same L1 normalization recipe.
"""

import os

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sparkdu.crawl import robots_allow, robots_rules
from sparkdu.fixtures import gen_robots
from sparkdu.rank import hits

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures_data"
)


# ---------------------------------------------------------------- robots


def _py_robots_rules(txt: str) -> list:
    """Independent imperative parse: walk lines, track whether the current
    user-agent block includes '*', collect (is_allow, prefix) rules.

    Lines that are not directives (blank, comments, junk without a
    letters-and-hyphens key) are IGNORED ENTIRELY — they neither join nor
    split groups, so stacked User-agent lines separated by a blank line
    still share one group, per RFC 9309 / the Google parser (the fuzz
    differential caught an earlier version that reset the stacking state
    on such lines)."""
    import re

    rules = []
    in_star = False
    prev_was_ua = False
    for raw in txt.split("\n"):
        line = raw.split("#", 1)[0].strip()
        m = re.match(r"^([A-Za-z-]+)\s*:(.*)$", line)
        if not m:
            continue  # non-directive: invisible to group structure
        key, val = m.group(1).lower(), m.group(2).strip()
        if key == "user-agent":
            if not prev_was_ua:
                in_star = False  # a new group starts; reset membership
            if val == "*":
                in_star = True
            prev_was_ua = True
        else:
            prev_was_ua = False
            if key in ("allow", "disallow") and val and in_star:
                rules.append((key == "allow", val))
    return rules


def _py_decide(path: str, rules: list):
    """Longest matching prefix wins; Allow beats Disallow on ties;
    no match -> allowed with no rule."""
    best = None  # (plen, is_allow, prefix)
    for is_allow, prefix in rules:
        if path.startswith(prefix):
            cand = (len(prefix), is_allow, prefix)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
    if best is None:
        return True, None, None
    return best[1], best[2], "allow" if best[1] else "disallow"


def test_robots_fixture_covers_branches():
    rows = dict(gen_robots())
    texts = "\n".join(rows.values())
    assert "Disallow: /\n" in texts or "Disallow: /  #" in texts  # closed host
    assert "User-agent: OtherBot\nUser-agent: *" in texts  # stacked UAs
    assert any("User-agent: *" not in t for t in rows.values())  # no * group
    assert "Disallow:\n" in texts or texts.endswith("Disallow:")  # empty value


def test_robots_rules_group_semantics(spark):
    df = spark.createDataFrame(gen_robots(), "host string, robots string")
    got = {
        (r["host"], r["is_allow"], r["prefix"])
        for r in robots_rules(df).collect()
    }
    expect = set()
    for host, txt in gen_robots():
        for is_allow, prefix in _py_robots_rules(txt):
            expect.add((host, is_allow, prefix))
    assert got == expect


def test_robots_allow_differential(spark):
    """Every distinct fixture url decided identically by the Spark join
    pipeline and the imperative Python evaluator."""
    robots = spark.createDataFrame(gen_robots(), "host string, robots string")
    pages = pq.read_table(
        os.path.join(FIXDIR, "pages.parquet"), columns=["url"]
    )
    urls = sorted(set(pages["url"].to_pylist()))
    got = {
        r["url"]: (r["allowed"], r["rule_prefix"], r["rule_type"])
        for r in robots_allow(
            spark.createDataFrame([(u,) for u in urls], "url string"),
            robots_rules(robots),
        ).collect()
    }
    assert len(got) == len(urls)

    py_rules = {h: _py_robots_rules(t) for h, t in gen_robots()}
    n_denied = 0
    for u in urls:
        rest = u.split("://", 1)[1]
        host, slash, path = rest.partition("/")
        path = slash + path if slash else "/"
        expect = _py_decide(path, py_rules.get(host, []))
        assert got[u] == expect, (u, got[u], expect)
        n_denied += 0 if expect[0] else 1
    # the fixture must actually exercise both outcomes
    assert 0 < n_denied < len(urls)


def test_robots_edge_paths(spark):
    """Hand-built corner cases: bare-host url maps to '/', carve-out
    Allow beats shorter Disallow, equal-length Allow wins the tie."""
    txt = (
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /ab\n"
        "Disallow: /x\n"
        "Allow: /y\n"  # same length as /x: tie broken by kind, not order
        "Disallow: /\n"
    )
    rules = robots_rules(
        spark.createDataFrame([("h.example", txt)], "host string, robots string")
    )
    urls = spark.createDataFrame(
        [
            ("http://h.example",),  # bare host -> path '/'
            ("http://h.example/ab/deep",),  # carve-out wins over /a
            ("http://h.example/a/other",),
            ("http://h.example/y",),
        ],
        "url string",
    )
    got = {r["url"]: r for r in robots_allow(urls, rules).collect()}
    r0 = got["http://h.example"]
    assert (r0["path"], r0["allowed"], r0["rule_prefix"]) == ("/", False, "/")
    assert got["http://h.example/ab/deep"]["allowed"] is True
    assert got["http://h.example/ab/deep"]["rule_prefix"] == "/ab"
    assert got["http://h.example/a/other"]["allowed"] is False
    assert got["http://h.example/y"]["allowed"] is True


# ------------------------------------------------------------------ HITS


def _numpy_hits(edges, iters=20):
    """Dense reference: same recipe — weighted adjacency from parallel
    edges, auth then hub half-steps, each L1-normalized."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, t in edges:
        W[idx[s], idx[t]] += 1.0
    hub = np.full(n, 1.0 / n)
    auth = None
    for _ in range(iters):
        auth = W.T @ hub
        auth /= auth.sum()
        hub = W @ auth
        hub /= hub.sum()
    return {h: (hub[idx[h]], auth[idx[h]]) for h in nodes}


def _fixture_host_edges():
    t = pq.read_table(os.path.join(FIXDIR, "links.parquet"))
    return [
        (s.split("/")[2], h)
        for s, h, nf in zip(
            t["src_url"].to_pylist(),
            t["dst_host"].to_pylist(),
            t["nofollow"].to_pylist(),
        )
        if not nf
    ]


def test_hits_matches_power_iteration(spark):
    edges = _fixture_host_edges()
    expect = _numpy_hits(edges)
    got = {
        r["host"]: (r["hub"], r["auth"])
        for r in hits(
            spark.createDataFrame(edges, "src string, dst string")
        ).collect()
    }
    assert set(got) == set(expect)
    for h in expect:
        assert abs(got[h][0] - expect[h][0]) < 1e-9, h
        assert abs(got[h][1] - expect[h][1]) < 1e-9, h
    # both vectors are L1-normalized probability-like scores
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-9


def test_hits_star_graph(spark):
    """Star into one center: the center holds all authority, the spokes
    split hub mass evenly, the center's own hub score is 0."""
    edges = [(f"s{i}", "center") for i in range(4)]
    got = {
        r["host"]: (r["hub"], r["auth"])
        for r in hits(
            spark.createDataFrame(edges, "src string, dst string"), iters=5
        ).collect()
    }
    assert abs(got["center"][1] - 1.0) < 1e-12
    assert abs(got["center"][0]) < 1e-12
    for i in range(4):
        assert abs(got[f"s{i}"][0] - 0.25) < 1e-12
        assert abs(got[f"s{i}"][1]) < 1e-12


# ------------------------------------------------- frontier & recrawl


def test_frontier_anti_join_robots_and_budget(spark):
    """Synthetic graph exercising every stage: already-crawled urls drop
    (the fixture-based harness key can't show this — its discovered
    targets are all new), robots-denied urls drop, and the per-host
    budget caps at k in priority order."""
    from sparkdu.crawl import frontier, robots_rules

    cand = spark.createDataFrame(
        [("http://a.example/p%d" % i, 10 - i) for i in range(8)]
        + [("http://a.example/blocked/x", 99),
           ("http://b.example/only", 1),
           ("http://a.example/seen", 50)],
        "url string, n_ref_hosts long",
    )
    crawled = spark.createDataFrame(
        [("http://a.example/seen",)], "url string"
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /blocked\n")],
        "host string, robots string",
    )
    got = frontier(cand, crawled, robots_rules(robots), per_host_k=3)
    rows = {r["url"]: r for r in got.collect()}
    assert "http://a.example/seen" not in rows        # anti-join
    assert "http://a.example/blocked/x" not in rows   # robots deny
    assert "http://b.example/only" in rows            # no rules -> allowed
    a_urls = [u for u in rows if u.startswith("http://a.example")]
    assert len(a_urls) == 3                           # politeness budget
    # priority order: highest n_ref_hosts first
    assert sorted(a_urls) == [f"http://a.example/p{i}" for i in range(3)]
    assert rows["http://a.example/p0"]["rk"] == 1


def test_recrawl_priority_change_rates(spark):
    """Hand-built capture histories: single capture -> 0, unchanged
    recapture -> 0, changed recapture -> 1, 3 captures / 2 versions
    -> 0.5; last_ts is the max capture time."""
    import datetime as dt

    from sparkdu.crawl import recrawl_priority

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("u1", b"v1", t0),
        ("u2", b"v1", t0), ("u2", b"v1", t0 + dt.timedelta(days=1)),
        ("u3", b"v1", t0), ("u3", b"v2", t0 + dt.timedelta(days=2)),
        ("u4", b"v1", t0), ("u4", b"v1", t0 + dt.timedelta(days=1)),
        ("u4", b"v2", t0 + dt.timedelta(days=3)),
    ]
    pages = spark.createDataFrame(
        rows, "url string, html binary, warc_ts timestamp"
    )
    got = {r["url"]: r for r in recrawl_priority(pages).collect()}
    assert (got["u1"]["n_captures"], got["u1"]["n_versions"],
            got["u1"]["change_rate"]) == (1, 1, 0.0)
    assert got["u2"]["change_rate"] == 0.0
    assert got["u3"]["change_rate"] == 1.0
    assert (got["u4"]["n_captures"], got["u4"]["n_versions"],
            got["u4"]["change_rate"]) == (3, 2, 0.5)
    assert got["u4"]["last_ts"] == t0 + dt.timedelta(days=3)


# -------------------------------------------------------------- BM25


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    """Independent plain-Python BM25 over {doc_id: text}."""
    import math

    toks = {d: t.split(" ") for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in terms
    }
    out = {}
    for d, v in toks.items():
        s = 0.0
        for q in terms:
            tf = v.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[d] = round(s, 4)
    return out


def test_bm25_matches_reference_and_ranks(spark):
    from sparkdu.staging import bm25_topk

    corpus = {
        1: "table query table filler filler",
        2: "table filler filler filler filler filler filler filler",
        3: "query rare words here",
        4: "nothing relevant at all",
        5: "table table table table",  # heavy tf, saturates
        6: "table query",              # short doc, length norm boost
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    got = bm25_topk(docs, ("table", "query"), 10).collect()
    expect = _py_bm25(corpus, ("table", "query"))
    assert {r["doc_id"]: r["score"] for r in got} == expect
    # rank column is 1..n in (score desc, doc_id) order
    order = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rk"])] == [
        d for d, _ in order
    ]
    # doc 4 matches nothing and must be absent
    assert 4 not in expect
    # the short both-term doc must beat the long single-term doc
    assert expect[6] > expect[2]


def test_bm25_topk_cap(spark):
    from sparkdu.staging import bm25_topk

    docs = spark.createDataFrame(
        [(i, "table word%d" % i) for i in range(20)],
        "doc_id long, text string",
    )
    got = bm25_topk(docs, ("table",), 7).collect()
    assert len(got) == 7
    assert sorted(r["rk"] for r in got) == list(range(1, 8))


# --------------------------------------------------------- redirects


def _py_resolve(edges, max_hops=16):
    """Independent per-source walk with an explicit hop budget; ambiguous
    sources (same src, different dst) resolve to the smallest dst, the
    resolver's documented deterministic pick."""
    nxt = {}
    for s, d, *_ in edges:
        nxt[s] = min(nxt[s], d) if s in nxt else d
    out = {}
    for s in nxt:
        cur, hops = s, 0
        while cur in nxt and hops < max_hops:
            cur = nxt[cur]
            hops += 1
        if cur in nxt:  # budget exhausted mid-graph
            out[s] = (None, None, "exceeded")
        else:
            out[s] = (cur, hops, "landed")
    return out


def test_redirect_resolver_differential(spark):
    """Whole fixture graph (chains, 2-/3-cycles, a self-loop, diamond
    fan-ins) resolved identically by pointer doubling and a plain
    per-source Python walk."""
    from sparkdu.crawl import resolve_redirects
    from sparkdu.fixtures import gen_redirects

    edges = gen_redirects()
    df = spark.createDataFrame(
        edges, "src_url string, dst_url string, status int"
    )
    got = {
        r["src_url"]: (r["final_url"], r["n_hops"], r["status"])
        for r in resolve_redirects(df).collect()
    }
    expect = _py_resolve(edges)
    assert got == expect
    # the fixture genuinely exercises both outcomes
    statuses = {v[2] for v in got.values()}
    assert statuses == {"landed", "exceeded"}
    # diamond fan-in: the alt source lands at the same page as the chain head
    assert got["https://r0.example/alt"][0] == got["https://r0.example/hop0"][0]


def test_redirect_hop_budget_boundary(spark):
    """A chain of exactly max_hops lands; one hop longer is exceeded —
    including when max_hops is not a power of two (doubling covers more
    ground than the budget; the final check must still enforce it)."""
    from sparkdu.crawl import resolve_redirects

    def chain(n):
        return [(f"u{i}", f"u{i+1}") for i in range(n)]

    for budget in (6, 8):
        df = spark.createDataFrame(
            chain(budget), "src_url string, dst_url string"
        )
        got = {r["src_url"]: r for r in
               resolve_redirects(df, max_hops=budget).collect()}
        assert got["u0"]["status"] == "landed"
        assert got["u0"]["n_hops"] == budget
        assert got["u0"]["final_url"] == f"u{budget}"

        df2 = spark.createDataFrame(
            chain(budget + 1), "src_url string, dst_url string"
        )
        got2 = {r["src_url"]: r for r in
                resolve_redirects(df2, max_hops=budget).collect()}
        assert got2["u0"]["status"] == "exceeded"
        assert got2["u0"]["final_url"] is None
        assert got2["u1"]["status"] == "landed"  # one closer: fits


# ----------------------------------------------------- url templates


def test_url_templates_collapse_and_trap_flag(spark):
    """Hex ids collapse to {hex} before digits can fragment them; a
    dominating numeric template trips the trap flag while a diverse
    host stays clean."""
    from sparkdu.crawl import url_templates

    trap = [(f"http://trap.example/cal/2026/{m}/{d}",)
            for m in range(1, 4) for d in range(1, 6)]
    sess = [("http://trap.example/s/deadbeefcafe1234",)]
    clean = [("http://ok.example/about",), ("http://ok.example/contact",),
             ("http://ok.example/item/7",)]
    df = spark.createDataFrame(trap + sess + clean, "url string")
    rows = {(r["host"], r["template"]): r
            for r in url_templates(df, min_urls=10).collect()}

    t = rows[("trap.example", "/cal/{n}/{n}/{n}")]
    assert (t["n_urls"], t["host_urls"], t["trap_suspect"]) == (15, 16, True)
    s = rows[("trap.example", "/s/{hex}")]
    assert s["trap_suspect"] is False  # 1 url: below min_urls
    assert ("ok.example", "/item/{n}") in rows
    assert not any(r["trap_suspect"] for (h, _), r in rows.items()
                   if h == "ok.example")
    # fractions per host sum to 1
    assert abs(sum(r["frac"] for (h, _), r in rows.items()
                   if h == "trap.example") - 1.0) < 1e-6


# ------------------------------------------------------------ sitemaps


def test_sitemap_gap_differential_vs_xml_parser(spark):
    """The regex extraction is checked against a REAL XML parser
    (xml.etree) over the whole fixture, and every status branch must
    occur."""
    import xml.etree.ElementTree as ET

    from sparkdu.crawl import sitemap_gap
    from sparkdu.fixtures import gen_sitemaps

    pages_t = pq.read_table(
        os.path.join(FIXDIR, "pages.parquet"), columns=["url", "warc_ts"]
    )
    urls = pages_t["url"].to_pylist()
    tss = pages_t["warc_ts"].to_pylist()
    last = {}
    for u, ts in zip(urls, tss):
        if u not in last or ts > last[u]:
            last[u] = ts

    sitemaps = gen_sitemaps(sorted(set(urls)))
    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    expect = {}
    for host, xml in sitemaps:
        for ent in ET.fromstring(xml).iter(f"{ns}url"):
            loc = ent.find(f"{ns}loc").text
            lm_el = ent.find(f"{ns}lastmod")
            lm = lm_el.text if lm_el is not None else None
            if loc not in last:
                st = "uncrawled"
            elif lm is None:
                st = "unknown"
            else:
                import datetime as dt

                try:
                    lm_ts = dt.datetime.fromisoformat(lm)
                except ValueError:
                    lm_ts = None  # junk date: classified, never a crash
                st = (
                    "unknown" if lm_ts is None
                    else "stale" if lm_ts > last[loc]
                    else "fresh"
                )
            expect[loc] = (host, lm, last.get(loc), st)

    sm_df = spark.createDataFrame(sitemaps, "host string, sitemap string")
    pages_df = spark.read.parquet(os.path.join(FIXDIR, "pages.parquet"))
    got = {
        r["url"]: (r["host"], r["lastmod"], r["last_crawl"], r["status"])
        for r in sitemap_gap(sm_df, pages_df).collect()
    }
    assert got == expect
    assert {v[3] for v in expect.values()} == {
        "uncrawled", "stale", "fresh", "unknown"
    }


# ----------------------------------------------------------- trustrank


def _numpy_trustrank(edges, seeds, d=0.85, iters=20):
    """Independent dense reference: same seed-teleport recipe."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t in edges:
        M[idx[t], idx[s]] += 1.0
    outdeg = M.sum(axis=0)
    has_out = outdeg > 0
    M[:, has_out] /= outdeg[has_out]
    s_vec = np.zeros(n)
    for s in seeds:
        s_vec[idx[s]] = 1.0 / len(seeds)
    r = s_vec.copy()
    for _ in range(iters):
        c = M @ r
        lost = d * (1.0 - c.sum())
        r = (1.0 - d + lost) * s_vec + d * c
    return {h: r[idx[h]] for h in nodes}


def test_trustrank_matches_power_iteration_and_conserves_mass(spark):
    from sparkdu.rank import trustrank

    edges = _fixture_host_edges()
    seeds = ["site0.example", "site1.example"]
    expect = _numpy_trustrank(edges, seeds)
    got = {
        r["host"]: r["rank"]
        for r in trustrank(
            spark.createDataFrame(edges, "src string, dst string"), seeds
        ).collect()
    }
    assert set(got) == set(expect)
    for h in expect:
        assert abs(got[h] - expect[h]) < 1e-9, h
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_trustrank_link_farm_scores_zero(spark):
    """A densely-interlinked clique with no path from the seeds gets no
    trust, however high its internal link count — the anti-spam property
    plain PageRank lacks."""
    from sparkdu.rank import trustrank

    edges = [("seed", "good"), ("good", "leaf")]
    farm = [(f"f{i}", f"f{j}") for i in range(4) for j in range(4) if i != j]
    got = {
        r["host"]: r["rank"]
        for r in trustrank(
            spark.createDataFrame(edges + farm * 3, "src string, dst string"),
            ["seed"],
            iters=10,
        ).collect()
    }
    for i in range(4):
        assert got[f"f{i}"] == 0.0
    assert got["good"] > 0.1
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_robots_crawl_delay_parse_and_default(spark):
    """Delay comes only from the * group (other agents' delays ignored),
    strictest wins on repeats, non-numeric values drop, absent directive
    or absent * group falls back to the default."""
    from sparkdu.crawl import robots_crawl_delay

    rows = [
        ("a.example", "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"),
        ("b.example",
         "User-agent: Fancy\nCrawl-delay: 9\n\nUser-agent: *\nDisallow: /\n"),
        ("c.example", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 4\n"),
        ("d.example", "User-agent: *\nCrawl-delay: soon\n"),
        ("e.example", "User-agent: Only\nDisallow: /\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots string")
    got = {r["host"]: r["crawl_delay"]
           for r in robots_crawl_delay(df, default_s=3.0).collect()}
    assert got == {"a.example": 2.5, "b.example": 3.0, "c.example": 4.0,
                   "d.example": 3.0, "e.example": 3.0}
    # one row per input host, even without any parseable directive
    assert len(got) == len(rows)


def test_fixture_robots_have_delays():
    """The regenerated fixture plants Crawl-delay on the i%3==1 hosts
    (fractional values included) so the schedule key exercises both the
    parsed and the default path."""
    from sparkdu.fixtures import gen_robots

    texts = dict(gen_robots())
    with_delay = {h for h, t in texts.items() if "Crawl-delay:" in t}
    assert with_delay  # some hosts have it
    assert len(with_delay) < len(texts)  # some fall back to the default
    assert any("." in t.split("Crawl-delay:")[1].split("\n")[0]
               for h, t in texts.items() if h in with_delay)


def test_redirect_ambiguous_source_is_deterministic(spark):
    """Two recorded targets for one source (refetched redirect) must not
    fan out through the doubling rounds: the resolver picks the smallest
    target and emits exactly ONE row per source."""
    from sparkdu.crawl import resolve_redirects

    edges = [("a", "b"), ("a", "c"), ("b", "end"), ("c", "c")]
    rows = resolve_redirects(
        spark.createDataFrame(edges, "src_url string, dst_url string")
    ).collect()
    got = {r["src_url"]: r for r in rows}
    assert len(rows) == len(got) == 3  # one row per distinct source
    assert got["a"]["final_url"] == "end"  # via min(b, c) = b
    assert got["a"]["n_hops"] == 2
    assert got["c"]["status"] == "exceeded"  # self-loop


def test_url_templates_uppercase_hex(spark):
    """Uppercase/mixed-case hex ids collapse too — a host emitting
    /S/DEADBEEF-style session ids still converges to one template."""
    from sparkdu.crawl import url_templates

    urls = [(f"http://up.example/s/DEADBEEFCAFE{i:04X}",) for i in range(12)]
    rows = url_templates(
        spark.createDataFrame(urls, "url string"), min_urls=10
    ).collect()
    assert len(rows) == 1
    assert rows[0]["template"] == "/s/{hex}"
    assert rows[0]["trap_suspect"] is True


def test_sitemap_fixture_has_malformed_lastmod():
    from sparkdu.fixtures import gen_robots, gen_sitemaps

    import pyarrow.parquet as pq2

    urls = pq2.read_table(
        os.path.join(FIXDIR, "pages.parquet"), columns=["url"]
    )["url"].to_pylist()
    xmls = "\n".join(x for _, x in gen_sitemaps(sorted(set(urls))))
    assert "<lastmod>around mid-january</lastmod>" in xmls
    # robots fixture: both integer and fractional delays planted
    delays = [t.split("Crawl-delay:")[1].split("\n")[0].strip()
              for _, t in gen_robots() if "Crawl-delay:" in t]
    assert any("." in d for d in delays) and any("." not in d for d in delays)


# ------------------------------------------------------- plan shapes


def test_bm25_plan_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject (per-
    partition partial top-k + one k-row merge), never a single-partition
    global Window sort."""
    from sparkdu.staging import bm25_topk

    docs = spark.createDataFrame(
        [(i, "table word") for i in range(10)], "doc_id long, text string"
    )
    plan = bm25_topk(docs, ("table",), 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_frontier_plan_no_cartesian(spark):
    """The frontier composition stays equi-join shaped end to end."""
    from sparkdu.crawl import frontier, robots_rules
    from sparkdu.fixtures import gen_robots

    cand = spark.createDataFrame(
        [("http://a.example/x", 1)], "url string, n_ref_hosts long"
    )
    crawled = spark.createDataFrame([("http://a.example/y",)], "url string")
    rules = robots_rules(
        spark.createDataFrame(gen_robots(), "host string, robots string")
    )
    plan = frontier(cand, crawled, rules)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --------------------------------------------------- property fuzzing


def _random_robots(rng):
    """Arbitrary-ish robots.txt: random directives, stacked UAs, junk
    lines, comments, empty values — the shapes a crawler actually sees."""
    lines = []
    for _ in range(rng.randint(0, 14)):
        r = rng.random()
        if r < 0.3:
            ua = rng.choice(["*", "FancyBot", "OtherBot"])
            lines.append(f"User-agent: {ua}")
        elif r < 0.55:
            seg = "/" + "".join(rng.choice("abc01/") for _ in range(rng.randint(0, 4)))
            lines.append(f"Disallow: {seg if rng.random() < 0.9 else ''}")
        elif r < 0.7:
            seg = "/" + "".join(rng.choice("abc01/") for _ in range(rng.randint(0, 4)))
            lines.append(f"Allow: {seg}")
        elif r < 0.8:
            lines.append(f"Crawl-delay: {rng.choice(['1', '2.5', 'soon', ''])}")
        elif r < 0.9:
            lines.append(f"# comment {rng.randint(0, 9)}")
        else:
            lines.append(rng.choice(["", "garbage line", "Sitemap: http://x/s.xml"]))
    return "\n".join(lines)


def test_robots_fuzz_differential(spark):
    """200 random robots payloads x 8 paths: the Spark join pipeline and
    the imperative Python evaluator must agree on EVERY decision."""
    import random

    rng = random.Random(1234)
    hosts = [(f"h{i}.example", _random_robots(rng)) for i in range(200)]
    paths = ["/", "/a", "/ab", "/abc", "/0", "/a/b", "/c1", "/zzz"]
    urls = [(f"http://{h}{p}",) for h, _ in hosts for p in paths]
    got = {
        r["url"]: (r["allowed"], r["rule_prefix"])
        for r in robots_allow(
            spark.createDataFrame(urls, "url string"),
            robots_rules(
                spark.createDataFrame(hosts, "host string, robots string")
            ),
        ).collect()
    }
    assert len(got) == len(urls)
    py_rules = {h: _py_robots_rules(t) for h, t in hosts}
    for h, _ in hosts:
        for p in paths:
            want = _py_decide(p, py_rules[h])
            u = f"http://{h}{p}"
            assert got[u] == (want[0], want[1]), (u, got[u], want)


def test_redirect_fuzz_differential(spark):
    """Random functional graphs (chains, cycles, self-loops, fan-ins):
    pointer doubling equals the per-source Python walk on every source,
    across several hop budgets."""
    import random

    from sparkdu.crawl import resolve_redirects

    rng = random.Random(99)
    nodes = [f"n{i}" for i in range(60)]
    edges = []
    for s in nodes:
        if rng.random() < 0.8:  # 20% of nodes are terminals
            edges.append((s, rng.choice(nodes)))
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    for budget in (4, 16):
        got = {
            r["src_url"]: (r["final_url"], r["n_hops"], r["status"])
            for r in resolve_redirects(df, max_hops=budget).collect()
        }
        assert got == _py_resolve(edges, max_hops=budget), budget
