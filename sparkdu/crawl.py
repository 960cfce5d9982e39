"""robots.txt politeness evaluation over crawl tables.

The crawl-side decision a web pipeline makes before fetching (and again
before including a cached capture): parse each host's robots.txt into
prefix rules for the wildcard agent, then decide every url by the
longest-matching rule, Allow winning length ties (the public semantics
documented in RFC 9309 / the Google robots spec). Implemented entirely
JVM-side: line explode + regexp directive parse, a running-sum window to
assign rule groups (consecutive stacked ``User-agent`` lines head ONE
group), and a host-equi join with a prefix predicate for the decision.

Scope, documented honestly: plain prefix rules only — ``*`` wildcards and
``$`` anchors inside rule paths are not expanded (the fixture generator
never emits them; a production build would compile such rules to Java
regexes in the same join). Directive names are case-insensitive; rule
paths are case-sensitive, per the spec.

Scale shape: robots tables are |hosts| rows (~10^8 at web scale) — the
parse is a pure map + one small window; the decision join is host-equi
(hash/SMJ on host, prefix test as a residual filter), with the rules side
orders of magnitude smaller than the url side and broadcast-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _star_directives(robots: DataFrame, host: str, txt: str) -> DataFrame:
    """Shared robots.txt group parse: (host, directive, value) rows for
    every directive inside a group that applies to the wildcard agent
    ``*``. Comments strip at ``#``; blank/alien lines drop; a group is
    the run of directives after one or more consecutive ``User-agent``
    lines and applies to ``*`` iff any of those stacked lines names it.
    Both robots consumers (rules, crawl-delay) MUST use this one parse
    so group semantics can never diverge between them."""
    lines = robots.select(
        F.col(host).alias("host"),
        F.posexplode(F.split(F.col(txt), "\n")).alias("ln", "raw"),
    )
    clean = F.trim(F.regexp_replace("raw", "#.*", ""))
    parsed = lines.select(
        "host",
        "ln",
        F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)\s*:", 1)).alias(
            "directive"
        ),
        F.trim(F.regexp_extract(clean, r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(F.col("directive") != "")
    w = Window.partitionBy("host").orderBy("ln")
    grouped = (
        parsed.withColumn("is_ua", F.col("directive") == "user-agent")
        .withColumn(
            "grp",
            F.sum(
                F.when(
                    F.col("is_ua")
                    & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
                    1,
                ).otherwise(0)
            ).over(w),
        )
    )
    star = (
        grouped.filter(F.col("is_ua") & (F.col("value") == "*"))
        .select("host", "grp")
        .distinct()
    )
    return grouped.join(star, ["host", "grp"]).select(
        "host", "directive", "value"
    )


def robots_rules(robots: DataFrame, host: str = "host",
                 txt: str = "robots") -> DataFrame:
    """Parse robots.txt payloads into (host, is_allow, prefix, plen) rules
    applying to the wildcard agent ``*`` (group semantics:
    _star_directives). Empty rule values ("Disallow:" = allow
    everything) are not rules.
    """
    return (
        _star_directives(robots, host, txt)
        .filter(
            F.col("directive").isin("allow", "disallow")
            & (F.col("value") != "")
        )
        .select(
            "host",
            (F.col("directive") == "allow").alias("is_allow"),
            F.col("value").alias("prefix"),
            F.length("value").alias("plen"),
        )
    )


def robots_allow(urls: DataFrame, rules: DataFrame,
                 url: str = "url") -> DataFrame:
    """Decide every url against the parsed rules.

    Longest matching prefix wins; Allow beats Disallow at equal length;
    no matching rule (or no ``*`` group for the host) means allowed.
    Returns (url, path, allowed, rule_prefix, rule_type).
    """
    path_re = r"^https?://[^/]+(/.*)$"
    raw_path = F.regexp_extract(url, path_re, 1)
    u = urls.select(
        F.col(url).alias("url"),
        F.regexp_extract(url, r"^https?://([^/]+)", 1).alias("u_host"),
        F.when(raw_path == "", "/").otherwise(raw_path).alias("path"),
    )
    m = u.join(
        rules,
        (u.u_host == rules.host) & u.path.startswith(rules.prefix),
        "left",
    )
    w = Window.partitionBy("url").orderBy(
        F.col("plen").desc(),
        F.col("is_allow").cast("int").desc(),
        F.col("prefix"),
    )
    best = m.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return best.select(
        "url",
        "path",
        F.coalesce("is_allow", F.lit(True)).alias("allowed"),
        F.col("prefix").alias("rule_prefix"),
        F.when(F.col("prefix").isNull(), F.lit(None).cast("string"))
        .when(F.col("is_allow"), F.lit("allow"))
        .otherwise(F.lit("disallow"))
        .alias("rule_type"),
    )


def frontier(candidates: DataFrame, crawled: DataFrame, rules: DataFrame,
             per_host_k: int = 5) -> DataFrame:
    """Build the next politeness-bounded fetch batch from discovered links.

    candidates: (url, n_ref_hosts) — discovered targets with a priority
    signal (how many distinct hosts link there). crawled: (url) — already
    fetched. rules: robots_rules() output. Pipeline: drop known urls
    (left-anti join — at web scale the crawled side is the big one, so
    this is the shuffle), drop robots-denied urls, then keep the top-k
    per destination host by (n_ref_hosts desc, url) — the per-host
    politeness budget a frontier scheduler enforces so one mega-host
    can't monopolize a fetch wave. Returns (host, url, n_ref_hosts, rk).

    Scale shape: one anti-join shuffle on url, the robots decision join
    on host (rules side broadcast-able), and a per-host WindowGroupLimit
    — rank k prunes before the final sort, so the window never
    materializes more than k rows per host per partition.
    """
    fresh = candidates.join(crawled.select("url"), "url", "left_anti")
    allowed = (
        robots_allow(fresh.select("url"), rules)
        .filter(F.col("allowed"))
        .select("url")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_ref_hosts").desc(), "url"
    )
    return (
        fresh.join(allowed, "url")
        .withColumn(
            "host", F.regexp_extract("url", r"^https?://([^/]+)", 1)
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_host_k)
        .select("host", "url", "n_ref_hosts", "rk")
    )


def recrawl_priority(pages: DataFrame, url: str = "url",
                     html: str = "html", ts: str = "warc_ts") -> DataFrame:
    """Per-url revisit statistics from the capture history: capture
    count, distinct payload versions (raw-byte compare, no decode), the
    observed change rate (version transitions / recrawl opportunities;
    single-capture urls report 0), and the latest capture time. One
    groupBy on url — at web scale this shuffles (url, payload-hash)
    pairs from the capture index, never the payloads."""
    return pages.groupBy(F.col(url).alias("url")).agg(
        F.count("*").alias("n_captures"),
        F.count_distinct(html).alias("n_versions"),
        F.round(
            (F.count_distinct(html) - 1)
            / F.greatest(F.count("*") - 1, F.lit(1)),
            6,
        ).alias("change_rate"),
        F.max(ts).alias("last_ts"),
    )


def resolve_redirects(edges: DataFrame, max_hops: int = 16,
                      src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """Resolve every redirect source to its final landing url by pointer
    doubling: each round composes the current successor table with
    itself, so a chain of length L resolves in ceil(log2(L)) rounds of
    one self-join each — the scale-correct form of redirect-chain
    walking (a naive per-hop loop is O(max_hops) shuffles; this is
    O(log max_hops), 4 joins for the standard 16-hop budget).

    Each redirect source has exactly one successor (a url redirects to
    one place), so the successor table is a functional graph; cycles and
    chains longer than max_hops exhaust the budget and report
    status='exceeded' with null final_url/n_hops — the "too many
    redirects" a fetcher raises. Returns (src_url, final_url, n_hops,
    status).
    """
    import math

    # enforce the functional-graph invariant: real crawl logs can record
    # the same source redirecting to different targets across fetches;
    # without a per-source dedup every doubling round would MULTIPLY the
    # ambiguous rows (exponentially inside cycles). Deterministic pick:
    # lexicographically smallest target (a deployment would keep the
    # latest fetch's edge).
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("nxt"))
        .groupBy("u")
        .agg(F.min("nxt").alias("nxt"))
    )
    srcs = e.select(F.col("u").alias("s")).distinct()
    cur = (
        e.join(srcs, e.nxt == srcs.s, "left")
        .select(
            "u",
            "nxt",
            F.col("s").isNull().alias("done"),
            F.lit(1).alias("hops"),
        )
    )
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        m = cur.select(
            F.col("u").alias("m_u"),
            F.col("nxt").alias("m_nxt"),
            F.col("done").alias("m_done"),
            F.col("hops").alias("m_hops"),
        )
        # done rows pass through; live rows jump to their successor's
        # successor, inheriting its done flag and accumulated hop count
        cur = (
            cur.join(m, cur.nxt == m.m_u, "left")
            .select(
                "u",
                F.when(F.col("done") | F.col("m_u").isNull(), F.col("nxt"))
                .otherwise(F.col("m_nxt"))
                .alias("nxt"),
                (
                    F.col("done")
                    | F.col("m_u").isNull()
                    | F.col("m_done")
                ).alias("done"),
                F.when(F.col("done") | F.col("m_u").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("m_hops"))
                .alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    ok = F.col("done") & (F.col("hops") <= max_hops)
    return cur.select(
        F.col("u").alias("src_url"),
        F.when(ok, F.col("nxt")).alias("final_url"),
        F.when(ok, F.col("hops").cast("int")).alias("n_hops"),
        F.when(ok, F.lit("landed")).otherwise(F.lit("exceeded")).alias(
            "status"
        ),
    )


def url_templates(urls: DataFrame, url: str = "url",
                  min_frac: float = 0.5, min_urls: int = 10) -> DataFrame:
    """URL template mining / crawler-trap detection: collapse each url's
    path to a template (hex runs of 8+ -> {hex} BEFORE digit runs -> {n},
    so a 32-char session id never splits into digit fragments), count
    urls per (host, template), and flag templates that dominate a host —
    the calendar/session-id/pagination shapes a frontier rate-limits.
    Returns (host, template, n_urls, host_urls, frac, trap_suspect)."""
    path = F.regexp_extract(url, r"^https?://[^/]+(/.*)$", 1)
    seg = urls.select(F.col(url).alias("url")).distinct().select(
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_replace(
            F.regexp_replace(
                F.when(path == "", "/").otherwise(path),
                r"[0-9a-fA-F]{8,}", "{hex}",
            ),
            r"[0-9]+", "{n}",
        ).alias("template"),
    )
    counts = seg.groupBy("host", "template").agg(
        F.count("*").alias("n_urls")
    )
    tot = counts.groupBy("host").agg(F.sum("n_urls").alias("host_urls"))
    frac = F.col("n_urls") / F.col("host_urls")
    return counts.join(tot, "host").select(
        "host",
        "template",
        "n_urls",
        "host_urls",
        F.round(frac, 6).alias("frac"),
        ((frac > min_frac) & (F.col("n_urls") >= min_urls)).alias(
            "trap_suspect"
        ),
    )


def sitemap_gap(sitemaps: DataFrame, pages: DataFrame,
                host: str = "host", xml: str = "sitemap") -> DataFrame:
    """Sitemap-vs-crawl freshness audit: parse every <url> entry (loc +
    optional lastmod) out of each host's sitemap.xml with JVM regexes
    ((?s) so entries spanning lines match), join against the latest
    capture per url, and classify: 'uncrawled' (declared, never
    fetched), 'stale' (lastmod after the last capture), 'fresh'
    (lastmod at/before it), 'unknown' (no lastmod). Returns (host, url,
    lastmod, last_crawl, status) — the recrawl planner's sitemap-driven
    complement to crawl_recrawl_priority's history-driven signal.

    Scale shape: sitemap tables are |hosts| rows; the parse is a pure
    map + explode. The join key is url against the capture index's
    latest-per-url aggregate — one shuffle each side, sitemap side tiny.
    """
    ents = sitemaps.select(
        F.col(host).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml), F.lit(r"(?s)<url>.*?</url>"), 0
            )
        ).alias("e"),
    )
    lastmod_raw = F.regexp_extract("e", "<lastmod>([^<]*)</lastmod>", 1)
    parsed = ents.select(
        "host",
        F.regexp_extract("e", "<loc>([^<]*)</loc>", 1).alias("url"),
        F.when(lastmod_raw == "", None).otherwise(lastmod_raw).alias(
            "lastmod"
        ),
    )
    crawl = pages.groupBy("url").agg(F.max("warc_ts").alias("last_crawl"))
    j = parsed.join(crawl, "url", "left")
    # try_to_timestamp: ANSI to_timestamp THROWS on a malformed lastmod
    # (real sitemaps contain them); unparseable dates classify 'unknown'
    lm_ts = F.try_to_timestamp(F.col("lastmod"))
    status = (
        F.when(F.col("last_crawl").isNull(), "uncrawled")
        .when(F.col("lastmod").isNull() | lm_ts.isNull(), "unknown")
        .when(lm_ts > F.col("last_crawl"), "stale")
        .otherwise("fresh")
    )
    return j.select(
        "host", "url", "lastmod", "last_crawl", status.alias("status")
    )


def robots_crawl_delay(robots: DataFrame, default_s: float = 1.0,
                       host: str = "host", txt: str = "robots") -> DataFrame:
    """Extract the wildcard-agent Crawl-delay (seconds) per host, using
    the same line/group parse as robots_rules; hosts whose ``*`` group
    has no Crawl-delay (or no ``*`` group at all) get `default_s`. If a
    group repeats the directive, the strictest (max) applies. Returns
    one row per input host: (host, crawl_delay)."""
    delays = (
        _star_directives(robots, host, txt)
        .filter(F.col("directive") == "crawl-delay")
        # try_cast: ANSI mode makes plain cast THROW on junk like
        # "Crawl-delay: soon"; the spec-correct behavior is to ignore it
        .select("host", F.col("value").try_cast("double").alias("d"))
        .filter(F.col("d").isNotNull())
        .groupBy("host")
        .agg(F.max("d").alias("d"))
    )
    return robots.select(F.col(host).alias("host")).join(
        delays, "host", "left"
    ).select(
        "host", F.coalesce("d", F.lit(float(default_s))).alias("crawl_delay")
    )
