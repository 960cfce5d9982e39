"""WAT-analogue transforms over raw HTML pages: head metadata, outlinks,
frontier discovery.

CommonCrawl derives three record families from a crawl: WET (main text —
the extraction pipeline in sparkdu.api), WAT (per-page metadata +
outlinks — this module), and CDX (capture index — sparkdu.warc). Every
transform here is a pure JVM map (regexp_extract / replace / CASE inside
whole-stage codegen): zero Python, zero shuffle until a consumer
aggregates, so at 100 TB these run at scan speed beside the text pass
and the link-graph shuffle is the consumer's choice of key.

Shared regex dialect: every pattern is valid and EQUIVALENT in Java
regex (Spark) and RE2 (DuckDB) — inline (?is) flags, lazy ``.*?``,
``[^>]`` tag-local scans — so the harness oracles run the identical
patterns (sparkdu/staging.py builds the SQL from these constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- head metadata (extract_doc_meta) --------------------------------
# Field regexes run over the <head> substring only (body decoys must
# never leak); LANG runs over the whole document (the <html> tag sits
# outside <head>).
HEAD = r"(?is)<head[^>]*>(.*?)</head>"
TITLE = r"(?is)<title[^>]*>(.*?)</title>"
DESC_F = r"""(?is)<meta\s[^>]*name\s*=\s*["']description["'][^>]*content\s*=\s*["']([^"']*)["']"""
DESC_R = r"""(?is)<meta\s[^>]*content\s*=\s*["']([^"']*)["'][^>]*name\s*=\s*["']description["']"""
CANON_F = r"""(?is)<link\s[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*["']([^"']*)["']"""
CANON_R = r"""(?is)<link\s[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["']canonical["']"""
OG_F = r"""(?is)<meta\s[^>]*property\s*=\s*["']og:title["'][^>]*content\s*=\s*["']([^"']*)["']"""
OG_R = r"""(?is)<meta\s[^>]*content\s*=\s*["']([^"']*)["'][^>]*property\s*=\s*["']og:title["']"""
LANG = r"""(?is)<html\s[^>]*lang\s*=\s*["']([^"']*)["']"""
CHARSET = r"""(?i)<meta\s+charset\s*=\s*["']?([A-Za-z0-9_-]+)"""

# minimal-entity unescape, &amp; LAST so "&amp;lt;" decodes to "&lt;"
ENTS = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&")]

META_FIELDS = ["title", "meta_description", "canonical_url",
               "og_title", "html_lang", "charset"]

# ---- outlinks (extract_outlinks) --------------------------------------
COMMENT = r"(?s)<!--.*?-->"
ANCHOR = r"""(?is)<a\s[^>]*href\s*=\s*["'][^"']*["'][^>]*>.*?</a>"""
HREF = r"""(?is)<a\s[^>]*href\s*=\s*["']([^"']*)["']"""
ATEXT = r"(?is)>(.*?)</a>"
SCHEME = r"^(https?)://"
HOST = r"^https?://([^/]+)"
BASE = r"^(https?://.*/)"
DOTDOT = r"/[^/]+/\.\./"
# bounded dot-segment removal: sane web paths never nest ../ deeper than
# this; each pass removes one level everywhere in the string
DOT_PASSES = 4


def _unesc(c):
    for a, b in ENTS:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def _norm(c):
    return F.trim(F.regexp_replace(_unesc(c), r"\s+", " "))


def _pick(scope, fwd, rev):
    """Forward attribute order, falling back to reversed."""
    return F.coalesce(
        F.nullif(F.regexp_extract(scope, fwd, 1), F.lit("")),
        F.regexp_extract(scope, rev, 1),
    )


def doc_meta(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per page of head metadata: title,
    meta description, canonical url, og:title, html lang, declared
    charset ('' when absent) + completeness count. Single codegen map."""
    h = F.col("html").cast("string")
    head = F.regexp_extract(h, HEAD, 1)
    fields = pages.select(
        "url",
        _norm(F.regexp_extract(head, TITLE, 1)).alias("title"),
        _norm(_pick(head, DESC_F, DESC_R)).alias("meta_description"),
        F.trim(_pick(head, CANON_F, CANON_R)).alias("canonical_url"),
        _norm(_pick(head, OG_F, OG_R)).alias("og_title"),
        F.lower(F.trim(F.regexp_extract(h, LANG, 1))).alias("html_lang"),
        F.lower(F.regexp_extract(head, CHARSET, 1)).alias("charset"),
    )
    present = sum((F.col(c) != "").cast("int") for c in META_FIELDS)
    return fields.withColumn("n_meta_fields", present)


def outlinks(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per navigational anchor with the
    reference RESOLVED against the page url (RFC 3986-lite: absolute /
    protocol-relative / root-relative / path-relative; fragment
    stripped; ./ and bounded ../ removed; empty, #-only, mailto:,
    javascript: dropped; comments stripped first) + cross-host flag.
    One codegen map ending in a generate — still no shuffle."""
    h = F.regexp_replace(F.col("html").cast("string"), COMMENT, "")
    anchors = pages.select(
        "url", F.explode(F.regexp_extract_all(h, F.lit(ANCHOR), 0)).alias("elem")
    )
    parts = anchors.select(
        "url",
        F.trim(_unesc(F.regexp_extract("elem", HREF, 1))).alias("href"),
        F.trim(F.regexp_replace(
            _unesc(F.regexp_extract("elem", ATEXT, 1)), r"\s+", " ")
        ).alias("anchor_text"),
        F.regexp_extract("url", SCHEME, 1).alias("scheme"),
        F.regexp_extract("url", HOST, 1).alias("host"),
    ).withColumn(
        "base",
        F.coalesce(
            F.nullif(F.regexp_extract("url", BASE, 1), F.lit("")),
            F.concat(F.col("scheme"), F.lit("://"), F.col("host"), F.lit("/")),
        ),
    )
    resolved = parts.filter(
        (F.col("href") != "")
        & ~F.col("href").startswith("#")
        & ~F.col("href").rlike(r"(?i)^(mailto|javascript):")
    ).withColumn(
        "dst0",
        F.when(F.col("href").rlike(r"(?i)^https?://"), F.col("href"))
        .when(F.col("href").startswith("//"),
              F.concat(F.col("scheme"), F.lit(":"), F.col("href")))
        .when(F.col("href").startswith("/"),
              F.concat(F.col("scheme"), F.lit("://"), F.col("host"),
                       F.col("href")))
        .otherwise(F.concat(F.col("base"), F.col("href"))),
    )
    dst = F.replace(F.regexp_replace(F.col("dst0"), "#.*$", ""),
                    F.lit("/./"), F.lit("/"))
    for _ in range(DOT_PASSES):
        dst = F.regexp_replace(dst, DOTDOT, "/")
    return resolved.select(
        "url",
        dst.alias("dst_url"),
        "anchor_text",
        (F.regexp_extract(dst, HOST, 1) != F.col("host"))
        .cast("int").alias("external"),
    )


def frontier_hosts(ol: DataFrame, crawled: DataFrame) -> DataFrame:
    """Outlinks x crawled-url ledger -> per-host frontier stats over the
    UNCRAWLED destinations (left-anti join on the resolved url). At
    fixture scale AQE broadcasts the anti-join; at 100 TB the ledger
    side is a bloom prefilter or a bucketed MERGE key, never a full
    broadcast. The aggregate map-side-combines before its one shuffle.

    ``crawled`` must expose the ledger urls in a column named url."""
    frontier = ol.join(
        crawled.select(F.col("url").alias("dst_url")), "dst_url", "left_anti"
    )
    return (
        frontier
        .withColumn("dst_host", F.regexp_extract("dst_url", HOST, 1))
        .groupBy("dst_host")
        .agg(
            F.countDistinct("dst_url").alias("n_frontier_urls"),
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("url").alias("n_referring_pages"),
        )
    )
