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
``[^>]`` tag-local scans, NO lookarounds and NO backreferences (RE2 has
neither) — so the harness oracles run the identical patterns
(sparkdu/staging.py builds the SQL from these constants).

Quoting: attribute VALUES are captured with per-quote-style patterns
("([^"]*)" tried before '([^']*)') so a value containing the other
quote character is captured whole, never truncated at it. Attribute-name
DELIMITERS (e.g. ["']description["']) keep the loose two-char class —
the literal between them contains no quotes, so mismatched delimiters
there can only accept malformed markup, never corrupt a value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- head metadata (doc_meta) ----------------------------------------
# Comments are stripped FIRST (a commented-out <title>/<meta> is not
# live metadata); field regexes then run over the <head> substring only
# (body decoys must never leak); LANG runs over the whole stripped
# document (the <html> tag sits outside <head>).
COMMENT = r"(?s)<!--.*?-->"
HEAD = r"(?is)<head[^>]*>(.*?)</head>"
TITLE = r"(?is)<title[^>]*>(.*?)</title>"


def _attr_pats(tag: str, key_attr: str, key_val: str, val_attr: str) -> list:
    """The four patterns for <tag key_attr=key_val ... val_attr=VALUE>:
    forward / reversed attribute order x double / single quoted value,
    tried in that order (first non-empty capture wins)."""
    key = f"""{key_attr}\\s*=\\s*["']{key_val}["']"""
    return [
        f"""(?is)<{tag}\\s[^>]*{key}[^>]*{val_attr}\\s*=\\s*"([^"]*)\"""",
        f"""(?is)<{tag}\\s[^>]*{key}[^>]*{val_attr}\\s*=\\s*'([^']*)'""",
        f"""(?is)<{tag}\\s[^>]*{val_attr}\\s*=\\s*"([^"]*)"[^>]*{key}""",
        f"""(?is)<{tag}\\s[^>]*{val_attr}\\s*=\\s*'([^']*)'[^>]*{key}""",
    ]


DESC_PATS = _attr_pats("meta", "name", "description", "content")
CANON_PATS = _attr_pats("link", "rel", "canonical", "href")
OG_PATS = _attr_pats("meta", "property", "og:title", "content")
LANG_PATS = [r"""(?is)<html\s[^>]*lang\s*=\s*"([^"]*)\"""",
             r"""(?is)<html\s[^>]*lang\s*=\s*'([^']*)'"""]
CHARSET = r"""(?i)<meta\s+charset\s*=\s*["']?([A-Za-z0-9_-]+)"""

# minimal-entity unescape, &amp; LAST so "&amp;lt;" decodes to "&lt;"
ENTS = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&")]

META_FIELDS = ["title", "meta_description", "canonical_url",
               "og_title", "html_lang", "charset"]

# ---- outlinks ---------------------------------------------------------
# A "tag token": one unquoted non-delimiter char, or a whole quoted
# string consumed atomically — so a '>' inside a quoted attribute value
# can never terminate the opening tag early (before OR after href).
_TOK = """(?:[^>"']|"[^"]*"|'[^']*')"""
ANCHOR = (r"(?is)<a\s" + _TOK
          + r"""*?href\s*=\s*("[^"]*"|'[^']*'|[^\s>"']+)"""
          + _TOK + r"*>.*?</a>")
# value capture per quote style, quoted tried first, then unquoted
# (<a href=/x> is valid HTML)
HREF_PATS = [r"(?is)<a\s" + _TOK + r"""*?href\s*=\s*"([^"]*)\"""",
             r"(?is)<a\s" + _TOK + r"""*?href\s*=\s*'([^']*)'""",
             r"(?is)<a\s" + _TOK + r"""*?href\s*=\s*([^\s>"']+)"""]
ATEXT = r"(?is)<a\s" + _TOK + r"*?>(.*?)</a>"
# any scheme-shaped prefix; only http(s) is navigational for us
ANY_SCHEME = r"(?i)^[a-z][a-z0-9+.-]*:"
HTTP_ABS = r"(?i)^https?://"
SCHEME = r"(?i)^(https?)://"
HOST = r"(?i)^https?://([^/]+)"
# resolution base = page url through its last PATH slash (query and
# fragment excluded — RFC 3986 merges against the path only)
BASE = r"(?i)^(https?://[^?#]*/)"
QUERY = r"(\?.*)$"
PRE_QUERY = r"^([^?]*)"
AUTHORITY = r"(?i)^(https?://[^/?#]*)"
AUTH_STRIP = r"(?i)^https?://[^/?#]*"
DOTDOT = r"/[^/]+/\.\./"
DOTSLASH = r"/\./"
# excess '..' at the root is dropped (RFC 3986 5.2.4), never allowed to
# climb into (and delete) the authority
ROOT_DOTDOT = r"^/\.\./"
# bounded dot-segment removal: sane web paths never nest ../ deeper than
# this; each pass removes one level everywhere (and one /./ overlap)
DOT_PASSES = 4


def _unesc(c):
    for a, b in ENTS:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def _norm(c):
    return F.trim(F.regexp_replace(_unesc(c), r"\s+", " "))


def _pick(scope, pats):
    """First non-empty capture across the pattern list."""
    return F.coalesce(
        *[F.nullif(F.regexp_extract(scope, p, 1), F.lit("")) for p in pats],
        F.lit(""),
    )


def _html_str():
    """html binary -> comment-stripped string; NULL html is an empty
    document, never a NULL row (totality contract)."""
    return F.regexp_replace(
        F.coalesce(F.col("html").cast("string"), F.lit("")), COMMENT, "")


def doc_meta(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per page of head metadata: title,
    meta description, canonical url, og:title, html lang, declared
    charset ('' when absent) + completeness count. Single codegen map."""
    h = _html_str()
    head = F.regexp_extract(h, HEAD, 1)
    fields = pages.select(
        "url",
        _norm(F.regexp_extract(head, TITLE, 1)).alias("title"),
        _norm(_pick(head, DESC_PATS)).alias("meta_description"),
        # hrefs are attribute values too: entity-unescape (valid HTML
        # writes & in a query string as &amp;), same as outlink hrefs
        F.trim(_unesc(_pick(head, CANON_PATS))).alias("canonical_url"),
        _norm(_pick(head, OG_PATS)).alias("og_title"),
        F.lower(F.trim(_pick(h, LANG_PATS))).alias("html_lang"),
        F.lower(F.regexp_extract(head, CHARSET, 1)).alias("charset"),
    )
    present = sum((F.col(c) != "").cast("int") for c in META_FIELDS)
    return fields.withColumn("n_meta_fields", present)


def outlinks(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> one row per navigational anchor with the
    reference RESOLVED against the page url (RFC 3986-lite: absolute
    http(s) / protocol-relative / root-relative / path-relative;
    fragment stripped; ./ and bounded ../ removed from the PATH only;
    empty, #-only, and every non-http(s) scheme — mailto:, javascript:,
    tel:, data:, ftp:, ... — dropped; comments stripped first) + a
    case-insensitive cross-host flag. One codegen map ending in a
    generate — still no shuffle."""
    anchors = pages.select(
        "url",
        F.explode(F.regexp_extract_all(_html_str(), F.lit(ANCHOR), 0))
        .alias("elem"),
    )
    parts = anchors.select(
        "url",
        F.trim(_unesc(_pick(F.col("elem"), HREF_PATS))).alias("href"),
        F.trim(F.regexp_replace(
            _unesc(F.regexp_extract("elem", ATEXT, 1)), r"\s+", " ")
        ).alias("anchor_text"),
        F.lower(F.regexp_extract("url", SCHEME, 1)).alias("scheme"),
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
        & (F.col("href").rlike(HTTP_ABS) | ~F.col("href").rlike(ANY_SCHEME))
    ).withColumn(
        "dst0",
        F.when(F.col("href").rlike(HTTP_ABS), F.col("href"))
        .when(F.col("href").startswith("//"),
              F.concat(F.col("scheme"), F.lit(":"), F.col("href")))
        .when(F.col("href").startswith("/"),
              F.concat(F.col("scheme"), F.lit("://"), F.col("host"),
                       F.col("href")))
        .otherwise(F.concat(F.col("base"), F.col("href"))),
    )
    defrag = F.regexp_replace(F.col("dst0"), "#.*$", "")
    pre = F.regexp_extract(defrag, PRE_QUERY, 1)
    # dot cleanup runs on the PATH alone: the authority is split off
    # first so '..' can never climb into (and delete) the hostname, and
    # excess root-level '..' is dropped per RFC 3986 5.2.4
    auth = F.regexp_extract(pre, AUTHORITY, 1)
    path = F.regexp_replace(pre, AUTH_STRIP, "")
    for _ in range(DOT_PASSES):
        path = F.regexp_replace(
            F.regexp_replace(F.regexp_replace(path, DOTSLASH, "/"),
                             DOTDOT, "/"),
            ROOT_DOTDOT, "/")
    dst = F.concat(auth, path, F.regexp_extract(defrag, QUERY, 1))
    return resolved.select(
        "url",
        dst.alias("dst_url"),
        "anchor_text",
        (F.lower(F.regexp_extract(dst, HOST, 1)) != F.lower(F.col("host")))
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
        .withColumn("dst_host",
                    F.lower(F.regexp_extract("dst_url", HOST, 1)))
        .groupBy("dst_host")
        .agg(
            F.countDistinct("dst_url").alias("n_frontier_urls"),
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("url").alias("n_referring_pages"),
        )
    )
