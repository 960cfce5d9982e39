"""REAL WARC/1.0 ingest (ISO 28500 / WARC 1.0, the PUBLIC spec Common
Crawl shards follow) — the authentic container format behind the engine's
Common-Crawl-style pages table, complementing the custom `warcish`
DataSource (sparkdu/sources.py) the way the PDF/PAGE-XML legs complement
the HTML leg: a from-scratch parser for the wire format real crawl dumps
arrive in.

Implemented subset, all from the public spec:

- record grammar: ``WARC/1.0 CRLF`` version line, named header fields
  (``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``, ``Content-Type``,
  ``Content-Length`` — the framing authority), LWS continuation-line
  folding (ISO 28500 header grammar), ``CRLF`` blank line, exactly
  Content-Length block bytes, ``CRLF CRLF`` record terminator;
  ``WARC-Date`` is validated against WARC 1.0 §5.4's uniform
  ``YYYY-MM-DDThh:mm:ssZ`` form INCLUDING calendar validity at parse
  time, so timestamp conversion downstream is total;
- record types: ``warcinfo``, ``request``, ``response`` (others parse and
  carry their type through);
- HTTP payload extraction for ``application/http; msgtype=response``
  blocks: status line (``HTTP/1.x <code> <reason>``), response headers,
  ``CRLF CRLF``, then the entity body — the (url, timestamp, html) the
  extraction pipeline consumes;
- per-record gzip members (the Common-Crawl on-disk layout: each record
  an independent gzip stream, members concatenated so shards stay
  seekable): member-wise inflate via stdlib zlib (wbits=31) using
  ``unused_data`` to find member boundaries — no codec library.

Fail-whole per SHARD, the same contract as the PDF/PAGE-XML/AV decoders:
a bad version line, a missing mandatory header, a Content-Length that
overruns the buffer, a broken record terminator, or a corrupt gzip member
rejects the whole shard (None / no rows) — a partially-ingested crawl
shard silently drops documents, which at 10^12-document scale is an
invisible coverage hole, not an error message.

Scale shape: one vectorized mapInPandas over the binary shard column,
zero exchanges; the unit of parallelism is the shard (like the ~1 GB
paths in a real crawl), so cluster scaling is pure partition count.
"""

from __future__ import annotations

import datetime
import hashlib
import random
import re
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .fixtures import SEED_BASE

CRLF = b"\r\n"

# WARC 1.0 §5.4: a uniform fourteen-digit UTC timestamp, no variants
_WARC_DATE = re.compile(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$")

WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("url", T.StringType()),          # WARC-Target-URI
        T.StructField("warc_date", T.StringType()),    # ISO 8601 Z
        T.StructField("status", T.IntegerType()),      # HTTP status or null
        T.StructField("mime", T.StringType()),         # payload Content-Type
        T.StructField("n_body", T.IntegerType()),      # entity body bytes
        T.StructField("body_sha", T.StringType()),     # sha256 hex, 16 chars
        T.StructField("offset", T.LongType()),         # seek domain: raw
        T.StructField("length", T.IntegerType()),      # or gzip-member
    ]
)


def _gunzip_members(b: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext; raises on a
    corrupt or truncated member (fail-whole)."""
    out = bytearray()
    rest = b
    while rest:
        d = zlib.decompressobj(31)
        out += d.decompress(rest)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member")
        rest = d.unused_data
    return bytes(out)


def _parse_headers(b: bytes, i: int) -> tuple:
    """Named header fields until the blank CRLF -> (dict, next_i).
    Header names are case-insensitive per spec; keys are lowercased.
    Lines starting with SP/HT are LWS continuations (ISO 28500 header
    folding, same grammar as classic HTTP obs-fold): joined onto the
    previous field's value with a single space. A continuation before
    any field is malformed (fail-whole)."""
    headers: dict = {}
    last: Optional[str] = None
    while True:
        j = b.index(CRLF, i)
        line = b[i:j]
        i = j + 2
        if not line:
            return headers, i
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise ValueError("continuation line before any header")
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        k = line.index(b":")
        last = line[:k].strip().lower().decode("ascii")
        headers[last] = line[k + 1 :].strip().decode("latin-1")


def _parse_http_response(block: bytes) -> tuple:
    """application/http; msgtype=response block ->
    (status:int, mime:str, body:bytes)."""
    j = block.index(CRLF)
    status_line = block[:j]
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/1."):
        raise ValueError("bad HTTP status line")
    status = int(parts[1])
    headers, i = _parse_headers(block, j + 2)
    mime = headers.get("content-type", "").split(";")[0].strip()
    return status, mime, block[i:]


def _iter_members(b: bytes) -> list:
    """Member-gzip shard -> [(comp_offset, comp_length, plain_bytes)];
    raises on a corrupt/truncated member (fail-whole). Offsets are in the
    COMPRESSED file — the domain a range request seeks in."""
    out = []
    pos = 0
    rest = b
    while rest:
        d = zlib.decompressobj(31)
        plain = d.decompress(rest) + d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member")
        consumed = len(rest) - len(d.unused_data)
        out.append((pos, consumed, plain))
        pos += consumed
        rest = d.unused_data
    return out


def _parse_records(b: bytes) -> list:
    """Records from a plain byte run, each stamped with its raw-domain
    (offset, length). Raises on any malformation."""
    recs = []
    i = 0
    n = len(b)
    while i < n:
        start = i
        j = b.index(CRLF, i)
        if b[i:j] != b"WARC/1.0":
            raise ValueError("bad WARC version line")
        headers, i = _parse_headers(b, j + 2)
        for req in ("warc-type", "warc-record-id", "warc-date",
                    "content-length"):
            if req not in headers:
                raise ValueError(f"missing mandatory header {req}")
        m = _WARC_DATE.match(headers["warc-date"])
        if not m:
            raise ValueError("bad WARC-Date (WARC 1.0 mandates uniform "
                             "YYYY-MM-DDThh:mm:ssZ)")
        # full calendar validation (rejects e.g. 2026-02-30T25:00:00Z) so
        # every date that survives the parse is total for downstream
        # strptime — a malformed date must fail the SHARD here, not kill
        # the whole Spark job inside warc_pages
        datetime.datetime(int(m[1]), int(m[2]), int(m[3]),
                          int(m[4]), int(m[5]), int(m[6]))
        clen = int(headers["content-length"])
        block = b[i : i + clen]
        if len(block) != clen:
            raise ValueError("Content-Length overruns shard")
        i += clen
        if b[i : i + 4] != CRLF + CRLF:
            raise ValueError("bad record terminator")
        i += 4
        rtype = headers["warc-type"]
        status = mime = body = None
        n_body = body_sha = None
        if (rtype in ("response", "revisit")
                and headers.get("content-type", "")
                .startswith("application/http")):
            status, mime, body = _parse_http_response(block)
            if rtype == "revisit":
                # revisit (ISO 28500 §6.7.2, identical-payload-digest
                # profile): HTTP headers only, NO entity body — the
                # payload digest is DECLARED in WARC-Payload-Digest, to
                # be resolved against the original capture by join
                if body:
                    raise ValueError("revisit record carries a body")
                body = None
                digest = headers.get("warc-payload-digest", "")
                if not digest.startswith("sha256:"):
                    raise ValueError("revisit without sha256 payload digest")
                body_sha = digest.split(":", 1)[1]
            else:
                n_body = len(body)
                body_sha = hashlib.sha256(body).hexdigest()[:16]
        recs.append({
            "rec_idx": len(recs),
            "rec_type": rtype,
            "url": headers.get("warc-target-uri"),
            "warc_date": headers["warc-date"],
            "status": status,
            "mime": mime,
            "n_body": n_body,
            "body_sha": body_sha,  # computed (response) / declared (revisit)
            "offset": start,
            "length": i - start,
            "_body": body,
        })
    return recs


def parse_warc(b: bytes) -> Optional[list]:
    """Parse one WARC shard -> list of record dicts (WARC_RECORDS_SCHEMA
    minus shard_id) in record order, or None (fail-whole). Accepts plain
    or member-gzipped shards (sniffed by the gzip magic). Every record
    carries its (offset, length) in the domain a reader would seek in —
    raw bytes for plain shards, the COMPRESSED member extent for
    member-gzip shards (the CDX seekability contract); a gzip member
    holding anything but exactly one record breaks that contract and
    fails the shard whole."""
    try:
        b = bytes(b) if b is not None else b""
        if b[:2] == b"\x1f\x8b":
            recs = []
            for off, ln, plain in _iter_members(b):
                rs = _parse_records(plain)
                if len(rs) != 1:
                    raise ValueError("gzip member != exactly one record")
                r = rs[0]
                r["rec_idx"] = len(recs)
                r["offset"], r["length"] = off, ln
                recs.append(r)
            return recs
        return _parse_records(b)
    except Exception:
        return None


def warc_records(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "shard_id") -> DataFrame:
    """Vectorized WARC shard -> record-metadata table: one mapInPandas,
    zero exchanges; a corrupt shard yields no rows (fail-whole)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORDS_SCHEMA.fields]
        for pdf in batches:
            out = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                recs = parse_warc(payload)
                if recs is None:
                    continue
                for r in recs:
                    out.append({"shard_id": int(sid),
                                **{k: r[k] for k in r if k != "_body"}})
            o = pd.DataFrame(out, columns=cols)
            o["shard_id"] = pd.array(o["shard_id"], dtype="int64")
            o["offset"] = pd.array(o["offset"], dtype="int64")
            for c in ("rec_idx", "status", "n_body", "length"):
                o[c] = pd.array(o[c], dtype="Int32")
            yield o

    return df.mapInPandas(fn, schema=WARC_RECORDS_SCHEMA)


WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def warc_pages(df: DataFrame, payload_col: str = "payload",
               id_col: str = "shard_id") -> DataFrame:
    """WARC shards -> the engine's pages shape: HTTP 200 text/html
    response payloads only (the Common-Crawl ingestion filter), url +
    capture timestamp + raw html bytes — feeds extract_pages directly.
    Same zero-exchange map; fail-whole per shard."""
    import datetime as _dt

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html"]
        for pdf in batches:
            out = []
            for _sid, payload in zip(pdf[id_col], pdf[payload_col]):
                recs = parse_warc(payload)
                if recs is None:
                    continue
                for r in recs:
                    if (r["rec_type"] == "response" and r["status"] == 200
                            and r["mime"] == "text/html"):
                        ts = _dt.datetime.strptime(
                            r["warc_date"], "%Y-%m-%dT%H:%M:%SZ")
                        out.append({"url": r["url"], "warc_ts": ts,
                                    "html": r["_body"]})
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(fn, schema=WARC_PAGES_SCHEMA)


# ---------------------------------------------------------------------
# deterministic synthetic WARC shards (fixture generator truth)
# ---------------------------------------------------------------------

def _record(headers: list, block: bytes) -> bytes:
    h = b"".join(k.encode("ascii") + b": " + v + CRLF for k, v in headers)
    return (b"WARC/1.0" + CRLF + h
            + b"Content-Length: %d" % len(block) + CRLF + CRLF
            + block + CRLF + CRLF)


def synth_warc_bytes(shard_id: int) -> tuple:
    """Deterministic WARC shard + generator-truth record rows.

    Adversarial on purpose:
    - a leading warcinfo record (no Target-URI) and interleaved request
      records the pages filter must skip;
    - responses mix 200 text/html with 404s, 301s and a 200 text/plain
      (filtered out by mime, not status);
    - header NAMES vary in case (the spec says case-insensitive);
    - every 7th shard is member-gzipped (one gzip member per record,
      the Common-Crawl layout); every 9th is truncated mid-record with
      EMPTY truth (fail-whole).

    Returns (shard_bytes, truth_rows) with truth matching
    WARC_RECORDS_SCHEMA minus shard_id (plus the derived page rows being
    recoverable from rec_type/status/mime).
    """
    rng = random.Random(SEED_BASE + 777_000_000 + shard_id)
    day = 1 + shard_id % 27
    recs = []
    truth = []

    def emit(rtype: str, headers: list, block: bytes,
             url: Optional[str], status, mime, body: Optional[bytes],
             digest: Optional[str] = None):
        recs.append(_record(headers, block))
        wdate = next(v for k, v in headers if k.lower() == "warc-date")
        truth.append({
            "rec_idx": len(truth), "rec_type": rtype, "url": url,
            "warc_date": wdate.decode("ascii"),
            "status": status, "mime": mime,
            "n_body": len(body) if body is not None else None,
            "body_sha": (hashlib.sha256(body).hexdigest()[:16]
                         if body is not None else digest),
        })

    date = f"2026-08-{day:02d}T{rng.randint(0,23):02d}:00:00Z".encode()
    emit("warcinfo",
         [("WARC-Type", b"warcinfo"),
          ("WARC-Record-ID", b"<urn:uuid:%08d-info>" % shard_id),
          ("WARC-Date", date),
          ("Content-Type", b"application/warc-fields")],
         b"software: sparkdu-synth/1.0" + CRLF,
         None, None, None, None)

    for k in range(rng.randint(5, 9)):
        url = f"https://shard{shard_id}.test/page/{k}"
        date = (f"2026-08-{day:02d}T{rng.randint(0,23):02d}:"
                f"{rng.randint(0,59):02d}:00Z").encode()
        if rng.random() < 0.4:  # request record: skipped by pages filter
            block = (b"GET /page/%d HTTP/1.1" % k + CRLF
                     + b"Host: shard%d.test" % shard_id + CRLF + CRLF)
            emit("request",
                 [("WARC-Type", b"request"),
                  ("warc-record-id", b"<urn:uuid:%08d-%03d-q>"
                   % (shard_id, k)),
                  ("WARC-Target-URI", url.encode()),
                  ("WARC-Date", date),
                  ("Content-Type", b"application/http; msgtype=request")],
                 block, url, None, None, None)
        u = rng.random()
        if u < 0.6:
            status, mime = 200, b"text/html"
            body = (f"<html><body><h1>doc {shard_id}/{k}</h1>"
                    f"<p>{' '.join(f'w{rng.randint(0, 99)}' for _ in range(rng.randint(5, 20)))}"
                    f"</p></body></html>").encode()
        elif u < 0.75:
            status, mime = 200, b"text/plain"
            body = f"robots-ish plain text {shard_id}/{k}".encode()
        elif u < 0.9:
            status, mime = 404, b"text/html"
            body = b"<html><body>not found</body></html>"
        else:
            status, mime = 301, b"text/html"
            body = b""
        http = (b"HTTP/1.1 %d X" % status + CRLF
                + b"content-TYPE: " + mime + b"; charset=utf-8" + CRLF
                + b"Server: synth" + CRLF + CRLF + body)
        emit("response",
             [("warc-type", b"response"),
              ("WARC-Record-ID", b"<urn:uuid:%08d-%03d-r>"
               % (shard_id, k)),
              ("WARC-Target-URI", url.encode()),
              ("warc-date", date),
              ("Content-Type", b"application/http; msgtype=response")],
             http, url, status, mime.decode(), body)
        if status == 200 and mime == b"text/html" and rng.random() < 0.3:
            # later re-capture of the same content: a REVISIT record
            # (identical-payload-digest profile) — HTTP headers only,
            # digest declared, resolved against the original by join
            digest = hashlib.sha256(body).hexdigest()[:16]
            rurl = url + "?re"
            rdate = (f"2026-08-{day:02d}T23:"
                     f"{rng.randint(0,59):02d}:00Z").encode()
            hdr_only = (b"HTTP/1.1 200 X" + CRLF
                        + b"Content-Type: text/html; charset=utf-8"
                        + CRLF + CRLF)
            emit("revisit",
                 [("WARC-Type", b"revisit"),
                  ("WARC-Record-ID", b"<urn:uuid:%08d-%03d-v>"
                   % (shard_id, k)),
                  ("WARC-Target-URI", rurl.encode()),
                  ("WARC-Date", rdate),
                  ("WARC-Profile",
                   b"http://netpreserve.org/warc/1.0/revisit/"
                   b"identical-payload-digest"),
                  ("WARC-Payload-Digest", b"sha256:" + digest.encode()),
                  ("Content-Type",
                   b"application/http; msgtype=response")],
                 hdr_only, rurl, 200, "text/html", None, digest)

    # stamp truth offsets in the SEEK domain the parser must report:
    # raw bytes for plain shards, compressed member extents for gzip
    parts = ([_gzip_member(r) for r in recs]
             if shard_id % 7 == 3 else recs)
    pos = 0
    for t, p in zip(truth, parts):
        t["offset"], t["length"] = pos, len(p)
        pos += len(p)
    payload = b"".join(parts)
    if shard_id % 9 == 5:  # truncated shard: fail-whole, no truth
        return payload[: max(10, len(payload) * 3 // 5)], []
    return payload, truth


def _gzip_member(b: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(b) + c.flush()


def shard_error_accounting(shards: DataFrame) -> tuple:
    """(n_shards, n_failed) for a shard DataFrame: fail-whole drops a
    corrupt shard SILENTLY at the record level, so crawl-scale jobs must
    account the coverage hole at shard granularity before running.
    Shared by extract_job --format warc and wat_job --format warc."""
    n = shards.count()
    ok = warc_records(shards).select("shard_id").distinct().count()
    return n, n - ok
