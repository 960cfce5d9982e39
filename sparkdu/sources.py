"""Custom Spark 4 Python DataSource: a WARC-style record container.

The reference ingests document collections from record containers (its
collection readers walk PAGE-XML/mpxml directories [U tasks/DU_Task
--trn/--tst dir args]); the Common-Crawl graft analogue is WARC. This
module implements a from-scratch splittable reader for a deterministic
WARC-ish record format via the Spark 4 Python DataSource API
(`pyspark.sql.datasource`): one InputPartition per shard file, streamed
record parsing (no whole-file buffering beyond one record), schema pushed
to Spark as `url string, warc_ts timestamp, html binary`.

Record layout (binary, self-delimiting, append-friendly like WARC):

    WARCISH1 <url_len> <html_len> <epoch_us>\n
    <url bytes><html bytes>

Registration and use:

    from sparkdu.sources import WarcishDataSource
    spark.dataSource.register(WarcishDataSource)
    df = spark.read.format("warcish").load("/path/to/shard_dir")

At 100 TB the unit of parallelism is the shard file (like WARC's ~1 GB
gzip members): partitions() lists files cheaply from the driver, every
byte is read exactly once executor-side, and a bad record fails only its
shard task. Filters/column pruning stay Spark-side (a record container has
no statistics to push into).
"""

from __future__ import annotations

import datetime as _dt
import glob
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

MAGIC = b"WARCISH1 "


class _Shard(InputPartition):
    def __init__(self, path: str):
        self.path = path


def write_shard(path: str, rows) -> int:
    """Writer twin (the S3 sink form): rows of (url, warc_ts, html)."""
    n = 0
    with open(path, "wb") as f:
        for url, ts, html in rows:
            u = url.encode("utf-8")
            b = html if html is not None else b""
            if isinstance(ts, int):
                epoch_us = ts
            else:
                # naive datetimes are UTC by convention (session TZ is pinned
                # UTC); never let the host TZ leak into the container bytes
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=_dt.timezone.utc)
                epoch_us = int(ts.timestamp() * 1_000_000)
            f.write(MAGIC + f"{len(u)} {len(b)} {epoch_us}\n".encode("ascii"))
            f.write(u)
            f.write(b)
            n += 1
    return n


def read_shard(path: str) -> Iterator[tuple]:
    """Streamed record parse; yields (url, warc_ts, html)."""
    with open(path, "rb") as f:
        while True:
            head = f.readline()
            if not head:
                return
            if not head.startswith(MAGIC):
                raise ValueError(f"{path}: bad record header {head[:40]!r}")
            ul, bl, epoch_us = (int(x) for x in head[len(MAGIC):].split())
            url_b = f.read(ul)
            if len(url_b) != ul:
                raise ValueError(f"{path}: truncated record url ({len(url_b)}/{ul} bytes)")
            url = url_b.decode("utf-8")
            html = f.read(bl)
            if len(html) != bl:
                raise ValueError(f"{path}: truncated record for {url}")
            ts = _dt.datetime.fromtimestamp(epoch_us / 1_000_000, _dt.timezone.utc)
            yield url, ts.replace(tzinfo=None), html


class WarcishReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warcish: path option required")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.warcish")))
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"warcish: no *.warcish shards under {self.path}")
        return [_Shard(p) for p in files]

    def read(self, partition: _Shard):
        yield from read_shard(partition.path)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class WarcishWriter(DataSourceWriter):
    """Sink twin (S3'): one shard per task, two-phase commit.

    Tasks write to `.inprogress` files and report them in commit messages;
    only the driver-side commit() renames them into place and stamps
    _SUCCESS — a failed/speculative task's output is never visible, the
    same visibility contract Spark's file committers give parquet."""

    def __init__(self, options: dict, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warcish: path option required")
        self.overwrite = overwrite

    def write(self, iterator) -> _ShardCommit:
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path,
            f"part-{ctx.partitionId():05d}-{uuid.uuid4().hex}.warcish.inprogress",
        )
        n = write_shard(tmp, ((r["url"], r["warc_ts"], r["html"]) for r in iterator))
        return _ShardCommit(tmp, n)

    def commit(self, messages) -> None:
        success = os.path.join(self.path, "_SUCCESS")
        if self.overwrite:
            # Invalidate FIRST: a crash anywhere in this commit must never
            # leave a _SUCCESS-stamped directory with partial data.  The new
            # _SUCCESS is written only after every rename has completed.
            try:
                os.remove(success)
            except FileNotFoundError:
                pass
            # replace-visibility only at commit: old shards removed right
            # before the new ones are renamed in, never before the tasks
            # have all succeeded
            for old in glob.glob(os.path.join(self.path, "*.warcish")):
                os.remove(old)
        total = 0
        for m in messages:
            final = m.path[: -len(".inprogress")]
            os.replace(m.path, final)
            total += m.n
        with open(success, "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        # failed tasks report None commit messages (DataSourceWriter contract)
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


class WarcishDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warcish"

    def schema(self) -> str:
        # timestamp_ntz: record timestamps are UTC wall-clock fields by
        # convention; NTZ keeps them session-TZ-independent end to end (a
        # plain `timestamp` column is ingested as UTC by the Python data
        # source but rendered in session TZ — an 8h shift on a PST driver)
        return "url string, warc_ts timestamp_ntz, html binary"

    def reader(self, schema) -> WarcishReader:
        return WarcishReader(self.options)

    def writer(self, schema, overwrite: bool) -> WarcishWriter:
        return WarcishWriter(self.options, overwrite=overwrite)
