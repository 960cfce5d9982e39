"""Table layer — schemas + parquet-backed catalog with Iceberg DDL (M0).

The engine's data model (SURVEY.md SS1.2): five tables replacing the
reference's filesystem-of-PAGE-XML collection model [U graph/Graph.loadGraphs].
In production these are Iceberg tables (partition transform ``days(warc_ts)``
on `pages`); no Iceberg runtime jar exists in this sandbox, so the same
schemas are parquet-backed behind `TableCatalog`, and `iceberg_ddl()` emits
the DDL that a cluster deployment would run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# parse-stage node columns (SPEC.md SS2); layout/windows add x/y, spans, seq
NODES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("node_id", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("depth", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_links", T.IntegerType()),
        T.StructField("link_density", T.DoubleType()),
        T.StructField("punct_ratio", T.DoubleType()),
        T.StructField("digit_ratio", T.DoubleType()),
        T.StructField("caps_ratio", T.DoubleType()),
        T.StructField("anc_boiler", T.BooleanType()),
        T.StructField("doc_truncated", T.BooleanType()),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("src_node_id", T.IntegerType()),
        T.StructField("dst_node_id", T.IntegerType()),
        T.StructField("edge_type", T.StringType()),  # h | v | xpart
        T.StructField("dist", T.DoubleType()),
        T.StructField("overlap", T.DoubleType()),
    ]
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("node_id", T.IntegerType()),
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
        ]
    )
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("pipeline_version", T.StringType()),
    ]
)

CHECKPOINTS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_key", T.IntegerType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_nodes", T.LongType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("started_ts", T.TimestampType()),
        T.StructField("finished_ts", T.TimestampType()),
        T.StructField("status", T.StringType()),
    ]
)

SCHEMAS = {
    "pages": PAGES_SCHEMA,
    "nodes": NODES_SCHEMA,
    "edges": EDGES_SCHEMA,
    "extracted": EXTRACTED_SCHEMA,
    "checkpoints": CHECKPOINTS_SCHEMA,
}

_ICEBERG_PARTITION = {
    "pages": "PARTITIONED BY (days(warc_ts))",
    "extracted": "PARTITIONED BY (days(warc_ts))",
    "nodes": "PARTITIONED BY (bucket(256, url))",
    "edges": "PARTITIONED BY (bucket(256, url))",
    "checkpoints": "",
}


def iceberg_ddl(name: str, catalog: str = "warehouse") -> str:
    """DDL a real cluster would run (Iceberg v2, merge-on-read)."""
    schema = SCHEMAS[name]
    cols = ",\n  ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    part = _ICEBERG_PARTITION.get(name, "")
    return (
        f"CREATE TABLE IF NOT EXISTS {catalog}.du.{name} (\n  {cols}\n) USING iceberg\n"
        f"{part}\nTBLPROPERTIES ('format-version'='2', 'write.delete.mode'='merge-on-read')"
    )


class TableCatalog:
    """Named-table catalog; parquet-backed locally, Iceberg path on cluster.

    Local layout: ``<root>/<name>/`` parquet dirs. ``use_iceberg=True``
    switches read/write to ``spark.table``/``writeTo`` against a configured
    Iceberg catalog (requires the runtime jar; absent in this sandbox).
    """

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool = False,
                 iceberg_catalog: str = "warehouse"):
        self.spark = spark
        self.root = root
        self.use_iceberg = use_iceberg
        self.iceberg_catalog = iceberg_catalog

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.iceberg_catalog}.du.{name}")
        p = self.path(name)
        return os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.table(f"{self.iceberg_catalog}.du.{name}")
        return self.spark.read.schema(SCHEMAS[name]).parquet(self.path(name))

    def write(self, name: str, df: DataFrame, mode: str = "append") -> None:
        if self.use_iceberg:
            w = df.writeTo(f"{self.iceberg_catalog}.du.{name}")
            (w.append() if mode == "append" else w.createOrReplace())
        else:
            df.write.mode(mode).parquet(self.path(name))
