"""Ingest toolchain — the Spark-first analogue of the reference's XML
toolchain [U xml_formats/PageXml.py: MultiPageXml merge/split, XSD
validation, Page2DS/DS2PageXml format conversion] (SURVEY SS3.3).

The reference's toolchain is DOM-to-DOM over PAGE-XML files; our data model
is HTML pages with `<hr class="page-break">` part boundaries (SPEC SS2
pagination), so the analogues are:

- merge_parts: many single-part fragments -> one multi-part document
  (MultiPageXml merge). Pure JVM: collect_list + array_sort + array_join —
  deterministic under any partitioning, one shuffle on url.
- split_parts: multi-part document -> (url, part_seq, fragment) rows
  (MultiPageXml split). Pure JVM: split + posexplode.
  split_parts(merge_parts(frags)) is the identity — the round-trip gate.
- validate_fragments: contract report per url (XSD-validation analogue):
  part_seq must be exactly 0..n-1 with no gaps or dups.
- nodes_to_json / json_from_nodes: nested-document <-> columnar conversion
  (Page2DS/DS2PageXml analogue) via to_json/from_json, schema-preserving.

All operators are built-in-function compositions — no Python in any of
them — so they run at scan speed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fixtures import PART_SEP


def merge_parts(frags: DataFrame, sep: str = PART_SEP) -> DataFrame:
    """(url, part_seq, frag) -> (url, doc). collect_list is unordered under
    parallel merge, so ordering is imposed with array_sort over a
    (part_seq-first) struct (same determinism pattern as staged.assemble)."""
    return (
        frags.groupBy("url")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(part_seq, frag))), s -> s.frag)"),
                sep,
            ).alias("doc")
        )
    )


def split_parts(docs: DataFrame, sep: str = PART_SEP) -> DataFrame:
    """(url, doc) -> (url, part_seq, frag); inverse of merge_parts."""
    parts = F.split(F.col("doc"), F.lit(sep), -1)
    return docs.select(
        "url", F.posexplode(parts).alias("part_seq", "frag")
    ).select("url", F.col("part_seq").cast("long").alias("part_seq"), "frag")


def validate_fragments(frags: DataFrame) -> DataFrame:
    """XSD-validation analogue: per-url structural contract report.
    valid <=> part_seq is exactly {0..n-1} (contiguous, no dups)."""
    return frags.groupBy("url").agg(
        F.count("*").alias("n_parts"),
        (
            (F.min("part_seq") == 0)
            & (F.max("part_seq") == F.count("*") - 1)
            & (F.countDistinct("part_seq") == F.count("*"))
        ).alias("valid"),
    )


_NODE_JSON_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("node_id", T.IntegerType()),
            T.StructField("part_id", T.IntegerType()),
            T.StructField("tag", T.StringType()),
            T.StructField("n_chars", T.IntegerType()),
        ]
    )
)


def nodes_to_json(nodes: DataFrame) -> DataFrame:
    """Columnar nodes -> one nested JSON document per url (Page2DS
    analogue). Sorted struct array -> to_json; deterministic bytes."""
    return (
        nodes.select("url", F.struct("node_id", "part_id", "tag", "n_chars").alias("s"))
        .groupBy("url")
        .agg(F.to_json(F.array_sort(F.collect_list("s"))).alias("doc_json"))
    )


def json_to_nodes(docs: DataFrame) -> DataFrame:
    """Inverse of nodes_to_json (DS2PageXml analogue): parse + re-explode."""
    return (
        docs.select("url", F.from_json("doc_json", _NODE_JSON_SCHEMA).alias("arr"))
        .select("url", F.explode("arr").alias("s"))
        .select("url", "s.node_id", "s.part_id", "s.tag", "s.n_chars")
    )
