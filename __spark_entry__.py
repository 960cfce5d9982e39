"""Driver contract for the spark-graft builder (PySpark target).

entry():     flagship fused extraction over the committed pages fixture
             (sf0.001-scale corpus) — SURVEY.md SS7 M1.
queries():   one callable per implemented operator from SURVEY.md SS2
             (registry lives in sparkdu/harness.py).
oracle_sql():DuckDB-equivalent SQL per query where SQL-expressible;
             omitted keys are rows-only by design (approx sketches,
             Spark-specific hashing, stubbed codecs).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: main-content extraction, byte-identical per url (SPEC.md)."""
    from sparkdu.api import extract_pages
    from sparkdu.harness import fx
    from sparkdu.tables import PAGES_SCHEMA

    pages = spark.read.schema(PAGES_SCHEMA).parquet(fx("pages"))
    return extract_pages(spark, pages)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import sparkdu.staging  # noqa: F401  (registers round-3 keys)
    from sparkdu.harness import QUERIES, ordered

    return ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    import sparkdu.staging  # noqa: F401  (registers round-3 keys)
    from sparkdu.harness import ORACLES, ordered

    return ordered(ORACLES)
