"""Local emulation of the driver's DuckDB-oracle correctness harness.

Runs every queries() entry on Spark and its oracle_sql() through DuckDB over
the same sf dir, then compares row count, column-name set, and
order-insensitive values. Usage:

    python tools/check_harness.py [sf_dir] [query ...]

Env:
    SPARKDU_CHECK_PLAIN_TZ=<tz>  build a PLAIN SparkSession (no sparkdu
        tuned defaults) pinned to <tz> instead of get_spark's UTC session —
        simulates the driver environment; non-UTC values (e.g.
        America/Los_Angeles) flush out session-TZ-dependent queries.
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    # Decimal must NOT collapse to the int/float representation: the driver
    # hashes at the Arrow level, where decimal128 != int64 even for equal
    # values (DuckDB sum(INTEGER) -> HUGEINT -> decimal128(38,0) burned us
    # in round 1). Keep it a distinct canonical form so the local gate
    # fails exactly where the driver fails.
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return str(v)


def arrow_family(t: pa.DataType) -> str:
    """Coarse type family of an Arrow type, for Spark-vs-DuckDB schema compare."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "struct"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def spark_family(dtype: str) -> str:
    """Coarse type family of a Spark simpleString dtype."""
    d = dtype.lower()
    if d in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "int"
    if d in ("float", "double"):
        return "float"
    if d.startswith("decimal"):
        return "decimal"
    if d == "boolean":
        return "bool"
    if d.startswith("timestamp"):
        return "ts"
    if d == "date":
        return "date"
    if d == "binary":
        return "bytes"
    if d == "string":
        return "str"
    if d.startswith("array"):
        return "list"
    if d.startswith("struct") or d.startswith("map"):
        return "struct"
    if d in ("void", "null"):
        return "null"
    return d


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Go through the driver entry point so staging keys and the frozen
    # DRIVER_PRIORITY ordering are exercised exactly as the driver sees them.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as _entry

    QUERIES = _entry.queries()
    ORACLES = _entry.oracle_sql()

    plain_tz = os.environ.get("SPARKDU_CHECK_PLAIN_TZ")
    if plain_tz:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("harness-check-plain")
            .master("local[8]")
            .config("spark.sql.session.timeZone", plain_tz)
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        print(f"[plain-session mode, session TZ = {plain_tz}]")
    else:
        from sparkdu.session import get_spark

        spark = get_spark(app="harness-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_types = {fld.name: fld.dataType.simpleString() for fld in sdf.schema.fields}
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        # Driver-strictness: the driver's pandas canonicalizer raises
        # "unhashable type: 'list'" on array/map/struct result columns
        # (CORRECTNESS_r03 errs on emb_quantize_int8/mm_decode_features).
        # The Arrow canon below would accept them, so fail here instead —
        # the local gate must never be more permissive than the driver.
        unsafe = [c for c, d in s_types.items() if spark_family(d) in ("list", "struct")]
        if unsafe:
            print(f"FAIL  {name}: driver-unsafe complex result columns {unsafe} "
                  f"(stringify with array_join/to_json)")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            # Arrow-level fetch: the driver hashes DuckDB output through
            # Arrow, so type mismatches invisible to fetchall() (decimal128
            # vs int64) must surface here too.
            tbl = con.sql(ORACLES[name]).arrow()
            d_cols = tbl.column_names
            d_rows = [tuple(d[c] for c in d_cols) for d in tbl.to_pylist()]
            d_families = {f.name: arrow_family(f.type) for f in tbl.schema}
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            msgs.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        else:
            for c in s_cols:
                sf_, df_ = spark_family(s_types[c]), d_families[c]
                if "null" in (sf_, df_):  # empty/all-null column: undecidable
                    continue
                if sf_ != df_:
                    ok = False
                    msgs.append(f"type family {c}: spark={s_types[c]}({sf_}) duckdb={df_}")
        if ok:
            cs = canon_rows(s_cols, s_rows)
            cd = canon_rows(d_cols, d_rows)
            if cs != cd:
                ok = False
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
