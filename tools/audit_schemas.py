"""Audit every registry key's result schema for driver-canon safety.

The driver's correctness harness canonicalizes Spark/DuckDB results through a
pandas path (``sort_values`` + hashing) that raises ``TypeError: unhashable
type: 'list'`` on array/map/struct-typed result columns (see VERDICT r3,
"What's wrong" #1: emb_quantize_int8, mm_decode_features).  The builder's
local gate (tools/check_harness.py) canonicalizes at the Arrow level and is
more permissive — so it can NOT be trusted for driver-window keys.

This script plans (``.schema`` only, no execution for most keys) every
``queries()`` entry at sf0.001 and reports keys whose result schema contains
ArrayType / MapType / StructType, split by whether the key has ever had a
driver row (safe/banked) or is still pending a driver window slot (must fix
before rotation).

Usage: python tools/audit_schemas.py [sf_dir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    attested = set()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in (1, 2, 3):
        p = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(p):
            attested |= set(json.load(open(p)))

    from pyspark.sql import SparkSession
    from pyspark.sql.types import ArrayType, MapType, StructType

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    bad = []
    errs = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            complex_cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            errs.append((name, repr(e)[:120]))
            continue
        if complex_cols:
            bad.append((name, complex_cols, name in attested, name in osql))

    print(f"total keys: {len(qs)}  oracles: {len(osql)}  attested: {len(attested & set(qs))}")
    print(f"\nkeys with complex-typed result columns: {len(bad)}")
    for name, cols, att, has_oracle in sorted(bad, key=lambda t: (t[2], t[0])):
        tag = "banked" if att else "PENDING-WINDOW"
        okind = "sql" if has_oracle else "rows-only"
        print(f"  {tag:15s} {okind:9s} {name}: {cols}")
    if errs:
        print(f"\nkeys that errored while planning: {len(errs)}")
        for name, e in errs:
            print(f"  {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
