"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() in DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from jsonschema_rs_spark.session import get_spark

    spark = get_spark(app_name="check_entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {repr(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {repr(e)[:300]}")
            n_fail += 1
            continue
        sn, sc = norm_rows(scols, srows)
        on, oc = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
            continue
        if len(sn) != len(on):
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(on)}")
            _show_diff(sn, on)
            n_fail += 1
            continue
        if sn != on:
            print(f"FAIL {name}: value mismatch ({len(sn)} rows)")
            _show_diff(sn, on)
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sn)} rows)")
        n_pass += 1

    print(f"\n{n_pass} pass / {n_fail} fail")
    # entry() smoke
    if not only:
        df = entry_mod.entry(spark)
        n = df.count()
        print(f"entry(): {n} rows, schema={df.schema.simpleString()[:200]}")
    sys.exit(1 if n_fail else 0)


def _show_diff(sn, on, k=3):
    sset, oset = set(sn), set(on)
    for r in list(sset - oset)[:k]:
        print(f"   spark-only: {r}")
    for r in list(oset - sset)[:k]:
        print(f"   duck-only:  {r}")


if __name__ == "__main__":
    main()
