"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at the given SF,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def row_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("check_oracle")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            fails.append(name)
            continue
        if name not in os_:
            print(f"ok~  {name}: rows={len(s_rows)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(s_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(os_[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            fails.append(name)
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            a, b = row_set(s_cols, s_rows), row_set(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y]
                problems.append(f"values differ in {len(diff)} rows; first: "
                                f"{diff[0] if diff else (a[-1], b[-1])}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fails.append(name)
        else:
            print(f"ok   {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(fails)} failures: {fails}" if fails else "\nall queries match")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
