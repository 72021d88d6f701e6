"""Local mimic of the driver's DuckDB-oracle comparison.

Runs every queries() entry at a given sf dir; where an oracle_sql() entry
exists, runs it in DuckDB over the same parquet files and compares row
count, column names, and an order-insensitive value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
(with no query names, runs every entry)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_value(value):
    import datetime
    import decimal

    if isinstance(value, decimal.Decimal):
        return float(value)
    if isinstance(value, (datetime.datetime, datetime.date)):
        return str(value)
    if isinstance(value, list):
        return tuple(normalize_value(v) for v in value)
    return value


def multiset(rows, columns):
    out = {}
    for row in rows:
        key = tuple(normalize_value(row[c]) for c in sorted(columns))
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from islamic_ner_spark.session import build_session

    spark = build_session("oracle_check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    timings: list[tuple[str, float, float]] = []
    import time as _time

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = _time.time()
        sdf = fn(spark, sf_dir)
        spark_rows = sdf.collect()
        t_spark = _time.time() - t0
        spark_cols = sdf.columns
        if name not in oracles:
            timings.append((name, t_spark, 0.0))
            print(f"[rows-only] {name}: {len(spark_rows)} rows, cols={spark_cols}")
            if len(spark_rows) == 0:
                failures.append((name, "0 rows"))
            continue
        t0 = _time.time()
        rel = con.sql(oracles[name])
        duck_cols = rel.columns
        duck_rows = [dict(zip(duck_cols, r)) for r in rel.fetchall()]
        t_duck = _time.time() - t0
        timings.append((name, t_spark, t_duck))
        ok_cols = sorted(duck_cols) == sorted(spark_cols)
        ok_count = len(duck_rows) == len(spark_rows)
        ok_vals = multiset(
            [r.asDict() for r in spark_rows], spark_cols
        ) == multiset(duck_rows, duck_cols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"[{status}] {name}: spark={len(spark_rows)} duck={len(duck_rows)} "
            f"cols_match={ok_cols} values_match={ok_vals} "
            f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
        )
        if status == "FAIL":
            failures.append((name, f"cols={ok_cols} count={ok_count} vals={ok_vals}"))
            if not ok_cols:
                print("  spark cols:", spark_cols, " duck cols:", duck_cols)
            if ok_cols and not ok_vals:
                sm = multiset([r.asDict() for r in spark_rows], spark_cols)
                dm = multiset(duck_rows, duck_cols)
                only_s = [k for k in sm if k not in dm][:3]
                only_d = [k for k in dm if k not in sm][:3]
                print("  only in spark:", only_s)
                print("  only in duck:", only_d)

    slow = sorted(timings, key=lambda t: -(t[1] + t[2]))[:12]
    print(
        "\ntotal spark %.1fs duck %.1fs; slowest:" % (
            sum(t[1] for t in timings), sum(t[2] for t in timings)
        )
    )
    for name, ts, td in slow:
        print(f"  {name}: spark {ts:.1f}s duck {td:.1f}s")

    print("\nentry(spark) smoke:")
    flagship = entrymod.entry(spark)
    print("  rows:", flagship.count(), "schema:", flagship.schema.simpleString())

    if failures:
        print("\nFAILURES:", failures)
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
