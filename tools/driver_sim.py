"""Bare-session driver-contract simulation — the strongest pre-driver gate.

Reproduces exactly what the external driver does: a PLAIN SparkSession (no
engine tuning, so config dependencies surface), ``entry(spark)`` checked for
rows > 0, then every query in the 50-entry driver window run at sf0.01 and
compared against its ``oracle_sql()`` twin via DuckDB using the hardened
type-sensitive comparator (tools/check.py).  Run this after the window
rotation, before closing a round.

Usage: python tools/driver_sim.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from tools.check import compare

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    n = entry_mod.entry(spark).count()
    if n <= 0:
        print("FAIL entry(): 0 rows")
        return 1
    print(f"entry OK: {n} rows")

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)[:50]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    bad = []
    for name in names:
        try:
            sdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append((name, f"spark err {type(e).__name__}: {str(e)[:150]}"))
            continue
        if name not in osql:
            print(f"ROWS {name}: {len(sdf)}")
            continue
        try:
            ddf = con.execute(osql[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"duck err {type(e).__name__}: {str(e)[:150]}"))
            continue
        problems = compare(sdf, ddf)
        if problems:
            bad.append((name, problems[:2]))
        else:
            print(f"PASS {name}: {len(sdf)}")
    print("\nFAILURES:" if bad else "\nALL 50 WINDOW QUERIES GREEN (bare session)")
    for b in bad:
        print(" ", b)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
