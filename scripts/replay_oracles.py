#!/usr/bin/env python
"""Replay every __spark_entry__ queries() entry against its DuckDB oracle
— the same comparison the driver's correctness gate runs. Usage:

    python scripts/replay_oracles.py [sf_dir]   # default /root/testdata/sf0.01

Prints MATCH / MISMATCH / ROWS-ONLY per query and exits non-zero on any
mismatch.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6) if not math.isnan(v) else "nan"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    mismatches = []
    oracles = entrymod.oracle_sql()
    for name, fn in sorted(entrymod.queries().items()):
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        oracle = oracles.get(name)
        if oracle is None:
            print(f"{name}: ROWS-ONLY ({len(srows)} rows)")
            continue
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
            and len(srows) == len(drows)
            and normalize(srows, scols) == normalize(drows, dcols)
        )
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
        if not ok:
            mismatches.append(name)
    spark.stop()
    print("MISMATCHES:", mismatches)
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
