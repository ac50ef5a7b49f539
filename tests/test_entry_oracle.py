"""Local replica of the driver's DuckDB oracle harness: every queries()
entry with an oracle_sql() must match row-count + values at sf0.001.
(The driver runs the same comparison at sf0.01.)"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(rows, colnames):
    """Order-insensitive, column-name-sorted value normalization, floats
    rounded — approximates the driver's compare."""
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


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = ddb.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"{name}: column sets differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    assert normalize(spark_rows, spark_cols) == normalize(duck_rows, duck_cols), (
        f"{name}: values differ"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"part", "check", "label", "n_rows", "n_violations", "passed"} <= set(df.columns)
    # flagship must find the planted violations and pass elsewhere
    assert any(not r["passed"] for r in rows)
    assert any(r["passed"] for r in rows)
