"""MERGE INTO emitter tests: golden statement, Spark parser acceptance,
and semantic parity of the same-spec rewrite against merge_keyed — run
in BOTH Spark SQL and DuckDB (the sandbox has no Iceberg catalog, so the
rewrite is the executable contract; see merge_sql.py module docstring)."""

import duckdb
import pytest
from pyspark.sql import Row

from neontology_spark.merge_sql import merge_into_sql, merge_rewrite_sql
from neontology_spark.models import MergePolicy
from neontology_spark.upsert import merge_keyed

KEYS = ["k"]
DATA_COLS = ["a", "b", "c"]
POLICIES = {
    "a": MergePolicy.ALWAYS_SET,
    "b": MergePolicy.SET_ON_CREATE,
    "c": MergePolicy.SET_ON_MATCH,
}


@pytest.fixture()
def frames(spark):
    existing = spark.createDataFrame(
        [
            Row(k=1, a="ea", b="eb", c="ec"),
            Row(k=2, a="ea2", b="eb2", c="ec2"),
            Row(k=None, a="en", b="en", c="en"),  # NULL key must match NULL-safely
        ]
    )
    batch = spark.createDataFrame(
        [
            Row(k=1, a="ba", b="bb", c="bc", ord=1),
            Row(k=1, a="ba_late", b="bb_late", c="bc_late", ord=2),  # LWW winner
            Row(k=3, a="new_a", b="new_b", c="new_c", ord=1),
            Row(k=None, a="bn", b="bn", c="bn", ord=1),
        ]
    )
    return existing, batch


def test_merge_into_golden():
    stmt = merge_into_sql(
        "cat.db.images",
        "updates",
        KEYS,
        POLICIES,
        DATA_COLS,
        order_col="ord",
    )
    assert stmt == (
        "MERGE INTO cat.db.images t\n"
        "USING (SELECT k, a, b, c FROM (SELECT *, row_number() OVER "
        "(PARTITION BY k ORDER BY ord DESC) AS _rn FROM updates) "
        "WHERE _rn = 1) s\n"
        "ON t.k <=> s.k\n"
        "WHEN MATCHED THEN UPDATE SET t.a = s.a, t.c = s.c\n"
        "WHEN NOT MATCHED THEN INSERT (k, a, b, c) "
        "VALUES (s.k, s.a, s.b, NULL)"
    )


def test_merge_into_missing_batch_column():
    """A target column the batch doesn't carry: never updated (matched
    rows keep the old value — reference Cypher SET semantics), inserted
    as NULL on create. merge_keyed and merge_rewrite_sql agree (ADVICE
    r4 medium; parity asserted in test_absent_column_parity)."""
    stmt = merge_into_sql(
        "tgt", "src", KEYS, {}, ["a", "x"], batch_cols=["a"]
    )
    assert "t.x" not in stmt.split("WHEN NOT MATCHED")[0]
    assert "VALUES (s.k, s.a, NULL)" in stmt


def test_absent_column_parity(spark, frames):
    """batch_cols a STRICT SUBSET of data_cols: all three formulations
    (merge_keyed, rewrite-in-Spark, rewrite-in-DuckDB) must agree that
    the absent columns keep old values on match and are NULL on create,
    for every policy."""
    existing, batch = frames
    # batch drops 'b' (SET_ON_CREATE) and 'c' (SET_ON_MATCH); also probe
    # an absent ALWAYS_SET column by dropping 'a' from a second run
    for batch_cols in (["a"], ["b", "c"]):
        sub = batch.select("k", *batch_cols, "ord")
        out = merge_keyed(existing, sub, KEYS, POLICIES, order_col="ord")
        keyed = {r["k"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
        absent = [c for c in DATA_COLS if c not in batch_cols]
        for k, vals in keyed.items():
            erow = {r["k"]: r for r in existing.collect()}.get(k)
            for c, v in zip(DATA_COLS, vals):
                if c in absent:
                    # matched/target-only rows keep old; created rows NULL
                    assert v == (erow[c] if erow is not None else None)
        existing.createOrReplaceTempView("merge_tgt_v")
        sub.createOrReplaceTempView("merge_src_v")
        sql = merge_rewrite_sql(
            "merge_tgt_v", "merge_src_v", KEYS, POLICIES, DATA_COLS,
            batch_cols=batch_cols, order_col="ord", dialect="spark",
        )
        got = {r["k"]: (r["a"], r["b"], r["c"]) for r in spark.sql(sql).collect()}
        assert got == keyed
        con = duckdb.connect()
        con.register("merge_tgt_v", existing.toPandas())
        con.register("merge_src_v", sub.toPandas())
        dsql = merge_rewrite_sql(
            "merge_tgt_v", "merge_src_v", KEYS, POLICIES, DATA_COLS,
            batch_cols=batch_cols, order_col="ord", dialect="ansi",
        )
        ddf = con.execute(dsql).df()
        dgot = {
            (None if k != k else int(k)): tuple(
                None if v != v else v for v in (a, b, c)
            )
            for k, a, b, c in ddf[["k", "a", "b", "c"]].itertuples(index=False)
        }
        keyed_n = {
            k: tuple(None if v != v else v for v in vals)
            for k, vals in keyed.items()
        }
        assert dgot == keyed_n


def test_merge_into_parses_in_spark(spark, frames):
    """The emitted statement must be valid Spark SQL: run it against a
    parquet-backed table and require the ICEBERG-shaped failure (row-level
    ops unsupported), not a parse/analysis error on our syntax."""
    stmt = merge_into_sql(
        "merge_tgt_v", "merge_src_v", KEYS, POLICIES, DATA_COLS, order_col="ord"
    )
    existing, batch = frames
    existing.createOrReplaceTempView("merge_tgt_v")
    batch.createOrReplaceTempView("merge_src_v")
    with pytest.raises(Exception, match="MERGE INTO TABLE is not supported temporarily|does not support|not supported"):
        spark.sql(stmt)


def _expected(spark, frames):
    existing, batch = frames
    out = merge_keyed(existing, batch, KEYS, POLICIES, order_col="ord")
    rows = {
        (r["k"],): (r["a"], r["b"], r["c"]) for r in out.collect()
    }
    return rows


def test_rewrite_parity_spark(spark, frames):
    existing, batch = frames
    existing.createOrReplaceTempView("merge_tgt_v")
    batch.createOrReplaceTempView("merge_src_v")
    sql = merge_rewrite_sql(
        "merge_tgt_v", "merge_src_v", KEYS, POLICIES, DATA_COLS,
        order_col="ord", dialect="spark",
    )
    got = {
        (r["k"],): (r["a"], r["b"], r["c"]) for r in spark.sql(sql).collect()
    }
    assert got == _expected(spark, frames)
    # hand-checkable anchors: LWW winner, SET_ON_CREATE kept old on match,
    # SET_ON_MATCH NULL on create, NULL key matched null-safely
    assert got[(1,)] == ("ba_late", "eb", "bc_late")
    assert got[(3,)] == ("new_a", "new_b", None)
    assert got[(None,)] == ("bn", "en", "bn")
    assert got[(2,)] == ("ea2", "eb2", "ec2")


def test_rewrite_parity_duckdb(spark, frames):
    existing, batch = frames
    con = duckdb.connect()
    con.register("merge_tgt_v", existing.toPandas())
    con.register("merge_src_v", batch.toPandas())
    sql = merge_rewrite_sql(
        "merge_tgt_v", "merge_src_v", KEYS, POLICIES, DATA_COLS,
        order_col="ord", dialect="ansi",
    )
    df = con.execute(sql).df()
    got = {
        (None if k != k else int(k),): (a, b, c)
        for k, a, b, c in df[["k", "a", "b", "c"]].itertuples(index=False)
    }
    exp = {
        k: tuple(None if v != v else v for v in vals)
        for k, vals in _expected(spark, frames).items()
    }
    got = {k: tuple(None if v != v else v for v in vals) for k, vals in got.items()}
    assert got == exp


def test_validation_errors():
    with pytest.raises(ValueError, match="both key and data"):
        merge_into_sql("tgt", "src", ["kk"], {}, ["kk", "aa"])
    with pytest.raises(ValueError, match="undeclared"):
        merge_into_sql("tgt", "src", ["kk"], {"zz": MergePolicy.ALWAYS_SET}, ["aa"])
    with pytest.raises(Exception, match="invalid"):
        merge_into_sql("tgt; DROP TABLE x", "src", ["kk"], {}, ["aa"])
