"""Upsert kernel tests — replay the reference merge-hook semantics
(tests/test_basenode.py:1236-1300, 1321-1345) set-oriented."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from neontology_spark.models import MergePolicy, NodeModel, Property
from neontology_spark.upsert import dedupe_batch, merge_df, merge_nodes, with_fingerprint


@pytest.fixture(scope="module")
def model():
    return NodeModel(
        label="PracticeNode",
        primary_property="pp",
        properties=[
            Property("pp", str),
            Property("normal_field", str, required=False),
            Property("only_set_on_match", str, required=False, policy=MergePolicy.SET_ON_MATCH),
            Property("only_set_on_create", str, required=False, policy=MergePolicy.SET_ON_CREATE),
        ],
    )


def rows_by_pp(df):
    return {r["pp"]: r.asDict() for r in df.collect()}


def mk(spark, data):
    return spark.createDataFrame(
        data,
        "pp string, normal_field string, only_set_on_match string, only_set_on_create string",
    )


def test_merge_create_then_match(spark, model):
    """First merge: set_on_match stays NULL, set_on_create written.
    Second merge: set_on_create keeps old value, set_on_match + normal
    update (reference tests/test_basenode.py:1236-1300)."""
    empty = mk(spark, [])
    batch1 = mk(spark, [("n1", "v1", "m1", "c1")])
    post1 = merge_nodes(empty, batch1, model)
    r1 = rows_by_pp(post1)
    assert r1["n1"]["only_set_on_match"] is None  # create: not written
    assert r1["n1"]["only_set_on_create"] == "c1"
    assert r1["n1"]["normal_field"] == "v1"

    batch2 = mk(spark, [("n1", "v2", "m2", "c2"), ("n2", "x", "m9", "c9")])
    post2 = merge_nodes(post1, batch2, model)
    r2 = rows_by_pp(post2)
    assert r2["n1"]["only_set_on_create"] == "c1"  # match: old value retained
    assert r2["n1"]["only_set_on_match"] == "m2"  # match: written
    assert r2["n1"]["normal_field"] == "v2"  # always_set
    assert r2["n2"]["only_set_on_create"] == "c9"
    assert r2["n2"]["only_set_on_match"] is None


def test_merge_untouched_rows_survive(spark, model):
    existing = mk(spark, [("keep", "old", "om", "oc")])
    batch = mk(spark, [("new1", "nv", "nm", "nc")])
    post = merge_nodes(existing, batch, model)
    r = rows_by_pp(post)
    assert set(r) == {"keep", "new1"}
    assert r["keep"]["normal_field"] == "old"


def test_within_batch_duplicate_keys_last_writer_wins(spark, model):
    empty = mk(spark, [])
    batch = spark.createDataFrame(
        [
            ("n1", "first", None, "c_first", 1),
            ("n1", "last", None, "c_last", 2),
        ],
        "pp string, normal_field string, only_set_on_match string, only_set_on_create string, row_id long",
    )
    post = merge_nodes(empty, batch.drop("row_id"), model, order_col=None)
    assert post.count() == 1
    post2 = merge_nodes(empty, batch, model, order_col="row_id")
    r = rows_by_pp(post2)
    assert r["n1"]["normal_field"] == "last"
    assert r["n1"]["only_set_on_create"] == "c_last"


def test_fingerprint_null_vs_missing_distinct(spark):
    df = spark.createDataFrame(
        [Row(a="a", b=None), Row(a="a", b="")], "a string, b string"
    )
    fps = [r["_fp"] for r in with_fingerprint(df).collect()]
    assert fps[0] != fps[1]  # NULL and "" must not collide


def test_dedupe_and_order_preservation(spark, model):
    """FIXTURES.md §2 merge_df_dupes: arthur/70, betty/65, betty/65,
    ted/50, betty/75, arthur/70 → results in input order, identical rows
    mapped to the same merged identity (test_basenode.py:1321-1345)."""
    batch = spark.createDataFrame(
        [
            ("arthur_70", "arthur", 70, 0),
            ("betty_65", "betty", 65, 1),
            ("betty_65", "betty", 65, 2),
            ("ted_50", "ted", 50, 3),
            ("betty_75", "betty", 75, 4),
            ("arthur_70", "arthur", 70, 5),
        ],
        "pp string, name string, age long, row_id long",
    )
    m = NodeModel(
        label="HumanX",
        primary_property="pp",
        properties=[Property("pp", str), Property("name", str), Property("age", int, required=False)],
    )
    existing = spark.createDataFrame([], "pp string, name string, age long")
    post, results = merge_df(existing, batch, m, order_col="row_id")
    assert post.count() == 4  # arthur_70, betty_65, ted_50, betty_75
    got = [(r["pp"], r["name"], r["age"]) for r in results.collect()]
    assert got == [
        ("arthur_70", "arthur", 70),
        ("betty_65", "betty", 65),
        ("betty_65", "betty", 65),
        ("ted_50", "ted", 50),
        ("betty_75", "betty", 75),
        ("arthur_70", "arthur", 70),
    ]


def test_dedupe_batch_keeps_first_by_order(spark):
    df = spark.createDataFrame(
        [("x", "v", 5), ("x", "v", 2), ("y", "w", 1)], "k string, v string, row_id long"
    )
    out = dedupe_batch(df, ["k", "v"], order_col="row_id").collect()
    got = {(r["k"], r["row_id"]) for r in out}
    assert got == {("x", 2), ("y", 1)}


def test_merge_replay_converges(spark, model):
    """Replaying the same batch converges (MERGE semantics,
    graphengine.py:219-226): rows 2 and 3 are identical. (Run 1 differs on
    set_on_match columns, which by definition only write on match.)"""
    empty = mk(spark, [])
    batch = mk(spark, [("n1", "v", "m", "c"), ("n2", "v2", "m2", "c2")])
    once = merge_nodes(empty, batch, model)
    twice = merge_nodes(once, batch, model)
    thrice = merge_nodes(twice, batch, model)
    r1, r2, r3 = rows_by_pp(once), rows_by_pp(twice), rows_by_pp(thrice)
    assert r2 == r3
    # always_set / set_on_create stable from run 1; set_on_match fills on run 2
    assert r1["n1"]["only_set_on_create"] == r2["n1"]["only_set_on_create"] == "c"
    assert r1["n1"]["normal_field"] == r2["n1"]["normal_field"] == "v"
    assert r1["n1"]["only_set_on_match"] is None and r2["n1"]["only_set_on_match"] == "m"
