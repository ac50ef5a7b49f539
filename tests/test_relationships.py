"""Relationship merge + traversal tests — replay reference merge_on
semantics (tests/test_baserelationship.py:117-206) and get_related
(basenode.py:425-528)."""

import pytest
from pyspark.sql import functions as F

from neontology_spark.models import MergePolicy, Property, RelationshipModel
from neontology_spark.relationships import (
    get_related,
    merge_relationships,
    resolve_and_merge_relationships,
)

EDGE_DDL = "source string, target string, merge_key string, rel_prop string, row_id long"


@pytest.fixture(scope="module")
def rel_model():
    return RelationshipModel(
        rel_type="FOLLOWS",
        source_label="PersonA",
        target_label="PersonA",
        properties=[
            Property("merge_key", str, policy=MergePolicy.MERGE_ON),
            Property("rel_prop", str, required=False),
        ],
    )


def test_merge_on_same_value_overwrites(spark, rel_model):
    existing = spark.createDataFrame([("a", "b", "k1", "old", 0)], EDGE_DDL)
    batch = spark.createDataFrame([("a", "b", "k1", "new", 1)], EDGE_DDL)
    post = merge_relationships(existing, batch, rel_model, order_col="row_id")
    rows = post.collect()
    assert len(rows) == 1  # same (src,tgt,merge_key) ⇒ overwrite, no new edge
    assert rows[0]["rel_prop"] == "new"


def test_merge_on_different_value_new_edge(spark, rel_model):
    existing = spark.createDataFrame([("a", "b", "k1", "old", 0)], EDGE_DDL)
    batch = spark.createDataFrame([("a", "b", "k2", "x", 1)], EDGE_DDL)
    post = merge_relationships(existing, batch, rel_model, order_col="row_id")
    rows = {r["merge_key"]: r["rel_prop"] for r in post.collect()}
    assert rows == {"k1": "old", "k2": "x"}  # different merge_on ⇒ 2 edges


def test_unresolved_endpoints_silently_dropped(spark, rel_model):
    """graphengine.py:281-291: MERGE inner-join semantics."""
    nodes = spark.createDataFrame([("a",), ("b",)], "node_id string")
    existing = spark.createDataFrame([], EDGE_DDL)
    batch = spark.createDataFrame(
        [
            ("a", "b", "k1", "ok", 0),
            ("a", "ghost", "k1", "dropped", 1),
            ("ghost", "b", "k1", "dropped", 2),
        ],
        EDGE_DDL,
    )
    post = resolve_and_merge_relationships(
        existing, batch, rel_model, nodes, nodes, "node_id", "node_id"
    )
    rows = post.collect()
    assert len(rows) == 1 and rows[0]["rel_prop"] == "ok"


@pytest.fixture(scope="module")
def graph(spark):
    # a -> b -> c -> d ; a -> c (short-cut); d -> a (cycle)
    follows = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "a")],
        "source string, target string",
    )
    likes = spark.createDataFrame([("a", "d")], "source string, target string")
    return {"FOLLOWS": follows, "LIKES": likes}


def starts(spark, *keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_one_hop_out(spark, graph):
    out = get_related(graph, starts(spark, "a"), rel_types=["FOLLOWS"])
    assert {(r["node"], r["depth"]) for r in out.collect()} == {("b", 1), ("c", 1)}


def test_one_hop_in(spark, graph):
    out = get_related(graph, starts(spark, "c"), rel_types=["FOLLOWS"], direction="in")
    assert {r["node"] for r in out.collect()} == {"a", "b"}


def test_type_alternation(spark, graph):
    out = get_related(graph, starts(spark, "a"), rel_types=["FOLLOWS", "LIKES"])
    got = {(r["node"], r["rel_type"]) for r in out.collect()}
    assert got == {("b", "FOLLOWS"), ("c", "FOLLOWS"), ("d", "LIKES")}


def test_depth_range(spark, graph):
    out = get_related(
        graph, starts(spark, "a"), rel_types=["FOLLOWS"], min_depth=2, max_depth=3
    )
    got = {(r["node"], r["depth"]) for r in out.collect()}
    # depth2: a->b->c, a->c->d ; depth3: a->b->c->d, a->c->d->a
    assert got == {("c", 2), ("d", 2), ("d", 3), ("a", 3)}


def test_distinct_collapses_depths(spark, graph):
    out = get_related(
        graph, starts(spark, "a"), rel_types=["FOLLOWS"],
        min_depth=1, max_depth=3, distinct=True,
    )
    nodes = [r["node"] for r in out.collect()]
    assert sorted(nodes) == ["a", "b", "c", "d"]  # each once


def test_rel_property_filter(spark):
    edges = spark.createDataFrame(
        [("a", "b", "best"), ("a", "c", "meh")],
        "source string, target string, quality string",
    )
    out = get_related(
        {"KNOWS": edges}, starts(spark, "a"), rel_filters={"quality": "best"}
    )
    assert [r["node"] for r in out.collect()] == ["b"]


def test_limit_skip(spark, graph):
    out = get_related(
        graph, starts(spark, "a"), rel_types=["FOLLOWS"], distinct=True,
        min_depth=1, max_depth=3, skip=1, limit=2,
    )
    assert out.count() == 2


def test_bad_args(spark, graph):
    with pytest.raises(ValueError):
        get_related(graph, starts(spark, "a"), direction="sideways")
    with pytest.raises(ValueError):
        get_related(graph, starts(spark, "a"), min_depth=0)


def test_with_paths_hop_sequences(spark, graph):
    """Path hydration (VERDICT r2 #4): each (start, node, depth) row
    carries its hop sequence; ties resolve to the lexicographically
    smallest path; the row set matches the path-less mode."""
    out = get_related(
        graph, starts(spark, "a"), rel_types=["FOLLOWS"],
        min_depth=1, max_depth=2, with_paths=True,
    )
    rows = out.collect()
    got = {(r["node"], r["depth"]): r["path"] for r in rows}
    assert got[("b", 1)] == "a->b"
    assert got[("c", 1)] == "a->c"
    # depth-2 c is reachable only via b
    assert got[("c", 2)] == "a->b->c"
    # depth-2 d: via a->c->d (a->b->c->d is depth 3)
    assert got[("d", 2)] == "a->c->d"
    # every path starts at the start key and ends at the node
    for r in rows:
        assert r["path"].startswith("a->") and r["path"].endswith(r["node"])
        assert r["path"].count("->") == r["depth"]
    # same row set as path-less mode
    plain = get_related(
        graph, starts(spark, "a"), rel_types=["FOLLOWS"],
        min_depth=1, max_depth=2,
    )
    assert {(r["node"], r["depth"]) for r in rows} == {
        (r["node"], r["depth"]) for r in plain.collect()
    }


def test_with_paths_distinct_deterministic(spark, graph):
    out = get_related(
        graph, starts(spark, "a"), rel_types=["FOLLOWS"],
        min_depth=1, max_depth=3, distinct=True, with_paths=True,
    )
    rows = {r["node"]: r for r in out.collect()}
    assert sorted(rows) == ["a", "b", "c", "d"]
    # distinct keeps the shallowest representative with its path
    assert rows["c"]["depth"] == 1 and rows["c"]["path"] == "a->c"
    assert rows["d"]["depth"] == 2 and rows["d"]["path"] == "a->c->d"
