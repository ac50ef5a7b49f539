"""Raw-query escape hatch tests — replaying the semantics the reference
fixes in tests/test_graph_connection.py:28-151 (evaluate_query /
evaluate_query_single hydration, warnings, dedup) over Spark SQL."""

import warnings

import pytest
from pyspark.sql import functions as F

from neontology_spark.models import ModelCatalog, NodeModel, Property, RelationshipModel
from neontology_spark.query import run_query, run_query_single


@pytest.fixture()
def graph(spark):
    catalog = ModelCatalog()
    person = catalog.register_node(
        NodeModel(
            label="PersonQ",
            primary_property="name",
            properties=[Property("name", str), Property("age", int)],
        )
    )
    team = catalog.register_node(
        NodeModel(label="TeamQ", primary_property="team", properties=[Property("team", str)])
    )
    catalog.register_rel(
        RelationshipModel(
            rel_type="PLAYS_FOR_Q",
            source_label="PersonQ",
            target_label="TeamQ",
            properties=[Property("since", int)],
        )
    )
    tables = {
        "PersonQ": spark.createDataFrame(
            [("alice", 30), ("bob", 25)], "name string, age long"
        ),
        "TeamQ": spark.createDataFrame([("reds",)], "team string"),
        "PLAYS_FOR_Q": spark.createDataFrame(
            [("alice", "reds", 2019), ("bob", "reds", 2021)],
            "source string, target string, since long",
        ),
    }
    return catalog, tables


def test_records_and_node_hydration(spark, graph):
    catalog, tables = graph
    res = run_query(
        spark,
        "SELECT struct(p.*) AS `n:PersonQ`, p.age AS age "
        "FROM PersonQ p ORDER BY p.name",
        catalog,
        tables,
    )
    assert [r["age"] for r in res.records.collect()] == [30, 25]
    assert set(res.nodes) == {"PersonQ"}
    hydrated = {r["name"]: r["age"] for r in res.nodes["PersonQ"].collect()}
    assert hydrated == {"alice": 30, "bob": 25}


def test_node_dedup_by_pp(spark, graph):
    """result.py:38 nodes_map semantics: the same node returned by many
    records appears once in .nodes."""
    catalog, tables = graph
    res = run_query(
        spark,
        "SELECT struct(p.*) AS PersonQ FROM PersonQ p "
        "CROSS JOIN range(3)",
        catalog,
        tables,
    )
    assert res.records.count() == 6
    assert res.nodes["PersonQ"].count() == 2


def test_relationship_hydration(spark, graph):
    catalog, tables = graph
    res = run_query(
        spark,
        """
        SELECT named_struct(
                 'source', struct(p.*), 'target', struct(t.*),
                 'since', r.since) AS `r:PLAYS_FOR_Q`
        FROM PLAYS_FOR_Q r
        JOIN PersonQ p ON r.source = p.name
        JOIN TeamQ t ON r.target = t.team
        """,
        catalog,
        tables,
    )
    rels = {
        r["source"]["name"]: (r["target"]["team"], r["since"])
        for r in res.relationships["PLAYS_FOR_Q"].collect()
    }
    assert rels == {"alice": ("reds", 2019), "bob": ("reds", 2021)}


def test_unknown_label_warns_and_drops(spark, graph):
    catalog, tables = graph
    with pytest.warns(UserWarning, match="unexpected label 'GhostQ'"):
        res = run_query(
            spark,
            "SELECT struct(p.*) AS `g:GhostQ` FROM PersonQ p",
            catalog,
            tables,
        )
    assert res.nodes == {} and res.relationships == {}
    assert res.records.count() == 2  # records untouched


def test_relationship_without_nodes_warns(spark, graph):
    """neo4jengine.py:119-127: a returned relationship without endpoint
    nodes cannot hydrate."""
    catalog, tables = graph
    with pytest.warns(UserWarning, match="did not include nodes"):
        res = run_query(
            spark,
            "SELECT struct(r.since AS since) AS `r:PLAYS_FOR_Q` "
            "FROM PLAYS_FOR_Q r",
            catalog,
            tables,
        )
    assert res.relationships == {}


def test_undeclared_node_field_warns_and_drops(spark, graph):
    catalog, tables = graph
    with pytest.warns(UserWarning, match="not declared"):
        res = run_query(
            spark,
            "SELECT named_struct('name', p.name, 'shoe_size', 9) AS PersonQ "
            "FROM PersonQ p",
            catalog,
            tables,
        )
    assert res.nodes == {}


def test_node_link_data_small_result(spark, graph):
    catalog, tables = graph
    res = run_query(
        spark,
        """
        SELECT struct(p.*) AS PersonQ, struct(t.*) AS TeamQ,
               named_struct('source', struct(p.*), 'target', struct(t.*),
                            'since', r.since) AS PLAYS_FOR_Q
        FROM PLAYS_FOR_Q r
        JOIN PersonQ p ON r.source = p.name
        JOIN TeamQ t ON r.target = t.team
        """,
        catalog,
        tables,
    )
    data = res.node_link_data()
    assert data["directed"] is True
    assert {n["LABEL"] for n in data["nodes"]} == {"PersonQ", "TeamQ"}
    assert len([n for n in data["nodes"] if n["LABEL"] == "PersonQ"]) == 2
    assert len(data["edges"]) == 2


def test_query_single(spark, graph):
    catalog, tables = graph
    run_query(spark, "SELECT 1", catalog, tables)  # registers views
    assert (
        run_query_single(
            spark, "SELECT name FROM PersonQ WHERE name = 'alice'"
        )
        == "alice"
    )
    assert (
        run_query_single(spark, "SELECT name FROM PersonQ WHERE name = 'zz'")
        is None
    )
    with pytest.warns(UserWarning, match="multiple results"):
        run_query_single(spark, "SELECT name FROM PersonQ")
    # collected aggregate — test_graph_connection.py:75-91 analogue
    assert run_query_single(
        spark,
        "SELECT sort_array(collect_list(name)) FROM PersonQ",
    ) == ["alice", "bob"]


def test_register_graph_rejects_unknown_name(spark, graph):
    catalog, tables = graph
    from neontology_spark.query import register_graph

    with pytest.raises(ValueError, match="not a registered"):
        register_graph(
            spark, catalog, {"NopeQ": tables["PersonQ"]}
        )
