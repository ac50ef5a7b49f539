"""Node-op tests: create append parity, DETACH delete cascade, paged
match with endpoint hydration."""

import pytest

from neontology_spark.models import ModelCatalog, NodeModel, Property, RelationshipModel
from neontology_spark.nodes import (
    create_nodes,
    delete_nodes,
    match_nodes,
    match_relationships,
)


@pytest.fixture(scope="module")
def setup(spark):
    person = NodeModel(
        label="PersonN", primary_property="name",
        properties=[Property("name", str), Property("age", int, required=False)],
    )
    team = NodeModel(label="TeamN", primary_property="team", properties=[Property("team", str)])
    rel = RelationshipModel(rel_type="PLAYS_FOR", source_label="PersonN", target_label="TeamN")
    people = spark.createDataFrame(
        [("alice", 30), ("bob", 25), ("carol", 41)], "name string, age long"
    )
    teams = spark.createDataFrame([("reds",), ("blues",)], "team string")
    edges = spark.createDataFrame(
        [("alice", "reds"), ("bob", "reds"), ("carol", "blues")],
        "source string, target string",
    )
    return person, team, rel, people, teams, edges


def test_create_appends_duplicates(spark, setup):
    person, _, _, people, _, _ = setup
    batch = spark.createDataFrame([("alice", 99)], "name string, age long")
    post = create_nodes(people, batch)
    # reference: create twice ⇒ count 2 (tests/test_basenode.py:113-141)
    assert post.filter("name = 'alice'").count() == 2


def test_detach_delete(setup):
    person, team, rel, people, teams, edges = setup
    post_nodes, post_edges = delete_nodes(
        people, person, ["alice"], edge_tables={"PLAYS_FOR": (edges, rel)}
    )
    assert sorted(r["name"] for r in post_nodes.collect()) == ["bob", "carol"]
    remaining = sorted(
        (r["source"], r["target"]) for r in post_edges["PLAYS_FOR"].collect()
    )
    assert remaining == [("bob", "reds"), ("carol", "blues")]  # alice edge gone


def test_match_nodes_paged(setup):
    person, _, _, people, _, _ = setup
    page = match_nodes(people, person, filters={"age__gte": 25}, limit=2, skip=1)
    assert [r["name"] for r in page.collect()] == ["bob", "carol"]


def test_match_relationships_hydrates(setup):
    person, team, rel, people, teams, edges = setup
    out = match_relationships(edges, rel, people, teams, person, team)
    rows = out.collect()
    assert len(rows) == 3
    r = [x for x in rows if x["source"] == "alice"][0]
    assert r["source_age"] == 30 and r["target_team"] == "reds"


def test_match_relationships_drops_orphan_edges(spark, setup):
    person, team, rel, people, teams, _ = setup
    edges = spark.createDataFrame(
        [("alice", "reds"), ("ghost", "reds")], "source string, target string"
    )
    out = match_relationships(edges, rel, people, teams, person, team)
    assert out.count() == 1  # J6: rel without endpoints dropped


def test_match_one_first_or_none_with_multiplicity_warning(spark, setup):
    """F1 first-or-None + the reference's >1-result warning
    (neo4jengine.py:267-283, tests/test_graph_connection.py:58-72)."""
    import warnings

    from neontology_spark.nodes import create_nodes, match_one

    person, team, rel, people, teams, edges = setup
    assert match_one(people, person, "nobody") is None
    row = match_one(people, person, "alice")
    assert row is not None and row["name"] == "alice"
    # duplicate pp: CREATE allows it; match_one returns first and WARNS
    dup = create_nodes(people, people.filter(people["name"] == "alice"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        row = match_one(dup, person, "alice")
        assert row is not None and row["name"] == "alice"
        assert any("Multiple" in str(x.message) for x in w)
