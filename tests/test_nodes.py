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


def test_match_nodes_keyset_paging_disjoint(setup):
    """Seek pages (after=<last key>) cover the same rows as offset pages,
    disjointly (VERDICT r2 #3)."""
    person, _, _, people, _, _ = setup
    p1 = match_nodes(people, person, limit=2)
    rows1 = [r["name"] for r in p1.collect()]
    assert rows1 == ["alice", "bob"]
    p2 = match_nodes(people, person, limit=2, after=rows1[-1])
    rows2 = [r["name"] for r in p2.collect()]
    assert rows2 == ["carol"]
    assert not set(rows1) & set(rows2)
    with pytest.raises(ValueError):
        match_nodes(people, person, limit=2, skip=1, after="alice")


def test_match_nodes_keyset_plan_has_no_global_sort(setup):
    """Seek mode must compile to TakeOrderedAndProject (per-partition
    top-n + driver merge) with NO ordering Exchange — the 10^12-row
    paging path."""
    person, _, _, people, _, _ = setup
    page = match_nodes(people, person, limit=2, after="alice")
    plan = page._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    # offset mode is the positional-parity (expensive) path: global sort
    off = match_nodes(people, person, limit=2, skip=1)
    off_plan = off._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in off_plan or "Sort" in off_plan


def test_delete_nodes_dataframe_kill_set(spark, setup):
    """DataFrame-of-keys overload: same result as the list API, no
    driver round-trip (VERDICT r2 #7)."""
    person, team, rel, people, teams, edges = setup
    kill_df = spark.createDataFrame([("alice",)], "name string")
    post_nodes, post_edges = delete_nodes(
        people, person, kill_df, edge_tables={"PLAYS_FOR": (edges, rel)}
    )
    assert sorted(r["name"] for r in post_nodes.collect()) == ["bob", "carol"]
    assert post_edges["PLAYS_FOR"].count() == 2


def test_delete_nodes_predicate(spark, setup):
    """Column-predicate overload (DELETE WHERE): NULL predicate rows
    survive; cascade uses the matching key set."""
    from pyspark.sql import functions as F

    person, team, rel, people, teams, edges = setup
    with_null = people.unionByName(
        spark.createDataFrame([("dan", None)], "name string, age long")
    )
    post_nodes, post_edges = delete_nodes(
        with_null, person, F.col("age") >= 30,
        edge_tables={"PLAYS_FOR": (edges, rel)},
    )
    # alice(30) + carol(41) deleted; bob(25) stays; dan(NULL age) SURVIVES
    assert sorted(r["name"] for r in post_nodes.collect()) == ["bob", "dan"]
    remaining = sorted(r["source"] for r in post_edges["PLAYS_FOR"].collect())
    assert remaining == ["bob"]


def test_match_relationships_keyset_paging(spark, setup):
    """Composite-key seek paging over hydrated relationship triples."""
    person, team, rel, people, teams, edges = setup
    p1 = match_relationships(edges, rel, people, teams, person, team, limit=2)
    rows1 = [(r["source"], r["target"]) for r in p1.collect()]
    assert rows1 == [("alice", "reds"), ("bob", "reds")]
    p2 = match_relationships(
        edges, rel, people, teams, person, team, limit=2, after=rows1[-1]
    )
    rows2 = [(r["source"], r["target"]) for r in p2.collect()]
    assert rows2 == [("carol", "blues")]
    with pytest.raises(ValueError):
        match_relationships(
            edges, rel, people, teams, person, team, limit=2, skip=1,
            after=("a", "b"),
        )


def test_match_relationships_tie_break_paging(spark, setup):
    """ADVICE r3: with parallel edges per endpoint pair, 2-key seek can
    skip tied rows at a page boundary; the tie_break third key makes
    pages disjoint AND exhaustive."""
    person, team, rel, people, teams, _ = setup
    edges = spark.createDataFrame(
        [("alice", "reds", k) for k in range(5)]
        + [("bob", "reds", 0), ("carol", "blues", 0)],
        "source string, target string, seq long",
    )
    pages, last = [], None
    while True:
        kw = {"after": last, "tie_break": "seq"} if last else {"tie_break": "seq"}
        page = match_relationships(
            edges, rel, people, teams, person, team, limit=2, **kw
        ).collect()
        if not page:
            break
        pages.extend((r["source"], r["target"], r["seq"]) for r in page)
        last = (page[-1]["source"], page[-1]["target"], page[-1]["seq"])
    assert len(pages) == len(set(pages)) == 7  # no skips inside the tie group
    assert [p for p in pages if p[0] == "alice"] == [
        ("alice", "reds", k) for k in range(5)
    ]

    with pytest.raises(ValueError):
        match_relationships(
            edges, rel, people, teams, person, team,
            after=("alice", "reds"), tie_break="seq",
        )
