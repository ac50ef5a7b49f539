"""Importer / dump tool tests — replay reference
tests/test_tools/test_import_records.py and test_import_files.py semantics."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from neontology_spark.checks.referential import UnmatchedError
from neontology_spark.models import ModelCatalog, NodeModel, Property, RelationshipModel
from neontology_spark.tools import (
    ImportError_,
    classify_records,
    dump_nodes,
    dump_relationships,
    import_json_files,
    import_md_files,
    import_records,
    import_yaml_files,
    node_link_data,
)


@pytest.fixture(scope="module")
def catalog():
    cat = ModelCatalog()
    cat.register_node(
        NodeModel(
            label="PersonX",
            primary_property="name",
            properties=[Property("name", str), Property("age", int, required=False)],
        )
    )
    cat.register_node(
        NodeModel(label="TeamX", primary_property="team", properties=[Property("team", str)])
    )
    cat.register_rel(
        RelationshipModel(rel_type="MEMBER_OF", source_label="PersonX", target_label="TeamX")
    )
    return cat


RAW_DDL = (
    "LABEL string, RELATIONSHIP_TYPE string, SOURCE_LABEL string, "
    "TARGET_LABEL string, name string, age long, team string, "
    "source string, target string"
)


def raw_df(spark, rows):
    return spark.createDataFrame(rows, RAW_DDL)


def test_classify_and_import(spark, catalog):
    raw = raw_df(
        spark,
        [
            ("PersonX", None, None, None, "alice", 30, None, None, None),
            ("PersonX", None, None, None, "bob", 25, None, None, None),
            ("TeamX", None, None, None, None, None, "reds", None, None),
            (None, "MEMBER_OF", "PersonX", "TeamX", None, None, None, "alice", "reds"),
        ],
    )
    nodes, rels, bad = classify_records(raw)
    assert nodes.count() == 3 and rels.count() == 1 and bad.count() == 0

    report = import_records(raw, catalog)
    assert set(report.nodes_by_label) == {"PersonX", "TeamX"}
    assert report.nodes_by_label["PersonX"].count() == 2
    assert report.rels_by_type["MEMBER_OF"].count() == 1
    assert report.ri_unmatched.count() == 0


def test_bad_record_raises(spark, catalog):
    raw = raw_df(
        spark,
        [(None, None, None, None, "ghost", None, None, None, None)],
    )
    with pytest.raises(ImportError_):
        import_records(raw, catalog)


def test_unknown_label_raises(spark, catalog):
    raw = raw_df(
        spark, [("Nonexistent", None, None, None, "x", None, None, None, None)]
    )
    with pytest.raises(ImportError_):
        import_records(raw, catalog)


def test_ri_unmatched_reported_and_escalated(spark, catalog):
    raw = raw_df(
        spark,
        [
            ("PersonX", None, None, None, "alice", 30, None, None, None),
            ("TeamX", None, None, None, None, None, "reds", None, None),
            (None, "MEMBER_OF", "PersonX", "TeamX", None, None, None, "ghost", "reds"),
        ],
    )
    report = import_records(raw, catalog)
    um = report.ri_unmatched.collect()
    assert [(r["side"], r["key"]) for r in um] == [("source", "ghost")]
    with pytest.raises(UnmatchedError):
        import_records(raw, catalog, error_on_unmatched=True)


RAW_RELS_OUT_DDL = (
    "LABEL string, name string, age long, team string, "
    "RELATIONSHIPS_OUT array<struct<RELATIONSHIP_TYPE:string, "
    "TARGET_LABEL:string, TARGET_PROPERTY:string, TARGETS:array<string>>>"
)


def test_relationships_out_exploded_and_checked(spark, catalog):
    """Nested RELATIONSHIPS_OUT import (reference import_records.py:239-298):
    each node record's pp value becomes the edge source; TARGETS explode to
    one edge per target; RI checks run on the exploded edges."""
    from neontology_spark.tools.import_records import explode_relationships_out

    raw = spark.createDataFrame(
        [
            ("PersonX", "alice", 30, None,
             [("MEMBER_OF", "TeamX", None, ["reds", "ghost_team"])]),
            ("PersonX", "bob", 25, None, None),
            ("TeamX", None, None, "reds", None),
        ],
        RAW_RELS_OUT_DDL,
    )
    exploded = explode_relationships_out(raw, catalog)
    rows = sorted(
        (r["SOURCE_LABEL"], r["source"], r["RELATIONSHIP_TYPE"], r["target"])
        for r in exploded.collect()
    )
    assert rows == [
        ("PersonX", "alice", "MEMBER_OF", "ghost_team"),
        ("PersonX", "alice", "MEMBER_OF", "reds"),
    ]

    report = import_records(raw, catalog)
    assert report.rels_by_type["MEMBER_OF"].count() == 2
    um = {(r["side"], r["key"]) for r in report.ri_unmatched.collect()}
    assert um == {("target", "ghost_team")}


def test_relationships_out_target_property(spark, catalog):
    """TARGET_PROPERTY selects an alternate match column (J3)."""
    raw = spark.createDataFrame(
        [
            ("PersonX", "alice", 30, None,
             [("MEMBER_OF", "PersonX", "age", ["25"])]),
            ("PersonX", "bob", 25, None, None),
        ],
        RAW_RELS_OUT_DDL,
    )
    report = import_records(raw, catalog)
    # target "25" matches bob via the age column — no unmatched rows
    assert report.ri_unmatched.count() == 0
    assert report.rels_by_type["MEMBER_OF"].count() == 1


def test_merge_into_existing(spark, catalog):
    existing = spark.createDataFrame([("alice", 99)], "name string, age long")
    raw = raw_df(
        spark,
        [
            ("PersonX", None, None, None, "alice", 30, None, None, None),
            ("PersonX", None, None, None, "carol", 41, None, None, None),
        ],
    )
    report = import_records(raw, catalog, existing_tables={"PersonX": existing})
    post = {r["name"]: r["age"] for r in report.nodes_by_label["PersonX"].collect()}
    assert post == {"alice": 30, "carol": 41}  # always_set updates, new created


def test_dump_import_roundtrip(spark, catalog):
    """S7→S6 round-trip (reference test_import_records.py:78-108)."""
    people = spark.createDataFrame([("alice", 30), ("bob", 25)], "name string, age long")
    dumped = dump_nodes(people, catalog.nodes["PersonX"])
    assert dumped.columns[0] == "LABEL"
    report = import_records(dumped, catalog)
    back = report.nodes_by_label["PersonX"].select("name", "age")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, people.collect()))


def test_dump_relationships_and_node_link_data(spark, catalog):
    people = spark.createDataFrame([("alice", 30), ("alice", 30)], "name string, age long")
    teams = spark.createDataFrame([("reds",)], "team string")
    edges = spark.createDataFrame(
        [("alice", "reds"), ("alice", "reds")], "source string, target string"
    )
    rel_model = catalog.rels["MEMBER_OF"]
    d = dump_relationships(edges, rel_model)
    assert {"RELATIONSHIP_TYPE", "SOURCE_LABEL", "TARGET_LABEL"} <= set(d.columns)
    nodes, links = node_link_data(
        {"PersonX": (people, catalog.nodes["PersonX"]), "TeamX": (teams, catalog.nodes["TeamX"])},
        {"MEMBER_OF": (edges, rel_model)},
    )
    assert nodes.count() == 2  # alice dedup'd by label:pp + reds
    assert links.count() == 1  # identical edges dedup'd by dump hash
    ids = {r["id"] for r in nodes.collect()}
    assert ids == {"PersonX:alice", "TeamX:reds"}


def test_import_files_json_yaml_md(spark, tmp_path, catalog):
    (tmp_path / "a.json").write_text('[{"LABEL": "PersonX", "name": "jo", "age": 5}]')
    (tmp_path / "b.yaml").write_text("LABEL: PersonX\nname: ky\nage: 6\n---\nLABEL: PersonX\nname: al\nage: 7\n")
    (tmp_path / "c.md").write_text("---\nLABEL: PersonX\nname: md_person\nage: 8\n---\n# Body title\ntext here\n")

    j = import_json_files(spark, str(tmp_path / "a.json"))
    assert [r["name"] for r in j.collect()] == ["jo"]

    y = import_yaml_files(spark, str(tmp_path / "b.yaml"))
    assert sorted(r["name"] for r in y.collect()) == ["al", "ky"]

    m = import_md_files(spark, str(tmp_path / "c.md"))
    row = m.collect()[0]
    assert row["name"] == "md_person" and "Body title" in row["body"]

    # files feed the typed importer directly
    report = import_records(y, catalog)
    assert report.nodes_by_label["PersonX"].count() == 2
