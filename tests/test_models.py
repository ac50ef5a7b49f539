"""Model DSL unit tests — replays the reference's model-layer semantics
(reference tests: test_basenode.py:64-91/174-194, test_commonmodel.py)."""

import datetime
import enum
import uuid

import pytest
from pyspark.sql import types as T

from neontology_spark.identifiers import InvalidIdentifierError, check_identifier, check_int
from neontology_spark.models import (
    MergePolicy,
    ModelCatalog,
    ModelError,
    NodeModel,
    Property,
    RelationshipModel,
    UnsupportedTypeError,
    resolve_type,
)


# -- identifier rule (gql.py:4-10) ------------------------------------------
@pytest.mark.parametrize("good", ["Person", "test_prop", "a1", "Xy_9"])
def test_identifier_ok(good):
    assert check_identifier(good) == good


@pytest.mark.parametrize("bad", ["", "1abc", "_x", "a", "has space", "a-b", "a;b", None])
def test_identifier_bad(bad):
    with pytest.raises((InvalidIdentifierError, TypeError)):
        check_identifier(bad)


def test_check_int():
    assert check_int(5) == 5
    assert check_int("12") == 12
    with pytest.raises(ValueError):
        check_int(True)
    with pytest.raises(ValueError):
        check_int("1; DROP")


# -- type domain (graphengine.py:22-84) --------------------------------------
def test_resolve_python_types():
    assert resolve_type(str) == T.StringType()
    assert resolve_type(int) == T.LongType()
    assert resolve_type(float) == T.DoubleType()
    assert resolve_type(bool) == T.BooleanType()
    assert resolve_type(bytes) == T.BinaryType()
    assert resolve_type(datetime.date) == T.DateType()
    assert resolve_type(datetime.datetime) == T.TimestampType()
    assert resolve_type(uuid.UUID) == T.StringType()  # str() fallback


def test_resolve_enum_to_string():
    class Color(enum.Enum):
        RED = "red"

    assert resolve_type(Color) == T.StringType()


def test_dict_rejected():
    # graphengine.py:59-60: dict → TypeError
    with pytest.raises(UnsupportedTypeError):
        resolve_type(dict)
    with pytest.raises(UnsupportedTypeError):
        resolve_type(T.MapType(T.StringType(), T.StringType()))
    with pytest.raises(UnsupportedTypeError):
        resolve_type("map<string,string>")


def test_homogeneous_list_ok_nested_rejected():
    assert resolve_type("array<long>") == T.ArrayType(T.LongType())
    with pytest.raises(UnsupportedTypeError):
        resolve_type(T.ArrayType(T.ArrayType(T.LongType())))  # heterogeneity analogue
    with pytest.raises(UnsupportedTypeError):
        resolve_type(list)  # bare list needs element type


def test_ddl_string():
    assert resolve_type("string") == T.StringType()
    assert resolve_type("int") == T.IntegerType()


# -- NodeModel ----------------------------------------------------------------
def make_person():
    return NodeModel(
        label="PersonLabel",
        primary_property="name",
        properties=[
            Property("name", str),
            Property("age", int, required=False),
            Property(
                "only_set_on_match", str, required=False, policy=MergePolicy.SET_ON_MATCH
            ),
            Property(
                "only_set_on_create", str, required=False, policy=MergePolicy.SET_ON_CREATE
            ),
        ],
        secondary_labels=("Extra",),
    )


def test_node_model_basic():
    m = make_person()
    assert m.all_labels == ("PersonLabel", "Extra")
    st = m.struct_type()
    # required fields sorted first (basenode.py:620-625)
    assert st.fields[0].name == "name" and not st.fields[0].nullable
    assert m.required_columns() == ["name"]
    assert m.columns_by_policy(MergePolicy.SET_ON_MATCH) == ["only_set_on_match"]
    assert "PersonLabel" in m.markdown_schema()


def test_node_model_pp_must_exist_and_be_required():
    with pytest.raises(ModelError):
        NodeModel(label="X1", primary_property="nope", properties=[Property("aa")])
    with pytest.raises(ModelError):
        NodeModel(
            label="X1",
            primary_property="aa",
            properties=[Property("aa", str, required=False)],
        )


def test_bad_label_rejected():
    # basenode.py:153-181 identifier validation
    with pytest.raises(InvalidIdentifierError):
        NodeModel(label="9bad", primary_property="aa", properties=[Property("aa")])


def test_alias_rename_map():
    m = NodeModel(
        label="AliasedUser",
        primary_property="user_name",
        properties=[
            Property("user_name", str, alias="userName"),
            Property("some_other_property", str, required=False, alias="otherProperty"),
        ],
    )
    assert m.rename_map() == {
        "user_name": "userName",
        "some_other_property": "otherProperty",
    }
    assert m.pp_storage == "userName"


# -- RelationshipModel + catalog ---------------------------------------------
def test_catalog_and_rels():
    cat = ModelCatalog()
    cat.register_node(make_person())
    cat.register_node(
        NodeModel(label="Team", primary_property="team_id", properties=[Property("team_id")])
    )
    rel = RelationshipModel(
        rel_type="BELONGS_TO",
        source_label="PersonLabel",
        target_label="Team",
        properties=[Property("role", str, required=False, policy=MergePolicy.MERGE_ON)],
    )
    cat.register_rel(rel)
    assert rel.merge_on == ["role"]
    assert cat.rels_by_source("PersonLabel") == [rel]
    assert cat.rels_by_target("Team") == [rel]
    # auto constraints from (label, pp) — utils.py:156-176
    names = {c.name for c in cat.auto_constraints()}
    assert names == {"unique__PersonLabel__name", "unique__Team__team_id"}


def test_catalog_rejects_unknown_endpoint_and_abstract():
    cat = ModelCatalog()
    with pytest.raises(ModelError):
        cat.register_rel(
            RelationshipModel(rel_type="R1", source_label="Nope", target_label="Nope")
        )
    abstract = NodeModel(
        label="ignored", primary_property="aa", properties=[Property("aa")], abstract=True
    )
    with pytest.raises(ModelError):
        cat.register_node(abstract)


def test_constraint_management():
    cat = ModelCatalog()
    c = cat.apply_constraint("ImageX", "image_id")
    assert cat.get_constraints() == [c.name]
    cat.drop_constraint(c.name)
    assert cat.get_constraints() == []
    with pytest.raises(ValueError):
        cat.drop_constraint("nope")


def test_related_query_registration(spark):
    """@related_nodes / @related_property analogue: named query functions
    registered on the model, discovered, and runnable
    (reference basenode.py:20-78, 117-151)."""
    from pyspark.sql import functions as F

    m = NodeModel(
        label="PersonR",
        primary_property="name",
        properties=[Property("name", str)],
    )

    @m.related_nodes()
    def followers(edges, key):
        return edges.filter(F.col("target") == key).select("source")

    @m.related_property("follower_count")
    def _count(edges, key):
        return edges.filter(F.col("target") == key).count()

    assert set(m.get_related_node_methods()) == {"followers"}
    assert set(m.get_related_property_methods()) == {"follower_count"}

    edges = spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("b", "a")], "source string, target string"
    )
    got = sorted(r["source"] for r in m.run_related("followers", edges, "b").collect())
    assert got == ["a", "c"]
    assert m.run_related("follower_count", edges, "b") == 2
    with pytest.raises(KeyError):
        m.run_related("nope", edges, "b")


def test_catalog_markdown_schema():
    """Whole-graph markdown dump: node sections, rel sections with
    endpoint arrows and merge_on, properties sorted required-first
    (reference schema_utils.py:53-89 / basenode.py:620-625)."""
    from neontology_spark.models import (
        ModelCatalog,
        NodeModel,
        Property,
        RelationshipModel,
    )

    cat = ModelCatalog()
    cat.register_node(
        NodeModel(
            label="Person",
            primary_property="pid",
            properties=[Property("pid", int), Property("name", str, required=False)],
        )
    )
    cat.register_node(
        NodeModel(
            label="City",
            primary_property="cid",
            properties=[Property("cid", int)],
        )
    )
    cat.register_rel(
        RelationshipModel(
            rel_type="LIVES_IN",
            source_label="Person",
            target_label="City",
            properties=[Property("since", int, required=False)],
        )
    )
    md = cat.markdown_schema()
    assert md.index("## City") < md.index("## Person")  # sorted labels
    assert "(:Person)-[:LIVES_IN]->(:City)" in md
    assert "| since | bigint | no |" in md
    # required-first ordering inside a node section
    sec = md[md.index("## Person"):]
    assert sec.index("| pid |") < sec.index("| name |")
