"""Property-type matrix (FIXTURES.md §3) — replay reference
tests/test_basenode.py:1082-1233 and test_commonmodel.py:59-103 semantics
at the table level."""

import datetime
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from neontology_spark.checks import check_schema
from neontology_spark.models import (
    NodeModel,
    Property,
    UnsupportedTypeError,
)


@pytest.fixture(scope="module")
def matrix_model():
    return NodeModel(
        label="TypeMatrix",
        primary_property="c_str",
        properties=[
            Property("c_str", str),
            Property("c_int", int, required=False),
            Property("c_float", float, required=False),
            Property("c_bool", bool, required=False),
            Property("c_bytes", bytes, required=False),
            Property("c_date", datetime.date, required=False),
            Property("c_ts", datetime.datetime, required=False),
            Property("c_list_str", "array<string>", required=False),
            Property("c_list_int", "array<long>", required=False),
            Property("c_uuid", uuid.UUID, required=False),  # → string
            Property("c_enum", str, required=False, enum_values=("value1", "value2", "value3")),
        ],
    )


def test_matrix_struct_type(matrix_model):
    st = matrix_model.struct_type()
    by_name = {f.name: f.dataType for f in st.fields}
    assert by_name["c_list_int"] == T.ArrayType(T.LongType())
    assert by_name["c_uuid"] == T.StringType()
    assert by_name["c_bytes"] == T.BinaryType()


def test_matrix_roundtrip_clean(spark, matrix_model):
    df = spark.createDataFrame(
        [
            Row(
                c_str="row1",
                c_int=5,
                c_float=1.5,
                c_bool=True,
                c_bytes=b"\x00\x01",
                c_date=datetime.date(2024, 1, 1),
                c_ts=datetime.datetime(2024, 1, 1, 12, 0),
                c_list_str=["a", "b"],
                c_list_int=[1, 2],
                c_uuid=str(uuid.uuid4()),
                c_enum="value1",
            ),
            # empty-list row is allowed (reference test_basenode.py:1218-1233)
            Row(
                c_str="row2", c_int=None, c_float=None, c_bool=None,
                c_bytes=None, c_date=None, c_ts=None,
                c_list_str=[], c_list_int=[], c_uuid=None, c_enum=None,
            ),
        ],
        matrix_model.struct_type(),
    )
    assert check_schema(df, matrix_model) == []
    back = df.collect()
    assert back[0]["c_list_int"] == [1, 2]
    assert [r for r in back if r["c_str"] == "row2"][0]["c_list_str"] == []


def test_map_column_rejected_at_model_level():
    # dict property forbidden (graphengine.py:59-60)
    with pytest.raises(UnsupportedTypeError):
        Property("bad_map", "map<string,string>")
    with pytest.raises(UnsupportedTypeError):
        Property("bad_map", dict)


def test_map_column_flagged_at_table_level(spark, matrix_model):
    df = spark.createDataFrame(
        [Row(c_str="x", props={"k": "v"})],
        T.StructType([
            T.StructField("c_str", T.StringType(), False),
            T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        ]),
    )
    v = check_schema(df, matrix_model)
    assert any(x["column"] == "props" and "unexpected column" in x["detail"] for x in v)


def test_heterogeneous_array_impossible_by_construction():
    # ArrayType(elem) enforces homogeneity; nested arrays rejected like
    # heterogeneous lists (graphengine.py:66-75)
    with pytest.raises(UnsupportedTypeError):
        Property("nested", T.ArrayType(T.ArrayType(T.StringType())))
