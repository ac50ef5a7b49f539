"""Filter DSL tests — one per lookup, replaying
reference tests/test_basenode.py:474-1027 semantics (FIXTURES.md §4)."""

import pytest
from pyspark.sql import Row

from neontology_spark.filters import FilterError, compile_filters


@pytest.fixture(scope="module")
def products(spark):
    rows = [
        Row(id="p1", name="Laptop", category="Electronics", price=999.0, stock=5, rating=4.5, active=True),
        Row(id="p2", name="Phone", category="electronics", price=599.0, stock=0, rating=4.0, active=True),
        Row(id="p3", name="Desk Lamp", category="Home", price=39.0, stock=12, rating=None, active=False),
        Row(id="p4", name="lapdog bed", category="Pets", price=25.0, stock=3, rating=3.0, active=True),
    ]
    return spark.createDataFrame(rows)


def names(df, filters, rename=None):
    pred = compile_filters(filters, rename)
    out = df if pred is None else df.filter(pred)
    return sorted(r["name"] for r in out.select("name").collect())


def test_exact(products):
    assert names(products, {"category": "Electronics"}) == ["Laptop"]
    assert names(products, {"category__exact": "Electronics"}) == ["Laptop"]


def test_iexact(products):
    assert names(products, {"category__iexact": "ELECTRONICS"}) == ["Laptop", "Phone"]


def test_contains_icontains(products):
    assert names(products, {"name__contains": "Lap"}) == ["Laptop"]
    assert names(products, {"name__icontains": "lap"}) == ["Laptop", "lapdog bed"]


def test_startswith_istartswith(products):
    assert names(products, {"name__startswith": "Lap"}) == ["Laptop"]
    assert names(products, {"name__istartswith": "lap"}) == ["Laptop", "lapdog bed"]


def test_endswith(products):
    assert names(products, {"name__endswith": "bed"}) == ["lapdog bed"]
    assert names(products, {"name__iendswith": "LAMP"}) == ["Desk Lamp"]


def test_numeric_lookups(products):
    assert names(products, {"price__gt": 599.0}) == ["Laptop"]
    assert names(products, {"price__gte": 599.0}) == ["Laptop", "Phone"]
    assert names(products, {"stock__lt": 4}) == ["Phone", "lapdog bed"]
    assert names(products, {"stock__lte": 3}) == ["Phone", "lapdog bed"]


def test_in(products):
    assert names(products, {"category__in": ["Home", "Pets"]}) == ["Desk Lamp", "lapdog bed"]
    with pytest.raises(FilterError):
        compile_filters({"category__in": "Home"})


def test_isnull(products):
    assert names(products, {"rating__isnull": True}) == ["Desk Lamp"]
    assert names(products, {"rating__isnull": False}) == ["Laptop", "Phone", "lapdog bed"]
    with pytest.raises(FilterError):
        compile_filters({"rating__isnull": 1})


def test_combined_and(products):
    # multiple filters AND together (graphengine.py:344)
    assert names(products, {"active": True, "price__lt": 600.0, "stock__gt": 0}) == ["lapdog bed"]


def test_empty_filters_match_all(products):
    assert compile_filters(None) is None
    assert compile_filters({}) is None
    assert len(names(products, None)) == 4


def test_unknown_lookup_raises():
    # graphengine.py:340-341
    with pytest.raises(FilterError):
        compile_filters({"price__regex": ".*"})


def test_rename_map(products):
    # alias handling: logical name 'cat' stored as 'category'
    assert names(products, {"cat__iexact": "pets"}, rename={"cat": "category"}) == ["lapdog bed"]


def test_pushdown_reaches_scan(spark, tmp_path):
    """The compiled predicate must reach the parquet scan (PushedFilters) —
    the 100 TB requirement that filters prune IO, not post-filter rows."""
    p = str(tmp_path / "prod.parquet")
    spark.createDataFrame([Row(id="x1", price=1.0)]).write.parquet(p)
    df = spark.read.parquet(p)
    pred = compile_filters({"price__gt": 0.5})
    plan = df.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(price" in plan


def test_temporal_accessors(spark):
    """field__year / field__month__in / field__day__lte — reference
    datetime-component access (tests/test_basenode.py:391-415)."""
    import datetime

    rows = [
        Row(id="e1", created=datetime.datetime(2022, 5, 4, 3, 21)),
        Row(id="e2", created=datetime.datetime(2022, 7, 9, 18, 0)),
        Row(id="e3", created=datetime.datetime(2023, 5, 4, 3, 21)),
        Row(id="e4", created=None),
    ]
    df = spark.createDataFrame(rows)

    def ids(filters):
        return sorted(r["id"] for r in df.filter(compile_filters(filters)).collect())

    assert ids({"created__year": 2022}) == ["e1", "e2"]
    assert ids({"created__year": 2022, "created__month__gte": 6}) == ["e2"]
    assert ids({"created__month__in": [5]}) == ["e1", "e3"]
    assert ids({"created__day__lte": 4, "created__hour": 3}) == ["e1", "e3"]
    assert ids({"created__date": datetime.date(2023, 5, 4)}) == ["e3"]
    # accessor with unknown trailing lookup still raises
    with pytest.raises(FilterError):
        compile_filters({"created__year__regex": ".*"})
