"""Core constraint checks: schema conformance, required-field nulls,
value-domain, uniqueness (plain + salted two-phase for hot keys).

Reference semantics being replayed:
* unexpected columns ⇒ hard error — Pydantic ``extra="forbid"``
  (``src/neontology/commonmodel.py:11``); here: schema-conformance
  violations instead of a raise, so a 100 TB run reports instead of dying.
* required (non-Optional) field present and non-null — Pydantic required
  fields (``schema_utils.py:92-135``).
* enum value domain (``schema_utils.py:95-102``).
* uniqueness of the primary property — ``apply_constraint``
  (``neo4jengine.py:285-298``) + duplicate-create test
  (``tests/test_basenode.py:113-141``: duplicates are *detected*, not
  prevented at write).

Scale notes per check are on the functions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..models import NodeModel, Property
from .base import CheckResult, shape_violations

# ---------------------------------------------------------------------------
# Schema conformance (driver-side: compares schemas, not data)
# ---------------------------------------------------------------------------


def check_schema(df: DataFrame, model: NodeModel) -> list[dict]:
    """Compare ``df.schema`` against the model's StructType.

    Returns driver-side violation dicts (schema mismatch is a property of
    the table, not of rows — zero data is read). Mirrors ``extra="forbid"``
    (unexpected column), missing required column, and type mismatch.
    """
    expected = {f.name: f for f in model.struct_type().fields}
    actual = {f.name: f for f in df.schema.fields}
    out: list[dict] = []
    for name in sorted(set(actual) - set(expected)):
        out.append(
            {
                "check": "schema_conformance",
                "label": model.label,
                "column": name,
                "detail": "unexpected column (extra=forbid, commonmodel.py:11)",
            }
        )
    for name, f in expected.items():
        if name not in actual:
            sev = "missing required column" if not f.nullable else "missing optional column"
            out.append(
                {
                    "check": "schema_conformance",
                    "label": model.label,
                    "column": name,
                    "detail": sev,
                }
            )
        elif actual[name].dataType.simpleString() != f.dataType.simpleString():
            out.append(
                {
                    "check": "schema_conformance",
                    "label": model.label,
                    "column": name,
                    "detail": (
                        f"type mismatch: expected {f.dataType.simpleString()}, "
                        f"got {actual[name].dataType.simpleString()}"
                    ),
                }
            )
    return out


def schema_violations_df(spark, df: DataFrame, model: NodeModel) -> DataFrame:
    """check_schema as a VIOLATION_SCHEMA DataFrame (for uniform reporting)."""
    rows = [
        (None, v["check"], v["label"], v["column"], None, v["detail"])
        for v in check_schema(df, model)
    ]
    from .base import VIOLATION_SCHEMA

    return spark.createDataFrame(rows, VIOLATION_SCHEMA)


# ---------------------------------------------------------------------------
# Required-field nulls
# ---------------------------------------------------------------------------


def check_required(
    df: DataFrame,
    model: NodeModel,
    part_col: Optional[str] = None,
    columns: Optional[Sequence[str]] = None,
) -> CheckResult:
    """Rows where any required column is NULL.

    One scan, one OR-of-isNull predicate — pushed into the parquet scan as
    IsNotNull filters' complement; only the required columns (+ part + pp)
    are read, never wide payloads.
    """
    cols = list(columns) if columns is not None else model.required_columns()
    cols = [c for c in cols if c in df.columns]
    pp = model.pp_storage
    if not cols:
        empty = df.sparkSession.createDataFrame(
            [], "part long, check string, label string, column string, key string, detail string"
        )
        return CheckResult("required_not_null", model.label, empty)
    # one violation row per (row, null column): stack the per-column checks
    # via an array of structs + explode — still a single scan, no shuffle.
    struct_arr = F.array(
        *[
            F.when(
                F.col(c).isNull(),
                F.struct(F.lit(c).alias("column")),
            )
            for c in cols
        ]
    )
    exploded = (
        df.select(
            *( [F.col(part_col)] if part_col else [] ),
            F.col(pp).cast("string").alias("_key"),
            F.explode(F.filter(struct_arr, lambda s: s.isNotNull())).alias("_v"),
        )
    )
    vio = shape_violations(
        exploded,
        check="required_not_null",
        label=model.label,
        part_col=part_col,
        column=F.col("_v.column"),
        key=F.col("_key"),
        detail="required column is NULL",
    )
    return CheckResult("required_not_null", model.label, vio)


# ---------------------------------------------------------------------------
# Value domain (enum)
# ---------------------------------------------------------------------------


def check_domain(
    df: DataFrame,
    model: NodeModel,
    part_col: Optional[str] = None,
) -> CheckResult:
    """Rows whose enum-domained columns hold out-of-domain values
    (reference enum handling, schema_utils.py:95-102). NULLs are the
    required-check's business, not the domain check's."""
    enum_props: list[Property] = [p for p in model.properties if p.enum_values]
    pp = model.pp_storage
    preds = []
    for p in enum_props:
        c = p.storage_name
        if c in df.columns:
            preds.append(
                F.when(
                    F.col(c).isNotNull() & ~F.col(c).isin(list(p.enum_values)),
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    ),
                )
            )
    if not preds:
        empty = df.sparkSession.createDataFrame([], "part long, check string, label string, column string, key string, detail string")
        return CheckResult("value_domain", model.label, empty)
    exploded = df.select(
        *([F.col(part_col)] if part_col else []),
        F.col(pp).cast("string").alias("_key"),
        F.explode(F.filter(F.array(*preds), lambda s: s.isNotNull())).alias("_v"),
    )
    vio = shape_violations(
        exploded,
        check="value_domain",
        label=model.label,
        part_col=part_col,
        column=F.col("_v.column"),
        key=F.col("_key"),
        detail=F.concat(F.lit("out-of-domain value: "), F.col("_v.value")),
    )
    return CheckResult("value_domain", model.label, vio)


# ---------------------------------------------------------------------------
# Secondary-label conformance
# ---------------------------------------------------------------------------


def check_labels(
    df: DataFrame,
    model: NodeModel,
    labels_col: str = "labels",
    part_col: Optional[str] = None,
) -> CheckResult:
    """Rows whose label set ≠ {primary} ∪ secondaries.

    Replays the reference's unexpected-label warning on read-back
    (``neo4jengine.py:77-80``), consuming ``NodeModel.all_labels``
    (models.py). ``labels_col`` is an array<string> column (how a
    graph-export table carries its label sets); comparison is order- and
    NULL-safe: a NULL or missing-any-label set is a violation row.
    """
    expected = F.array(*[F.lit(x) for x in sorted(model.all_labels)])
    bad = df.filter(~F.array_sort(F.col(labels_col)).eqNullSafe(expected))
    vio = shape_violations(
        bad,
        check="label_conformance",
        label=model.label,
        part_col=part_col,
        column=labels_col,
        key=F.col(model.pp_storage).cast("string"),
        detail=F.concat(
            F.lit("unexpected label set: ["),
            F.array_join(
                F.coalesce(F.col(labels_col), F.array().cast("array<string>")), ","
            ),
            F.lit("]"),
        ),
    )
    return CheckResult("label_conformance", model.label, vio)


# ---------------------------------------------------------------------------
# Uniqueness
# ---------------------------------------------------------------------------


def duplicate_keys(
    df: DataFrame,
    key_col: str,
    salted: bool = False,
    salt_buckets: int = 64,
) -> DataFrame:
    """(key, dup_count) for keys appearing more than once.

    Plain path: ``groupBy(key).count()`` — Spark's HashAggregate already
    does map-side partial aggregation, so each duplicate key ships one
    partial row per input partition, not one per duplicate row.

    Salted path (``salted=True``): two-phase aggregate
    ``groupBy(key, salt) → groupBy(key)`` for pathologically hot keys
    (e.g. a phash repeated 10^9 times): phase 1 spreads the hot key over
    ``salt_buckets`` reducers, phase 2 aggregates ``salt_buckets`` rows.
    With map-side combine the plain path is usually enough; the salted path
    is the explicit skew hedge the north_rule asks for. MEASURED
    (BENCH/skew.py, 30% hot key on 16M rows): for this count shape the
    partial aggregation already de-skews and salting costs ~1.5x (one
    extra Exchange) — it is insurance, not speedup; the shape where the
    salted two-phase plan genuinely wins (4.5x, and at 10^12 rows the
    difference between running and OOM) is holistic aggregation per key
    (collect_set/collect_list dup-group membership), where unsalted
    partials merge in a single final task. See BENCH/BASELINE.md
    § planted skew.
    """
    if salted:
        salt = F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(salt_buckets))
        partial = (
            df.select(F.col(key_col).alias("key"), salt.alias("_salt"))
            .groupBy("key", "_salt")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        counts = partial.groupBy("key").agg(F.sum("_c").alias("dup_count"))
    else:
        counts = df.groupBy(F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("dup_count")
        )
    return counts.filter(F.col("dup_count") > 1)


def check_unique(
    df: DataFrame,
    model: NodeModel,
    column: Optional[str] = None,
    part_col: Optional[str] = None,
    salted: bool = False,
    check_name: Optional[str] = None,
) -> CheckResult:
    """Violation rows = every row whose key collides (all members of each
    duplicate group, so the user sees the full collision set — matching the
    reference's create-twice-count-2 observability,
    tests/test_basenode.py:113-141).

    Plan shape at scale: aggregate (map-side combined) → tiny dup-key set →
    **broadcast** semi-join back to the table to pull the member rows.
    The dup set is small by assumption (violations are rare); if it were
    huge, the table itself is the problem, not the plan.
    """
    key_col = column or model.pp_storage
    name = check_name or f"unique__{key_col}"
    dups = duplicate_keys(df, key_col, salted=salted)
    # NULL-safe member join: a nullable unique column with several NULL rows
    # is a duplicate group too (groupBy counts NULLs together); a plain
    # equi-join would silently drop those members from the violation set.
    members = df.join(
        F.broadcast(dups), df[key_col].eqNullSafe(dups["key"]), "inner"
    ).drop(dups["key"])
    vio = shape_violations(
        members,
        check=name,
        label=model.label,
        part_col=part_col,
        column=key_col,
        key=F.col(key_col).cast("string"),
        detail=F.concat(F.lit("duplicate key, count="), F.col("dup_count").cast("string")),
    )
    return CheckResult(name, model.label, vio)
