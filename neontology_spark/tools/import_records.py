"""Typed bulk record importer — S6 (reference
``src/neontology/tools/import_records.py:147-383``).

Spark-native replay: the input is a DataFrame of raw records (typically
``spark.read.json``), classified by discriminator columns:

* ``LABEL`` present → node record for that label's table
* ``RELATIONSHIP_TYPE`` (+``SOURCE_LABEL``/``TARGET_LABEL``) → edge record
* neither → bad record (ValueError, reference ``import_records.py:343-348``)

Nested ``RELATIONSHIPS_OUT`` arrays are exploded into edge records
(``import_records.py:239-298``). Grouping "by label" / "by (type, source,
target)" (``:147-176``) is a driver loop over the tiny label domain, with
each group a *filtered view* of the one scan — Spark caches the classified
frame so N labels don't mean N scans of the raw input.

``validate_only`` runs the full constraint pass (schema conformance,
required nulls, RI unmatched/ambiguous) and returns the violation report
without writing (``import_records.py:353-383``);
``error_on_unmatched`` escalates RI violations to an exception.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.core import check_schema
from ..checks.referential import UnmatchedError, ambiguous_keys, unmatched_rows
from ..models import ModelCatalog
from ..upsert import merge_nodes


class ImportError_(ValueError):
    """Bad import record (reference raises ValueError,
    import_records.py:343-348)."""


META_COLS = (
    "LABEL",
    "RELATIONSHIP_TYPE",
    "SOURCE_LABEL",
    "TARGET_LABEL",
    "SOURCE_PROPERTY",
    "TARGET_PROPERTY",
    "RELATIONSHIPS_OUT",
)


def classify_records(raw: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(node_records, rel_records, bad_records) by discriminator columns.
    One pass; the three outputs are filters over the same cached frame."""
    has_label = F.col("LABEL").isNotNull() if "LABEL" in raw.columns else F.lit(False)
    has_rel = (
        F.col("RELATIONSHIP_TYPE").isNotNull()
        if "RELATIONSHIP_TYPE" in raw.columns
        else F.lit(False)
    )
    nodes = raw.filter(has_label)
    rels = raw.filter(~has_label & has_rel)
    bad = raw.filter(~has_label & ~has_rel)
    return nodes, rels, bad


_EXPLODED_DDL = (
    "RELATIONSHIP_TYPE string, SOURCE_LABEL string, source string, "
    "TARGET_LABEL string, TARGET_PROPERTY string, target string"
)


def explode_relationships_out(nodes: DataFrame, catalog: ModelCatalog) -> DataFrame:
    """Explode nested RELATIONSHIPS_OUT arrays into flat edge records
    (reference import_records.py:239-298). Expected element shape:
    struct(RELATIONSHIP_TYPE, TARGET_LABEL, TARGET_PROPERTY?, TARGETS:array).
    Returns rows (RELATIONSHIP_TYPE, SOURCE_LABEL, source, TARGET_LABEL,
    TARGET_PROPERTY, target).

    The ``source`` endpoint is each node record's OWN primary-property value
    (the reference wires the enclosing node as the edge source,
    import_records.py:260-270); the pp storage column differs per label, so
    resolution is a driver loop over the (tiny) label domain — each label a
    filtered view of the same cached frame, not a re-scan.
    """
    spark = nodes.sparkSession
    if "RELATIONSHIPS_OUT" not in nodes.columns:
        return spark.createDataFrame([], _EXPLODED_DDL)
    elem = nodes.schema["RELATIONSHIPS_OUT"].dataType.elementType
    has_tp = "TARGET_PROPERTY" in getattr(elem, "names", ())
    tp_col = (
        F.col("r.TARGET_PROPERTY") if has_tp else F.lit(None).cast("string")
    )
    with_rels = nodes.filter(
        F.col("RELATIONSHIPS_OUT").isNotNull() & (F.size("RELATIONSHIPS_OUT") > 0)
    )
    labels = [r["LABEL"] for r in with_rels.select("LABEL").distinct().collect()]
    unknown = [lb for lb in labels if lb not in catalog.nodes]
    if unknown:
        raise ImportError_(f"RELATIONSHIPS_OUT under unknown labels: {unknown}")
    out = None
    for lb in labels:
        pp = catalog.nodes[lb].pp_storage
        if pp not in with_rels.columns:
            raise ImportError_(
                f"label {lb!r} records lack their primary property column {pp!r}"
            )
        flat = (
            with_rels.filter(F.col("LABEL") == lb)
            .select(
                F.lit(lb).alias("SOURCE_LABEL"),
                F.col(pp).cast("string").alias("source"),
                F.explode("RELATIONSHIPS_OUT").alias("r"),
            )
            .select(
                F.col("r.RELATIONSHIP_TYPE").alias("RELATIONSHIP_TYPE"),
                "SOURCE_LABEL",
                "source",
                F.col("r.TARGET_LABEL").alias("TARGET_LABEL"),
                tp_col.alias("TARGET_PROPERTY"),
                F.explode("r.TARGETS").alias("target"),
            )
            .withColumn("target", F.col("target").cast("string"))
        )
        out = flat if out is None else out.unionByName(flat)
    return out if out is not None else spark.createDataFrame([], _EXPLODED_DDL)


@dataclass
class ImportReport:
    """What import_records did / would do (validate_only)."""

    nodes_by_label: dict[str, DataFrame] = field(default_factory=dict)
    rels_by_type: dict[str, DataFrame] = field(default_factory=dict)
    schema_violations: list[dict] = field(default_factory=list)
    ri_unmatched: Optional[DataFrame] = None
    ri_ambiguous: Optional[DataFrame] = None
    n_bad_records: int = 0


def import_records(
    raw: DataFrame,
    catalog: ModelCatalog,
    existing_tables: Optional[dict[str, DataFrame]] = None,
    validate_only: bool = False,
    error_on_unmatched: bool = False,
) -> ImportReport:
    """Classify → group → validate → (merge). Returns an ImportReport whose
    ``nodes_by_label`` are the POST-merge tables when ``existing_tables``
    are given (else the typed batch frames)."""
    raw = raw.cache()
    nodes, rels, bad = classify_records(raw)
    report = ImportReport()
    report.n_bad_records = bad.count()
    if report.n_bad_records > 0:
        raise ImportError_(
            f"{report.n_bad_records} records have neither LABEL nor "
            "RELATIONSHIP_TYPE (reference import_records.py:343-348)"
        )

    labels = [
        r["LABEL"] for r in nodes.select("LABEL").distinct().collect()
    ] if "LABEL" in raw.columns else []
    unknown = [lb for lb in labels if lb not in catalog.nodes]
    if unknown:
        raise ImportError_(f"unknown labels in import: {unknown}")

    for lb in labels:
        model = catalog.nodes[lb]
        cols = [p.storage_name for p in model.properties if p.storage_name in nodes.columns]
        batch = nodes.filter(F.col("LABEL") == lb).select(*cols)
        report.schema_violations.extend(check_schema(batch, model))
        if not validate_only:
            existing = (existing_tables or {}).get(lb)
            if existing is not None:
                batch = merge_nodes(existing, batch, model)
            report.nodes_by_label[lb] = batch
        else:
            report.nodes_by_label[lb] = batch

    # relationship records from two streams: flat records with a
    # RELATIONSHIP_TYPE discriminator, and nested RELATIONSHIPS_OUT arrays
    # exploded off node records (reference import_records.py:239-298).
    # Both grouped by (type, source_label, target_label[, target_property])
    # — the reference's 4-level grouping (:166-176) — and J2-checked
    # against the node batches just imported.
    unmatched_all = None
    ambiguous_all = None

    def _cast_key_to(df: DataFrame, key: str, like: DataFrame, like_key: str) -> DataFrame:
        """Align a node-key column's type with the edge-key column (the
        exploded stream stringifies endpoints; JSON imports often do too)."""
        if dict(df.dtypes)[key] != dict(like.dtypes)[like_key]:
            return df.withColumn(key, F.col(key).cast(dict(like.dtypes)[like_key]))
        return df

    def _process_rel_stream(rel_df: DataFrame, src_col: Optional[str],
                            tgt_col: Optional[str], group_tp: bool) -> None:
        """``src_col``/``tgt_col`` = edge key column names; None ⇒ use each
        rel type's model columns (the flat-record stream)."""
        nonlocal unmatched_all, ambiguous_all
        group_cols = ["RELATIONSHIP_TYPE", "SOURCE_LABEL", "TARGET_LABEL"]
        if group_tp:
            group_cols.append("TARGET_PROPERTY")
        rel_keys = rel_df.select(*group_cols).distinct().collect()
        for rk in rel_keys:
            rtype = rk["RELATIONSHIP_TYPE"]
            if rtype not in catalog.rels:
                raise ImportError_(f"unknown relationship type {rtype!r}")
            sc_ = src_col or catalog.rels[rtype].source_column
            tc_ = tgt_col or catalog.rels[rtype].target_column
            cond = (F.col("RELATIONSHIP_TYPE") == rtype) \
                & (F.col("SOURCE_LABEL") == rk["SOURCE_LABEL"]) \
                & (F.col("TARGET_LABEL") == rk["TARGET_LABEL"])
            if group_tp:
                tp = rk["TARGET_PROPERTY"]
                cond = cond & (
                    F.col("TARGET_PROPERTY").isNull() if tp is None
                    else (F.col("TARGET_PROPERTY") == tp)
                )
            group = rel_df.filter(cond)
            src_nodes = report.nodes_by_label.get(rk["SOURCE_LABEL"])
            tgt_nodes = report.nodes_by_label.get(rk["TARGET_LABEL"])
            if src_nodes is None or tgt_nodes is None:
                raise ImportError_(
                    f"relationship {rtype!r} references labels not present "
                    "in this import and no existing table was provided"
                )
            src_pp = catalog.nodes[rk["SOURCE_LABEL"]].pp_storage
            # alternate-key matching (J3): TARGET_PROPERTY overrides the pp
            tgt_key = (
                rk["TARGET_PROPERTY"]
                if group_tp and rk["TARGET_PROPERTY"] is not None
                else catalog.nodes[rk["TARGET_LABEL"]].pp_storage
            )
            if tgt_key not in tgt_nodes.columns:
                raise ImportError_(
                    f"TARGET_PROPERTY {tgt_key!r} not a column of "
                    f"{rk['TARGET_LABEL']!r}"
                )
            src_side = _cast_key_to(src_nodes, src_pp, group, sc_)
            tgt_side = _cast_key_to(tgt_nodes, tgt_key, group, tc_)
            um_src = unmatched_rows(group, src_side, sc_, src_pp)
            um_tgt = unmatched_rows(group, tgt_side, tc_, tgt_key)
            um = um_src.select(
                F.lit(rtype).alias("rel_type"),
                F.lit("source").alias("side"),
                F.col(sc_).cast("string").alias("key"),
            ).unionByName(
                um_tgt.select(
                    F.lit(rtype).alias("rel_type"),
                    F.lit("target").alias("side"),
                    F.col(tc_).cast("string").alias("key"),
                )
            )
            unmatched_all = um if unmatched_all is None else unmatched_all.unionByName(um)

            amb = ambiguous_keys(tgt_side, tgt_key).select(
                F.lit(rtype).alias("rel_type"),
                F.col("_amb_key").cast("string").alias("key"),
                "match_count",
            )
            ambiguous_all = amb if ambiguous_all is None else ambiguous_all.unionByName(amb)

            prior = report.rels_by_type.get(rtype)
            model = catalog.rels[rtype]
            stored = group.withColumnRenamed(sc_, model.source_column) \
                if sc_ != model.source_column else group
            stored = stored.withColumnRenamed(tc_, model.target_column) \
                if tc_ != model.target_column else stored
            report.rels_by_type[rtype] = (
                stored if prior is None
                else prior.unionByName(stored, allowMissingColumns=True)
            )

    if "RELATIONSHIP_TYPE" in raw.columns:
        _process_rel_stream(rels, src_col=None, tgt_col=None, group_tp=False)
    if "RELATIONSHIPS_OUT" in raw.columns:
        exploded = explode_relationships_out(nodes, catalog).cache()
        if exploded.limit(1).count() > 0:
            _process_rel_stream(exploded, "source", "target", group_tp=True)

    report.ri_unmatched = unmatched_all
    report.ri_ambiguous = ambiguous_all
    if error_on_unmatched and unmatched_all is not None:
        sample = unmatched_all.limit(5).collect()
        if sample:
            raise UnmatchedError(
                f"unmatched relationship endpoints: "
                f"{[(r['rel_type'], r['side'], r['key']) for r in sample]}"
            )
    return report
