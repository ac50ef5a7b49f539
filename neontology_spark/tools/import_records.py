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


def explode_relationships_out(nodes: DataFrame, catalog: ModelCatalog) -> DataFrame:
    """Explode nested RELATIONSHIPS_OUT arrays into flat edge records
    (reference import_records.py:239-298). Expected element shape:
    struct(RELATIONSHIP_TYPE, TARGET_LABEL, TARGET_PROPERTY?, TARGETS:array).
    Returns rows (RELATIONSHIP_TYPE, SOURCE_LABEL, source, TARGET_LABEL,
    TARGET_PROPERTY, target)."""
    if "RELATIONSHIPS_OUT" not in nodes.columns:
        return nodes.sparkSession.createDataFrame(
            [],
            "RELATIONSHIP_TYPE string, SOURCE_LABEL string, source string, "
            "TARGET_LABEL string, TARGET_PROPERTY string, target string",
        )
    with_rels = nodes.filter(F.col("RELATIONSHIPS_OUT").isNotNull())
    exploded = with_rels.select(
        F.col("LABEL").alias("SOURCE_LABEL"),
        F.col("_pp_value").alias("source"),
        F.explode("RELATIONSHIPS_OUT").alias("r"),
    )
    return exploded.select(
        F.col("r.RELATIONSHIP_TYPE").alias("RELATIONSHIP_TYPE"),
        "SOURCE_LABEL",
        "source",
        F.col("r.TARGET_LABEL").alias("TARGET_LABEL"),
        F.col("r.TARGET_PROPERTY").alias("TARGET_PROPERTY"),
        F.explode("r.TARGETS").alias("target"),
    )


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

    # relationship records: group by (type, source_label, target_label) and
    # run the J2 referential checks against the node batches just imported
    if "RELATIONSHIP_TYPE" in raw.columns:
        rel_keys = (
            rels.select("RELATIONSHIP_TYPE", "SOURCE_LABEL", "TARGET_LABEL")
            .distinct()
            .collect()
        )
        unmatched_all = None
        ambiguous_all = None
        for rk in rel_keys:
            rtype = rk["RELATIONSHIP_TYPE"]
            if rtype not in catalog.rels:
                raise ImportError_(f"unknown relationship type {rtype!r}")
            model = catalog.rels[rtype]
            group = rels.filter(
                (F.col("RELATIONSHIP_TYPE") == rtype)
                & (F.col("SOURCE_LABEL") == rk["SOURCE_LABEL"])
                & (F.col("TARGET_LABEL") == rk["TARGET_LABEL"])
            )
            src_nodes = report.nodes_by_label.get(rk["SOURCE_LABEL"])
            tgt_nodes = report.nodes_by_label.get(rk["TARGET_LABEL"])
            if src_nodes is None or tgt_nodes is None:
                raise ImportError_(
                    f"relationship {rtype!r} references labels not present "
                    "in this import and no existing table was provided"
                )
            src_pp = catalog.nodes[rk["SOURCE_LABEL"]].pp_storage
            tgt_pp = catalog.nodes[rk["TARGET_LABEL"]].pp_storage
            um_src = unmatched_rows(group, src_nodes, model.source_column, src_pp)
            um_tgt = unmatched_rows(group, tgt_nodes, model.target_column, tgt_pp)
            um = um_src.select(
                F.lit(rtype).alias("rel_type"),
                F.lit("source").alias("side"),
                F.col(model.source_column).cast("string").alias("key"),
            ).unionByName(
                um_tgt.select(
                    F.lit(rtype).alias("rel_type"),
                    F.lit("target").alias("side"),
                    F.col(model.target_column).cast("string").alias("key"),
                )
            )
            unmatched_all = um if unmatched_all is None else unmatched_all.unionByName(um)

            amb = ambiguous_keys(tgt_nodes, tgt_pp).select(
                F.lit(rtype).alias("rel_type"),
                F.col("_amb_key").cast("string").alias("key"),
                "match_count",
            )
            ambiguous_all = amb if ambiguous_all is None else ambiguous_all.unionByName(amb)

            report.rels_by_type[rtype] = group
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
