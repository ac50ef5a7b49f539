"""Export operators — S7/S8 (reference ``basenode.py:551-585``,
``baserelationship.py:349-435``, ``result.py:16-43``).

* ``dump_nodes`` — node table → records with the ``LABEL`` metadata column;
  NULL columns dropped on the JSON side via ``to_json`` ignoring nulls
  (``exclude_none`` parity).
* ``dump_relationships`` — edge table + RELATIONSHIP_TYPE / SOURCE_LABEL /
  TARGET_LABEL columns.
* Round-trip invariant (tested): dump output is valid import_records
  input and reproduces the table
  (reference tests/test_tools/test_import_records.py:78-108).
* ``node_link_data`` — graph export: nodes dedup'd by ``label:pp``, edges
  keyed by sha2 of their JSON dump (``result.py:24-43``); returns two
  DataFrames (collect-to-driver is the caller's choice for small reports).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..models import NodeModel, RelationshipModel


def dump_nodes(df: DataFrame, model: NodeModel) -> DataFrame:
    """Add the LABEL discriminator (S7). Column set = model properties +
    LABEL, so the result feeds classify_records directly."""
    cols = [p.storage_name for p in model.properties if p.storage_name in df.columns]
    return df.select(F.lit(model.label).alias("LABEL"), *cols)


def dump_relationships(
    df: DataFrame, model: RelationshipModel
) -> DataFrame:
    """Edge dump with type + endpoint-label metadata columns."""
    cols = [model.source_column, model.target_column] + [
        p.storage_name for p in model.properties if p.storage_name in df.columns
    ]
    return df.select(
        F.lit(model.rel_type).alias("RELATIONSHIP_TYPE"),
        F.lit(model.source_label).alias("SOURCE_LABEL"),
        F.lit(model.target_label).alias("TARGET_LABEL"),
        *cols,
    )


def node_link_data(
    nodes_by_label: dict[str, tuple[DataFrame, NodeModel]],
    rels_by_type: dict[str, tuple[DataFrame, RelationshipModel]],
) -> tuple[DataFrame, DataFrame]:
    """(nodes, links): nodes carry ``id = label:pp`` and are dedup'd on it
    (result.py:24-35); links carry ``key = sha2(json dump)`` and are
    dedup'd on it (result.py:35-43)."""
    all_nodes = None
    for label, (df, model) in nodes_by_label.items():
        n = df.select(
            F.concat(F.lit(label), F.lit(":"), F.col(model.pp_storage).cast("string")).alias("id"),
            F.lit(label).alias("label"),
            F.col(model.pp_storage).cast("string").alias("pp"),
        )
        all_nodes = n if all_nodes is None else all_nodes.unionByName(n)
    all_nodes = all_nodes.dropDuplicates(["id"])

    all_links = None
    for rtype, (df, model) in rels_by_type.items():
        dumped = dump_relationships(df, model)
        l = dumped.select(
            F.sha2(F.to_json(F.struct(*dumped.columns)), 256).alias("key"),
            F.col(model.source_column).cast("string").alias("source"),
            F.col(model.target_column).cast("string").alias("target"),
            F.lit(rtype).alias("rel_type"),
        )
        all_links = l if all_links is None else all_links.unionByName(l)
    if all_links is not None:
        all_links = all_links.dropDuplicates(["key"])
    return all_nodes, all_links
