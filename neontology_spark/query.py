"""Raw-query escape hatch: run arbitrary Spark SQL over registered model
tables and hydrate typed nodes/relationships from the result — the DSL
analogue of the reference's ``GraphConnection.evaluate_query(cypher,
params)`` (graphconnection.py:115-148), whose engine-side hydration
(neo4jengine.py:138-200 ``neo4j_records_to_neontology_records``) walks
each record, turns Node values into model instances keyed by primary
label, warns-and-drops values whose label has no registered class, and
dedupes nodes by ``label:pp`` (result.py:8-67).

Spark has no runtime graph values, so the typing convention is explicit:

* every registered node label / relationship type becomes a temp view
  (``register_graph``), so raw SQL reads the same tables the DSL writes;
* a result column HYDRATES as a node when it is a struct column whose
  name is ``<label>`` or ``<alias>:<label>`` (backquote the alias form:
  ``struct(c.*) AS `n:Customer```) — the analogue of a RETURNed Neo4j
  node carrying its label;
* a struct column named ``<alias>:<REL_TYPE>`` (or ``<REL_TYPE>``)
  hydrates as a relationship; it must contain ``source`` and ``target``
  struct fields (the reference warns 'query did not include nodes' when
  a relationship is returned without its endpoints — same here);
* anything else stays a plain record column (records_raw parity).

Unknown labels and malformed structs warn and drop, never raise —
matching the reference's graceful handling (neo4jengine.py:86-90).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .models import ModelCatalog, NodeModel, RelationshipModel


def register_graph(
    spark: SparkSession,
    catalog: ModelCatalog,
    tables: dict[str, DataFrame],
) -> None:
    """Register every node/rel table as a temp view named by its label /
    relationship type, so raw SQL addresses the graph by the same names
    the DSL uses. ``tables`` maps label-or-type → DataFrame; labels not
    in the catalog raise (a view with no model could never hydrate)."""
    for name, df in tables.items():
        if name not in catalog.nodes and name not in catalog.rels:
            raise ValueError(f"{name!r} is not a registered label or rel type")
        df.createOrReplaceTempView(name)


@dataclass
class QueryResult:
    """Spark analogue of NeontologyResult (result.py:8-13): ``records`` is
    the raw SQL result frame (records_raw), ``nodes``/``relationships``
    are per-label / per-type hydrated frames."""

    records: DataFrame
    nodes: dict[str, DataFrame] = field(default_factory=dict)
    relationships: dict[str, DataFrame] = field(default_factory=dict)

    def node_link_data(self) -> dict:
        """Dict with 'nodes'/'edges'/'directed' keys (result.py:16-43) —
        a driver-side convenience for SMALL results (it collects)."""
        nodes = []
        for label, df in sorted(self.nodes.items()):
            nodes.extend({**r.asDict(recursive=True), "LABEL": label}
                         for r in df.collect())
        edges = []
        for rtype, df in sorted(self.relationships.items()):
            edges.extend({**r.asDict(recursive=True), "RELATIONSHIP_TYPE": rtype}
                         for r in df.collect())
        return {"nodes": nodes, "edges": edges, "directed": True}


def _split_name(col_name: str) -> str:
    """``alias:Label`` → ``Label``; plain names pass through."""
    return col_name.split(":", 1)[1] if ":" in col_name else col_name


def _hydrate_node_column(
    records: DataFrame, col_name: str, model: NodeModel
) -> Optional[DataFrame]:
    """One struct column → a typed node frame: struct fields validated
    against the model (pp must be present; unknown fields warn-and-drop
    the column, the pydantic-ValidationError analogue), deduped by pp
    (result.py:38 nodes_map semantics)."""
    struct_type = records.schema[col_name].dataType
    assert isinstance(struct_type, T.StructType)
    fields = {f.name for f in struct_type.fields}
    allowed = {p.storage_name for p in model.properties}
    if model.pp_storage not in fields:
        warnings.warn(
            f"column {col_name!r}: struct lacks primary property "
            f"{model.pp_storage!r} of {model.label!r} — dropped"
        )
        return None
    unknown = fields - allowed
    if unknown:
        warnings.warn(
            f"column {col_name!r}: fields {sorted(unknown)} not declared on "
            f"{model.label!r} — dropped"
        )
        return None
    return (
        records.filter(F.col(col_name).isNotNull())
        .select(F.col(col_name + ".*"))
        .dropDuplicates([model.pp_storage])
    )


def _hydrate_rel_column(
    records: DataFrame,
    col_name: str,
    rmodel: RelationshipModel,
    catalog: ModelCatalog,
) -> Optional[DataFrame]:
    """One struct column → a typed relationship frame. Must embed
    ``source``/``target`` structs (reference: 'relationship type query
    did not include nodes' warning, neo4jengine.py:119-127); endpoint
    structs are validated against the rel's endpoint models."""
    struct_type = records.schema[col_name].dataType
    assert isinstance(struct_type, T.StructType)
    fields = {f.name: f.dataType for f in struct_type.fields}
    for endpoint in ("source", "target"):
        if endpoint not in fields or not isinstance(
            fields[endpoint], T.StructType
        ):
            warnings.warn(
                f"{rmodel.rel_type} relationship column {col_name!r} did not "
                "include nodes — return source and target structs to hydrate"
            )
            return None
    src_model = catalog.nodes[rmodel.source_label]
    tgt_model = catalog.nodes[rmodel.target_label]
    for endpoint, emodel in (("source", src_model), ("target", tgt_model)):
        efields = {f.name for f in fields[endpoint].fields}
        if emodel.pp_storage not in efields:
            warnings.warn(
                f"column {col_name!r}: {endpoint} struct lacks primary "
                f"property {emodel.pp_storage!r} of {emodel.label!r} — dropped"
            )
            return None
    prop_names = [
        p.storage_name
        for p in rmodel.properties
        if p.storage_name in fields
    ]
    return records.filter(F.col(col_name).isNotNull()).select(
        F.col(f"{col_name}.source").alias("source"),
        F.col(f"{col_name}.target").alias("target"),
        *[F.col(f"{col_name}.{p}").alias(p) for p in prop_names],
    )


def run_query(
    spark: SparkSession,
    sql: str,
    catalog: ModelCatalog,
    tables: Optional[dict[str, DataFrame]] = None,
) -> QueryResult:
    """Execute raw Spark SQL and hydrate the result by label.

    Set-oriented by design: where the reference materializes python
    model instances per record, the Spark analogue returns DataFrames —
    ``records`` is lazy and never collected here, so the escape hatch
    scales to results of any size (hydration adds one projection per
    typed column, no shuffle beyond the pp dedup)."""
    if tables:
        register_graph(spark, catalog, tables)
    records = spark.sql(sql)

    nodes: dict[str, DataFrame] = {}
    rels: dict[str, DataFrame] = {}
    for f_ in records.schema.fields:
        if not isinstance(f_.dataType, T.StructType):
            continue
        name = _split_name(f_.name)
        if name in catalog.nodes:
            hydrated = _hydrate_node_column(records, f_.name, catalog.nodes[name])
            if hydrated is not None:
                prev = nodes.get(name)
                nodes[name] = (
                    hydrated
                    if prev is None
                    else prev.unionByName(hydrated).dropDuplicates(
                        [catalog.nodes[name].pp_storage]
                    )
                )
        elif name in catalog.rels:
            hydrated = _hydrate_rel_column(
                records, f_.name, catalog.rels[name], catalog
            )
            if hydrated is not None:
                prev = rels.get(name)
                rels[name] = (
                    hydrated if prev is None else prev.unionByName(hydrated)
                )
        else:
            # struct column with no registered model: the reference warns
            # 'Unexpected primary labels returned' and drops (neo4jengine.py:86-90)
            warnings.warn(
                f"unexpected label {name!r} for struct column {f_.name!r} — "
                "no registered model, column not hydrated"
            )
    return QueryResult(records=records, nodes=nodes, relationships=rels)


def run_query_single(spark: SparkSession, sql: str):
    """Single-value query (graphconnection.py:100-112): first column of
    the first row, None on empty; warns when the query returns more than
    one value (reference test_graph_connection.py:58-73 semantics)."""
    df = spark.sql(sql)
    rows = df.limit(2).collect()
    if not rows:
        return None
    if len(rows) > 1 or len(df.columns) > 1:
        warnings.warn(
            "evaluate_query_single: query returned multiple results; "
            "returning the first"
        )
    return rows[0][0]
