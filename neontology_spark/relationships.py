"""Relationship (edge) operations: merge with ``merge_on`` edge identity,
endpoint-resolved upsert, and the ``get_related`` traversal.

Reference semantics:
* S4 ``merge_relationships`` (``graphengine.py:255-295``):
  ``MATCH source / MATCH target / MERGE (source)-[r:TYPE {merge_props}]->
  (target) ON MATCH SET / ON CREATE SET / SET`` — endpoint resolution is
  inner-join (unresolved rows silently vanish), edge identity is
  (source, target, merge_on values): same identity ⇒ overwrite props,
  different merge_on value ⇒ NEW edge
  (tests/test_baserelationship.py:117-206).
* J3 — source_prop/target_prop may be any endpoint property
  (``baserelationship.py:157-221``).
* J5 ``get_related`` (``basenode.py:425-528``): directioned, type-
  alternating, depth-bounded traversal with rel-property equality
  filters, DISTINCT, SKIP/LIMIT.

Scale notes:
* edge merge = one shuffle on the composite edge key (the merge_keyed
  kernel); endpoint resolution joins broadcast when the node key sides
  are small, else sort-merge with AQE skew handling.
* traversal = bounded iterative hash joins (frontier ⋈ edges per hop).
  Each hop shuffles the frontier on the join key; depth is explicitly
  bounded (the reference's ``*min..max`` with an unbounded max is capped —
  documented divergence, SURVEY.md §7 risk register).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .models import MergePolicy, RelationshipModel
from .upsert import merge_keyed


def resolve_and_merge_relationships(
    existing_edges: DataFrame,
    batch: DataFrame,
    model: RelationshipModel,
    source_nodes: DataFrame,
    target_nodes: DataFrame,
    source_key: str,
    target_key: str,
    order_col: Optional[str] = None,
    broadcast_nodes: bool = False,
) -> DataFrame:
    """S4 replay: drop batch rows whose endpoints don't resolve
    (inner-join semantics, graphengine.py:281-291), then MERGE into the
    edge table keyed on (source, target, *merge_on).

    ``source_key``/``target_key`` are the *node-side* match columns (J3:
    any property, not only the pp). The batch's source/target columns hold
    the values to match. Returns the post-merge edge table.
    """
    src_keys = source_nodes.select(
        F.col(source_key).alias(model.source_column)
    ).dropDuplicates()
    tgt_keys = target_nodes.select(
        F.col(target_key).alias(model.target_column)
    ).dropDuplicates()
    if broadcast_nodes:
        src_keys, tgt_keys = F.broadcast(src_keys), F.broadcast(tgt_keys)
    resolved = batch.join(src_keys, model.source_column, "inner").join(
        tgt_keys, model.target_column, "inner"
    )
    return merge_relationships(existing_edges, resolved, model, order_col=order_col)


def merge_relationships(
    existing_edges: DataFrame,
    batch: DataFrame,
    model: RelationshipModel,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Edge MERGE keyed on (source, target, *merge_on): same key ⇒ props
    overwritten per policy; different merge_on value ⇒ a new edge row
    (reference merge_on semantics, baserelationship.py:36-46)."""
    keys = [model.source_column, model.target_column, *model.merge_on]
    policies = {p.storage_name: p.policy for p in model.properties}
    return merge_keyed(existing_edges, batch, keys, policies, order_col=order_col)


def get_related(
    edges_by_type: dict[str, DataFrame],
    start_keys: DataFrame,
    rel_types: Optional[Sequence[str]] = None,
    direction: str = "out",
    min_depth: int = 1,
    max_depth: int = 1,
    rel_filters: Optional[dict] = None,
    distinct: bool = False,
    limit: Optional[int] = None,
    skip: Optional[int] = None,
    source_column: str = "source",
    target_column: str = "target",
    with_paths: bool = False,
) -> DataFrame:
    """J5 traversal: from ``start_keys`` (single column ``key``), follow
    edges of ``rel_types`` in ``direction`` ('out'/'in'/'both') for
    ``min_depth..max_depth`` hops; returns (start, node, depth, rel_type).

    ``with_paths=True`` adds a ``path`` column — the hop sequence
    ``start->n1->…->node`` as a delimited string — replaying the
    reference's first-class Path result values
    (``/root/reference/src/neontology/result.py:10-13``, Path dispatch
    ``neo4jengine.py:157-183``). When several hop sequences reach the same
    (start, node, depth), the lexicographically smallest path is kept
    (``min(path)`` per group) so results stay deterministic and
    set-oriented — one representative path per reachable pair, same row
    set as the path-less mode.

    * type alternation ``[r:T1|T2]`` → union of the per-type edge tables
      (they share the source/target schema) + isin filter.
    * rel-property equality map → extra predicates on the edge table
      *before* the hop joins (pushed to the edge scan).
    * DISTINCT → dropDuplicates over (start, node).
    * depth ``*min..max`` → bounded BFS: iterative frontier ⋈ edges.
      Cycles are allowed within the depth bound, like Cypher's default
      relationship-uniqueness is NOT replicated per-path (documented
      divergence: we dedup visited (start, node, depth) tuples instead,
      which converges and is set-oriented).
    """
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction!r}")
    if min_depth < 1 or max_depth < min_depth:
        raise ValueError("need 1 <= min_depth <= max_depth")

    types = list(rel_types or edges_by_type.keys())
    unions = None
    for t in types:
        e = edges_by_type[t]
        if rel_filters:
            for k, v in rel_filters.items():
                e = e.filter(F.col(k) == F.lit(v))
        e = e.select(
            F.col(source_column).alias("_src"),
            F.col(target_column).alias("_dst"),
            F.lit(t).alias("rel_type"),
        )
        unions = e if unions is None else unions.unionByName(e)

    if direction == "out":
        hops = unions.select(F.col("_src").alias("_from"), F.col("_dst").alias("_to"), "rel_type")
    elif direction == "in":
        hops = unions.select(F.col("_dst").alias("_from"), F.col("_src").alias("_to"), "rel_type")
    else:
        hops = unions.select(
            F.col("_src").alias("_from"), F.col("_dst").alias("_to"), "rel_type"
        ).unionByName(
            unions.select(F.col("_dst").alias("_from"), F.col("_src").alias("_to"), "rel_type")
        )

    # multi-hop: persist the (small) oriented edge set so each hop and each
    # accumulated union branch reuses one materialization, and cut the
    # frontier's lineage per hop (localCheckpoint) — otherwise the plan
    # re-executes all previous hops at every depth (exponential re-compute).
    multi_hop = max_depth > 1
    if multi_hop:
        hops = hops.persist()

    frontier = start_keys.select(
        F.col("key").alias("start"), F.col("key").alias("node")
    )
    if with_paths:
        frontier = frontier.withColumn("path", F.col("node").cast("string"))
    out = None
    for depth in range(1, max_depth + 1):
        joined = frontier.join(hops, frontier["node"] == hops["_from"], "inner")
        if with_paths:
            frontier = (
                joined.select(
                    "start",
                    F.col("_to").alias("node"),
                    "rel_type",
                    F.concat(
                        F.col("path"), F.lit("->"), F.col("_to").cast("string")
                    ).alias("path"),
                )
                # min(path) per (start,node,rel_type): deterministic
                # representative; same group keys as the dropDuplicates
                # branch so the row set is identical
                .groupBy("start", "node", "rel_type")
                .agg(F.min("path").alias("path"))
            )
        else:
            frontier = (
                joined.select("start", F.col("_to").alias("node"), "rel_type")
                .dropDuplicates(["start", "node", "rel_type"])
            )
        if multi_hop:
            frontier = frontier.localCheckpoint(eager=True)
        if depth >= min_depth:
            step = frontier.withColumn("depth", F.lit(depth))
            out = step if out is None else out.unionByName(step)
        if with_paths:
            frontier = frontier.groupBy("start", "node").agg(
                F.min("path").alias("path")
            )
        else:
            frontier = frontier.select("start", "node").dropDuplicates()

    if out is None:
        raise AssertionError("unreachable: max_depth >= 1")
    if distinct:
        if with_paths:
            # deterministic representative: lexicographic struct-min picks
            # the shallowest (then smallest rel_type/path) row per pair
            out = (
                out.groupBy("start", "node")
                .agg(F.min(F.struct("depth", "rel_type", "path")).alias("_s"))
                .select(
                    "start",
                    "node",
                    F.col("_s.rel_type").alias("rel_type"),
                    F.col("_s.depth").alias("depth"),
                    F.col("_s.path").alias("path"),
                )
            )
        else:
            out = out.dropDuplicates(["start", "node"])
    out = out.orderBy("start", "node", "depth")
    if skip:
        out = out.offset(skip)
    if limit is not None:
        out = out.limit(limit)
    return out
