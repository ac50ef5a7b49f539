"""Connected components over near-duplicate pairs — the second half of
every dedup pipeline: pair finders (dedup.py, similarity.py) emit edges;
keeping ONE document per duplicate *cluster* requires the transitive
closure of those edges (a~b, b~c ⇒ keep one of {a,b,c}, not two).

Algorithm: hash-min label propagation — every node starts labeled with
its own id; each round takes the min of its own and its neighbors'
labels; fixpoint = per-component min id (the canonical representative).
Converges in O(component diameter) rounds — near-dup clusters are
shallow (stars/cliques around a template), so 3-5 rounds in practice;
``max_iter`` bounds pathological chains.

Scale design:
* each round is ONE shuffle (edge ⋈ labels on the node key, groupBy min)
  — the same join key every round, so a bucketed/pre-partitioned edge
  table keeps rounds Exchange-free after the first;
* ``localCheckpoint`` per round cuts lineage (without it round k re-runs
  rounds 1..k-1 — the exponential-plan trap, same as get_related);
* convergence test is a cheap changed-row count, one action per round;
* at extreme scale (10^12 edges, deep components) the literature upgrade
  is large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond") which contracts in O(log n) rounds; the hop
  interface below is deliberately the same so that optimization swaps in
  without touching callers. Near-dup graphs never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is the
    min node id in the connected component (stable canonical label)."""
    sym = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .dropDuplicates()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor label contributions unioned with the self labels, then
        # ONE min-aggregate: min(own, neighbors') per node in two
        # shuffles/round (edge⋈labels + groupBy) — the join+agg+left-join
        # formulation costs a third; at 10^12 edges that's 1/3 of the
        # per-round shuffle bytes
        contrib = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "comp"
        )
        new = (
            contrib.unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(
                labels.withColumnRenamed("comp", "_old"), "node"
            )
            .filter(F.col("comp") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedupe_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one row per near-duplicate CLUSTER (the min-id member) plus
    every row not in any pair — the transitive-closure analogue of
    ``dedup.dedupe_exact`` (which needs no closure because exact-hash
    groups are already equivalence classes)."""
    comp = connected_components(pairs, src, dst)
    drop = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
