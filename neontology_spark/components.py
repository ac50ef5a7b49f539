"""Connected components over near-duplicate pairs — the second half of
every dedup pipeline: pair finders (dedup.py, similarity.py) emit edges;
keeping ONE document per duplicate *cluster* requires the transitive
closure of those edges (a~b, b~c ⇒ keep one of {a,b,c}, not two).

Algorithm: hash-min label propagation — every node starts labeled with
its own id; each round takes the min of its own and its neighbors'
labels; fixpoint = per-component min id (the canonical representative).
Each round combines min-propagation with POINTER DOUBLING
(shortcutting: comp ← comp(comp)), so a round covers twice the hop
distance of the last — O(log diameter) rounds on chains, not
O(diameter). Near-dup clusters (stars/cliques around a template) still
converge in 2-4 rounds; a 10k-node path converges in ~15 (see
tests/test_components_sampling.py long-chain stress).

Scale design:
* per round: one |E| shuffle (edge ⋈ labels on the node key — the same
  join key every round, so a bucketed/pre-partitioned edge table keeps
  it Exchange-light) + one |V| groupBy + one |V| shortcut self-join;
  |V| ≪ |E| on dedup graphs so the edge join dominates;
* ``localCheckpoint`` per round cuts lineage (without it round k re-runs
  rounds 1..k-1 — the exponential-plan trap, same as get_related);
* convergence test is a cheap changed-row count, one action per round;
* at extreme scale the remaining literature upgrade is
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond"), which ALSO contracts the edge set per round;
  with shortcutting in place its win is edge-volume, not round count.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    on_truncate: str = "warn",
) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; ``comp`` is the
    min node id in the connected component (stable canonical label).

    If ``max_iter`` rounds pass without reaching the fixpoint the labels
    may SPLIT components (under-merged); ``on_truncate`` controls the
    response: ``"warn"`` (default) emits a RuntimeWarning, ``"raise"``
    raises, anything else is silent (ADVICE r3 — silent truncation made
    dedupe_by_components under-delete with no signal). With pointer
    doubling, max_iter=25 covers diameters up to ~2^25."""
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
    converged = False
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
        )
        # pointer doubling (shortcutting): comp ← comp(comp). Every comp
        # value is the id of a node in the same component (initial labels
        # cover all nodes; min preserves membership), so following the
        # label one extra hop stays in-component while doubling the
        # distance covered per round — O(log diameter) rounds on chains.
        # The join is |V|-sized (labels, not edges); left+coalesce guards
        # the invariant rather than assuming it.
        parent = new.select(
            F.col("node").alias("_pn"), F.col("comp").alias("_pc")
        )
        new = (
            new.join(parent, new["comp"] == parent["_pn"], "left")
            .select("node", F.coalesce("_pc", "comp").alias("comp"))
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
            converged = True
            break
    sym.unpersist()
    if not converged:
        msg = (
            f"connected_components: fixpoint not reached in {max_iter} "
            "rounds — labels may split components (under-merge). "
            "Raise max_iter."
        )
        if on_truncate == "raise":
            raise RuntimeError(msg)
        if on_truncate == "warn":
            warnings.warn(msg, RuntimeWarning)
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
