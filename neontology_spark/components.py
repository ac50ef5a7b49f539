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
* ``connected_components_star`` (below) implements the
  large-star/small-star alternative (Kiveris et al., "Connected
  Components in MapReduce and Beyond"): it CONTRACTS the edge set per
  round, so per-round cost shrinks on dense components — the choice for
  celebrity-duplicate blobs at 10^12 edges; cross-checked against
  hash-min on mixed/random/chain graphs in tests.
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
    # initial labels are the identity, so round 1's edge⋈labels join
    # would join every edge to itself — skipped: the first round's
    # contributions are just the raw neighbor ids (labels=None below),
    # which also removes the up-front eager materialization job
    labels = None
    converged = False
    for _ in range(max_iter):
        # neighbor label contributions unioned with the self labels, then
        # ONE min-aggregate: min(own, neighbors') per node in two
        # shuffles/round (edge⋈labels + groupBy) — the join+agg+left-join
        # formulation costs a third; at 10^12 edges that's 1/3 of the
        # per-round shuffle bytes
        if labels is None:
            contrib = sym.select(F.col("b").alias("node"), F.col("a").alias("comp"))
            self_labels = (
                sym.select(F.col("a").alias("node"))
                .dropDuplicates()
                .withColumn("comp", F.col("node"))
            )
        else:
            contrib = sym.join(labels, sym["a"] == labels["node"]).select(
                F.col("b").alias("node"), "comp"
            )
            self_labels = labels
        new = (
            contrib.unionByName(self_labels)
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
        # carry the previous label through the round so ONE action both
        # materializes the lazy checkpoint (count() touches every
        # partition) and answers the convergence question — the r5 form
        # paid two jobs per round (eager checkpoint + a changed-count
        # join) and per-round job overhead dominated on shallow graphs
        new = (
            new.join(parent, new["comp"] == parent["_pn"], "left")
            .select("node", F.coalesce("_pc", "comp").alias("comp"))
            .join(self_labels.withColumnRenamed("comp", "_old"), "node")
            .localCheckpoint(eager=False)
        )
        changed = new.filter(F.col("comp") != F.col("_old")).count()
        labels = new.drop("_old")
        if changed == 0:
            converged = True
            break
    if labels is None:  # max_iter == 0 — identity labelling
        labels = (
            sym.select(F.col("a").alias("node"))
            .dropDuplicates()
            .withColumn("comp", F.col("node"))
            .localCheckpoint(eager=True)
        )
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


# ---------------------------------------------------------------------------
# large-star / small-star (Kiveris et al., "Connected Components in
# MapReduce and Beyond") — the edge-CONTRACTING alternative
# ---------------------------------------------------------------------------


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a < b), self-loops dropped,
    deduped."""
    return (
        e.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})."""
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = sym.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m")
    ).select(F.col("a").alias("_u"), "m")
    out = (
        sym.filter(F.col("b") > F.col("a"))
        .join(m, sym["a"] == m["_u"])
        .select(F.col("m").alias("a"), F.col("b").alias("b"))
    )
    return _canon(out)


def _small_star(e: DataFrame) -> DataFrame:
    """small-star(hi): connect every lo-neighbor (and hi itself) to
    m = min of hi's lo-neighbors."""
    m = e.groupBy("b").agg(F.min("a").alias("m")).select(
        F.col("b").alias("_hi"), "m"
    )
    j = e.join(m, e["b"] == m["_hi"])
    lo_edges = j.select(F.col("m").alias("a"), F.col("a").alias("b"))
    hi_edges = j.select(F.col("m").alias("a"), F.col("b").alias("b"))
    return _canon(lo_edges.unionByName(hi_edges))


def _edge_checksum(e: DataFrame) -> tuple:
    # bit_xor (not sum): overflow-free under ANSI mode, and the edge set
    # is deduped so no pair can cancel itself
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    on_truncate: str = "warn",
) -> DataFrame:
    """(node, comp) via alternating large-star/small-star contraction —
    same output contract as ``connected_components``.

    Why a second algorithm: hash-min + shortcutting keeps the FULL edge
    set in every round (per-round cost O(|E|) forever). Star rounds
    CONTRACT the edge set toward a star forest — on dense near-dup
    clusters |E| collapses toward |V| within a couple of rounds, so the
    per-round join cost shrinks as the algorithm proceeds; convergence
    is O(log^2 n) rounds (paper thm. 3). Use it when components are
    dense/huge (celebrity-duplicate clusters at 10^12 edges);
    ``connected_components`` remains the default for shallow graphs.

    Each round = one large-star + one small-star (each: a groupBy + a
    same-key join, Exchange-reused) + a two-number checksum action;
    ``localCheckpoint`` cuts lineage per round. Fixpoint = the edge set
    is round-stable (it is then a star forest: every edge (root, child)
    with root the component min)."""
    e = _canon(
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ).localCheckpoint(eager=True)
    all_nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .dropDuplicates()
    )
    prev = _edge_checksum(e)
    converged = False
    for _ in range(max_iter):
        # lazy checkpoint: the checksum aggregate touches every partition,
        # so one action materializes the round AND tests the fixpoint
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _edge_checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        msg = (
            f"connected_components_star: fixpoint not reached in {max_iter} "
            "rounds — labels may split components. Raise max_iter."
        )
        if on_truncate == "raise":
            raise RuntimeError(msg)
        if on_truncate == "warn":
            warnings.warn(msg, RuntimeWarning)
    # star forest → labels: child b → root a; roots + isolated nodes → self
    child_root = e.select(F.col("b").alias("node"), F.col("a").alias("comp"))
    return (
        all_nodes.join(child_root, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
    )
