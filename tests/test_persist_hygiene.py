"""Storage hygiene (VERDICT r4 #5 / ADVICE r4): operators that cache an
intermediate internally must not leave storage behind for the session
lifetime. The pair/ANN operators use GC-scoped ``localCheckpoint``
blocks (reclaimed by the ContextCleaner once the result frame is
dropped) instead of ``persist()`` (CacheManager entries nothing ever
unpersists) — this test runs each operator, drops the results, forces
GC on both sides, and asserts the persistent-RDD registry drains back
to its baseline."""

import gc
import time

import pytest
from pyspark.sql import functions as F


def _live_rdd_ids(spark) -> set:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _drain_ids(spark, created: set, timeout: float = 90.0) -> set:
    """Poll until every RDD id in ``created`` has left the persistent
    registry (the ContextCleaner runs async off JVM weak-ref queues);
    returns the stragglers. Tracking ids — not a global count — keeps
    the assertion independent of whatever other test modules in the
    shared session are still holding or concurrently releasing."""
    deadline = time.time() + timeout
    left = _live_rdd_ids(spark) & created
    while left and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        left = _live_rdd_ids(spark) & created
    return left


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (i, f"some shared boilerplate text chunk {i % 9} with words "
                f"unique tail {i}")
            for i in range(120)
        ],
        "doc_id long, text string",
    )


@pytest.fixture()
def vectors(spark):
    return spark.range(80).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.rand(seed=7 + j) + (F.col("id") % 4).cast("double"))
                for j in range(8)
            ]
        ).alias("embedding"),
    )


def test_pair_operators_leave_no_storage(spark, docs, vectors, tmp_path):
    from neontology_spark.dedup import (
        dedupe_exact_incremental,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from neontology_spark.similarity import (
        embedding_near_duplicates,
        ivf_topk_indexed,
        train_ivf_centroids,
        write_ivf_index,
    )

    before = _live_rdd_ids(spark)

    minhash_lsh_pairs(docs).count()
    simhash_pairs(docs).count()
    embedding_near_duplicates(vectors, threshold=0.5).count()
    r = dedupe_exact_incremental(
        docs, None, cache=True
    )
    r.kept.count()
    r.new_fps.count()
    del r

    cents = train_ivf_centroids(vectors, n_centroids=4, iters=1)
    idx = str(tmp_path / "ivf")
    write_ivf_index(vectors, idx, cents)
    q = vectors.filter(F.col("vec_id") < 5)
    ivf_topk_indexed(spark, idx, q, cents, k=2, n_probe=2).count()
    del q

    # while intermediate frames were alive, storage was in use; once
    # every reference is dropped, each RDD id the operators registered
    # must leave the persistent registry
    created = _live_rdd_ids(spark) - before
    stragglers = _drain_ids(spark, created)
    assert stragglers == set(), stragglers
