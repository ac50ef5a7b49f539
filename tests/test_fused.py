"""Fused one-pass suite vs the composable per-check pipeline: identical
verdict-level quantities on the planted table (neontology_spark/fused.py
exists to cut per-suite fixed costs, not to change semantics)."""

import pytest
from pyspark.sql import functions as F

from neontology_spark.checks import (
    check_domain,
    check_required,
    check_unique,
    column_stats,
)
from neontology_spark.checks.drift import drift_metrics, numeric_histogram
from neontology_spark.fused import fused_validation_summary
from neontology_spark.images import check_payload, generate_images, image_model

N = 2_000
N_PARTS = 8
STAT_COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]
EDGES = [0.0, 16, 32, 48, 64, 80, 96, 112, 128, 160]


@pytest.fixture(scope="module")
def images(spark):
    df = generate_images(spark, n_rows=N, n_parts=N_PARTS).cache()
    df.count()
    yield df
    df.unpersist()


def test_fused_matches_per_check_pipeline(spark, images):
    model = image_model()
    got = fused_validation_summary(
        spark, images, model, stat_cols=STAT_COLS, hist_col="w", edges=EDGES
    )

    # per-check violation counts
    expected_per_check = {
        "unique__pp": check_unique(images, model, part_col="part").violations.count(),
        "unique__phash": check_unique(
            images, model, column="phash", part_col="part", salted=True,
            check_name="unique__phash",
        ).violations.count(),
        "required_not_null": check_required(
            images, model, part_col="part"
        ).violations.count(),
        "value_domain": check_domain(images, model, part_col="part").violations.count(),
        "payload_invariants": check_payload(images).violations_count
        if hasattr(check_payload(images), "violations_count")
        else check_payload(images).count(),
    }
    assert got["per_check"] == expected_per_check
    assert got["violations"][0] == sum(expected_per_check.values())

    # stats: same row count and total nulls as the profiler
    st = column_stats(images, columns=STAT_COLS, part_col="part")
    assert got["stats"][0] == st.count()
    assert got["stats"][1] == st.agg(F.sum("n_nulls")).first()[0]

    # drift: same psi sum as drift_metrics (global hist vs per-part hist)
    m = drift_metrics(
        numeric_histogram(images, "w", EDGES),
        numeric_histogram(images, "w", EDGES, part_col="part"),
    )
    psi_expected = m.agg(F.sum("psi")).first()[0]
    assert abs(got["drift"][1] - psi_expected) < 1e-9
    assert got["drift"][0] == m.count()

    # rows
    assert got["rows"] == (N, N_PARTS)


def test_fused_required_excludes_bytes_by_design(spark, images):
    """bytes is excluded from the fused metadata scan (payload decode
    subsumes it): a NULL payload must still be flagged — by the payload
    check."""
    model = image_model()
    broken = images.limit(50).withColumn(
        "bytes", F.when(F.col("image_id") == "img_000000000000", F.lit(None)).otherwise(F.col("bytes"))
    )
    got = fused_validation_summary(
        spark, broken, model, stat_cols=STAT_COLS, hist_col="w", edges=EDGES
    )
    assert got["per_check"]["payload_invariants"] >= 1


def test_fused_rollup_plan_shape(spark, images, tmp_path_factory):
    """The fused metadata scan must (a) never read the payload column and
    (b) aggregate all grouping levels in one pass — at 100 TB the rollup
    is one column-pruned scan + one shuffle, not one scan per check."""
    from neontology_spark.fused import metadata_rollup
    from neontology_spark.images import image_model

    path = str(tmp_path_factory.mktemp("fp") / "img.parquet")
    images.write.parquet(path)
    stored = spark.read.parquet(path)
    plan = (
        metadata_rollup(stored, image_model(), STAT_COLS, "w", EDGES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # column pruning: the scan's ReadSchema excludes bytes
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("bytes" not in ln for ln in read_schema)
    # exactly one scan of the table feeds the whole rollup
    assert plan.count("FileScan parquet") == 1
