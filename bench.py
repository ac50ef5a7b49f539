"""Benchmark harness — prints ONE JSON line the driver records as
BENCH_r{N}.json.

Headline workload = the engine's reason to exist: the full constraint-
validation suite (uniqueness ×2 incl. salted phash, required-null,
value-domain, payload PSNR/caption invariants, column stats, drift) over a
parquet-backed synthetic image+caption table sized to the SF, plus the
SURVEY.md §2 operator queries over the driver testdata tables.

The image table is generated once per (sf, n) into a /tmp cache and
re-read from parquet so the timing measures VALIDATION throughput, not
synthesis. `value` = total wall seconds over all headline queries;
`rows_per_sec` = image-table rows / validation-suite seconds (the
BASELINE.json throughput metric).

Scaling-efficiency evidence (N vs 4N simulated executors — independent
pinned JVMs over disjoint file slices) is produced by BENCH/scaling.py;
kept out of the default bench run so the driver's per-round bench stays
fast. Results + protocol + controls: BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
N_IMAGES = max(2_000, int(1_000_000 * SF))
N_PARTS = 16
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/neontology_bench")
# PSNR row-sample estimator (see images._score_record_batch): identical
# violation set on the planted corruptions, ±0.2 dB CI on the lossy-codec
# margin, and O(sample·w) instead of O(h·w) bytes touched per image — the
# payload stage is the suite's bandwidth bound at high core counts.
# 0 = full-plane exact PSNR.
_sr = int(os.environ.get("SPARK_GRAFT_PSNR_SAMPLE_ROWS", "8"))
PSNR_SAMPLE_ROWS = _sr if _sr > 0 else None


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"neontology_bench_{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # split size: the 8m-splits tuning dated from when image bytes went
        # through the JVM scan; the payload now reads parquet directly in
        # python workers, so the JVM-side scans are metadata-priced and tiny
        # tasks only buy scheduling overhead (measured ~7s of a 28s
        # quarter-slice run). 64m keeps tasks ≫ cores without task spam.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "64m"),
        )
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST", "4m"),
        )
        # small Arrow batches for binary-heavy python exchange: 10k-row
        # default batches (~40MB of image bytes) thrash worker memory;
        # 512 rows ≈ 2MB measured ~10x faster on the no-op exchange
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # tell the JVM how many cores it actually has: pinned local[K]
        # JVMs otherwise size GC/JIT/netty pools for ALL visible CPUs and
        # thrash when several executors share a machine
        .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cpus}")
        .getOrCreate()
    )


def ensure_images(spark, n_rows: int) -> str:
    """Generate-or-reuse the parquet-backed image table for this SF."""
    path = os.path.join(CACHE_DIR, f"images_n{n_rows}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        import __spark_entry__ as entrymod

        entrymod._ensure_shipped(spark)
        from neontology_spark.images import generate_images

        generate_images(spark, n_rows=n_rows, n_parts=N_PARTS).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def validation_suite(spark, images_path: str):
    """The headline job over a parquet path; see validation_suite_df."""
    import __spark_entry__ as entrymod

    entrymod._ensure_shipped(spark)
    return validation_suite_df(
        spark, spark.read.parquet(images_path), images_path=images_path
    )


FUSED = os.environ.get("SPARK_GRAFT_FUSED", "1") != "0"

STAT_COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]
HIST_EDGES = [0.0, 16, 32, 48, 64, 80, 96, 112, 128, 160]


def validation_suite_df(spark, images, images_path=None):
    """The headline job: the full check-suite summary over the image table;
    returns (seconds, n_rows). Default = the FUSED two-action plan
    (neontology_spark/fused.py: one rollup metadata scan + one
    uniqueness/payload action) — the per-check composable pipeline computes
    the same quantities in ~10 scans and pays ~5 s of per-suite fixed cost
    (plan building + stage scheduling) that becomes the Amdahl serial term
    in the scaling measurement. SPARK_GRAFT_FUSED=0 selects the per-check
    path (parity between the two is pytest-enforced)."""
    if FUSED:
        from neontology_spark.fused import fused_validation_summary
        from neontology_spark.images import image_model

        t0 = time.time()
        got = fused_validation_summary(
            spark,
            images,
            image_model(),
            stat_cols=STAT_COLS,
            hist_col="w",
            edges=HIST_EDGES,
            images_path=images_path,
            sample_rows=PSNR_SAMPLE_ROWS,
        )
        dt = time.time() - t0
        assert got["violations"][0] > 0 and got["violations"][1] >= 1
        assert got["stats"][0] > 0 and got["drift"][0] > 0
        return dt, got["rows"][0]
    return validation_suite_df_percheck(spark, images, images_path)


def validation_suite_df_percheck(spark, images, images_path=None):
    """Per-check composable pipeline (one plan per check, ~10 scans).
    Kept as the readable reference implementation and the fused path's
    parity partner. When ``images_path`` is given the payload check uses
    the direct-read kernel (python workers read the parquet files
    themselves — the JVM⇄python exchange is a measured machine-global
    ~200 MB/s bottleneck in this sandbox; see BENCH/BASELINE.md)."""
    from neontology_spark.checks import (
        check_domain,
        check_required,
        check_unique,
        column_stats,
        partition_row_counts,
    )
    from neontology_spark.checks.base import CheckResult
    from neontology_spark.images import check_payload, check_payload_files, image_model

    from pyspark.sql import functions as F

    model = image_model()
    t0 = time.time()
    counts = partition_row_counts(images, "part")
    results = [
        check_unique(images, model, part_col="part"),
        check_unique(
            images, model, column="phash", part_col="part", salted=True,
            check_name="unique__phash",
        ),
        check_required(images, model, part_col="part"),
        check_domain(images, model, part_col="part"),
        CheckResult(
            "payload_invariants",
            "Image",
            check_payload_files(spark, images_path, sample_rows=PSNR_SAMPLE_ROWS)
            if images_path
            else check_payload(images, sample_rows=PSNR_SAMPLE_ROWS),
        ),
    ]
    # ---- ONE action for the whole suite -----------------------------------
    # Driver-side planning/scheduling latency is serial (Amdahl): with one
    # aggregate per check the suite paid ~6 actions x multi-second Catalyst
    # plans regardless of cluster size (measured: flat wall from 1 to 4
    # executors). Instead: union all violation streams -> ONE
    # groupBy(part, check) -> ONE summary row, unioned with one-row
    # summaries of stats and drift -> a single collect().
    all_vio = results[0].violations
    for r in results[1:]:
        all_vio = all_vio.unionByName(r.violations)
    vio_summary = all_vio.groupBy().agg(
        F.count(F.lit(1)).alias("a"),
        F.count_distinct("check").alias("b"),
    ).select(F.lit("violations").alias("what"), "a", "b")

    stats = column_stats(
        images, columns=["image_id", "w", "h", "fmt", "caption", "phash"],
        part_col="part",
    )
    stats_summary = stats.groupBy().agg(
        F.count(F.lit(1)).alias("a"), F.sum("n_nulls").alias("b")
    ).select(F.lit("stats").alias("what"), "a", "b")

    from neontology_spark.checks.drift import drift_metrics, numeric_histogram

    edges = [0.0, 16, 32, 48, 64, 80, 96, 112, 128, 160]
    global_hist = numeric_histogram(images, "w", edges)
    part_hist = numeric_histogram(images, "w", edges, part_col="part")
    drift_summary = drift_metrics(global_hist, part_hist).groupBy().agg(
        F.count(F.lit(1)).alias("a"),
        F.sum(F.col("psi")).alias("b"),
    ).select(F.lit("drift").alias("what"), "a", "b")

    rows_summary = counts.groupBy().agg(
        F.sum("n_rows").alias("a"), F.count(F.lit(1)).alias("b")
    ).select(F.lit("rows").alias("what"), "a", "b")

    final = vio_summary.unionByName(stats_summary).unionByName(
        drift_summary
    ).unionByName(rows_summary)
    got = {r["what"]: r for r in final.collect()}
    dt = time.time() - t0
    # subset runs (scaling workers over a file slice) may not contain every
    # planted violation type; require at least one stream to have fired
    assert got["violations"]["a"] > 0 and got["violations"]["b"] >= 1
    assert got["stats"]["a"] > 0 and got["drift"]["a"] > 0
    n_rows = got["rows"]["a"]
    return dt, n_rows


N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    """Each query runs N_RUNS times (default 3) in suite-level rounds
    (round-robin, so one co-tenant noise burst cannot poison all of a
    query's samples); reported per-query time = MEDIAN, with the
    relative spread ((max-min)/median) published alongside. VERDICT r3
    'What's wrong' #3: single-shot timings on this ~2-3x-noisy shared
    host made regression calls unfalsifiable — medians + disclosed
    spread make them checkable."""
    import statistics

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        images_path = ensure_images(spark, N_IMAGES)
        # JVM/codegen warmup + python-worker spawn (mapInArrow on a slice)
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        validation_suite(spark, images_path)  # warm plan cache + workers

        import __spark_entry__ as entrymod

        samples: dict[str, list[float]] = {}
        val_secs: list[float] = []
        n_rows = 0
        for _ in range(N_RUNS):
            val_sec, n_rows = validation_suite(spark, images_path)
            val_secs.append(val_sec)
            samples.setdefault("validation_suite", []).append(val_sec)
            for name, fn in sorted(entrymod.queries().items()):
                t = time.time()
                fn(spark, SF_DIR).count()
                samples.setdefault(name, []).append(time.time() - t)

        timings = {
            name: round(statistics.median(ts), 3)
            for name, ts in samples.items()
        }
        spread = {
            name: round(
                (max(ts) - min(ts)) / statistics.median(ts), 3
            )
            for name, ts in samples.items()
        }
        val_med = statistics.median(val_secs)
        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "headline suite wall time (per-query medians)",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "queries_rel_spread": spread,
                    "n_runs": N_RUNS,
                    "sf": SF,
                    "image_rows": n_rows,
                    "validation_rows_per_sec": round(n_rows / val_med, 1),
                    "psnr_sample_rows": PSNR_SAMPLE_ROWS,
                    "cpus": CPUS,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
