"""Planted-skew measurement for the salted uniqueness aggregation
(VERDICT r4 #6: the salting exists in checks/core.py duplicate_keys —
measure its benefit instead of asserting it).

Setup: one phash value planted on 30% of an N-row table (default 16M),
the rest unique — the "celebrity duplicate" regime the salted path
exists for. Three configs per aggregation shape, median of R runs:

* unsalted, AQE off  — the naive single-phase groupBy
* salted,   AQE off  — two-phase groupBy(key, salt) -> groupBy(key)
* unsalted, AQE on   — what AQE alone does (NB: AQE splits skewed
  sort-merge-JOIN partitions; it does not split skewed aggregations,
  so this config documents that the hedge must live in the plan)

Two aggregation shapes, because they behave differently by design:

* count shape (duplicate_keys): HashAggregate's map-side partial
  aggregation already collapses the hot key to ONE partial row per
  input partition before the shuffle — skew-resilient without salting.
  The measurement EXPECTS parity here; the salted path's extra shuffle
  should show as overhead, not a win. Publishing that honestly is the
  point: salting the count path is insurance, not speedup.
* distinct-payload shape (count_distinct(payload) per key — the
  dup-group characterization query): Catalyst plans this as a
  FIRST aggregate keyed by (key, payload) — so the dedup shuffle
  hashes on BOTH columns and a distinct-per-row payload spreads the
  hot key across all reducers. Also expected ~parity: Spark's own
  two-level distinct plan is already the de-skew.
* holistic shape (size(collect_set(payload)) per key — dup-group
  membership): partial ObjectHashAggregate state cannot collapse, so
  the hot key's ~0.3*N values merge in ONE final-aggregate task
  unsalted while every other reducer idles. This is the genuinely
  skew-vulnerable aggregation shape, and the one the salted plan
  (exact here because the payload is distinct-per-row; overlap-safe
  variants emit phase-1 distinct values) actually helps.

Usage:  python BENCH/skew.py [n_rows]     # writes one JSON line
Results belong in BENCH/BASELINE.md § planted skew.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
HOT_FRAC = 0.3
SALT_BUCKETS = 64
RUNS = 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build(aqe: bool):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"skew_bench_aqe_{aqe}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={CPUS}")
        .getOrCreate()
    )


def gen_table(spark, path: str) -> None:
    from pyspark.sql import functions as F

    hot_n = int(N_ROWS * HOT_FRAC)
    df = spark.range(N_ROWS, numPartitions=CPUS).select(
        F.when(F.col("id") < hot_n, F.lit(1234567890123))
        .otherwise(F.col("id") + 10_000_000_000)
        .alias("phash"),
        # payload distinct per row — the partial-agg-defeating column
        F.concat(F.lit("caption-"), F.col("id").cast("string")).alias("caption"),
    )
    df.write.mode("overwrite").parquet(path)


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def measure(spark, path: str) -> dict:
    from pyspark.sql import functions as F

    from neontology_spark.checks.core import duplicate_keys

    df = spark.read.parquet(path)

    def count_shape(salted: bool):
        # same terminal action for every config: materialize the dup set
        return lambda: duplicate_keys(
            df, "phash", salted=salted, salt_buckets=SALT_BUCKETS
        ).count()

    def distinct_shape(salted: bool):
        if salted:
            salt = F.pmod(
                F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(SALT_BUCKETS),
            )
            def run():
                partial = (
                    df.select("phash", "caption", salt.alias("_salt"))
                    .groupBy("phash", "_salt")
                    .agg(F.count_distinct("caption").alias("_d"))
                )
                # distinct payloads never collide across salt buckets only
                # by luck; sum is exact here because caption is unique per
                # row — the shape (not the exact statistic) is what the
                # two-phase plan buys. For overlap-safe exact distincts,
                # phase 1 would emit the distinct values themselves.
                partial.groupBy("phash").agg(F.sum("_d").alias("n_captions")).filter(
                    F.col("n_captions") > 1
                ).count()
        else:
            def run():
                df.groupBy("phash").agg(
                    F.count_distinct("caption").alias("n_captions")
                ).filter(F.col("n_captions") > 1).count()
        return run

    def collect_shape(salted: bool):
        if salted:
            salt = F.pmod(
                F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(SALT_BUCKETS),
            )
            def run():
                partial = (
                    df.select("phash", "caption", salt.alias("_salt"))
                    .groupBy("phash", "_salt")
                    .agg(F.size(F.collect_set("caption")).alias("_n"))
                )
                partial.groupBy("phash").agg(F.sum("_n").alias("n")).filter(
                    F.col("n") > 1
                ).count()
        else:
            def run():
                df.groupBy("phash").agg(
                    F.size(F.collect_set("caption")).alias("n")
                ).filter(F.col("n") > 1).count()
        return run

    out = {}
    for label, mk in (
        ("count", count_shape),
        ("distinct", distinct_shape),
        ("collect", collect_shape),
    ):
        for variant, salted in (("unsalted", False), ("salted", True)):
            fn = mk(salted)
            fn()  # warm
            out[f"{label}_{variant}"] = round(
                statistics.median(timed(fn) for _ in range(RUNS)), 3
            )
    return out


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="skew_bench_")
    path = os.path.join(tmp, "table.parquet")
    results = {}
    try:
        for aqe in (False, True):
            spark = build(aqe)
            spark.sparkContext.setLogLevel("ERROR")
            try:
                if not os.path.exists(os.path.join(path, "_SUCCESS")):
                    gen_table(spark, path)
                tag = "aqe_on" if aqe else "aqe_off"
                for k, v in measure(spark, path).items():
                    results[f"{k}_{tag}"] = v
            finally:
                spark.stop()
        print(
            json.dumps(
                {
                    "metric": "planted-skew salted vs unsalted (median sec)",
                    "n_rows": N_ROWS,
                    "hot_frac": HOT_FRAC,
                    "salt_buckets": SALT_BUCKETS,
                    "runs": RUNS,
                    "cpus": CPUS,
                    "timings": results,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
