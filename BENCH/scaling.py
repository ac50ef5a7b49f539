"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion, sandbox protocol per BASELINE.md: run the IDENTICAL validation
job on the IDENTICAL input at local[8] (N) and local[32] (4N), report
throughput at both and efficiency = (T_8 / T_32) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.

Protocol details that make the number honest:
* the input is a parquet table on disk, generated once before either run;
* each parallelism level gets a FRESH SparkSession (stop + rebuild) so no
  cached RDD/codegen state leaks between levels;
* per level: one warmup pass (JVM/codegen) then `RUNS` timed passes,
  best-of reported (local-mode noise is one-sided — GC pauses slow runs,
  nothing speeds them up);
* shuffle partitions scale with cores (8 / 32), as they would on a real
  cluster sized N vs 4N executors.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root bench.py provides the job + session)

RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
LEVELS = (8, 32)
# scaling evidence needs a compute-bound job: at <~1s wall, scheduling
# overhead dominates and 4× the cores measures nothing. 400k images keeps
# local[8] around tens of seconds (payload decode bound).
N_SCALING = int(os.environ.get("SPARK_GRAFT_SCALING_N", str(max(1_000_000, bench.N_IMAGES))))


def measure(cpus: int, images_path: str) -> tuple[float, int]:
    """One parallelism level, with CPU AFFINITY pinned to `cpus` cores: in
    local mode the JVM task threads AND the Python UDF workers both burn
    cores, so an unpinned local[8] quietly uses up to 16 — inflating the
    small level and faking poor scaling. Pinning is the honest analogue of
    an N-core executor allocation. (Children — JVM, python workers —
    inherit the affinity mask.)"""
    os.sched_setaffinity(0, set(range(cpus)))
    try:
        spark = bench.build_session(cpus)
        spark.sparkContext.setLogLevel("ERROR")
        try:
            bench.validation_suite(spark, images_path)  # warmup
            best = float("inf")
            n_rows = 0
            for _ in range(RUNS):
                dt, n_rows = bench.validation_suite(spark, images_path)
                best = min(best, dt)
            return best, n_rows
        finally:
            spark.stop()
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))


def main() -> None:
    spark = bench.build_session(LEVELS[0])
    spark.sparkContext.setLogLevel("ERROR")
    try:
        images_path = bench.ensure_images(spark, N_SCALING)
    finally:
        spark.stop()

    t_lo, n_rows = measure(LEVELS[0], images_path)
    t_hi, _ = measure(LEVELS[1], images_path)
    thr_lo = n_rows / t_lo
    thr_hi = n_rows / t_hi
    ratio = LEVELS[1] / LEVELS[0]
    efficiency = (t_lo / t_hi) / ratio

    out = {
        "metric": "scaling efficiency (local[8] -> local[32])",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "sf": bench.SF, "n_scaling": N_SCALING,
        "image_rows": n_rows,
        "t_sec_8": round(t_lo, 3),
        "t_sec_32": round(t_hi, 3),
        "rows_per_sec_8": round(thr_lo, 1),
        "rows_per_sec_32": round(thr_hi, 1),
        "runs_per_level": RUNS,
    }
    print(json.dumps(out))

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Protocol (BASELINE.md / north_rule): identical validation-suite job on the
identical parquet image table at two parallelism levels, fresh SparkSession
per level, 1 warmup + {RUNS} timed runs per level, best-of reported.

| parallelism | wall sec | rows/sec |
|---|---|---|
| local[{LEVELS[0]}] (N) | {t_lo:.3f} | {thr_lo:,.0f} |
| local[{LEVELS[1]}] (4N) | {t_hi:.3f} | {thr_hi:,.0f} |

**Scaling efficiency** = (T_{LEVELS[0]} / T_{LEVELS[1]}) / {ratio:.0f}
= **{efficiency:.3f}** (target ≥ 0.8)

Input: {n_rows:,} image rows (sf={bench.SF}), table at `{images_path}`.

Caveat: local-mode shuffles share one JVM and page cache, so this
under-approximates network effects on a real 4N-executor cluster but
honestly measures CPU-scaling of the plan (scan, hash aggregates, joins,
Arrow-batched payload UDF).
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
