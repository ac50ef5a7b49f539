"""One simulated executor for BENCH/scaling.py: a pinned local[K] Spark
JVM running the full validation suite over a subset of the input files.
Prints one JSON line {"wall_sec": ..., "rows": ...}.

Invoked as:
    python _scaling_worker.py <core_start> <core_count> <files_csv_path> <barrier_epoch> [ballast]

Setup (JVM start, package ship, kernel warmup) happens BEFORE the barrier
timestamp; the timed region starts exactly at the barrier so concurrent
workers measure steady-state cluster throughput, not each other's
startup. Memory: driver heap set via SPARK_GRAFT_DRIVER_MEM by the
orchestrator so K workers fit in RAM together.

``ballast`` mode: loop the suite from the barrier until SIGTERM, printing
nothing — used by the orchestrator to keep host occupancy IDENTICAL
across cluster-size levels (see scaling.py protocol notes).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    core_start, core_count = int(sys.argv[1]), int(sys.argv[2])
    with open(sys.argv[3]) as f:
        files = [ln.strip() for ln in f if ln.strip()]
    barrier = float(sys.argv[4])
    os.sched_setaffinity(0, set(range(core_start, core_start + core_count)))

    import bench

    # task parallelism may be lower than the pinned range: the spare cores
    # absorb JVM service threads / python daemons / OS so four executors
    # saturating the whole machine don't fall off the full-occupancy cliff
    task_cores = int(os.environ.get("SPARK_GRAFT_TASK_CORES", str(core_count)))
    spark = bench.build_session(task_cores)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        import __spark_entry__ as entrymod

        entrymod._ensure_shipped(spark)
        # symlink farm: the direct-read payload kernel takes a directory,
        # and each simulated executor owns a file subset
        import tempfile

        linkdir = tempfile.mkdtemp(prefix="exec_files_")
        for f in files:
            os.symlink(f, os.path.join(linkdir, os.path.basename(f)))
        images = spark.read.parquet(*files)
        bench.validation_suite_df(spark, images, images_path=linkdir)  # warmup
        import time

        now = time.time()
        if now < barrier:
            time.sleep(barrier - now)
        late = max(0.0, now - barrier)
        if len(sys.argv) > 5 and sys.argv[5] == "ballast":
            import signal

            signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))
            while True:  # until SIGTERM from the orchestrator
                bench.validation_suite_df(spark, images, images_path=linkdir)
        # SUITE_LOOPS > 1 multiplies the work per timed region (the
        # disk-constrained stand-in for a proportionally larger input:
        # a 64M-row table does not fit this sandbox's disk, 4 loops over
        # 16M rows give each worker the same 4x work; page-cache caveat
        # disclosed in BASELINE.md)
        loops = int(os.environ.get("SPARK_GRAFT_SUITE_LOOPS", "1"))
        t0 = time.time()
        for _ in range(loops):
            _, n_rows = bench.validation_suite_df(spark, images, images_path=linkdir)
        wall = time.time() - t0
        print(json.dumps({"wall_sec": wall, "rows": n_rows * loops, "late_sec": late}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
