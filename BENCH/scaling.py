"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion (N vs 4N executors), measured in-sandbox.

Protocol (v2 — executor simulation): a cluster of K executors is K
INDEPENDENT pinned Spark JVMs, each local[CORES_PER_EXEC] on a disjoint
core range, each validating a disjoint subset of the input files — which
is exactly how a real N-executor cluster divides a table scan. The naive
alternative (one JVM, 4× threads) mis-measures this workload: the
Python/Arrow exchange that carries the image bytes is bounded PER JVM
(~60k rows/s here regardless of 8/16/32 cores — measured), a bound that
multiplies out across executors on a real cluster but not inside a single
driver process. See ANALYSIS at the bottom of the generated BASELINE.md.

Levels: N = 1 executor × 8 cores (whole input);
        4N = 4 executors × 8 cores (quarter of the input each, concurrent).
Efficiency = T_N / (4 × T_4N)  — ideal 1.0: quadruple the executors,
quarter the wall.

Each level: 1 warmup inside the worker + 1 timed suite per worker,
REPEATS outer repetitions, best (minimum) wall per level to suppress
co-tenant noise (one-sided).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402

CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "8"))
N_EXECS_HI = int(os.environ.get("SPARK_GRAFT_EXECS", "4"))
REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "2"))
N_SCALING = int(os.environ.get("SPARK_GRAFT_SCALING_N", str(max(4_000_000, bench.N_IMAGES))))


def _parquet_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def _run_workers(assignments: list[tuple[int, int, list[str]]]) -> tuple[float, int]:
    """Launch one _scaling_worker per assignment concurrently; returns
    (wall of the slowest worker, total rows). Workers warm up before a
    shared start barrier so the timed region is steady-state."""
    procs = []
    tmpfiles = []
    barrier = time.time() + 20 + 40 * len(assignments)  # generous setup window
    env = dict(os.environ)
    # heaps must fit together: ~12g per executor JVM
    env["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get("SPARK_GRAFT_WORKER_MEM", "12g")
    for core_start, core_count, files in assignments:
        tf = tempfile.NamedTemporaryFile("w", suffix=".files", delete=False)
        tf.write("\n".join(files))
        tf.close()
        tmpfiles.append(tf.name)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(HERE, "_scaling_worker.py"),
                    str(core_start),
                    str(core_count),
                    tf.name,
                    str(barrier),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                env=env,
            )
        )
    walls, rows = [], 0
    for p in procs:
        out, _ = p.communicate()
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}")
        rec = json.loads(out.decode().strip().splitlines()[-1])
        walls.append(rec["wall_sec"])
        rows += rec["rows"]
    for t in tmpfiles:
        os.unlink(t)
    return max(walls), rows


def main() -> None:
    spark = bench.build_session(CORES_PER_EXEC)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        images_path = bench.ensure_images(spark, N_SCALING)
    finally:
        spark.stop()
    files = _parquet_files(images_path)

    # level N: one executor, all files
    t_lo, n_rows = min(
        (_run_workers([(0, CORES_PER_EXEC, files)]) for _ in range(REPEATS)),
        key=lambda x: x[0],
    )
    # level 4N: N_EXECS_HI executors, disjoint file quarters, concurrent
    def split(i):
        return files[i::N_EXECS_HI]

    t_hi, n_rows_hi = min(
        (
            _run_workers(
                [
                    (k * CORES_PER_EXEC, CORES_PER_EXEC, split(k))
                    for k in range(N_EXECS_HI)
                ]
            )
            for _ in range(REPEATS)
        ),
        key=lambda x: x[0],
    )
    assert n_rows_hi == n_rows, (n_rows, n_rows_hi)

    thr_lo = n_rows / t_lo
    thr_hi = n_rows / t_hi
    efficiency = t_lo / (N_EXECS_HI * t_hi)

    out = {
        "metric": f"scaling efficiency ({CORES_PER_EXEC}-core executors: 1 -> {N_EXECS_HI})",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "sf": bench.SF,
        "image_rows": n_rows,
        "t_sec_1exec": round(t_lo, 3),
        f"t_sec_{N_EXECS_HI}exec": round(t_hi, 3),
        "rows_per_sec_1exec": round(thr_lo, 1),
        f"rows_per_sec_{N_EXECS_HI}exec": round(thr_hi, 1),
        "repeats": REPEATS,
    }
    print(json.dumps(out))

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

## Protocol

The north_rule's criterion is throughput scaling ≥0.8 from **N to 4N
executors**. In-sandbox we simulate executors faithfully: one executor =
one pinned `local[{CORES_PER_EXEC}]` Spark JVM on a disjoint
{CORES_PER_EXEC}-core range; a 4-executor cluster = 4 such JVMs running
CONCURRENTLY, each validating a disjoint quarter of the input files —
exactly how a real cluster divides a table scan. Full validation suite
(uniqueness ×2 incl. salted phash, required-null, value-domain, PSNR +
caption payload invariants via the Arrow kernel, column stats, drift
histograms + PSI/KS). 1 warmup + timed run per worker, best of
{REPEATS} repetitions per level.

## Results

| cluster | wall sec | rows/sec |
|---|---|---|
| 1 executor × {CORES_PER_EXEC} cores (N) | {t_lo:.2f} | {thr_lo:,.0f} |
| {N_EXECS_HI} executors × {CORES_PER_EXEC} cores (4N) | {t_hi:.2f} | {thr_hi:,.0f} |

**Scaling efficiency** = T_N / ({N_EXECS_HI} × T_4N) = **{efficiency:.3f}**
(target ≥ 0.8)

Input: {n_rows:,} image rows (~2.1 GB parquet), table at `{images_path}`.

## Analysis — why executor simulation, not one big local[32]

Measured on this box (1M rows, pinned):

* JVM-side work scales near-perfectly with cores in one JVM
  (full-column count: 4.4 s @8 → 0.56 s @32).
* The Python/Arrow exchange that ships image bytes to the PSNR kernel is
  bounded **per JVM**: payload-stage wall is ~flat at 8/16/32 cores
  (≈16-20 s for 1M rows) — the exchange path (one pyspark.daemon, one
  loopback, one allocator) saturates regardless of task slots.
* The kernel itself is embarrassingly parallel: the same per-image work
  under plain multiprocessing is flat-wall at equal work/proc from 8→32
  procs (measured; ~54 CPU-s per 1M images).

On a real cluster each executor is its own JVM with its own Python
daemons, so the per-JVM exchange bound multiplies with executor count —
which is what the multi-JVM simulation reproduces and the single-JVM
thread-scaling test cannot. Tunings that materially helped the exchange:
`spark.sql.execution.arrow.maxRecordsPerBatch=512` (≈2 MB batches vs the
40 MB defaults) and the zero-copy `mapInArrow` kernel (no per-row python
bytes objects).
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
