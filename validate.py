#!/usr/bin/env python
"""spark-submit entry point: run the full constraint-validation suite over
an image+caption table (parquet directory; Iceberg table on a real
cluster), checkpoint-resumable, with per-partition lineage + metrics in an
audit store.

Cluster usage (north_star protocol):

    zip -r neontology_spark.zip neontology_spark/
    spark-submit --py-files neontology_spark.zip validate.py \
        --table s3://bucket/images --audit s3://bucket/audit \
        --run-id nightly_2026_08_16 [--no-resume] [--baseline s3://...]

Sandbox usage:

    python validate.py --table /tmp/neontology_bench/images_n100000.parquet \
        --audit /tmp/audit --run-id test1

Exits 0 when every partition passed, 2 when violations were found (the
audit store has the rows), 1 on error.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="parquet path of the image table")
    ap.add_argument("--audit", required=True, help="audit store root path")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--part-col", default="part")
    ap.add_argument("--baseline", default=None, help="parquet path of a clean baseline snapshot for drift")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--sketch-cols",
        default=None,
        help="comma-separated columns to HLL-sketch into the audit "
        "'sketches' stream (cross-run incremental distinct counts)",
    )
    ap.add_argument("--master", default=os.environ.get("SPARK_MASTER", "local[32]"))
    ap.add_argument(
        "--psnr-sample-rows", type=int, default=0,
        help="rows per image for the sampled PSNR estimator (0 = exact "
        "full-plane audit mode; 8 = the bench default, ±0.2 dB CI)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(args.master)
        .appName(f"neontology_validate_{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    import __spark_entry__ as entrymod

    entrymod._ensure_shipped(spark)

    from neontology_spark.audit import AuditStore, ValidationRun
    from neontology_spark.checks import (
        check_domain,
        check_required,
        check_unique,
        column_stats,
    )
    from neontology_spark.checks.base import CheckResult
    from neontology_spark.checks.drift import (
        check_drift,
        drift_metrics,
        numeric_histogram,
    )
    from neontology_spark.images import check_payload, image_model

    table = spark.read.parquet(args.table)
    model = image_model()

    # partition-local checks run over the pruned pending-partition scan;
    # uniqueness is GLOBAL (a duplicate straddling a completed and a
    # pending partition must still be found on resume) so it scans the
    # full table with output restricted to pending partitions
    checks = [
        functools.partial(check_required, model=model, part_col=args.part_col),
        functools.partial(check_domain, model=model, part_col=args.part_col),
        lambda df: CheckResult(
            "payload_invariants",
            "Image",
            check_payload(
                df,
                sample_rows=args.psnr_sample_rows or None,
            ),
        ),
    ]
    global_checks = [
        functools.partial(check_unique, model=model, part_col=args.part_col),
        functools.partial(
            check_unique, model=model, column="phash", part_col=args.part_col,
            salted=True, check_name="unique__phash",
        ),
    ]
    if args.baseline:
        from neontology_spark.checks.drift import (
            check_quantile_drift,
            quantile_drift,
        )

        baseline = spark.read.parquet(args.baseline)
        edges = [0.0, 16, 32, 48, 64, 80, 96, 112, 128, 160, 256, 1024, 4096]
        base_hist = numeric_histogram(baseline, "w", edges)

        def drift_check(df):
            return check_drift(
                drift_metrics(
                    base_hist, numeric_histogram(df, "w", edges, part_col=args.part_col)
                ),
                label="Image",
            )

        def qdrift_check(df):
            # GK-sketch quantiles (exact=False): the 10^12-row path;
            # catches location/scale shifts inside histogram buckets
            return check_quantile_drift(
                quantile_drift(
                    baseline, df, ["w", "h"], part_col=args.part_col
                ),
                label="Image",
            )

        checks.append(drift_check)
        checks.append(qdrift_check)

    run = ValidationRun(
        spark=spark,
        table=table,
        label="Image",
        part_col=args.part_col,
        checks=checks,
        global_checks=global_checks,
        store=AuditStore(spark, args.audit),
        run_id=args.run_id,
        metrics_fn=lambda df: column_stats(
            df, columns=["image_id", "w", "h", "fmt", "caption", "phash"],
            part_col=args.part_col,
        ),
    )
    verdicts = run.run(resume=not args.no_resume)
    if args.sketch_cols:
        from neontology_spark.audit import append_distinct_sketches

        append_distinct_sketches(
            run.store,
            args.run_id,
            table,
            [c.strip() for c in args.sketch_cols.split(",") if c.strip()],
            part_col=args.part_col,
        )
    rows = verdicts.collect()
    n_failed = sum(1 for r in rows if not r["passed"])
    summary = {
        "run_id": args.run_id,
        "partitions_processed": len({r["part"] for r in rows}),
        "verdicts": len(rows),
        "failed_verdicts": n_failed,
        "violations": int(sum(r["n_violations"] for r in rows)),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0 if n_failed == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
