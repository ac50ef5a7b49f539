"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times individual declared queries exactly as bench.py does (``.count()``
on the returned frame, medians over N rounds, round-robin), but lets you
pick the query subset and the SF from the command line, and optionally
dumps ``explain("formatted")`` for each query to plans/r06/.

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 --runs 3 \
        --queries embedding_near_dup,ivf_ann,ivf_ann_indexed
    python bench_extra.py --explain --queries column_quantiles \
        --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import build_session  # same session config as the frozen bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default="", help="comma-separated names; empty = all")
    ap.add_argument("--explain", action="store_true", help="dump explain('formatted') per query")
    ap.add_argument("--suffix", default="", help="plans/r06/<name>_<suffix>.txt")
    ap.add_argument("--noop", action="store_true", help="noop sink instead of .count()")
    args = ap.parse_args()

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        import __spark_entry__ as entrymod

        qs = entrymod.queries()
        names = [n for n in args.queries.split(",") if n] or sorted(qs)
        for n in names:
            if n not in qs:
                raise SystemExit(f"unknown query: {n}")

        if args.explain:
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            for n in names:
                df = qs[n](spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                sfx = f"_{args.suffix}" if args.suffix else ""
                path = os.path.join(REPO, "plans", "r06", f"{n}{sfx}.txt")
                with open(path, "w") as f:
                    f.write(plan)
                print(f"wrote {path}")
            return

        # warmup: JVM/codegen + python workers
        spark.range(1_000_000).selectExpr("sum(id)").collect()

        samples: dict[str, list[float]] = {}
        for _ in range(args.runs):
            for n in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{n}")
                t = time.time()
                df = qs[n](spark, args.sf_dir)
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                samples.setdefault(n, []).append(round(time.time() - t, 3))
                spark.sparkContext.setJobDescription(None)
        out = {
            n: {
                "median": round(statistics.median(ts), 3),
                "samples": ts,
            }
            for n, ts in samples.items()
        }
        print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus, "queries": out}, indent=1))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
