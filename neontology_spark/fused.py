"""Fused one-pass validation summary — the scale-optimized verdict path.

The composable per-check API (checks/) builds one plan per check; a full
suite is ~10 scans and ~20 stages. Each scan is column-pruned and cheap at
the IO level, but the *fixed* costs multiply: plan building (py4j +
analysis per branch), per-stage scheduling, and one task wave per scan.
Measured on the bench host these fixed costs are ~5 s per suite run —
irrelevant on one executor, but pure Amdahl serial fraction when the same
suite runs on many executors (BENCH/BASELINE.md).

This module computes the SAME verdict-level quantities in TWO actions:

1. ONE ``rollup(part, bucket)`` scan of the metadata columns producing,
   per (partition, histogram-bucket) with per-partition and grand-total
   levels: row counts, per-column null counts, value-domain violation
   counts, min/max, approx-distinct (HLL merges across rollup levels),
   and the drift histogram. The result is O(parts × buckets) rows;
   drift PSI/KS and the stats/required/domain summaries are derived from
   it driver-side (microseconds over ~200 rows).
2. One action unioning the uniqueness aggregates (plain + salted, counts
   of duplicate keys and member rows via ``sum(dup_count)`` — no member
   rescan needed for counts) and the payload-invariant violation count
   (direct-read Arrow kernel).

``bytes`` is intentionally EXCLUDED from the metadata scan: a NULL or
truncated payload already fails the payload decode check, and a metadata
scan that touches the payload column costs payload IO at 10^12 rows.

Row-level violation *rows* (who exactly violated) remain the per-check
API's job; the fused path answers "how many, per check, per partition" —
which is what verdicts, dashboards, and the bench suite consume.

Parity with the per-check pipeline is pytest-enforced on the planted
table (tests/test_fused.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checks.core import duplicate_keys
from .checks.drift import EPS, bucket_expr
from .models import NodeModel

DEFAULT_EDGES = (0.0, 16, 32, 48, 64, 80, 96, 112, 128, 160)


def metadata_rollup(
    images: DataFrame,
    model: NodeModel,
    stat_cols: Sequence[str],
    hist_col: str = "w",
    edges: Sequence[float] = DEFAULT_EDGES,
    part_col: str = "part",
) -> DataFrame:
    """The single metadata scan: rollup(part, bucket) with conditional
    aggregates. Levels: (part, bucket) rows carry the drift histogram;
    (part, NULL) rows carry per-partition stats; (NULL, NULL) is the
    grand total. ``grouping(bucket)`` distinguishes them."""
    enum_props = {
        p.storage_name: tuple(p.enum_values)
        for p in model.properties
        if p.enum_values and p.storage_name in images.columns
    }
    req = [
        c for c in model.required_columns()
        if c in images.columns and c != "bytes" and c != part_col
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in sorted(set(req) | set(stat_cols)):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls__{c}"))
    for c, domain in enum_props.items():
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & ~F.col(c).isin(list(domain))).cast("long")
            ).alias(f"domain__{c}")
        )
    for c in stat_cols:
        aggs.append(F.min(F.col(c).cast("string")).alias(f"min__{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"max__{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"dist__{c}"))
    return (
        images.select(
            F.col(part_col).cast("long").alias("part"),
            F.format_string("b%05d", bucket_expr(hist_col, edges)).alias("bucket"),
            *sorted({*req, *stat_cols, *enum_props}),
        )
        .rollup("part", "bucket")
        .agg(*aggs, F.grouping("bucket").alias("g_bucket"), F.grouping("part").alias("g_part"))
    )


def _psi_ks(base_p: dict, cur_p: dict) -> tuple[float, float]:
    """PSI + two-sample KS over bucket→probability dicts, identical math
    to checks.drift.drift_metrics (ε-smoothed PSI, CDF max-gap KS over the
    lexicographic bucket order)."""
    buckets = sorted(set(base_p) | set(cur_p))
    psi = 0.0
    cdf_b = cdf_c = 0.0
    ks = 0.0
    for b in buckets:
        pb, pc = base_p.get(b, 0.0), cur_p.get(b, 0.0)
        psi += (pc - pb) * math.log((pc + EPS) / (pb + EPS))
        cdf_b += pb
        cdf_c += pc
        ks = max(ks, abs(cdf_c - cdf_b))
    return psi, ks


def fused_validation_summary(
    spark,
    images: DataFrame,
    model: NodeModel,
    stat_cols: Sequence[str],
    hist_col: str = "w",
    edges: Sequence[float] = DEFAULT_EDGES,
    part_col: str = "part",
    images_path: Optional[str] = None,
    sample_rows: Optional[int] = None,
) -> dict:
    """Run the fused suite; returns
    ``{"violations": (total, n_checks_fired), "stats": (n_stat_rows,
    total_nulls), "drift": (n_metric_rows, psi_sum), "rows": (n_rows,
    n_parts), "per_check": {...}, "required_excludes": ("bytes",)}`` —
    the same summary the per-check bench suite computes.

    PARITY CAVEAT (ADVICE r2, by design): ``per_check["required_not_null"]``
    EXCLUDES the ``bytes`` payload column — the metadata rollup scan must
    not touch payload IO, and a NULL payload already fails
    ``payload_invariants`` (decode_ok=False), so no violation is lost;
    it is *attributed* to payload_invariants instead. On tables with NULL
    payloads the fused and per-check required_not_null counts therefore
    diverge by exactly the NULL-bytes rows; ``required_excludes`` in the
    returned dict records which columns were excluded so callers comparing
    the two summaries can reconcile."""
    from concurrent.futures import ThreadPoolExecutor

    from .images import check_payload, check_payload_files

    # the rollup scan and the uniqueness+payload action are independent
    # jobs; submitting the rollup from a second driver thread lets its
    # tasks back-fill executor slots under the payload stage's tail
    # (guide §2.6) — the suite's wall time becomes max(action1, action2)
    # instead of their sum (~1.4 s at sf1.0, measured r6)
    rollup_df = metadata_rollup(
        images, model, stat_cols, hist_col, edges, part_col
    )
    pool = ThreadPoolExecutor(max_workers=1)
    rollup_future = pool.submit(rollup_df.collect)

    # ---- action 2: uniqueness aggregates + payload, one action ----------
    def uniq_summary(col: str, salted: bool, name: str) -> DataFrame:
        d = duplicate_keys(images, col, salted=salted)
        return d.groupBy().agg(
            F.count(F.lit(1)).alias("a"),
            F.coalesce(F.sum("dup_count"), F.lit(0)).cast("long").alias("b"),
        ).select(F.lit(name).alias("what"), "a", "b")

    payload = (
        check_payload_files(spark, images_path, sample_rows=sample_rows)
        if images_path
        else check_payload(images, sample_rows=sample_rows)
    )
    pay_summary = payload.groupBy().agg(
        F.count(F.lit(1)).alias("a"), F.count(F.lit(1)).alias("b")
    ).select(F.lit("payload").alias("what"), "a", "b")

    final = (
        uniq_summary(model.pp_storage, False, "unique_pp")
        .unionByName(uniq_summary("phash", True, "unique_phash"))
        .unionByName(pay_summary)
    )
    try:
        got = {r["what"]: r for r in final.collect()}
        rollup_rows = rollup_future.result()
    finally:
        pool.shutdown(wait=False)
    unique_pp_members = int(got["unique_pp"]["b"])
    unique_phash_members = int(got["unique_phash"]["b"])
    payload_viols = int(got["payload"]["a"])

    # ---- derive from the tiny rollup result (driver-side, ~200 rows) ----
    hist = {}   # part -> {bucket: n}
    per_part = {}  # part -> row  (the (part, NULL-bucket) level)
    total_row = None
    for r in rollup_rows:
        if r["g_part"] == 1:
            total_row = r
        elif r["g_bucket"] == 1:
            per_part[r["part"]] = r
        else:
            hist.setdefault(r["part"], {})[r["bucket"]] = r["n"]

    n_rows = int(total_row["n"])
    n_parts = len(per_part)

    req = [
        c for c in model.required_columns()
        if c in images.columns and c != "bytes" and c != part_col
    ]
    required_viols = sum(int(total_row[f"nulls__{c}"]) for c in req)
    domain_viols = sum(
        int(total_row[k]) for k in total_row.asDict() if k.startswith("domain__")
    )
    stats_nulls = sum(int(total_row[f"nulls__{c}"]) for c in stat_cols)
    n_stat_rows = len(stat_cols) * n_parts

    # drift: every partition's histogram vs the global one (same shape the
    # per-check suite uses in bench)
    global_n = {b: sum(h.get(b, 0) for h in hist.values()) for b in
                {b for h in hist.values() for b in h}}
    gtot = sum(global_n.values()) or 1
    base_p = {b: n / gtot for b, n in global_n.items()}
    psi_sum = 0.0
    for p, h in hist.items():
        ptot = sum(h.values()) or 1
        cur_p = {b: n / ptot for b, n in h.items()}
        psi, _ks = _psi_ks(base_p, cur_p)
        psi_sum += psi

    per_check = {
        "unique__pp": unique_pp_members,
        "unique__phash": unique_phash_members,
        "required_not_null": required_viols,
        "value_domain": domain_viols,
        "payload_invariants": payload_viols,
    }
    total_viols = sum(per_check.values())
    n_fired = sum(1 for v in per_check.values() if v > 0)
    return {
        "violations": (total_viols, n_fired),
        "stats": (n_stat_rows, stats_nulls),
        "drift": (n_parts, psi_sum),
        "rows": (n_rows, n_parts),
        "per_check": per_check,
        # columns omitted from the metadata scan's required-null counts
        # (payload-IO avoidance; NULL payloads surface under
        # payload_invariants instead — see docstring)
        "required_excludes": tuple(
            c for c in model.required_columns() if c == "bytes"
        ),
    }
