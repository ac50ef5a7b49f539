"""Column-stats profiler (SURVEY.md A6).

The reference has no stats operator — per-row Pydantic validation is its
only null/required signal. The north_rule mandates per-column stats (null
rate, min/max, distinct) as first-class checks; this module computes them
in **one pass** over the table.

Scale design:
* ONE ``agg`` with all per-column expressions → a single column-pruned scan
  with map-side partial aggregation; no per-column jobs.
* distinct counts use ``approx_count_distinct`` (HyperLogLog++ — mergeable
  across partitions by construction, the "HLL sketch" the north_star names).
  Exact ``countDistinct`` is available behind ``exact=True`` for oracle
  parity at small scale, but at 100 TB exact-distinct per column is a
  full shuffle per column — approx is the production path.
* per-partition stats = same expressions under ``groupBy(part)``; the
  partition column is low-cardinality so the reduce side is tiny.
* binary columns (image ``bytes``) get length stats only — the payload is
  never materialized into the aggregate (``F.length`` is computed at the
  scan and the bytes dropped immediately).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# long stats row schema: one row per (part, column)
STATS_COLS = [
    "part",
    "column",
    "n_rows",
    "n_nulls",
    "null_rate",
    "n_distinct",
    "min_value",
    "max_value",
]

_UNORDERED = (T.BinaryType, T.ArrayType, T.MapType, T.StructType, T.BooleanType)


def _col_exprs(df: DataFrame, c: str, exact: bool) -> list:
    """Aggregate expressions for one column; min/max stringified so all
    columns stack into one long-format result."""
    f = df.schema[c]
    nulls = F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
    if isinstance(f.dataType, T.BinaryType):
        base = F.length(F.col(c))
        distinct = F.lit(None).cast("long").alias(f"{c}__distinct")
        mn = F.min(base).cast("string").alias(f"{c}__min")
        mx = F.max(base).cast("string").alias(f"{c}__max")
        return [nulls, distinct, mn, mx]
    dist_src = F.col(c)
    distinct = (
        F.count_distinct(dist_src) if exact else F.approx_count_distinct(dist_src)
    ).alias(f"{c}__distinct")
    if isinstance(f.dataType, _UNORDERED):
        mn = F.lit(None).cast("string").alias(f"{c}__min")
        mx = F.lit(None).cast("string").alias(f"{c}__max")
    else:
        mn = F.min(F.col(c)).cast("string").alias(f"{c}__min")
        mx = F.max(F.col(c)).cast("string").alias(f"{c}__max")
    return [nulls, distinct, mn, mx]


def column_stats(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    part_col: Optional[str] = None,
    exact: bool = False,
) -> DataFrame:
    """One-pass per-column stats, long format:
    (part, column, n_rows, n_nulls, null_rate, n_distinct, min_value,
    max_value). ``part_col=None`` ⇒ one global row per column."""
    cols = [c for c in (columns or df.columns) if c != part_col]
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs.extend(_col_exprs(df, c, exact))

    if part_col is None:
        wide = df.groupBy(F.lit(None).cast("long").alias("part")).agg(*aggs)
    else:
        wide = df.groupBy(F.col(part_col).cast("long").alias("part")).agg(*aggs)

    # unpivot wide → long with a stack of per-column structs (driver builds
    # the expression; executors see a single projection — no extra pass)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        wide.select("part", F.col("__n_rows").alias("n_rows"), F.explode(per_col).alias("s"))
        .select(
            "part",
            F.col("s.column").alias("column"),
            "n_rows",
            F.col("s.n_nulls").alias("n_nulls"),
            (F.col("s.n_nulls") / F.col("n_rows")).alias("null_rate"),
            F.col("s.n_distinct").alias("n_distinct"),
            F.col("s.min_value").alias("min_value"),
            F.col("s.max_value").alias("max_value"),
        )
    )


# ---------------------------------------------------------------------------
# persistable HLL sketches — incremental / mergeable distinct counts
# ---------------------------------------------------------------------------
#
# approx_count_distinct gives a NUMBER; these give the SKETCH (Apache
# DataSketches HLL, Spark 4 hll_sketch_agg family) as a binary column you
# can persist in the audit table. The 100 TB property: distinct counts
# become INCREMENTAL — sketch each ingest batch (or partition), persist,
# and union sketches to get the updated global distinct without ever
# rescanning history. Union is lossless and associative, so
#   estimate(union(sk(A), sk(B))) == estimate(sk(A ∪ B))
# exactly (pytest-asserted), and per-partition sketches roll up to any
# grouping after the fact.


def distinct_sketches(
    df: DataFrame,
    columns: Sequence[str],
    part_col: Optional[str] = None,
    lgk: int = 12,
) -> DataFrame:
    """One-pass HLL sketches, long format: (part, column, sketch).
    Values are stringified before sketching so every column type (and
    any engine re-reading the audit table with the same convention)
    hashes identically; NULLs are not counted. ``lgk`` trades sketch
    size (2^lgk buckets) for accuracy."""
    cols = [c for c in columns if c != part_col]
    aggs = [
        F.hll_sketch_agg(F.col(c).cast("string"), lgk).alias(f"__sk_{c}")
        for c in cols
    ]
    if part_col is None:
        wide = df.groupBy(F.lit(None).cast("long").alias("part")).agg(*aggs)
    else:
        wide = df.groupBy(F.col(part_col).cast("long").alias("part")).agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"), F.col(f"__sk_{c}").alias("sketch")
            )
            for c in cols
        ]
    )
    return wide.select("part", F.explode(per_col).alias("s")).select(
        "part",
        F.col("s.column").alias("column"),
        F.col("s.sketch").alias("sketch"),
        # recorded per row so historical sketches taken at a different
        # lgk remain auditable and unionable (ADVICE r4)
        F.lit(lgk).cast("int").alias("lgk"),
    )


def union_distinct_sketches(sketches: DataFrame) -> DataFrame:
    """Roll sketches up across parts/batches/runs: (column, sketch).
    Feed it the unionByName of any number of ``distinct_sketches``
    outputs (this run's + the audit table's persisted history).
    ``allowDifferentLgConfigK=True``: sketches recorded at different
    ``lgk`` settings across history union at the coarser precision
    instead of throwing (each row carries its ``lgk`` for audit)."""
    return sketches.groupBy("column").agg(
        F.hll_union_agg("sketch", True).alias("sketch")
    )


def sketch_distinct_estimates(sketches: DataFrame) -> DataFrame:
    """(column, n_distinct) estimates from (column, sketch) rows."""
    return sketches.select(
        "column", F.hll_sketch_estimate("sketch").alias("n_distinct")
    )


def numeric_quantiles(
    df: DataFrame,
    columns: Sequence[str],
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    part_col: Optional[str] = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Long-format quantiles: (part, column, prob, quantile) — the
    distribution companion to ``column_stats``'s min/max (quantile
    drift between partitions/snapshots catches shifts a min/max never
    shows).

    ``exact=True`` uses ``percentile`` — linear interpolation,
    bit-identical to DuckDB's ``quantile_cont`` (oracle-checked), but
    it buffers each group's values: fine for audit-scale groups, NOT
    for 10^12-row groups. ``exact=False`` is the scale path:
    ``approx_percentile`` (GK sketch, ``accuracy`` controls the rank
    error bound ~1/accuracy, memory O(accuracy·log n)) — one map-side-
    combinable aggregate at any size. Same output shape either way;
    accuracy-vs-exact deviation is pytest-bounded."""
    plist = [float(p) for p in probs]
    arr = "array(" + ", ".join(repr(p) for p in plist) + ")"
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    cols = [c for c in columns if c != part_col]
    aggs = [
        F.expr(f"{fn}({c}, {arr}{extra})").alias(f"__q_{c}") for c in cols
    ]
    if part_col is None:
        wide = df.groupBy(F.lit(None).cast("long").alias("part")).agg(*aggs)
    else:
        wide = df.groupBy(F.col(part_col).cast("long").alias("part")).agg(*aggs)
    per_col = F.array(
        *[
            F.struct(F.lit(c).alias("column"), F.col(f"__q_{c}").alias("qs"))
            for c in cols
        ]
    )
    probs_arr = F.array(*[F.lit(p) for p in plist])
    return (
        wide.select("part", F.explode(per_col).alias("s"))
        .select(
            "part",
            F.col("s.column").alias("column"),
            F.explode(
                F.arrays_zip(
                    probs_arr.alias("prob"), F.col("s.qs").alias("q")
                )
            ).alias("pq"),
        )
        .select(
            "part",
            "column",
            F.col("pq.prob").alias("prob"),
            F.col("pq.q").cast("double").alias("quantile"),
        )
    )
