"""Incremental validation via Structured Streaming.

The reference has no streaming (SURVEY.md §2.8) — its closest analogue is
batched file import + idempotent re-merge. This module is the forward-
looking extension: validate *arriving* data incrementally instead of
re-scanning the table.

* ``incremental_validate`` — ``readStream`` over a directory (new parquet
  files = new micro-batches) → ``foreachBatch``: run the same CheckResult
  suite used in batch mode on each micro-batch, append verdicts/violations
  (tagged with the epoch) to the audit store. foreachBatch gives
  exactly-once *per sink append* under Spark's checkpointing; the audit
  rows are idempotent on (run_id, epoch) replay.
* ``windowed_event_counts`` — watermark + tumbling-window aggregation over
  an event stream (late data handled by the watermark), the standard
  monitoring companion to drift checks.

Scale notes: each micro-batch is validated with the identical column-
pruned expressions as the batch path — streaming reuses the operators, it
doesn't fork them. State is bounded: the checks are per-batch (no
unbounded stateful op); the windowed aggregation holds only in-watermark
windows.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audit import AuditStore
from .checks.base import CheckResult, partition_row_counts


def incremental_validate(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType,
    checks: Sequence[Callable[[DataFrame], CheckResult]],
    store: AuditStore,
    run_id: str,
    part_col: str = "part",
    checkpoint_dir: Optional[str] = None,
    max_files_per_trigger: int = 16,
):
    """Start a streaming query validating each arriving micro-batch.
    Returns the StreamingQuery (caller: ``q.processAllAvailable()`` for a
    synchronous drain in tests, or let it run with a trigger)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        counts = partition_row_counts(batch_df, part_col)
        verdicts = None
        violations = None
        for check in checks:
            res = check(batch_df)
            v = res.verdicts(counts)
            verdicts = v if verdicts is None else verdicts.unionByName(v)
            violations = (
                res.violations
                if violations is None
                else violations.unionByName(res.violations)
            )
        tag = [
            F.lit(run_id).alias("run_id"),
            F.lit(int(epoch_id)).alias("epoch"),
        ]
        store.append("violations", violations.select(*tag, "*"))
        store.append("verdicts", verdicts.select(*tag, "*"))

    writer = stream.writeStream.foreachBatch(process_batch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    group_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts over a (possibly streaming)
    events frame — late rows beyond the watermark are dropped, state is
    bounded to in-watermark windows."""
    # event-time watermarks require TIMESTAMP (not NTZ); normalize first
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n",
            "total_value",
        )
    )
