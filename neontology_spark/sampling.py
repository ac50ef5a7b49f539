"""Deterministic (stratified) sampling for training-data curation.

``df.sample()`` is seed-stable only for a fixed partitioning — re-read
the table with a different split plan and the subset changes. Curation
pipelines need CONTENT-keyed sampling: whether a row is in the sample
depends only on its key, so the subset is identical across runs,
engines, partitionings, and incremental arrivals (a re-run over the
grown table keeps every previously-sampled row — append-only training
sets).

Mechanism: compare the row key's md5 hex string against a hex-prefix
threshold — ``md5(key) < hex(floor(fraction * 16^k))`` selects exactly
the fraction (md5 is uniform in [0, 16^32); k=8 digits gives 2^-32
resolution). Pure Column expressions (JVM-side, pushdown-friendly), and
the SAME predicate is expressible in any engine with md5 — which is what
makes the driver oracle exact, and what makes the sample auditable by
any downstream consumer.

Stratified variant: per-stratum fractions via one CASE column — a single
scan, no per-stratum jobs, no shuffle at all (sampling is a filter).
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_K = 8  # hex digits of threshold precision (2^-32 resolution)


def _threshold(fraction: float) -> str:
    """Hex-prefix threshold for ``md5(key) < t``. fraction >= 1.0 is handled
    by callers as an always-true branch (never reaches here): clamping to
    'ffffffff' would wrongly exclude the ~2^-32 of keys whose md5 starts
    with that prefix (ADVICE r3)."""
    if not 0.0 <= fraction < 1.0:
        raise ValueError(f"fraction must be in [0,1), got {fraction}")
    return format(min(int(fraction * 16**_K), 16**_K - 1), f"0{_K}x")


def sample_hash(key_col: str) -> Column:
    """The portable sampling hash: lowercase md5 hex of the stringified
    key (identical in Spark, DuckDB, Trino, ...)."""
    return F.md5(F.col(key_col).cast("string"))


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: Optional[float] = None,
    stratify_col: Optional[str] = None,
    fractions: Optional[Mapping[object, float]] = None,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Content-keyed sample: keeps exactly the rows whose
    ``md5(key) < threshold(fraction)``.

    * flat: ``deterministic_sample(df, "doc_id", 0.01)``
    * stratified: ``deterministic_sample(df, "doc_id",
      stratify_col="lang", fractions={"en": 0.01, "fr": 0.1})`` — strata
      not in ``fractions`` fall back to ``default_fraction``.

    The hash is keyed on the ROW key, not the stratum, so growing or
    re-bucketing a stratum never changes which of its rows are sampled.

    NULL keys are never sampled (md5(NULL) is NULL; NULL < t is not
    true) — a NULL-keyed row has no stable identity to sample by, and
    silently including it would make the subset partition-dependent.
    This holds at fraction=1.0 too: a full-fraction (stratum) keeps every
    NON-NULL-keyed row (ADVICE r3: the old hex clamp to 'ffffffff'
    silently dropped the ~2^-32 of keys whose md5 starts with it).
    """
    h = sample_hash(key_col)

    def keep(frac: float) -> Column:
        # fraction >= 1.0 ⇒ always-true for identifiable rows; the hex
        # threshold cannot represent 16^k exactly (see _threshold)
        if frac >= 1.0:
            if frac > 1.0:
                raise ValueError(f"fraction must be in [0,1], got {frac}")
            return h.isNotNull()
        return h < F.lit(_threshold(frac))

    if fractions is not None:
        if stratify_col is None:
            raise ValueError("fractions= requires stratify_col=")
        expr: Column = keep(default_fraction)
        for value, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
            expr = F.when(
                F.col(stratify_col) == F.lit(value), keep(frac)
            ).otherwise(expr)
        return df.filter(expr)
    if fraction is None:
        raise ValueError("pass fraction= or fractions=")
    return df.filter(keep(fraction))
