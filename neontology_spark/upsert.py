"""Policy-driven upsert (merge) kernel — the reference's signature
operation, re-expressed set-oriented.

Replays (see SURVEY.md §2.4):
* ``merge_nodes`` Cypher ``MERGE … ON MATCH SET … ON CREATE SET … SET``
  (reference ``src/neontology/graphengines/graphengine.py:203-234``) as a
  full-outer join + per-column ``when(is_new/is_match)`` projection — the
  join IS the merge; one shuffle on the key, no per-row logic.
* within-batch dedup by full-row fingerprint
  (``basenode.py:300-343``: NaN-mask → str-concat fingerprint →
  drop_duplicates) as ``sha2(concat_ws(…))`` + ``dropDuplicates``.
* within-batch duplicate *keys*: the reference's behavior is
  engine-divergent (networkxengine.py:402-465 vs Neo4j MERGE); we pin
  **last-writer-wins by batch order** via ``row_number()`` — documented
  in SURVEY.md §7 risk register.
* input-order restoration (J4, ``basenode.py:336-343``): join merged rows
  back to the batch on key and sort by the batch-order column.

Scale notes:
* The full-outer join shuffles both sides on the key once; with an
  Iceberg target this kernel maps 1:1 onto ``MERGE INTO`` (two WHEN
  branches) and inherits its copy-on-write/merge-on-read physics. The
  column arithmetic is identical either way; this implementation is the
  engine-neutral fallback that also runs on plain parquet.
* Batch is usually ≪ existing: Spark/AQE broadcast the batch side,
  turning the merge read into a broadcast-hash-join over the scan.
* Fingerprint dedup is a map-side hash + one shuffle on the fingerprint;
  at 100 TB you dedup per ingest batch (bounded), never the full table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .models import MergePolicy, NodeModel

FINGERPRINT_COL = "_fp"
_NULL_SENTINEL = "\x00<null>\x00"
_SEP = "\x1f"


def with_fingerprint(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    out_col: str = FINGERPRINT_COL,
) -> DataFrame:
    """Row fingerprint: sha2 over the NULL-masked, stringified row
    (reference ``basenode.py:318-322``: ``df.mask(pd.isna)`` then string
    concat). The explicit NULL sentinel prevents ("a", NULL) colliding
    with ("a") under concat_ws's null-skipping."""
    cols = list(columns or df.columns)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols]
    return df.withColumn(out_col, F.sha2(F.concat_ws(_SEP, *parts), 256))


def dedupe_batch(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Exact within-batch dedup by full-row fingerprint
    (``basenode.py:324-328``). With ``order_col`` the *first* occurrence
    (lowest order value) survives — deterministic regardless of partition
    layout; without it, an arbitrary member of each identical-row group
    survives (they are identical on ``columns`` anyway)."""
    cols = [c for c in (columns or df.columns)]
    fp = with_fingerprint(df, cols)
    if order_col is None:
        return fp.dropDuplicates([FINGERPRINT_COL]).drop(FINGERPRINT_COL)
    w = Window.partitionBy(FINGERPRINT_COL).orderBy(F.col(order_col).asc())
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", FINGERPRINT_COL)
    )


def merge_keyed(
    existing: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    policies: dict[str, MergePolicy],
    order_col: Optional[str] = None,
    broadcast_batch: bool = False,
) -> DataFrame:
    """Generic policy-driven MERGE on a composite key — the single upsert
    kernel behind node merge (key = primary property) and relationship
    merge (key = (source, target, *merge_on), reference
    graphengine.py:279-287).

    ======================  ========================================
    policy                  post-state of column
    ======================  ========================================
    ALWAYS_SET              batch value on match AND create
    SET_ON_CREATE           batch value on create; old value on match
    SET_ON_MATCH            batch value on match; NULL on create
    ======================  ========================================

    Columns of ``existing`` absent from ``batch`` are never SET —
    matched rows keep their old value, created rows get NULL —
    regardless of policy (reference Cypher ``SET`` only touches
    properties the batch carries; identical to ``merge_into_sql``'s
    UPDATE-SET omission).

    Maps 1:1 onto Iceberg ``MERGE INTO`` with two WHEN branches; this is
    the engine-neutral full-outer-join formulation.
    """
    keys = list(keys)
    data_cols = [c for c in existing.columns if c not in keys]
    if order_col is not None or len(keys) > 0:
        batch = _last_writer_wins_multi(batch, keys, order_col)
    b = batch.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in data_cols if c in batch.columns],
        F.lit(True).alias("_b_present"),
    )
    if broadcast_batch:
        b = F.broadcast(b)
    e = existing.select(
        *[F.col(k).alias(f"_e_{k}") for k in keys],
        *[F.col(c).alias(f"_e_{c}") for c in data_cols],
        F.lit(True).alias("_e_present"),
    )
    cond = None
    for k in keys:
        c = e[f"_e_{k}"].eqNullSafe(b[f"_b_{k}"])
        cond = c if cond is None else (cond & c)
    j = e.join(b, cond, "full_outer")

    is_match = F.col("_e_present").isNotNull() & F.col("_b_present").isNotNull()
    is_create = F.col("_e_present").isNull() & F.col("_b_present").isNotNull()

    out_cols = [
        F.coalesce(F.col(f"_e_{k}"), F.col(f"_b_{k}")).alias(k) for k in keys
    ]
    for c in data_cols:
        e_c = F.col(f"_e_{c}")
        if f"_b_{c}" not in j.columns:
            # Column absent from the batch ⇒ never SET, regardless of
            # policy (reference Cypher SET semantics: properties the
            # batch doesn't carry are untouched on match; created rows
            # get NULL — e_c is already NULL on the create side of the
            # full-outer join). Aligned with merge_into_sql /
            # merge_rewrite_sql (ADVICE r4 medium).
            out_cols.append(e_c.alias(c))
            continue
        b_c = F.col(f"_b_{c}")
        pol = policies.get(c, MergePolicy.ALWAYS_SET)
        if pol is MergePolicy.SET_ON_CREATE:
            expr = F.when(is_create, b_c).otherwise(e_c)
        elif pol is MergePolicy.SET_ON_MATCH:
            expr = F.when(is_match, b_c).otherwise(e_c)
        else:  # ALWAYS_SET
            expr = F.when(is_match | is_create, b_c).otherwise(e_c)
        out_cols.append(expr.alias(c))
    return j.select(*out_cols)


def _last_writer_wins_multi(
    batch: DataFrame, keys: Sequence[str], order_col: Optional[str]
) -> DataFrame:
    if order_col is None:
        return batch.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_nodes(
    existing: DataFrame,
    batch: DataFrame,
    model: NodeModel,
    order_col: Optional[str] = None,
    broadcast_batch: bool = False,
) -> DataFrame:
    """MERGE ``batch`` into ``existing`` keyed on the model's primary
    property (reference semantics fixed by tests/test_basenode.py:1236-1300).
    Returns the full post-merge table."""
    policies = {p.storage_name: p.policy for p in model.properties}
    return merge_keyed(
        existing,
        batch,
        keys=[model.pp_storage],
        policies=policies,
        order_col=order_col,
        broadcast_batch=broadcast_batch,
    )


def merge_df(
    existing: DataFrame,
    batch: DataFrame,
    model: NodeModel,
    order_col: str,
    dedupe: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The reference's ``merge_df`` entry point (``basenode.py:301-343``):
    optional full-row dedup, merge, then return (post_state, results) where
    ``results`` restores the *input batch order* (J4: ``basenode.py:336-343``
    outer-merge + sort on the order column) — one merged row per input row,
    duplicates mapped to the same merged identity."""
    key = model.pp_storage
    data = batch
    if dedupe:
        data = dedupe_batch(
            batch, [c for c in batch.columns if c != order_col], order_col=order_col
        )
    post = merge_nodes(existing, data, model, order_col=order_col)
    results = (
        batch.select(key, order_col)
        .join(post, key, "inner")
        .orderBy(order_col)
    )
    return post, results
