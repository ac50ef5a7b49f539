"""MERGE INTO emitter — the production path for the upsert kernel.

``upsert.merge_keyed`` is the engine-neutral full-outer-join formulation:
correct anywhere, but it rewrites the ENTIRE target table per batch. On
an Iceberg table at 100 TB the right physical plan is ``MERGE INTO``:
the engine prunes to the files containing matched keys and rewrites (or
delta-encodes, merge-on-read) only those. This module compiles the SAME
``MergePolicy`` spec (models.py MergePolicy; reference merge semantics
graphengine.py:203-234) into:

* ``merge_into_sql`` — the Iceberg/Spark ``MERGE INTO … WHEN MATCHED …
  WHEN NOT MATCHED`` statement, ready for ``spark.sql`` against a
  catalog table that supports row-level operations;
* ``merge_rewrite_sql`` — the equivalent full-outer-join SELECT derived
  from the same spec. It is the executable semantic contract: the
  sandbox has no Iceberg catalog, so parity tests run the rewrite in
  Spark AND DuckDB against ``merge_keyed`` output (tests/test_merge_sql.py),
  while the MERGE string itself is golden-tested and parser-validated.

Policy → branch mapping (identical to merge_keyed's column arithmetic):

======================  =======================  =========================
policy                  WHEN MATCHED (UPDATE)    WHEN NOT MATCHED (INSERT)
======================  =======================  =========================
ALWAYS_SET              SET c = s.c              VALUES (s.c)
SET_ON_CREATE           (omitted — keep old)     VALUES (s.c)
SET_ON_MATCH            SET c = s.c              VALUES (NULL)
======================  =======================  =========================

Columns absent from the batch never appear in UPDATE SET and INSERT NULL.
Key equality is NULL-safe (``<=>`` in Spark dialect, ``IS NOT DISTINCT
FROM`` in ansi dialect) — matching merge_keyed's ``eqNullSafe``.

Duplicate-key batches: Iceberg MERGE raises on multiple source matches
per target row (the engine-side analogue of our last-writer-wins
pre-dedup). With ``order_col`` the emitted source is wrapped in a
row_number dedup subquery reproducing ``_last_writer_wins_multi``;
without it the caller asserts per-key uniqueness of the batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .identifiers import check_identifier
from .models import MergePolicy

_NULL_EQ = {"spark": "<=>", "ansi": "IS NOT DISTINCT FROM"}


def _dedup_source(
    source: str, keys: Sequence[str], cols: Sequence[str], order_col: str
) -> str:
    key_list = ", ".join(keys)
    col_list = ", ".join([*keys, *cols])
    return (
        f"(SELECT {col_list} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {key_list} ORDER BY {order_col} DESC) AS _rn "
        f"FROM {source}) WHERE _rn = 1)"
    )


def _validate(
    target: str,
    source: str,
    keys: Sequence[str],
    data_cols: Sequence[str],
    policies: dict[str, MergePolicy],
    batch_cols: Sequence[str],
    order_col: Optional[str],
) -> None:
    # names are interpolated into SQL text: every dotted segment must be a
    # clean identifier (the same injection guard the DSL applies to labels)
    for name, what in ((target, "target table"), (source, "source table")):
        for seg in name.split("."):
            check_identifier(seg, what)
    for c in [*keys, *data_cols, *batch_cols]:
        check_identifier(c, "merge column")
    if order_col is not None:
        check_identifier(order_col, "order column")
    overlap = set(keys) & set(data_cols)
    if overlap:
        raise ValueError(f"columns {sorted(overlap)} are both key and data")
    unknown = set(policies) - set(data_cols)
    if unknown:
        raise ValueError(f"policies for undeclared columns: {sorted(unknown)}")


def merge_into_sql(
    target: str,
    source: str,
    keys: Sequence[str],
    policies: dict[str, MergePolicy],
    data_cols: Sequence[str],
    batch_cols: Optional[Sequence[str]] = None,
    order_col: Optional[str] = None,
    dialect: str = "spark",
) -> str:
    """The Iceberg ``MERGE INTO`` statement for one policy spec.

    ``target``/``source`` are table or view names (source may be any
    FROM-able name; with ``order_col`` it is wrapped in the last-writer-
    wins dedup subquery). ``data_cols`` is the target's non-key column
    list; ``batch_cols`` the subset the batch actually carries (default:
    all of them)."""
    keys = list(keys)
    data_cols = list(data_cols)
    batch = list(batch_cols) if batch_cols is not None else list(data_cols)
    _validate(target, source, keys, data_cols, policies, batch, order_col)
    eq = _NULL_EQ[dialect]

    src = (
        _dedup_source(source, keys, batch, order_col)
        if order_col is not None
        else source
    )
    on = " AND ".join(f"t.{k} {eq} s.{k}" for k in keys)

    updates = [
        f"t.{c} = s.{c}"
        for c in data_cols
        if c in batch
        and policies.get(c, MergePolicy.ALWAYS_SET)
        in (MergePolicy.ALWAYS_SET, MergePolicy.SET_ON_MATCH)
    ]
    insert_cols = [*keys, *data_cols]
    insert_vals = [f"s.{k}" for k in keys] + [
        (
            f"s.{c}"
            if c in batch
            and policies.get(c, MergePolicy.ALWAYS_SET)
            is not MergePolicy.SET_ON_MATCH
            else "NULL"
        )
        for c in data_cols
    ]

    lines = [f"MERGE INTO {target} t", f"USING {src} s", f"ON {on}"]
    if updates:
        lines.append("WHEN MATCHED THEN UPDATE SET " + ", ".join(updates))
    lines.append(
        "WHEN NOT MATCHED THEN INSERT ("
        + ", ".join(insert_cols)
        + ") VALUES ("
        + ", ".join(insert_vals)
        + ")"
    )
    return "\n".join(lines)


def merge_rewrite_sql(
    target: str,
    source: str,
    keys: Sequence[str],
    policies: dict[str, MergePolicy],
    data_cols: Sequence[str],
    batch_cols: Optional[Sequence[str]] = None,
    order_col: Optional[str] = None,
    dialect: str = "ansi",
) -> str:
    """The full-outer-join SELECT equivalent of ``merge_into_sql`` from
    the same spec — runs on any SQL engine (the in-sandbox executable
    contract; presence flags mirror merge_keyed's ``_present`` columns so
    NULL keys behave identically)."""
    keys = list(keys)
    data_cols = list(data_cols)
    batch = list(batch_cols) if batch_cols is not None else list(data_cols)
    _validate(target, source, keys, data_cols, policies, batch, order_col)
    eq = _NULL_EQ[dialect]

    src_cols = ", ".join([*keys, *batch])
    src = (
        _dedup_source(source, keys, batch, order_col)
        if order_col is not None
        else f"(SELECT {src_cols} FROM {source})"
    )
    on = " AND ".join(f"t.{k} {eq} s.{k}" for k in keys)
    is_match = "(t._t_present AND s._s_present)"
    is_create = "(t._t_present IS NULL AND s._s_present)"

    out = [f"COALESCE(t.{k}, s.{k}) AS {k}" for k in keys]
    for c in data_cols:
        pol = policies.get(c, MergePolicy.ALWAYS_SET)
        if c not in batch:
            # Absent from the batch ⇒ never SET (reference Cypher SET
            # semantics: properties not in the batch are untouched on
            # match; created rows get NULL — t.c is already NULL on the
            # create side of the full-outer join). Same for all
            # policies, and identical to merge_into_sql, which omits
            # the column from UPDATE SET and inserts NULL.
            expr = f"t.{c}"
        elif pol is MergePolicy.SET_ON_CREATE:
            expr = f"CASE WHEN {is_create} THEN s.{c} ELSE t.{c} END"
        elif pol is MergePolicy.SET_ON_MATCH:
            expr = f"CASE WHEN {is_match} THEN s.{c} ELSE t.{c} END"
        else:
            expr = (
                f"CASE WHEN {is_match} OR {is_create} THEN s.{c} "
                f"ELSE t.{c} END"
            )
        out.append(f"{expr} AS {c}")

    return (
        "SELECT "
        + ", ".join(out)
        + f"\nFROM (SELECT *, TRUE AS _t_present FROM {target}) t"
        + f"\nFULL OUTER JOIN (SELECT *, TRUE AS _s_present FROM {src} _s) s"
        + f"\nON {on}"
    )
