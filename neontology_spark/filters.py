"""Django-style filter DSL → Spark Column predicate compiler.

Reference semantics: ``src/neontology/graphengines/graphengine.py:297-346``
(``FilterOperators`` lookup table). Each key is ``field`` or
``field__lookup``; multiple keys AND together (``graphengine.py:344``);
unknown lookup ⇒ ValueError (``graphengine.py:340-341``).

Compiling to ``Column`` expressions (never SQL strings) keeps the whole
predicate inside Catalyst: pushdown-able into the parquet/Iceberg scan and
whole-stage-codegen'd — the predicate cost at 100 TB is the scan itself.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from .identifiers import check_identifier

__all__ = ["compile_filters", "LOOKUPS", "ACCESSORS", "FilterError"]


class FilterError(ValueError):
    """Unknown lookup or malformed filter key (graphengine.py:340-341)."""


def _exact(c: Column, v: Any) -> Column:
    return c == F.lit(v)


def _iexact(c: Column, v: Any) -> Column:
    # toLower(x) = toLower($p), graphengine.py:321-322
    return F.lower(c) == F.lower(F.lit(v))


def _contains(c: Column, v: Any) -> Column:
    return c.contains(v)


def _icontains(c: Column, v: Any) -> Column:
    return F.lower(c).contains(F.lower(F.lit(v)))


def _startswith(c: Column, v: Any) -> Column:
    return c.startswith(v)


def _istartswith(c: Column, v: Any) -> Column:
    return F.lower(c).startswith(F.lower(F.lit(v)))


def _endswith(c: Column, v: Any) -> Column:
    # Cypher ENDS WITH has no entry in the reference table, but the lookup
    # family is symmetric; included for completeness (documented divergence).
    return c.endswith(v)


def _iendswith(c: Column, v: Any) -> Column:
    return F.lower(c).endswith(F.lower(F.lit(v)))


def _in(c: Column, v: Any) -> Column:
    if not isinstance(v, (list, tuple, set, frozenset)):
        raise FilterError(f"'in' lookup requires a list/tuple/set, got {type(v).__name__}")
    return c.isin(list(v))


def _isnull(c: Column, v: Any) -> Column:
    # IS NULL / IS NOT NULL by boolean value, graphengine.py:337-338
    if not isinstance(v, bool):
        raise FilterError(f"'isnull' lookup requires a bool, got {v!r}")
    return c.isNull() if v else c.isNotNull()


LOOKUPS = {
    "exact": _exact,
    "iexact": _iexact,
    "contains": _contains,
    "icontains": _icontains,
    "startswith": _startswith,
    "istartswith": _istartswith,
    "endswith": _endswith,
    "iendswith": _iendswith,
    "gt": lambda c, v: c > F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "gte": lambda c, v: c >= F.lit(v),
    "lte": lambda c, v: c <= F.lit(v),
    "in": _in,
    "isnull": _isnull,
}

# Temporal accessors — reference users project datetime components inside
# Cypher (``n.test_created.year``, tests/test_basenode.py:391-415; SURVEY
# §2.7). Django-style spelling: ``field__year`` (exact) or
# ``field__year__gte`` (accessor then lookup). All compile to built-in
# datetime Column functions — pushdown/codegen preserved.
ACCESSORS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "date": lambda c: c.cast("date"),
    "dayofweek": F.dayofweek,
    "quarter": F.quarter,
    "week": F.weekofyear,
}


def compile_filters(
    filters: Optional[Mapping[str, Any]],
    rename: Optional[Mapping[str, str]] = None,
) -> Optional[Column]:
    """Compile a filter dict to a single conjunctive Column predicate.

    ``None`` / empty dict ⇒ ``None`` (match everything — reference builds no
    WHERE clause). ``rename`` maps logical field names to storage (alias)
    column names (reference field-alias handling, commonmodel.py:90).
    """
    if not filters:
        return None
    preds: list[Column] = []
    for key, value in filters.items():
        field, sep, rest = key.partition("__")
        check_identifier(field, "filter field")
        col_name = (rename or {}).get(field, field)
        col = F.col(col_name)
        lookup = rest if sep else "exact"
        if sep and rest:
            acc, sep2, rest2 = rest.partition("__")
            if acc in ACCESSORS:
                col = ACCESSORS[acc](col)
                lookup = rest2 if sep2 else "exact"
        fn = LOOKUPS.get(lookup)
        if fn is None:
            raise FilterError(
                f"unknown filter lookup {lookup!r} in {key!r}; "
                f"supported: {sorted(LOOKUPS)} "
                f"(+ temporal accessors {sorted(ACCESSORS)})"
            )
        preds.append(fn(col, value))
    return functools.reduce(Column.__and__, preds)
