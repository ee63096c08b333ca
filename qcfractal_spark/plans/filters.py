"""Declarative query filters compiled to Spark Column predicates.

Mirrors the reference's pydantic filter models + query builder:
- ``RecordQueryFilters`` (qcportal/qcportal/record_models.py:826-857): lists
  of ids/types/statuses, created/modified before/after bounds, cursor+limit.
- ``RecordSocket.query_base`` (qcfractal/qcfractal/components/record_socket.py:238-335):
  AND of optional predicates, each added only when its filter is present;
  joins are likewise added lazily (join elision — see operators/joins.py).
- Keyset pagination (record_socket.py:327-333): ``WHERE id < cursor
  ORDER BY id DESC LIMIT n`` — no OFFSET, so page N costs the same as page 1.

Spark-first notes: predicates built here are plain Column expressions, so
Catalyst pushes them into the parquet scan (PushedFilters) and
constant-folds; `orderBy(desc).limit(n)` compiles to TakeOrderedAndProject
(no full sort — a per-partition top-k then a k-way merge, which is exactly
the scale-safe plan for "newest 1000 of 10^11 rows").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class QueryFilters:
    """Generic equivalent of the reference's per-entity QueryFilters models.

    ``in_lists`` maps column → allowed values (P2); ``before``/``after`` map
    timestamp column → bound (P3, inclusive like the reference's
    ``<=``/``>=``); ``cursor``/``limit`` implement keyset pagination (P9/O1)
    over ``id_col``.
    """

    in_lists: dict[str, Sequence[Any]] = field(default_factory=dict)
    before: dict[str, datetime] = field(default_factory=dict)
    after: dict[str, datetime] = field(default_factory=dict)
    cursor: int | None = None
    limit: int | None = None
    id_col: str = "id"


def _combined_predicate(filters: QueryFilters) -> Column | None:
    preds: list[Column] = []
    for col, values in filters.in_lists.items():
        if values is not None:
            preds.append(F.col(col).isin(list(values)))
    # None bounds are skipped like None in_lists — `col <= lit(NULL)` is
    # NULL for every row and silently empties the result set.
    for col, ts in filters.before.items():
        if ts is not None:
            preds.append(F.col(col) <= F.lit(ts))
    for col, ts in filters.after.items():
        if ts is not None:
            preds.append(F.col(col) >= F.lit(ts))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def apply_filters(df: DataFrame, filters: QueryFilters) -> DataFrame:
    """Filter + keyset-paginate ``df`` per the reference's query_base."""
    pred = _combined_predicate(filters)
    if pred is not None:
        df = df.where(pred)
    return keyset_page(df, filters.id_col, filters.cursor, filters.limit)


def keyset_page(
    df: DataFrame, id_col: str, cursor: int | None, limit: int | None
) -> DataFrame:
    """Newest-first keyset page: id < cursor, ORDER BY id DESC, LIMIT n.

    Reference: record_socket.py:327-333 (and 6 sibling sockets).  The
    DISTINCT the reference adds is to undo join fan-out; callers that join
    should dropDuplicates on the id before paging instead.
    """
    if cursor is not None:
        df = df.where(F.col(id_col) < F.lit(cursor))
    df = df.orderBy(F.col(id_col).desc())
    if limit is not None:
        df = df.limit(limit)
    return df
