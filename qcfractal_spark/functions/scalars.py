"""Scalar function surface (SURVEY §2.7), expressed with built-in
``pyspark.sql.functions`` so everything stays inside whole-stage codegen.

Each helper cites the PostgreSQL construct it replaces in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_bucket(ts: Column | str) -> Column:
    """``to_char(ts AT TIME ZONE 'UTC', 'YYYY-MM-DD')`` (F1,
    qcfractal/qcfractal/components/serverinfo/socket.py:480-486).  Session
    timezone is pinned to UTC (session.py), so no explicit conversion."""
    return F.date_format(ts, "yyyy-MM-dd")


def hour_bucket(ts: Column | str) -> Column:
    """``to_char(..., 'YYYY-MM-DD HH24')`` (F1, serverinfo/socket.py:484)."""
    return F.date_format(ts, "yyyy-MM-dd HH")


def json_double(col: Column | str, key: str) -> Column:
    """``(js->>'key')::double precision`` with COALESCE(...,0) caller-side
    (F4, serverinfo/socket.py:659-660) over a JSON string column."""
    name = col if isinstance(col, str) else None
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{key}").cast("double")


def array_tail(col: Column | str) -> Column:
    """``arr[-1]::TEXT::DOUBLE PRECISION`` — last element (F6,
    qcfractal/qcfractal/components/torsiondrive/record_db_models.py:131).
    ``element_at(col, -1)`` indexes from the end, like Postgres ``[-1]``."""
    return F.element_at(col if not isinstance(col, str) else F.col(col), -1)


def lower_coerce(col: Column | str) -> Column:
    """Lowercase coercion for program/method/basis (F7/P11,
    singlepoint/record_db_models.py:78-83 CHECK constraints)."""
    return F.lower(col if not isinstance(col, str) else F.col(col))


def normalize_basis(col: Column | str) -> Column:
    """Empty-string ↔ NULL normalization for basis (P10,
    qcportal/qcportal/singlepoint/record_models.py:287-296): store '' for
    "no basis" so equality filters are total."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.lower(c), F.lit(""))


def content_hash(*cols: Column) -> Column:
    """Deterministic content hash over canonicalized fields (F9 — the
    molecule sha1 hash, qcfractal/qcfractal/components/molecules/db_models.py:83-115).
    md5 over a '|'-joined canonical string; engine-portable (DuckDB has md5)."""
    return F.md5(F.concat_ws("|", *cols))
