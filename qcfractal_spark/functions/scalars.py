"""Scalar function surface (SURVEY §2.7), expressed with built-in
``pyspark.sql.functions`` so everything stays inside whole-stage codegen.

Each helper cites the PostgreSQL construct it replaces in the reference.
"""

from __future__ import annotations

import re

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


def order_molecular_formula(col: Column | str) -> Column:
    """Hill-system canonical ordering of a molecular formula string (F10 —
    ``order_molecular_formula``, used by the identifiers query at
    qcfractal/qcfractal/components/molecules/socket.py:237-249).

    Hill order: if carbon is present, C first, then H, then every other
    element alphabetically; with no carbon, all elements alphabetically
    (H included).  Counts of 1 are omitted in the output, matching the
    public qcelemental behavior.

    Everything is built-in array/regexp expressions — parse tokens, tag each
    with a sort key, ``array_sort`` (struct comparison is field-order
    lexicographic, so the key field drives it), then fold back to a string —
    zero Python rows, stays inside codegen.  Assumes each element appears at
    most once per formula (true for formulas emitted from aggregated symbol
    counts, which is what the reference stores).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(r"[A-Z][a-z]*\d*"), F.lit(0))
    pairs = F.transform(
        toks,
        lambda t: F.struct(
            F.regexp_extract(t, r"^([A-Z][a-z]*)", 1).alias("el"),
            F.coalesce(
                F.nullif(F.regexp_extract(t, r"(\d+)$", 1), F.lit("")), F.lit("1")
            )
            .cast("int")
            .alias("n"),
        ),
    )
    has_c = F.exists(pairs, lambda p: p["el"] == F.lit("C"))
    keyed = F.transform(
        pairs,
        lambda p: F.struct(
            F.when(has_c & (p["el"] == F.lit("C")), F.lit("0"))
            .when(has_c & (p["el"] == F.lit("H")), F.lit("1"))
            .otherwise(F.concat(F.lit("2"), p["el"]))
            .alias("k"),
            p["el"].alias("el"),
            p["n"].alias("n"),
        ),
    )
    return F.aggregate(
        F.array_sort(keyed),
        F.lit(""),
        lambda acc, p: F.concat(
            acc,
            p["el"],
            F.when(p["n"] > 1, p["n"].cast("string")).otherwise(F.lit("")),
        ),
    )


def order_formula_py(formula: str) -> str:
    """Driver-side mirror of :func:`order_molecular_formula` for
    canonicalizing *query inputs* (the reference canonicalizes the user's
    formula list in Python before it reaches SQL, socket.py:239-244).
    Merges duplicate element tokens by summing counts."""
    counts: dict[str, int] = {}
    for el, n in re.findall(r"([A-Z][a-z]*)(\d*)", formula):
        if el:
            counts[el] = counts.get(el, 0) + int(n or "1")
    if "C" in counts:
        order = (
            ["C"]
            + (["H"] if "H" in counts else [])
            + sorted(k for k in counts if k not in ("C", "H"))
        )
    else:
        order = sorted(counts)
    return "".join(el + (str(counts[el]) if counts[el] > 1 else "") for el in order)


def short_description(
    record_type: Column, formula: Column, program: Column, method: Column, basis: Column
) -> Column:
    """D4 — per-record-type display string (record_db_models.py:282-288 base
    fallback; singlepoint/record_db_models.py:89-131 ``{formula}
    {program}/{method}/{basis}`` with ``(none)`` placeholders; optimization
    prefixes ``{program}+``).  Null↔'' method/basis normalize to the same
    placeholder, matching P10 discipline."""
    spec = F.format_string(
        "%s/%s/%s",
        program,
        F.coalesce(F.nullif(method, F.lit("")), F.lit("(none)")),
        F.coalesce(F.nullif(basis, F.lit("")), F.lit("(none)")),
    )
    return (
        F.when(
            record_type == F.lit("singlepoint"),
            F.format_string("%s %s", formula, spec),
        )
        .when(
            record_type == F.lit("optimization"),
            F.format_string("%s %s+%s", formula, program, spec),
        )
        .otherwise(
            F.format_string("short_description not implemented for %s", record_type)
        )
    )


def content_hash(*cols: Column) -> Column:
    """Deterministic content hash over canonicalized fields (F9 — the
    molecule sha1 hash, qcfractal/qcfractal/components/molecules/db_models.py:83-115).
    md5 over a '|'-joined canonical string; engine-portable (DuckDB has md5).

    NULL fields map to an explicit sentinel before joining: concat_ws
    SKIPS NULLs, so ('a', NULL, 'b') and ('a', 'b', NULL) both hashed
    'a|b' and distinct field vectors deduplicated as identical.  DuckDB
    mirror: ``md5(concat_ws('|', coalesce(x, chr(0)), ...))``."""
    guarded = [F.coalesce(c.cast("string"), F.lit("\x00")) for c in cols]
    return F.md5(F.concat_ws("|", *guarded))
