"""VARIANT-typed properties — closing SURVEY §7 hard-part 5.

The reference stores per-record ``properties`` as Postgres JSONB
(singlepoint/record_db_models.py:67-68): keys vary per program and values
keep their JSON types (numbers stay numbers).  The round-1 Spark model
compromised with ``MapType(String, String)`` — every numeric property
round-trips through a string and needs a cast at every extraction site, and a
float that was written ``1.5e2`` no longer equals one written ``150.0``.

Spark 4's VARIANT type removes the compromise: ``parse_json`` ingests the
JSON payload ONCE into a binary-encoded, shredded-at-scan column, and
``try_variant_get`` extracts any path with its native type — numbers come
back as BIGINT/DOUBLE/DECIMAL, booleans as BOOLEAN, no stringly detour.
Extraction is a codegen'd expression over the variant binary (no JSON
re-parse per access, unlike ``get_json_object``), and Parquet writers
shred frequent paths into typed subcolumns so scans prune and push down on
them like ordinary columns — the property-access story a 100 TB record
store needs.

Everything here degrades honestly: ``try_variant_get`` yields NULL for a
missing path or an uncastable value (the reference's ``->>`` returning
NULL), never a job failure.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_properties(json_col, on_null: str = "null") -> Column:
    """JSON-string properties column → VARIANT column.

    NULL payloads become the JSON ``null`` variant (extractions yield
    NULL) instead of erroring ``parse_json``; malformed payloads use
    ``try_parse_json`` semantics via the caller choosing
    ``on_null='null'`` + upstream validation — ingest-time parse, ONE
    pass, every later access is binary-path extraction."""
    return F.parse_json(F.coalesce(json_col, F.lit(on_null)))


def prop(variant_col, key: str, dtype: str = "double") -> Column:
    """Typed property extraction: ``properties[key]`` with its native JSON
    type (the reference's ``properties->>'key'`` + cast, minus the string
    detour).  NULL for missing keys or type mismatches."""
    return F.try_variant_get(variant_col, f"$.{key}", dtype)


def properties_df_variant(
    records: DataFrame,
    entry_col: str,
    spec_col: str,
    variant_col: str,
    keys: Sequence[str] | Mapping[str, str],
    spec_values: Sequence[str] | None = None,
) -> DataFrame:
    """The VARIANT twin of :func:`..operators.pivot.properties_df`: one
    wide column per (spec, property key), with each key extracted at its
    NATIVE type — ``keys`` may be a mapping ``{key: spark_type}`` (default
    ``double`` for a plain sequence).  Same single-shuffle plan as the map
    version: one groupBy + pivot, one aggregate per key, no joins."""
    typed = keys if isinstance(keys, Mapping) else {k: "double" for k in keys}
    grouped = records.groupBy(entry_col).pivot(
        spec_col, list(spec_values) if spec_values else None
    )
    out = grouped.agg(
        *[
            F.first(prop(F.col(variant_col), key, dtype), ignorenulls=True).alias(key)
            for key, dtype in typed.items()
        ]
    )
    if len(typed) == 1:
        key = next(iter(typed))
        out = out.select(
            out[entry_col],
            *[out[c].alias(f"{c}_{key}") for c in out.columns if c != entry_col],
        )
    return out
