"""Dataset-matrix analytics: the client's pandas pivot layer, distributed.

Reference:
- ``compile_values`` (qcportal/qcportal/dataset_models.py:2168-2265): iterate
  the entry×specification record matrix, apply a user ``value_call`` per
  record, pivot long→wide (index=entry, columns=spec).
- ``get_properties_df`` (:2267-2314): the specialization that extracts N
  property keys per record and drops all-NaN columns.

Spark-first: the client/server ping-pong (batched fetch per spec, SQLite
cache probe) collapses into one job — join the record_items fact to records,
compute the value column, ``groupBy(entry).pivot(spec)``.  The pivot is the
one genuinely shuffle-heavy operator in the reference's surface (SURVEY §4);
we pass explicit pivot values when known to skip the extra distinct-scan job.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compile_values_pivot(
    long_df: DataFrame,
    entry_col: str,
    spec_col: str,
    value: Column,
    spec_values: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Long (entry, spec, value) → wide matrix with one column per spec.

    ``value`` may be any Column expression — the moral equivalent of
    ``value_call`` when the extraction is expressible in Spark SQL (the
    common case: property lookups, arithmetic).  For genuinely arbitrary
    Python extraction use ``functions.udfs.value_call_udf``.
    """
    df = long_df.withColumn("_value", value)
    grouped = df.groupBy(entry_col)
    pivoted = grouped.pivot(spec_col, list(spec_values) if spec_values else None)
    if agg == "first":
        # first() over the matrix is deterministic: record_items is unique
        # per (entry, spec) by construction (the reference's association
        # table PK, base_dataset_socket.py:207-218).
        return pivoted.agg(F.first("_value", ignorenulls=True))
    return pivoted.agg(getattr(F, agg)("_value"))


def properties_df(
    records: DataFrame,
    entry_col: str,
    spec_col: str,
    properties_col: str,
    keys: Sequence[str],
    spec_values: Sequence[str] | None = None,
) -> DataFrame:
    """get_properties_df: one wide column per (spec, property key).

    One pivot with one aggregate per key — Spark names the result columns
    ``{spec}_{key}`` natively (the flattened pandas swaplevel multi-index).
    A single shuffle on entry, no joins: the per-key pivot-then-outer-join
    formulation this replaces compiled to one SortMergeJoin per key, which
    is len(keys)-1 extra fact-sized shuffles at scale.
    """
    grouped = records.groupBy(entry_col).pivot(
        spec_col, list(spec_values) if spec_values else None
    )
    out = grouped.agg(
        *[
            F.first(F.element_at(F.col(properties_col), key), ignorenulls=True).alias(key)
            for key in keys
        ]
    )
    if len(keys) == 1:
        # with a single aggregate Spark names columns by pivot value alone;
        # keep the {spec}_{key} contract regardless of key count
        # out[c] (not F.col(c)) so pivot values containing dots — legal in
        # user-provided spec names — resolve as column names, not struct
        # field paths.
        out = out.select(
            out[entry_col],
            *[
                out[c].alias(f"{c}_{keys[0]}")
                for c in out.columns
                if c != entry_col
            ],
        )
    return out


def drop_all_null_columns(df: DataFrame, keep: Sequence[str]) -> DataFrame:
    """Drop columns with zero non-null values (dataset_models.py:2304-2309)
    — one aggregate pass, then a select."""
    candidates = [c for c in df.columns if c not in set(keep)]
    if not candidates:
        return df  # df.agg() with zero expressions raises
    # r16: the counts pass below executes the input plan once and the
    # returned select would execute it AGAIN — for the pivot callers that
    # is the argmin+pivot shuffle twice.  The wide frame is one row per
    # entry, so materialize it lazily: the counts job builds the blocks,
    # the final select is a LocalTableScan-cheap re-read.
    df = df.localCheckpoint(eager=False)
    # df[c] / indexed aliases: dotted column names (produced by pivots over
    # dotted spec values) must resolve as names, not struct paths.
    counts = df.agg(
        *[F.count(df[c]).alias(f"_c{i}") for i, c in enumerate(candidates)]
    ).first()
    nonempty = [c for i, c in enumerate(candidates) if counts[f"_c{i}"] > 0]
    return df.select(*[df[c] for c in (*keep, *nonempty)])
