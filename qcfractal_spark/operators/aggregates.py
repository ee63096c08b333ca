"""Aggregation shapes from SURVEY §2.4, Spark-first.

Each function cites the reference implementation it reproduces.  All are
plain ``groupBy().agg`` plans — Catalyst plans partial (map-side) + final
aggregation automatically, which is the 100 TB-safe shape: the shuffle
carries one row per (partition × group), not per input row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def status_counts(df: DataFrame, status_col: str = "status") -> DataFrame:
    """status → count histogram (A2,
    qcfractal/qcfractal/components/record_socket.py — get_status_counts shape,
    base_record_socket equivalent :469-477)."""
    return df.groupBy(status_col).agg(F.count(F.lit(1)).alias("count"))


def grouped_counts(df: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """N-column count matrices (A3/A4/A5 — dataset status matrix
    base_dataset_socket.py:189-219, server stats serverinfo/socket.py:682-689)."""
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("count"))


def access_summary(
    df: DataFrame,
    ts_col: str,
    group_by: str,
    dims: Sequence[str],
    metrics: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """The access-log summary (A6, serverinfo/socket.py:443-539).

    Groups by a time bucket (``day`` → YYYY-MM-DD, ``hour`` → YYYY-MM-DD HH24,
    matching the reference's ``to_char(ts AT TIME ZONE 'UTC', ...)``) or any
    dimension column, × extra dims, and computes count/min/max plus exact
    percentiles for each metric.

    Exactness note (SURVEY §7 hard part #4): the reference uses
    ``percentile_disc`` — an exact, discrete (no-interpolation) quantile.
    ``percentile_approx`` would not match an oracle, so we use Spark's exact
    ``percentile`` for the continuous variant and a sort-array selection for
    the discrete variant.  Exact percentile requires collecting per-group
    values on the reducer — fine here because group cardinality is bounded
    (day × module × method), the classic trade the reference makes too.
    """
    if group_by == "day":
        key = F.date_format(ts_col, "yyyy-MM-dd").alias("bucket")
    elif group_by == "hour":
        key = F.date_format(ts_col, "yyyy-MM-dd HH").alias("bucket")
    else:
        key = F.col(group_by).alias("bucket")
    aggs: list[Column] = [F.count(F.lit(1)).alias("count")]
    for m in metrics:
        aggs.append(F.min(m).alias(f"{m}_min"))
        aggs.append(F.max(m).alias(f"{m}_max"))
        for q in quantiles:
            aggs.append(
                # int() truncates binary-float error downward (0.57*100 ->
                # 56.999... -> p56); round to label the right quantile.
                percentile_disc(F.col(m), q).alias(f"{m}_p{int(round(q * 100))}")
            )
    return df.groupBy(key, *dims).agg(*aggs)


def percentile_disc(col: Column, q: float) -> Column:
    """Exact discrete percentile — smallest value whose cumulative fraction
    ≥ q (PostgreSQL ``percentile_disc(q) WITHIN GROUP``, used at
    serverinfo/socket.py:500-509; DuckDB ``quantile_disc``).

    Spark has no built-in discrete percentile, so select element
    ``ceil(q*n)`` (1-based) from the sorted value array.  Aggregates values
    per group — acceptable for bounded-cardinality telemetry groups.
    """
    arr = F.array_sort(F.collect_list(col))
    n = F.size(arr)
    idx = F.greatest(F.ceil(F.lit(q) * n).cast("int"), F.lit(1))
    # All-NULL group → empty array; element_at(empty, 1) THROWS under
    # Spark 4's default ANSI mode, so guard to return NULL like SQL does.
    return F.when(n > 0, F.element_at(arr, idx))


def argmin_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """DISTINCT ON (group) ORDER BY ... — argmin row per group (A9,
    torsiondrive minimum_optimizations
    qcfractal/qcfractal/components/torsiondrive/record_db_models.py:120-136).
    Window row_number()==1 with the reference's tie-break ordering."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def group_map_agg(
    df: DataFrame, group_cols: Sequence[str], key_col: str, value_col: str
) -> DataFrame:
    """jsonb_object_agg — fold rows to a per-group map (A10,
    torsiondrive/record_db_models.py:138-146).  Entries sorted by key so the
    map is deterministic.

    Duplicate keys within a group keep the MAX value (a deterministic
    stand-in for Postgres jsonb_object_agg's order-dependent last-wins);
    without the pre-aggregation, Spark's default mapKeyDedupPolicy=EXCEPTION
    fails the whole job on the first duplicate."""
    deduped = df.groupBy(*group_cols, key_col).agg(F.max(value_col).alias(value_col))
    entries = F.sort_array(F.collect_list(F.struct(F.col(key_col), F.col(value_col))))
    return deduped.groupBy(*group_cols).agg(F.map_from_entries(entries).alias("group_map"))


def weighted_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    value_col: str,
    out_col: str = "weighted_sum",
) -> DataFrame:
    """Σ coefficient × value per group (A12 reaction energy,
    qcfractal/qcfractal/components/reaction/record_socket.py:198-275 — the
    reference computes this in Python over fetched rows; here it's a
    map-side-combined aggregate)."""
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(weight_col) * F.col(value_col)).alias(out_col)
    )


def dependency_status_gate(
    deps: DataFrame,
    service_col: str = "service_id",
    status_col: str = "status",
) -> DataFrame:
    """array_agg of dependency statuses + containment gates (A8,
    qcfractal/qcfractal/components/services/socket.py:170-227).

    Returns one row per service with ``statuses`` (sorted array),
    ``all_finished`` (= contained_by(['complete','error'])) and
    ``any_error`` (= contains 'error')."""
    finished = F.array(F.lit("complete"), F.lit("error"))
    return deps.groupBy(service_col).agg(
        F.array_sort(F.collect_list(status_col)).alias("statuses"),
        F.forall(
            F.collect_list(status_col), lambda s: F.array_contains(finished, s)
        ).alias("all_finished"),
        F.array_contains(F.collect_list(status_col), "error").alias("any_error"),
    )
