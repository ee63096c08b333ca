"""Skew mitigation and co-location utilities.

AQE (enabled in session.py) already splits skewed shuffle partitions for
sort-merge joins at runtime; these helpers cover the cases AQE cannot:
hot-key *aggregation* (one reducer owns one giant group) and deliberate
co-partitioning to reuse one shuffle across stages.

Salting is rand()-free (row hash mixed with the input partition id — see
``_row_salt``); results are salt-value-invariant by construction, so
repeated runs and oracle comparisons see identical output even though the
salt itself depends on input layout.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Decomposable aggregates: (phase-1 partial, phase-2 merge) per op.
_MERGEABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _row_salt(df: DataFrame, buckets: int):
    """Salt in [0, buckets) that spreads even IDENTICAL duplicate rows.

    A pure column hash sends byte-identical duplicates of a hot key to one
    bucket (ADVICE r5), so duplicate-heavy hot keys stayed skewed; mixing
    ``spark_partition_id`` spreads copies that arrive in different input
    partitions (the common layout for a giant hot key).  Still rand()-free:
    join/aggregate RESULTS are salt-value-invariant by construction (the dim
    side carries every bucket; partial/merge aggregation is lossless), so
    the partition-dependent salt never surfaces in output or oracle
    comparisons.  Long arithmetic avoids int overflow under ANSI."""
    return F.pmod(
        F.hash(*[F.col(c) for c in df.columns]).cast("long")
        + F.spark_partition_id().cast("long") * F.lit(2654435761),
        F.lit(buckets),
    ).cast("int")


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key for hot groups.

    ``aggs`` maps output column → (op, input column) with op in
    count/sum/min/max (the decomposable set — exactly the aggregates whose
    partial/merge split is lossless).  Phase 1 groups by
    (group_cols, salt(hash of all columns) % buckets) so a hot key spreads
    over ``buckets`` reducers; phase 2 merges the partials per real key.

    Spark's own partial aggregation already does this when the *map-side*
    reduction is effective; explicit salting matters when per-group state is
    large (collect_list-ish) or the hot group dominates a single reducer.
    """
    salt = _row_salt(df, buckets).alias("_salt")
    p1_aggs = []
    p2_aggs = []
    for out, (op, col) in aggs.items():
        partial, merge = _MERGEABLE[op]
        p1_aggs.append(partial(F.col(col)).alias(f"_p_{out}"))
        p2_aggs.append(merge(F.col(f"_p_{out}")).alias(out))
    phase1 = df.select(*df.columns, salt).groupBy(*group_cols, "_salt").agg(*p1_aggs)
    return phase1.groupBy(*group_cols).agg(*p2_aggs)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``dim`` is too large to
    broadcast: salt the skewed side deterministically, replicate the dim
    side ``buckets``-fold, join on (key, salt).  Each hot key's rows spread
    over ``buckets`` reducers at the cost of a bounded dim replication —
    the classic salted-join trade.

    (When ``dim`` fits in memory just use ``F.broadcast`` — this exists for
    the mid-size dim that AQE's skew split can't help because the skew is in
    the build of a single hash partition.)

    Only ``inner``/``left`` are supported: the dim side is replicated
    ``buckets``-fold, so a right/full outer join would emit every unmatched
    dim row once per salt copy.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated dim side would duplicate unmatched rows under a "
            "right/full outer join"
        )
    salt = _row_salt(skewed, buckets)
    left = skewed.withColumn("_salt", salt)
    right = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    return left.join(right, on=[on, "_salt"], how=how).drop("_salt")


def hot_keys(df: DataFrame, key_cols: Sequence[str], min_count: int) -> DataFrame:
    """Exact heavy-hitter detection: keys whose row count ≥ ``min_count``.

    One map-combinable count — the shuffle carries one row per (task, key),
    so cost is bounded by key cardinality, not row count.  The result is
    hot-key-sized (tiny by definition: a key is hot because it owns a large
    share of a bounded total), so callers broadcast it.  This is the
    profiling step that feeds :func:`adaptive_salted_join` — measure the
    skew, then pay salting costs only where it exists."""
    return (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select(*key_cols)
    )


def adaptive_salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    hot: DataFrame,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted join that salts ONLY the hot keys (from :func:`hot_keys`).

    The uniform :func:`salted_join` replicates the whole dim side
    ``buckets``-fold; here cold keys join unsalted (salt 0 on both sides)
    and only hot-key dim rows replicate — replication cost is
    O(|hot| x buckets) rows instead of O(|dim| x buckets).  The hot set is
    broadcast to both sides as a flag join, so flagging adds no shuffle.
    Result-invariant like uniform salting; same inner/left restriction and
    for the same reason (replicated unmatched dim rows under right/full
    outer)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"adaptive_salted_join supports how='inner'|'left', got {how!r}: "
            "the replicated dim side would duplicate unmatched rows under a "
            "right/full outer join"
        )
    flag = F.broadcast(hot.select(F.col(on)).dropDuplicates([on]).withColumn("_hot", F.lit(True)))
    salt = _row_salt(skewed, buckets)
    left = skewed.join(flag, on=on, how="left").withColumn(
        "_salt", F.when(F.col("_hot"), salt).otherwise(F.lit(0))
    ).drop("_hot")
    salts = F.when(
        F.col("_hot"), F.array(*[F.lit(i) for i in range(buckets)])
    ).otherwise(F.array(F.lit(0)))
    right = (
        dim.join(flag, on=on, how="left")
        .withColumn("_salt", F.explode(salts))
        .drop("_hot")
    )
    return left.join(right, on=[on, "_salt"], how=how).drop("_salt")


def co_partition(
    left: DataFrame, right: DataFrame, on: str, partitions: int
) -> tuple[DataFrame, DataFrame]:
    """Repartition both sides identically on the join key so the subsequent
    join (and any later groupBy on the same key) reuses one exchange — the
    plain-parquet stand-in for bucketed tables (SURVEY §4: B-tree indexes →
    partition/cluster layout)."""
    return (
        left.repartition(partitions, F.col(on)),
        right.repartition(partitions, F.col(on)),
    )
