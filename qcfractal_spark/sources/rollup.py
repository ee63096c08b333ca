"""Incremental rollup (materialized-view) maintenance from a change feed.

The reference maintains daily ``server_stats`` rollups by periodically
re-aggregating a trailing window of the raw log
(qcfractal/qcfractal/components/serverinfo/socket.py:645-708 — a 3-day
lookback recompute every 24 h).  At 100 TB the recompute-the-window
strategy stops scaling the moment the window must widen (late data,
backfills): this module maintains the rollup EXACTLY from the base table's
change feed instead — work is proportional to the change volume, never the
base or window size, and arbitrarily late mutations are handled because a
retraction is just a negative contribution.

Scope: distributive aggregates that admit retraction — COUNT and SUM (AVG
derives as sum/count downstream).  MIN/MAX are deliberately not offered:
deleting the current minimum requires rescanning the group (the classic
IVM limitation); groups touched by min/max retraction need the recompute
path.  This is the same contract Delta Live Tables / Materialize apply to
incremental aggregation.

Flow:
    cdf   = table.change_feed(keys, cdf_style=True)   # pre/postimages
    delta = rollup_delta(cdf, group_cols, sum_cols)   # signed partials
    new   = apply_rollup_delta(old_rollup, delta)     # merge + drop empties

Both steps are single map-combinable shuffles keyed on the group columns —
the rollup refresh plan is the same shape as the rollup itself, just over
the (tiny) change set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(20,6)"

# contribution sign per CDF row type
_SIGNS = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def full_rollup(base: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]) -> DataFrame:
    """The rollup definition itself: COUNT(*) + per-measure non-null counts
    + decimal-exact SUMs per group.  The non-null counts make the NULL
    semantics maintainable (SUM of an all-NULL group is NULL, which a pure
    additive delta cannot reproduce) and are what AVG derivation needs
    anyway.  ``apply_rollup_delta`` maintains exactly this result (the
    equivalence is property-tested over arbitrary mutation sequences)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in sum_cols:
        aggs.append(F.count(F.col(c)).alias(f"cnt_{c}"))
        aggs.append(F.sum(F.col(c).cast(_DEC)).alias(f"sum_{c}"))
    return base.groupBy(*group_cols).agg(*aggs)


def rollup_delta(
    cdf: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Signed per-group partials from a cdf_style change feed: inserts and
    update postimages contribute +1/+value, deletes and update preimages
    −1/−value.  One map-combinable aggregate over the change set."""
    sign = F.col("_change")
    # Strict mapping: any other change type (e.g. the collapsed 'update' of
    # a non-cdf_style feed, whose rows carry only postimages) must FAIL the
    # job, not silently contribute nothing — an update without its
    # preimage retraction would corrupt the rollup.
    sign_expr = F.raise_error(
        F.concat(F.lit("rollup_delta needs a cdf_style feed; got _change="), sign)
    ).cast("int")
    for k, v in _SIGNS.items():
        sign_expr = F.when(sign == k, F.lit(v)).otherwise(sign_expr)
    signed = cdf.withColumn("_sign", sign_expr.cast("int"))
    aggs = [F.sum("_sign").alias("d_n")]
    for c in sum_cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNotNull(), F.col("_sign"))).alias(f"d_cnt_{c}")
        )
        aggs.append(
            F.sum(F.col(c).cast(_DEC) * F.col("_sign")).alias(f"d_sum_{c}")
        )
    return signed.groupBy(*group_cols).agg(*aggs)


def apply_rollup_delta(
    rollup: DataFrame, delta: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Merge signed partials into the existing rollup: full outer join on
    the group key (new groups appear via the delta side, dead groups drop
    when their count reaches zero), coalesced additions per measure.

    The join is NULL-SAFE on every group column: GROUP BY collects NULL
    keys into one group, so the merge must match them too — a plain
    equi-join would ghost-duplicate the NULL group on both sides."""
    keys = list(group_cols)
    r = rollup.alias("r")
    d = delta.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"r.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    joined = r.join(d, cond, "full").select(
        *[F.coalesce(f"r.{k}", f"d.{k}").alias(k) for k in keys],
        *[F.col(f"r.{c}") for c in rollup.columns if c not in keys],
        *[F.col(f"d.{c}") for c in delta.columns if c not in keys],
    )
    zero = F.lit(0).cast(_DEC)
    out_cols = [
        (F.coalesce("n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n")
    ]
    for c in sum_cols:
        cnt = F.coalesce(f"cnt_{c}", F.lit(0)) + F.coalesce(f"d_cnt_{c}", F.lit(0))
        out_cols.append(cnt.alias(f"cnt_{c}"))
        # SUM over zero non-null values is NULL, not 0 — reproduce it.
        out_cols.append(
            F.when(
                cnt > 0,
                F.coalesce(f"sum_{c}", zero) + F.coalesce(f"d_sum_{c}", zero),
            ).alias(f"sum_{c}")
        )
    return joined.select(*keys, *out_cols).where(F.col("n") > 0)
