"""Join shapes from the reference, Spark-first.

All reference joins are equi-joins built lazily — a join is added to the
statement only when a filter needs it ("join elision",
qcfractal/qcfractal/components/singlepoint/record_socket.py:332-375,
optimization/record_socket.py:413-457).  In Spark we reproduce that in the
query-builder layer: construct the join chain from the present filters and
let Catalyst reorder/broadcast.

Scale notes: dimension sides (specifications, users, managers) are tiny
relative to records — always broadcast-able; `F.broadcast` hints are applied
by callers where the optimizer's size estimate may be missing (e.g. after
non-trivial subplans).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import local_df


def semi_join_values(
    spark: SparkSession,
    df: DataFrame,
    cols: Sequence[str],
    values: Sequence[tuple],
) -> DataFrame:
    """Composite tuple-IN (P4, db_socket/helpers.py:257-293).

    ``tuple_(cols).in_(values)`` becomes a broadcast left-semi join against a
    literal values DataFrame — NULL-tolerant like the reference's
    OR-of-ANDs fallback, and scan-friendly (the semi join's build side is
    broadcast so the fact table never shuffles).  An empty value list means
    "IN ()": zero rows, no job.
    """
    if not values:
        return df.where(F.lit(False))
    types = _infer_types(values)
    schema = ", ".join(f"{c} {t}" for c, t in zip(cols, types))
    # coerce ints to float where the position promoted to double (mixed
    # (1,) / (2.5,) inputs — DoubleType rejects raw ints at createDataFrame)
    rows = [
        tuple(
            float(v) if t == "double" and isinstance(v, int) and not isinstance(v, bool) else v
            for v, t in zip(row, types)
        )
        for row in values
    ]
    vals_df = local_df(spark, rows, schema=schema)
    # NULL-SAFE equality per position: the reference's OR-of-ANDs fallback
    # renders `col == None` as IS NULL and matches it; a plain equi-key
    # semi join would silently match nothing for tuples containing None.
    cond = None
    for c in cols:
        eq = df[c].eqNullSafe(vals_df[c])
        cond = eq if cond is None else (cond & eq)
    return df.join(F.broadcast(vals_df), cond, "left_semi")


def _infer_types(values: Sequence[tuple]) -> list[str]:
    """Per-position type from the first NON-None value (a None in the first
    tuple must not pin the column to string)."""
    width = len(values[0])
    out = []
    for pos in range(width):
        non_null = [t[pos] for t in values if t[pos] is not None]
        v = non_null[0] if non_null else None
        if isinstance(v, bool):
            out.append("boolean")
        elif isinstance(v, int):
            # promote to double when ANY value at this position is a float
            # (a long schema makes createDataFrame reject 2.5 at plan time)
            out.append(
                "double"
                if any(isinstance(x, float) for x in non_null)
                else "long"
            )
        elif isinstance(v, float):
            out.append("double")
        else:
            out.append("string")
    return out


def anti_join_keys(df: DataFrame, existing: DataFrame, keys: Sequence[str]) -> DataFrame:
    """left_anti "which keys are missing" (J9/U4, helpers.py:663-694)."""
    return df.join(existing.select(*keys).dropDuplicates(list(keys)), on=list(keys), how="left_anti")


def left_join_coalesce_count(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    count_col: str = "record_count",
) -> DataFrame:
    """Left outer join to a pre-aggregated count, COALESCE(count, 0) (J10).

    Reference: dataset list joined to per-dataset record counts
    (qcfractal/qcfractal/components/datasets/dataset_socket.py:228-257).
    ``right`` must already be grouped to one row per key with ``count_col``.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    return left.join(right, on=on_cols, how="left").withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0).cast("long"))
    )


def int_or_name_filter(
    df: DataFrame, id_col: str, name_col: str, values: Sequence[Any]
) -> DataFrame:
    """Polymorphic id-or-name filter (P8, record_socket.py:294-300).

    Splits the value list into ints and strings in the driver (plan-build
    time, not data time) and ORs two IN predicates.
    """
    ids = [v for v in values if isinstance(v, int)]
    names = [v for v in values if isinstance(v, str)]
    pred = F.lit(False)
    if ids:
        pred = pred | F.col(id_col).isin(ids)
    if names:
        pred = pred | F.col(name_col).isin(names)
    return df.where(pred)


def epoch_seconds(col) -> F.Column:
    """Epoch seconds as double, robust across timestamp flavors.

    ``TIMESTAMP_NTZ`` (what Spark ≥3.4 may infer for tz-less parquet)
    cannot cast to DOUBLE directly; routing through ``timestamp_ltz`` is an
    identity for LTZ inputs and a session-tz (UTC here) interpretation for
    NTZ — exact for micro-precision values within the 53-bit mantissa."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ltz").cast("double")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_id_col: str,
    payload_cols: Sequence[str] = (),
    out_prefix: str = "ref_",
) -> DataFrame:
    """As-of (backward, inclusive) join: attach to each left row the latest
    right row with ``right.ts <= left.ts`` for the same key.

    Spark has no native as-of join; the scalable plan is the union +
    window carry-forward: tag each side, union on (key, ts), sort within
    the key by (ts, side, right-id) — rights before lefts on equal ts, so
    the join is inclusive, with the max right id winning exact-ts ties —
    and carry the last right payload struct forward.  One shuffle on the
    key, never a row-multiplying join: at 100 TB this beats the
    O(left × matching-right) expand-then-rank join by the full fan-out
    factor, and (unlike pandas merge_asof under applyInPandas) stays
    entirely JVM-side.  The payload travels as one struct so all its
    fields come from the *same* right row even when payload values are
    NULL (per-column ``last(ignorenulls)`` could mix rows).
    """
    from pyspark.sql import Window

    pay = F.struct(*[F.col(c) for c in (right_id_col, *payload_cols)])
    # A NULL-ts right row would sort FIRST (asc puts NULLs first) and its
    # payload would carry forward as a bogus "match" for every early left
    # row; a row with no timestamp can never satisfy ts <= left.ts.  A
    # NULL-KEY right row can never equi-match any left row either, yet the
    # window partition groups NULL keys together and would carry its
    # payload onto NULL-key left rows — both are dropped from the right
    # side so NULL-key lefts get ref_* NULL, exactly the equi-join (and
    # oracle) semantics.
    r = right.where(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col), F.col(ts_col), pay.alias("_rpay"), F.lit(0).alias("_side")
    )
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.col(f"_rpay.{right_id_col}").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{right_id_col}").alias(f"{out_prefix}{right_id_col}")
    ] + [F.col(f"_match.{c}").alias(f"{out_prefix}{c}") for c in payload_cols]
    return matched.where(F.col("_side") == 1).select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    bucket_s: float | None = None,
    inclusive_lower: bool = False,
    inclusive_upper: bool = True,
) -> DataFrame:
    """Interval (range) join: pair each left row with the right rows whose
    timestamp falls in ``(left.ts + lower_s, left.ts + upper_s]`` for the
    same key (bound inclusivity configurable).

    Naive range joins degenerate to a per-key cross product filtered late
    (Spark plans them as BroadcastNestedLoop when no equi-key exists).  The
    scale plan is bucketization: rights get one time bucket of width
    ``bucket_s`` (default: the interval span), lefts explode to the (at
    most ⌈span/bucket⌉+1) buckets their window overlaps, the join is a
    plain equi-join on (key, bucket) — shuffle-bounded, AQE/skew-join
    eligible — and the exact predicate filters bucket-local candidates.
    A right row owns exactly one bucket, so no pair is produced twice and
    no dedup pass is needed.  Bucket ids come from epoch seconds as double
    (exact for micro-precision timestamps within the 53-bit mantissa); the
    final predicate compares native timestamps, so bucketing only ever
    widens candidates, never changes results.

    Returns the joined rows (all left columns + all right columns).
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must have distinct names (rename one side "
            "before joining) so the post-join range predicate is unambiguous"
        )
    span = float(upper_s - lower_s)
    w = float(bucket_s) if bucket_s is not None else span
    if w <= 0:
        raise ValueError("bucket width must be positive")
    lts_d = epoch_seconds(left_ts)
    rts_d = epoch_seconds(right_ts)
    lo_b = F.floor((lts_d + F.lit(float(lower_s))) / F.lit(w)).cast("long")
    hi_b = F.floor((lts_d + F.lit(float(upper_s))) / F.lit(w)).cast("long")
    l = left.withColumn("_b", F.explode(F.sequence(lo_b, hi_b)))
    r = right.withColumn("_b", F.floor(rts_d / F.lit(w)).cast("long"))
    lo_cmp = (rts_d >= lts_d + F.lit(float(lower_s))) if inclusive_lower else (
        rts_d > lts_d + F.lit(float(lower_s))
    )
    hi_cmp = (rts_d <= lts_d + F.lit(float(upper_s))) if inclusive_upper else (
        rts_d < lts_d + F.lit(float(upper_s))
    )
    joined = l.join(r, on=[key_col, "_b"] if key_col else ["_b"], how="inner")
    return joined.where(lo_cmp & hi_cmp).drop("_b")


def spec_chain_join(
    records: DataFrame,
    spec: DataFrame,
    subspec: DataFrame,
    record_spec_key: tuple[str, str],
    spec_subspec_key: tuple[str, str],
    spec_cols: Sequence[str] | None = None,
    subspec_cols: Sequence[str] | None = None,
    spec_filter=None,
    subspec_filter=None,
) -> DataFrame:
    """J2: the two-level specification chain with JOIN ELISION (reference
    record → optimization_spec → qc_spec,
    optimization/record_socket.py:413-457; the reference builds the
    SQLAlchemy statement lazily, adding each join only when a filter or
    projection actually needs that level).

    Elision rules, matching the reference:

    * the SUBSPEC level joins only when ``subspec_filter`` or
      ``subspec_cols`` is supplied;
    * the SPEC level joins when it is needed itself (``spec_filter`` /
      ``spec_cols``) OR as the bridge to a needed subspec level;
    * with neither, the returned plan is the bare record scan — zero
      joins (pinned by tests/test_spec_chain.py).

    Both dimension sides are broadcast (spec tables are tiny next to
    records — the reference keeps them in per-process caches for the same
    reason), so the record side never shuffles no matter how many levels
    join: at 100 TB this is a map-only chain.  Filters sit on the build
    sides BEFORE the broadcast, shrinking what ships.

    Returns the record columns plus the requested spec/subspec columns.
    Delegates to :func:`spec_chain_join_n`, the N-level generalization
    (VERDICT r11 item 4) — the reference also has 3-level chains
    (torsiondrive/neb/gridoptimization → optimization_spec → qc_spec).
    """
    return spec_chain_join_n(
        records,
        [
            {
                "df": spec,
                "key": record_spec_key,
                "cols": spec_cols,
                "filter": spec_filter,
            },
            {
                "df": subspec,
                "key": spec_subspec_key,
                "cols": subspec_cols,
                "filter": subspec_filter,
            },
        ],
    )


def spec_chain_join_n(records: DataFrame, levels: Sequence[dict]) -> DataFrame:
    """N-level specification chain with join ELISION (VERDICT r11 item 4;
    the reference's 3-level chains: torsiondrive/neb/gridoptimization →
    optimization_spec → qc_spec, e.g.
    torsiondrive/record_socket.py — the same lazily-built statement shape
    as the 2-level J2).

    ``levels[i]`` is ``{"df": DataFrame, "key": (parent_col, child_col),
    "cols": [...], "filter": Column | None}`` — ``key[0]`` names the join
    column on the PARENT side (the record relation for level 0, level
    i-1's df otherwise), ``key[1]`` the column on this level's df.

    Elision rule, matching the reference: level i joins iff it is needed
    itself (``filter``/``cols``) OR it bridges to a deeper needed level —
    i.e. the chain joins exactly levels ``0..deepest_needed`` and nothing
    past it; with nothing needed, the plan is the bare record scan (zero
    joins).  Every joined level is broadcast and filtered BEFORE the
    broadcast, so the record side never shuffles at any depth.
    """
    lvls = [
        {
            "df": l["df"],
            "key": l["key"],
            "cols": list(l.get("cols") or []),
            "filter": l.get("filter"),
        }
        for l in levels
    ]
    deepest = -1
    for i, l in enumerate(lvls):
        if l["filter"] is not None or l["cols"]:
            deepest = i
    rec_cols = [records[c] for c in records.columns]
    out = records
    parent = records
    joined: list[tuple[DataFrame, list[str]]] = []
    for i in range(deepest + 1):
        l = lvls[i]
        d = l["df"].where(l["filter"]) if l["filter"] is not None else l["df"]
        out = out.join(F.broadcast(d), parent[l["key"][0]] == d[l["key"][1]])
        joined.append((d, l["cols"]))
        parent = d
    return out.select(
        *rec_cols, *[d[c] for d, cols in joined for c in cols]
    )
