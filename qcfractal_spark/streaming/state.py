"""Custom stateful streaming operators.

The reference's stateful dataflows (T4 queue state machine, T5 service
iteration — SURVEY §2.9) are driver-orchestrated because they need
serialized claim semantics.  The *data-plane* stateful patterns a telemetry
stream needs — sessionization of the access log, per-key accumulating
state — belong inside the engine, and Spark gives two tiers:

1. :func:`sessionize` — built-in ``session_window`` aggregation (declarative,
   Catalyst-planned, watermark-aware).  Always prefer this tier: state
   management, spill, and late-data handling are engine-managed.
2. :func:`stateful_session_stats` — ``applyInPandasWithState`` for semantics
   the built-in can't express (per-session custom accumulators, emit-on-
   timeout contracts).  Arrow-batched per group; state is one small struct
   per key, so a 1000-executor job shards state by groupBy key hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key session aggregation via the built-in session window: a
    session is a run of events with inter-event gaps below ``gap``.

    Works on batch and streaming inputs; streaming requires the watermark
    (session windows are unbounded state without one)."""
    from .ingest import _watermarkable

    df = _watermarkable(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def session_output_schema(key_field: StructField) -> StructType:
    """Output schema parameterized on the grouping key's actual name/type
    (a hard-coded user_id:long silently broke any other key column)."""
    return StructType(
        [
            key_field,
            StructField("session_start", TimestampType()),
            StructField("last_event", TimestampType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )


# default shape kept for callers/tests that reference it directly
SESSION_OUTPUT_SCHEMA = session_output_schema(StructField("user_id", LongType()))

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("last_event", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def stateful_session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "1 hour",
):
    """Sessionization as an explicit state machine (`applyInPandasWithState`):
    per key, accumulate (start, last_event, n, Σvalue); emit the session
    when the event-time timeout fires (watermark passed last_event + gap).

    The built-in :func:`sessionize` covers plain session rollups; this
    operator is the template for contracts the built-in can't express —
    custom accumulators, emit-exactly-on-close, side outputs.  State is
    sharded by the groupBy key, Arrow-batched per group — the
    ``mapGroupsWithState`` execution shape that scales state linearly with
    executors."""
    from datetime import timezone

    import pandas as pd

    if "value" not in events.columns:
        raise ValueError("stateful_session_stats needs a 'value' column to sum")
    key_field = events.schema[key_col]
    out_schema = session_output_schema(key_field)

    def update(key, pdf_iter, state):
        if state.hasTimedOut:
            (start, last, n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "session_start": [start],
                    "last_event": [last],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        start = last = None
        n = 0
        total = 0.0
        if state.exists:
            (start, last, n, total) = state.get
        closed: list[tuple] = []
        # ONE global sort: Arrow may split a key's micro-batch into several
        # chunks with no cross-chunk ordering — sorting each chunk alone let
        # an earlier-timestamped later chunk move `last` backwards and emit
        # sessions with session_start > last_event.  NULL event times are
        # dropped (they can never satisfy a gap predicate, and NaT would
        # poison the timeout arithmetic and kill the query).
        pdf = pd.concat(list(pdf_iter), ignore_index=True).dropna(subset=[ts_col])
        pdf = pdf.sort_values(ts_col)
        for t, v in zip(pdf[ts_col], pdf["value"]):
            t = t.to_pydatetime()
            # >= gap closes the session, matching the built-in
            # session_window ([start, start+gap) half-open — an event at
            # exactly last+gap starts a NEW session); `>` made the two
            # tiers disagree on boundary-spaced events.
            if last is not None and (t - last).total_seconds() >= gap_seconds:
                closed.append((start, last, n, total))
                start, n, total = t, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            total += float(v)
        if last is not None:
            state.update((start, last, n, total))
            # close the open session once the watermark passes
            # last_event + gap.  `last` is a NAIVE datetime carrying the
            # session-timezone (UTC) wall clock; naive .timestamp() would
            # re-interpret it in the executor's OS timezone, shifting the
            # timeout by the UTC offset — pin UTC explicitly.
            epoch_ms = int(last.replace(tzinfo=timezone.utc).timestamp() * 1000)
            state.setTimeoutTimestamp(epoch_ms + gap_seconds * 1000)
        elif not state.exists:
            # batch contained only NULL-ts rows and no prior state: nothing
            # to remember, nothing to time out
            pass
        yield pd.DataFrame(
            {
                key_col: pd.Series([key[0]] * len(closed)),
                "session_start": pd.Series([c[0] for c in closed], dtype="datetime64[ns]"),
                "last_event": pd.Series([c[1] for c in closed], dtype="datetime64[ns]"),
                "n_events": pd.Series([c[2] for c in closed], dtype="int64"),
                "total_value": pd.Series([c[3] for c in closed], dtype="float64"),
            }
        )

    from .ingest import _watermarkable

    return (
        _watermarkable(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
