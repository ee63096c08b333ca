"""Table catalog over the parquet test tables.

The reference's entities live as PostgreSQL tables; here every entity is a
columnar parquet table read lazily so Catalyst can push filters and prune
columns into the scan (the reference gets projection pushdown by hand via
``defer``/``load_only`` — qcfractal/qcfractal/db_socket/helpers.py:135-231;
Spark's column pruning makes that automatic).

At 100 TB the big tables (``lineitem``/``events``/``documents``) would be
date- or key-partitioned parquet/Delta directories; ``load_tables`` reads
whatever layout is under ``sf_dir`` and registers temp views so Spark SQL is
a first-class entry point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_session_contract

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that a planner should broadcast in joins.  At SF100k these
# stay O(MB): region=5 rows, nation=25; part/supplier/customer grow with SF
# but remain tiny relative to the fact tables.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as TIMESTAMP(NANOS) parquet, which Spark cannot map to its
# microsecond TimestampType directly: read as int64 nanos (legacy conf) and
# truncate to micros — the same truncation DuckDB applies, so oracles agree.
_NANOS_TS_COLS = {"events": ("ts",)}


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TimestampType (session-tz LTZ).

    The testdata parquet stores tz-less ``timestamp[us]``; depending on
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` Spark reads that as
    TIMESTAMP_NTZ, a type that cannot be cast to DOUBLE and is rejected by
    ``withWatermark``.  The engine's timestamp contract is the reference's
    (all timestamps UTC — record_db_models.py:205): one instant type,
    TimestampType under a UTC session timezone, normalized at the scan so
    every downstream operator (epoch math, watermarks, window()) sees one
    type regardless of how the parquet writer flagged tz-ness.  The cast is
    wall-clock-identity under UTC and sits above the scan, so pushdown and
    pruning on other columns are unaffected."""
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # One-time, load-order-independent session contract (nanosAsLong +
    # inferTimestampNTZ) — all conf mutation lives in session.py; this is a
    # no-op after the first table load on a given session.
    ensure_session_contract(spark)
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return normalize_ntz(df)


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every test table; optionally register them as temp views."""
    sf_dir = sf_dir or default_sf_dir()
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
