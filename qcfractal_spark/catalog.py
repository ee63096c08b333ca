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

# ---------------------------------------------------------------------------
# Scan fan-out (r15 optimization round; spark_optimization_guide §2.2/§2.5).
#
# The test tables are single parquet FILES with a single row group, so every
# scan stage is exactly ONE task no matter how many cores the session has —
# and Spark places all scan-side derived work (shingle explode + md5
# signatures, regex quality scoring, decimal products) in that stage, ahead
# of the first exchange.  Measured at sf0.1 on local[32]: the MinHash
# signature subplan runs 3.4 s single-task vs 1.7 s after a 32-way fan-out.
#
# The fix is scale-adaptive, not a local[32] constant: fan out ONLY when the
# scan would produce fewer splits than the session's parallelism (estimated
# the same way Spark sizes splits: bytes / maxPartitionBytes).  At 100 TB a
# fact table has thousands of splits, the condition is false, and the plan
# is byte-identical to the un-fanned one — no extra exchange at scale.
#
# Opt-IN per query (``load_table(..., fanout=True)``), not blanket: a full
# 127-query A/B at sf0.1 (base 236.7 s vs blanket-fan 265.9/190.7 s across
# two runs) split the suite into 24 consistent winners (scan-compute-bound:
# md5 shingling, regex scoring, decimal products — e.g. dd_minhash_lsh
# 10.8→2.0 s, tx_text_stats 9.1→0.9 s, a23_corr 5.8→1.4 s) and ~40
# consistent losers (light scans where the extra exchange + 32-task
# scheduling is pure overhead at bench scale: +0.2–1.3 s each, e.g.
# a6_access_summary 1.1→1.8 s, a19_approx_distinct 1.0→2.3 s).  The
# winners opt in at their `_t` call; everything else keeps the split-count
# plan Spark derives on its own.
#
# Hash-partitioning on the table's primary key (not round-robin): it skips
# the local sort round-robin pays for retry determinism
# (spark.sql.execution.sortBeforeRepartition), it is deterministic under
# task retries by construction, and the keys are unique or near-unique so
# the spread is even.  Filters and column pruning push through a
# Repartition node, so PushedFilters/ReadSchema at the scan are unchanged
# (re-verified by tools/plan_audit.py).  Results are partitioning-
# independent for every registry query (all orderBy+limit sites carry full
# tie-breaks; verified against the DuckDB oracle with the fan-out active).
#
# SPARK_GRAFT_SCAN_FANOUT=0 disables (for A/B measurement and bisection).
_FANOUT_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_FANOUT_MIN_BYTES = 48 * 1024  # below this a single task is the right plan
# keyed on (path, mtime, size) so an in-process regeneration of the parquet
# invalidates the cached byte count (r15 ADVICE); the stat is cheap next to
# the table load the result feeds.
_fanout_bytes_cache: dict[tuple[str, float, int], int] = {}


def _table_bytes(path: str) -> int:
    """Total bytes under ``path`` (file or directory), cached per
    (path, mtime, size)."""
    try:
        st = os.stat(path)
        key = (path, st.st_mtime, st.st_size)
    except OSError:
        return 0
    n = _fanout_bytes_cache.get(key)
    if n is None:
        if os.path.isdir(path):
            n = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
                if not f.startswith((".", "_"))
            )
        else:
            n = st.st_size
        _fanout_bytes_cache[key] = n
    return n


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte conf value ('134217728', '128m', '1g')."""
    v = str(v).strip().lower().removesuffix("b")
    mult = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}.get(v[-1:], 1)
    return int(float(v[:-1] if mult != 1 else v) * mult)


def _scan_fanout_partitions(spark: SparkSession, path: str) -> int:
    """Partitions to fan a small scan out to, or 0 to leave the scan alone
    (already enough splits, too small to matter, or disabled)."""
    if os.environ.get("SPARK_GRAFT_SCAN_FANOUT") == "0":
        return 0
    nbytes = _table_bytes(path)
    if nbytes < _FANOUT_MIN_BYTES:
        return 0
    par = spark.sparkContext.defaultParallelism
    try:
        max_pb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
    except (ValueError, TypeError):
        max_pb = 128 * 1024 * 1024
    est_splits = max(1, -(-nbytes // max_pb))  # ceil
    if est_splits >= par:
        return 0
    return par


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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fanout: bool = False
) -> DataFrame:
    # One-time, load-order-independent session contract (nanosAsLong +
    # inferTimestampNTZ) — all conf mutation lives in session.py; this is a
    # no-op after the first table load on a given session.
    ensure_session_contract(spark)
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    df = normalize_ntz(df)
    # Scale-adaptive scan fan-out (see the block comment above _FANOUT_KEY):
    # opt-in per caller, and only fires when the scan has fewer splits than
    # the session has cores — i.e. never at production scale.  Broadcast
    # dims are left alone — an exchange ahead of a broadcast collect is
    # pure cost.
    key = _FANOUT_KEY.get(name)
    if fanout and key is not None and name not in BROADCAST_TABLES:
        n = _scan_fanout_partitions(spark, path)
        if n:
            df = df.repartition(n, F.col(key))
    return df


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
