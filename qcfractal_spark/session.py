"""SparkSession builders tuned for this engine.

Design notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replace hand-tuned partition counts when data volumes vary by 1000x.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces.  On a real cluster this would be ~2-3x total cores.
- UTC session timezone: the reference stores all timestamps UTC
  (qcfractal/qcfractal/components/record_db_models.py:205, qcportal/utils.py:427
  ``now_at_utc``) and the DuckDB oracle compares naive timestamps.
- Arrow enabled for the few pandas-UDF paths (compile_values value_call,
  multimodal decode) — Arrow batches, never row-at-a-time Python.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Session-level parquet/timestamp contract (see catalog.normalize_ntz for
# the full rationale):
# - inferTimestampNTZ off: tz-less parquet timestamps read as one instant
#   type (LTZ under the UTC session timezone) everywhere.
# - nanosAsLong on: TIMESTAMP(NANOS) parquet columns (events.ts in the
#   testdata) read as int64 nanos instead of erroring; the catalog converts
#   the registered nanos columns back to TimestampType at the scan.
# Applied at build time below, and enforced idempotently by
# ``ensure_session_contract`` for sessions this engine did not build (the
# correctness driver passes its own SparkSession into ``entry``).
# - session timezone UTC: the reference stores every timestamp UTC and the
#   engine's day/hour bucketing (date_format / date_trunc) and epoch math
#   are wall-clock operations — on a non-UTC externally-built session they
#   would silently bucket against the local zone and disagree with the
#   DuckDB oracle's naive-UTC comparison.
SESSION_CONTRACT_CONFS = {
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}

def ensure_session_contract(spark: SparkSession) -> None:
    """Apply the engine's session confs to an externally-built session.

    Check-and-set on every call (no identity cache: an ``id()``-keyed memo
    outlives garbage-collected sessions and can alias a NEW session at a
    reused address, silently skipping the confs — and a memo would also
    never re-assert the contract if user code flips a conf mid-session).
    The check is two conf reads; set fires only on drift.  Load-order
    independent — round-4's per-load mutation set ``nanosAsLong`` only
    when ``events`` happened to load first, so a later nanos-typed read of
    another table silently typed as bigint or not depending on history.
    All ``spark.conf.set`` calls of the engine live here."""
    for k, v in SESSION_CONTRACT_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def local_df(spark: SparkSession, rows, schema):
    """Small driver-side relation as a LocalTableScan, not a pickled RDD.

    ``createDataFrame(list, schema)`` always takes the Python-RDD path:
    the rows are pickled into ``defaultParallelism`` slices and EVERY scan
    of the relation re-pays ~32 Python-worker round trips (~200 ms wall /
    ~4 ms CPU per task measured on this suite) just to re-read a handful
    of local rows — the guide-§4 JVM↔Python boundary, paid per action for
    frames (union-find labels, claim exclusions, centroid dims, rule
    tables) that iterative operators re-scan many times.  Routing the same
    rows through pandas + Arrow yields a ``LocalTableScan``: the JVM
    decodes the Arrow batch directly, scans are free, and a broadcast of
    the relation needs no Spark job at all.

    Empty inputs build from a zero-row ``pyarrow`` table (``LocalTableScan
    <empty>``) — schema-preserving (nullability + field metadata survive,
    r15 ADVICE; the earlier cast-NULL projection over ``range(0)`` coerced
    every field nullable and dropped metadata) and still RDD-free; an
    Arrow-unmappable schema falls back to ``createDataFrame([], st)``
    (ExistingRDD scan, but exact schema).  Any Arrow-rejected non-empty
    shape falls back to the classic ``createDataFrame`` — same rows, same
    schema, slower.

    Naive ``datetime`` values are normalized to UTC-aware before the frame
    is built (r15 ADVICE, medium): the Arrow path localizes naive stamps in
    the SESSION timezone (UTC per the engine contract) while the classic
    path — still the exception fallback — uses the driver's OS timezone, so
    on a non-UTC host the two paths would disagree by the UTC offset.
    Making the value explicitly UTC-aware is both-paths unambiguous and
    encodes the engine's timestamps-are-UTC contract at the boundary."""
    from datetime import datetime, timezone

    from pyspark.sql.types import StructType, TimestampType

    rows = list(rows)
    st = (
        schema
        if isinstance(schema, StructType)
        else spark.createDataFrame([], schema).schema
    )
    if not rows:
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            return spark.createDataFrame(to_arrow_schema(st).empty_table(), st)
        except Exception:
            return spark.createDataFrame([], st)
    ts_idx = [
        i for i, f in enumerate(st.fields) if isinstance(f.dataType, TimestampType)
    ]
    if ts_idx:
        fixed = []
        for row in rows:
            vals = list(row)
            for i in ts_idx:
                v = vals[i]
                if isinstance(v, datetime) and v.tzinfo is None:
                    vals[i] = v.replace(tzinfo=timezone.utc)
            fixed.append(tuple(vals))
        rows = fixed
    try:
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=[f.name for f in st.fields], dtype=object)
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(rows, st)


_SCRATCH_BASE: str | None = None


def scratch_base() -> str:
    """Base directory for Spark local dirs (shuffle/spill/checkpoint
    blocks) and the engine's scratch tables (r15 optimization round).

    Order: ``SPARK_GRAFT_SCRATCH_DIR`` (operator override, e.g. an NVMe
    array on a real cluster) > ``/dev/shm`` when it has ≥32 GiB free
    (RAM-backed local dirs are a standard choice for shuffle-heavy work on
    RAM-rich hosts; this sandbox's root disk measured intermittent
    multi-second write stalls — 4 MB/s bursts vs 300 MB/s steady — that
    injected seconds of idle fetch/commit wait into shuffle-bearing
    stages) > the platform tempdir.  The 32 GiB floor keeps small hosts
    and shm-less containers on the default path; at 100 TB shuffle volume
    exceeds RAM and operators point SPARK_GRAFT_SCRATCH_DIR at real local
    disks.

    The default probe (shm free-space check) is CACHED per process (r15
    ADVICE): ``spark.local.dir`` is fixed at session build, and
    re-evaluating ``statvfs`` on every scratch call meant a mid-process
    threshold crossing could strand scratch dirs in one base while the
    reaper scanned another.  The env override stays a live read (explicit
    operator intent); the reaper sweeps every candidate base regardless
    (``scratch_base_candidates``)."""
    override = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if override:
        return override
    global _SCRATCH_BASE
    if _SCRATCH_BASE is None:
        shm = "/dev/shm"
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= 32 * 1024**3:
                _SCRATCH_BASE = shm
        except OSError:
            pass
        if _SCRATCH_BASE is None:
            import tempfile

            _SCRATCH_BASE = tempfile.gettempdir()
    return _SCRATCH_BASE


def scratch_base_candidates() -> list[str]:
    """Every base a scratch dir may have landed in across processes/runs:
    the operator override, ``/dev/shm``, and the platform tempdir.  The
    stale-scratch reaper sweeps all of them, so dirs orphaned in a base
    this process did not choose (threshold crossed, env changed between
    runs) still get pruned (r15 ADVICE)."""
    import tempfile

    cands = []
    override = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if override:
        cands.append(override)
    cands += ["/dev/shm", tempfile.gettempdir()]
    out: list[str] = []
    for c in cands:
        if c not in out and os.path.isdir(c):
            out.append(c)
    return out


def _prune_stale_local_dirs(base_dir: str, max_age_sec: int = 6 * 3600) -> None:
    """Best-effort prune of Spark local-dir litter from dead JVMs.

    ``spark.local.dir`` points every session at
    ``<scratch_base>/qcfractal-spark-local``; a killed JVM leaves its
    ``spark-<uuid>``/``blockmgr-<uuid>`` trees behind, and on a RAM-backed
    base that leak eats memory until reboot (r15 ADVICE — the scratch
    reaper's regex only matches ``qcfractal_spark_*`` dirs).  Spark's dir
    names carry no owner pid, so liveness is inferred by age: entries
    untouched for ``max_age_sec`` are removed at session BUILD time (before
    this JVM creates its own).  A live long-running session's dirs can have
    old top-level mtimes, so the threshold is conservative (6 h) and the
    prune is strictly best-effort — a concurrently-deleted file is a no-op,
    and shuffle-file loss in the pathological overlap case only triggers
    Spark's fetch-retry/recompute path, never wrong results."""
    import shutil
    import time

    try:
        names = os.listdir(base_dir)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not (name.startswith("spark-") or name.startswith("blockmgr-")):
            continue
        path = os.path.join(base_dir, name)
        try:
            if now - os.path.getmtime(path) >= max_age_sec:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def _default_driver_memory() -> str:
    """Default driver/executor heap: min(48g, ~40% of physical RAM).

    local[N] runs every executor thread inside the driver JVM, so this
    IS the executor memory.  48g ≈ 1.5g/task at 32 threads — the
    per-executor sizing a real cluster would run — but hard-coding 48g
    encoded the 128 GiB benchmark box into the library default (r13
    ADVICE): on a smaller host the JVM still starts (Xmx is a cap) yet
    heavy queries push the MACHINE into swap/OOM-killer territory
    instead of failing with Spark's managed-memory errors.  Deriving
    from MemTotal keeps the bench box at 48g while a 16 GiB laptop gets
    ~6g; SPARK_GRAFT_DRIVER_MEM remains the explicit override.
    """
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    break
            else:
                return "8g"
    except OSError:
        return "8g"
    return f"{max(2, min(48, int(total_gib * 0.4)))}g"


def _spark_local_dir() -> str:
    """The session's ``spark.local.dir``, with dead-JVM litter pruned
    first (see ``_prune_stale_local_dirs``)."""
    d = os.path.join(scratch_base(), "qcfractal-spark-local")
    _prune_stale_local_dirs(d)
    return d


def build_session(
    app_name: str = "qcfractal-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's default tuning."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # 8g split across 32 concurrent tasks starved execution memory
        # at sf10 (the r13 spot decade's dd_jaccard_capped
        # UNABLE_TO_ACQUIRE_MEMORY); the RAM-derived default gives the
        # 128 GiB bench box 48g while staying safe on small hosts.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_memory()),
        )
        # With a large heap, JVM GCs become rare — and Spark's
        # ContextCleaner only releases DEAD localCheckpoint/broadcast
        # blocks when a GC collects their references, so a long-lived
        # session accumulates gigabytes of orphaned storage blocks that
        # evict/spill live work (measured r13: the same sf1 query ran
        # 51 s in a clean session and 158 s right after a checkpoint-
        # heavy predecessor).  Tighten the periodic-GC floor from the
        # 30 min default so cleanup latency is bounded.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # Shuffle files, disk-spilled blocks and localCheckpoint blocks go
        # to the fastest local medium available (see scratch_base): this
        # box's root disk stalls for seconds at a time, which surfaced as
        # 32-task stages idling at ~0.3 s/task with near-zero CPU.
        .config("spark.local.dir", _spark_local_dir())
        .config("spark.ui.enabled", "false")
    )
    for k, v in SESSION_CONTRACT_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    session = builder.getOrCreate()
    # getOrCreate can return a pre-existing session whose builder confs were
    # ignored; enforce the contract on it either way.
    ensure_session_contract(session)
    return session
