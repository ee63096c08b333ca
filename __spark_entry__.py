"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``qcfractal_spark`` (see SURVEY.md §2 for the
operator inventory each registry key maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qcfractal_spark.queries import REGISTRY, q_pipe_prepare


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the end-to-end training-data prep pipeline
    (q_pipe_prepare): scan-side language+quality scoring → filters →
    MinHash star-edge near-dup clustering over the survivors →
    cluster-canonical docs with token counts — one composed plan touching
    scoring functions, dedup, graph components, and the checkpointing
    strategy in a single smoke check."""
    return q_pipe_prepare(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each oracle-checkable query."""
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
