"""Z-order layout: multi-dimensional file pruning (sources/layout.py:
zorder_column / write_zordered).  The assertion is mechanical — a narrow
filter on EITHER clustered dimension must touch a strict subset of the
files — because at 100 TB "hopefully the stats prune" is not a design."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from qcfractal_spark.sources.layout import pruned_files, write_zordered, zorder_column

N_FILES = 8


def _two_dim_df(spark):
    # Two independent pseudo-uniform dimensions derived from id (no RNG).
    return spark.range(0, 100_000).select(
        F.col("id"),
        (F.col("id") * 48271 % 65536).alias("a"),
        (F.col("id") * 16807 % 65536).alias("b"),
    )


def test_zorder_value_is_deterministic_and_bounded(spark):
    df = zorder_column(_two_dim_df(spark), ["a", "b"], bits=8)
    mx = df.agg(F.max("_z")).first()[0]
    assert 0 <= mx < (1 << 16)  # 2 dims x 8 bits
    again = zorder_column(_two_dim_df(spark), ["a", "b"], bits=8)
    assert df.agg(F.sum("_z")).first()[0] == again.agg(F.sum("_z")).first()[0]


def test_zorder_layout_prunes_on_both_dimensions(spark):
    df = _two_dim_df(spark)
    with tempfile.TemporaryDirectory() as d:
        zpath = os.path.join(d, "z")
        write_zordered(df, zpath, ["a", "b"], n_files=N_FILES)
        z = spark.read.parquet(zpath)
        total = pruned_files(z)
        assert total == N_FILES
        # narrow range on each clustered dimension -> strict file subset
        touched_a = pruned_files(z.where(F.col("a") < 4096))
        touched_b = pruned_files(z.where(F.col("b") < 4096))
        assert touched_a < total, f"a-filter touched {touched_a}/{total}"
        assert touched_b < total, f"b-filter touched {touched_b}/{total}"
        # an unclustered random layout reads everything for the same filter
        rpath = os.path.join(d, "r")
        df.repartition(N_FILES).write.parquet(rpath)
        r = spark.read.parquet(rpath)
        assert pruned_files(r.where(F.col("a") < 4096)) == N_FILES


def test_zorder_supports_timestamp_and_string_dims(spark):
    """The docstring's own example shape — (created_on, record_type) — must
    work: timestamps min-max scale via epoch, strings hash-bucket."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + timedelta(hours=i), ["sp", "opt", "td"][i % 3]) for i in range(300)],
        "id long, created_on timestamp, record_type string",
    )
    z = zorder_column(df, ["created_on", "record_type"], bits=6)
    assert z.where(F.col("_z").isNull()).count() == 0
    assert z.agg(F.max("_z")).first()[0] < (1 << 12)
    # empty input and all-null columns degrade to a constant key, not a crash
    empty = zorder_column(df.where(F.lit(False)), ["created_on", "record_type"])
    assert empty.count() == 0


def test_zorder_many_columns_clamps_bits_and_stays_sorted(spark):
    """6 Z-order columns exceed the 64-bit key at default bits=12; the
    per-column resolution must clamp (not wrap mod 64 / flip sign) so the
    key stays non-negative and monotone in each column's extremes."""
    from pyspark.sql import functions as F

    from qcfractal_spark.sources.layout import zorder_column

    cols = [f"c{i}" for i in range(6)]
    df = spark.range(0, 2000).select(
        "id", *[(F.col("id") * (i + 3) % 997).alias(c) for i, c in enumerate(cols)]
    )
    z = zorder_column(df, cols)
    mn, mx = z.agg(F.min("_z"), F.max("_z")).first()
    assert mn >= 0  # no sign flip
    # extremes: the all-min row must have a smaller key than the all-max row
    # per-column correlation — the top decile of any clustered column
    # must land in a higher z range than the bottom decile on average
    top = z.where(F.col("c0") > 900).agg(F.avg("_z")).first()[0]
    bot = z.where(F.col("c0") < 100).agg(F.avg("_z")).first()[0]
    assert top > bot
