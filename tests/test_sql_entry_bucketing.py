"""Spark SQL as a first-class entry point (catalog views) and bucketed-table
co-located joins (the SCALE.md §1 id-join layout: shuffle-free fact joins)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from qcfractal_spark.catalog import load_tables

SF = "/root/testdata/sf0.001"


def test_sql_entry_point_matches_dataframe_plans(spark):
    load_tables(spark, SF, register_views=True)
    sql = spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders WHERE o_totalprice > 1000
        GROUP BY o_orderstatus
        """
    )
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .where(F.col("o_totalprice") > 1000)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in sql.collect()} == {tuple(r) for r in df.collect()}

    # a join-shaped query through pure SQL over the registered views
    top = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY customers DESC, n_name LIMIT 5
        """
    )
    assert top.count() == 5


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed+sorted on the join key: the join plan contains no
    Exchange (the physical win bucketing buys at 100 TB — fact⋈fact id
    joins without shuffling either side)."""
    with tempfile.TemporaryDirectory() as d:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            orders = spark.read.parquet(f"{SF}/orders.parquet").select(
                "o_orderkey", "o_totalprice"
            )
            lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
                "l_orderkey", "l_quantity"
            )
            (
                orders.write.mode("overwrite")
                .bucketBy(4, "o_orderkey")
                .sortBy("o_orderkey")
                .option("path", d + "/orders_b")
                .saveAsTable("orders_b")
            )
            (
                lineitem.write.mode("overwrite")
                .bucketBy(4, "l_orderkey")
                .sortBy("l_orderkey")
                .option("path", d + "/lineitem_b")
                .saveAsTable("lineitem_b")
            )
            joined = spark.table("orders_b").join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and it still computes the right thing
            expect = orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            ).count()
            assert joined.count() == expect
        finally:
            spark.sql("DROP TABLE IF EXISTS orders_b")
            spark.sql("DROP TABLE IF EXISTS lineitem_b")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
