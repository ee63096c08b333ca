"""Measure the driver-union-find vs distributed-CC crossover (VERDICT r15
item 8 / OPTIMIZATION_r15 "not yet optimized" item 5).

`connected_components` picks the exact driver-side union-find when the
caller-supplied edge count is <= `_CC_DRIVER_SOLVE_EDGES`; that threshold
(500k) was derived from driver-footprint math, not a measurement.  This
sweep times BOTH arms on the same synthetic edge tables across edge counts
bracketing the threshold, at the graph shape the engine actually feeds CC
(near-dup candidate graphs: dense small components + one long chain so the
distributed loop pays a realistic round count), and prints a table from
which the threshold is re-derived.

Method (guide §1): same session, noop-equivalent force (the labels frame is
materialized by an agg over every row), best-of-N per (arm, size), arms
interleaved so neither soaks up a systematically warmer JVM.  Edge tables
are materialized to parquet in the scratch base first so BOTH arms read the
same on-disk relation and the generation cost is outside the timed region.

Usage: python tools/cc_crossover.py [edge_counts...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qcfractal_spark import session as qsession
from qcfractal_spark.operators import graph
from qcfractal_spark.session import build_session


def make_edges(spark, n_edges: int):
    """Deterministic near-dup-shaped graph: 90% of edges form dense
    clusters (avg ~8 edges per 5-node component: star + extras, like LSH
    candidate buckets), 10% form one long chain (the adversarial diameter
    the pointer-jumping loop exists for)."""
    n_cluster = int(n_edges * 0.9)
    n_chain = n_edges - n_cluster
    # cluster edges: component c = ids [5c, 5c+5); edge i links two
    # deterministic members of component (i // 8)
    cl = spark.range(n_cluster).select(
        (F.col("id") / 8).cast("long").alias("c"), F.col("id").alias("i")
    ).select(
        (F.col("c") * 5 + F.pmod(F.col("i"), F.lit(5))).alias("src"),
        (F.col("c") * 5 + F.pmod(F.col("i") * 3 + 1, F.lit(5))).alias("dst"),
    )
    # chain edges occupy an id range above every cluster node
    base = (n_cluster // 8 + 2) * 5
    ch = spark.range(n_chain).select(
        (F.col("id") + base).alias("src"), (F.col("id") + base + 1).alias("dst")
    )
    return cl.unionByName(ch).where(F.col("src") != F.col("dst"))


def time_cc(spark, path: str, n_edges: int, arm: str) -> float:
    edges = spark.read.parquet(path)
    saved = graph._CC_DRIVER_SOLVE_EDGES
    # Force the arm while still passing the TRUE edge count so the
    # distributed loop's scale-derived partitioning is what production
    # would use at this size.
    graph._CC_DRIVER_SOLVE_EDGES = (1 << 62) if arm == "driver" else -1
    try:
        t0 = time.time()
        labels = graph.connected_components(edges, approx_edges=n_edges)
        # Force every row through an order-insensitive checksum agg: both
        # arms produce (id, component); the checksum also cross-checks the
        # arms' equivalence on every sweep point.
        row = labels.agg(
            F.count("*").alias("n"),
            F.sum(F.col("id") * F.lit(31) + F.col("component")).alias("chk"),
        ).first()
        dt = time.time() - t0
    finally:
        graph._CC_DRIVER_SOLVE_EDGES = saved
    return dt, (row["n"], row["chk"])


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        125_000, 250_000, 500_000, 1_000_000, 2_000_000, 4_000_000, 8_000_000
    ]
    spark = build_session("qcfractal-spark-cc-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(qsession.scratch_base(), f"cc_sweep_{os.getpid()}")
    os.makedirs(base, exist_ok=True)
    results = []
    try:
        for n in sizes:
            path = os.path.join(base, f"edges_{n}")
            make_edges(spark, n).write.mode("overwrite").parquet(path)
            best = {"driver": float("inf"), "dist": float("inf")}
            chks = {}
            for _ in range(3):  # interleave arms, best-of-3
                for arm in ("driver", "dist"):
                    spark.sparkContext.setJobDescription(f"cc {arm} {n}")
                    dt, chk = time_cc(spark, path, n, arm)
                    best[arm] = min(best[arm], dt)
                    chks.setdefault(arm, chk)
            agree = chks["driver"] == chks["dist"]
            results.append((n, best["driver"], best["dist"], agree))
            print(
                f"edges={n:>9,}  driver={best['driver']:7.3f}s  "
                f"distributed={best['dist']:7.3f}s  "
                f"ratio={best['dist']/best['driver']:6.2f}x  "
                f"labels_agree={agree}",
                flush=True,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print("\nsummary (best-of-3, same session, arms interleaved):")
    for n, d, s, agree in results:
        print(f"  {n:>9,}  driver {d:7.3f}  dist {s:7.3f}  {'OK' if agree else 'MISMATCH'}")


if __name__ == "__main__":
    main()
