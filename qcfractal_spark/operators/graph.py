"""Record-graph traversal: iterative closure over a parent/child edges table.

The reference materializes 1-hop edges as UNION views
(qcfractal/qcfractal/components/record_db_views.py:30-55) and computes
unbounded-depth closure by batched 1-hop joins iterated to a fixpoint in
Python with a visited set (components/record_socket.py:150-236).

Spark-first: the edges live in one normalized ``(parent_id, child_id)``
table (written at ingest — SURVEY §4 notes the materialized table beats
re-unioning per query).  Closure is the same BFS fixpoint, but each hop is a
distributed join; we localCheckpoint periodically to cut lineage growth
(hard part #3), and the visited set stays a DataFrame (never collected) so
the traversal scales to graphs that don't fit on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Frontiers smaller than this get a broadcast hint, turning every hop into a
# map-side join against the (cached) edges scan — no edge shuffle at all.
_BROADCAST_FRONTIER_ROWS = 2_000_000


def _closure(
    seeds: DataFrame, edges: DataFrame, from_col: str, to_col: str, max_depth: int | None
) -> DataFrame:
    """BFS from ``seeds`` (single column ``id``) along edges from→to.

    Per level: materialize the new frontier once (localCheckpoint) so the
    emptiness test, the union, and the next hop all reuse it instead of
    re-running the join; broadcast the frontier while it is small; cache the
    edges table across hops.  Lineage is cut every level, so depth can be
    unbounded without plan blowup (SURVEY §7 hard part #3)."""
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    # Lazy localCheckpoint + count = ONE job that both materializes the
    # checkpoint blocks and returns the row count (eager=True would launch
    # a materialization job and then a second count job per level — two
    # driver round trips where one suffices; VERDICT r4 item 7).
    # ``depth`` is the BFS level a node was FIRST reached at (0 for seeds)
    # — min-depth by construction, since visited nodes are never re-added.
    # _drop_unreached_seeds needs it to honor max_depth (ADVICE r5).
    visited = (
        seeds.select(F.col("id"))
        .dropDuplicates(["id"])
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=False)
    )
    frontier = visited
    visited_rows = visited.count()
    frontier_rows = visited_rows
    depth = 0
    try:
        while True:
            depth += 1
            if max_depth is not None and depth > max_depth:
                break
            probe = (
                F.broadcast(frontier)
                if frontier_rows < _BROADCAST_FRONTIER_ROWS
                else frontier
            )
            step = (
                probe.join(edges, probe["id"] == edges[from_col], "inner")
                .select(F.col(to_col).alias("id"))
                .dropDuplicates(["id"])
                .withColumn("depth", F.lit(depth))
            )
            # Anti-join against visited; broadcast the visited side while its
            # (exactly tracked) row count is small so the step needs no extra
            # shuffle beyond its own dedup.
            vis = (
                F.broadcast(visited)
                if visited_rows < _BROADCAST_FRONTIER_ROWS
                else visited
            )
            new = step.join(vis, on="id", how="left_anti").localCheckpoint(eager=False)
            # Fixpoint test + checkpoint materialization in one job per
            # level, same loop as the reference's "while to_visit"
            # (record_socket.py:210-236).
            frontier_rows = new.count()
            if frontier_rows == 0:
                break
            # visited = union of already-checkpointed frontiers: no
            # re-materialization job per level; the plan grows by one leaf
            # per level, flattened every 8 levels to bound analysis cost.
            visited = visited.unionByName(new)
            visited_rows += frontier_rows
            if depth % 8 == 0:
                visited = visited.localCheckpoint(eager=True)
            frontier = new
    finally:
        edges.unpersist()
    return visited


def _drop_unreached_seeds(
    closure: DataFrame,
    seeds: DataFrame,
    edges: DataFrame,
    from_col: str,
    to_col: str,
    max_depth: int | None,
) -> DataFrame:
    """include_self=False semantics: remove seeds NOT reachable via >= 1
    hop *within the depth bound* — not every seed.  A seed that is a
    genuine descendant of another seed (edges A->B with seeds {A, B}), or
    of itself through a cycle, stays in the result; a blanket anti-join
    removed those too.  A seed is hop-reachable within the bound iff some
    closure member at min-depth < max_depth has an edge to it: that member
    reaches the seed in depth+1 <= max_depth hops, and conversely any
    qualifying path's final predecessor sits at min-depth <= max_depth-1.
    Edges out of members at exactly max_depth land BEYOND the bound and
    must not rescue a seed (ADVICE r5)."""
    dedup_seeds = seeds.select("id").dropDuplicates(["id"])
    sources = (
        closure if max_depth is None else closure.where(F.col("depth") < max_depth)
    )
    reached_targets = edges.join(
        sources.withColumnRenamed("id", from_col).select(from_col),
        on=from_col,
        how="left_semi",
    ).select(F.col(to_col).alias("id"))
    reachable_seeds = dedup_seeds.join(reached_targets, on="id", how="left_semi")
    out = closure.select("id")
    return out.join(dedup_seeds, on="id", how="left_anti").unionByName(reachable_seeds)


def descendants(
    seeds: DataFrame, edges: DataFrame, max_depth: int | None = None, include_self: bool = False
) -> DataFrame:
    """All transitive children of ``seeds`` (record_socket.py:150-162)."""
    closure = _closure(seeds, edges, "parent_id", "child_id", max_depth)
    if include_self:
        return closure.select("id")
    return _drop_unreached_seeds(closure, seeds, edges, "parent_id", "child_id", max_depth)


def ancestors(
    seeds: DataFrame, edges: DataFrame, max_depth: int | None = None, include_self: bool = False
) -> DataFrame:
    """All transitive parents of ``seeds`` (record_socket.py:195-208)."""
    closure = _closure(seeds, edges, "child_id", "parent_id", max_depth)
    if include_self:
        return closure.select("id")
    return _drop_unreached_seeds(closure, seeds, edges, "child_id", "parent_id", max_depth)


def one_hop_children(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """Direct (1-hop) children of ``seeds`` as (parent_id, child_id) pairs —
    the reference's ``parent_id`` record-query filter, which joins the
    direct-children view and keeps rows whose parent is in the id list
    (record_socket.py:305-308, record_db_views.py:30-43).

    One left-semi join of the edges table against the seed set; the seeds
    are broadcast while small (the common case — an explicit id list), so
    the edges scan never shuffles."""
    probe = seeds.select(F.col("id").alias("parent_id")).dropDuplicates(["parent_id"])
    return edges.join(F.broadcast(probe), on="parent_id", how="left_semi")


def one_hop_parents(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """Direct (1-hop) parents of ``seeds`` — the ``child_id`` filter arm
    (record_socket.py:310-314).  Same broadcast-semi-join physics."""
    probe = seeds.select(F.col("id").alias("child_id")).dropDuplicates(["child_id"])
    return edges.join(F.broadcast(probe), on="child_id", how="left_semi")


def relatives(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """Fixpoint over both directions — the reference's "all relatives"
    loop (record_socket.py:210-236): alternate parent/child expansion until
    no new ids appear."""
    undirected = edges.select(
        F.col("parent_id").alias("a"), F.col("child_id").alias("b")
    ).unionByName(edges.select(F.col("child_id").alias("a"), F.col("parent_id").alias("b")))
    return _closure(seeds, undirected, "a", "b", None).select("id")


# Target undirected-edge rows per CC partition: ~2M (long,long) pairs is
# ~32 MB shuffled — comfortably in-memory per task at any scale.
_CC_ROWS_PER_PARTITION = 2_000_000

# Edge-count ceiling for the exact driver-side union-find fast path.
# Re-derived from measurement in r16 (tools/cc_crossover.py; VERDICT r15
# item 8): on near-dup-shaped graphs (dense candidate clusters + a long
# chain for adversarial diameter) the driver arm wins at EVERY swept size —
# 500k edges 1.4 s vs 17.3 s distributed, 2M edges 6.6 s vs 65.3 s, and
# even 8M edges 10.7 s vs 70.0 s (best-of-3, same session, arms
# interleaved, identical labels at every point) — so wall time never
# crosses below 8M edges and the binding constraint is DRIVER MEMORY, not
# time.  Footprint is Python-side: the Arrow toPandas transfer is
# ~16 B/edge, but the union-find parent dict boxes ints (~80-100 B/entry);
# measured worst case (every edge introducing two fresh nodes) is 334 MB
# peak RSS at 2M edges / 4M nodes.  2M keeps that comfortably inside a
# default driver heap's headroom; 4M+ would cross ~0.7 GB, which is no
# longer "free" on a shared driver.
_CC_DRIVER_SOLVE_EDGES = 2_000_000


def _driver_union_find(spark, und: DataFrame) -> DataFrame:
    """Exact small-graph arm of :func:`connected_components`: collect the
    (bounded) edge list, union-find with path compression + union-by-min,
    return the same ``(id, component)`` relation the distributed loop
    yields — every node labeled with its component's minimum node id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Arrow-batched toPandas (not collect): 2 long columns transfer as
    # ~16 B/edge instead of materializing per-row Row objects.
    pdf = und.toPandas()
    for a, b in zip(pdf["src"], pdf["dst"]):
        a = None if a is None or a != a else int(a)
        b = None if b is None or b != b else int(b)
        if a is None or b is None:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: the smaller root stays root, preserving the
            # "component = min node id" label the distributed loop produces
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    labels = sorted((node, find(node)) for node in parent)
    # local_df (Arrow → LocalTableScan), NOT createDataFrame(list): the
    # pickled-RDD path re-paid ~32 Python-worker round trips every time a
    # downstream action re-scanned the labels (guide §4).  Measured on
    # pipe_prepare: cc+final 0.8–1.1 s → 0.24–0.33 s, and the final join
    # became a BroadcastHashJoin over the LocalTableScan.
    from ..session import local_df

    return local_df(spark, labels, "id long, component long")


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    approx_edges: int | None = None,
) -> DataFrame:
    """Connected components by min-label propagation: every node ends up
    labeled with the smallest node id in its component.

    Each iteration is one join (labels onto edge endpoints) + one min-agg +
    one pointer-jumping self-join (label <- label-of-label, the path
    compression of union-find) — all shuffle on the node id, so the same
    partitioning is reused across iterations.  Convergence is detected by
    the monotone invariant sum(label) — strictly decreasing until the
    fixpoint — which costs one tiny aggregate per round instead of a
    change-count join.  With compression each round halves the remaining
    label-path length, so rounds grow ~log2(component diameter) rather than
    linearly (measured: 10 -> 7 rounds on the sf0.1 near-dup graph, whose
    diameter is small; the gap widens with chain length) — the property that
    keeps adversarial long-chain graphs tractable at 100 TB, where each
    round is a serial full-shuffle stage.

    ``approx_edges`` (the edge count, which callers that materialize the
    pair table first have for free) sizes the loop's partitioning:
    ~2M undirected rows per partition, floored at defaultParallelism/4.
    The rounds are serial, so per-round task overhead multiplies by the
    iteration count — a 5k-edge graph over 32 partitions pays 8x32 nearly
    empty tasks per shuffle, while a 10^11-edge graph gets the tens of
    thousands of partitions it needs.  Unset, the session's shuffle
    partitioning applies.

    Returns ``(id, component)`` for every node appearing in ``edges``;
    callers left-join and coalesce to assign singletons their own id.

    Scale-adaptive strategy: when the (known) edge count fits trivially on
    the driver (≤ ``_CC_DRIVER_SOLVE_EDGES`` — threshold re-derived from a
    measured crossover sweep, see the constant's comment and SCALE.md),
    the component problem is solved exactly with one collect + union-find —
    O(E α(E)), no iterative shuffle rounds at all.  The distributed
    label-propagation loop below is the ≥driver-scale path; running its
    serial rounds (each a full scheduling + shuffle cycle) on a 5k-edge
    graph costs ~3 s where union-find costs ~0.1 s.  This is the same
    runtime-adaptive physics AQE applies to join strategy, applied to an
    iterative algorithm; the cutover needs an edge count, so it only
    engages when callers pass ``approx_edges`` (callers that materialize
    the pair table first have it for free).
    """
    # NULL-endpoint edges are dropped BEFORE the strategy branch so both
    # arms see the same relation (a node appearing only with NULL partners
    # is a singleton, which callers already handle by coalescing absent
    # labels to the node's own id).  Without the shared filter the two
    # arms disagreed: the distributed groupBy registered the non-null
    # endpoint while the driver arm skipped the row.
    und = edges.select(
        F.col(src_col).cast("long").alias("src"), F.col(dst_col).cast("long").alias("dst")
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if approx_edges is not None and approx_edges <= _CC_DRIVER_SOLVE_EDGES:
        return _driver_union_find(edges.sparkSession, und)
    und = und.unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # Pre-partition the (persisted) edge table by the probe key: every
    # round's labels join then reuses the cached exchange instead of
    # re-shuffling the edges — one shuffle per round, on the labels side
    # only.
    if approx_edges is not None:
        floor = max(1, edges.sparkSession.sparkContext.defaultParallelism // 4)
        n_parts = max(floor, (2 * approx_edges) // _CC_ROWS_PER_PARTITION + 1)
        part_cols = [n_parts, "dst"]
    else:
        part_cols = ["dst"]
    und = (
        und.dropDuplicates(["src", "dst"])
        .repartition(*part_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Initial labels already fold in the first propagation round: a node's
    # neighbors start labeled with their own ids, so round 1's output is
    # exactly min(self, min neighbor) — one map-combinable agg, no join.
    labels = (
        und.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select("id", F.least(F.col("id"), F.col("_mn")).alias("component"))
        # Lazy checkpoint: the convergence agg below materializes the
        # blocks in the same job (one driver round trip per round).
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    try:
        for _ in range(max_iter):
            # One round = min over {self label} ∪ {labels of neighbors}.
            # Expressing the self term as a union branch (instead of a
            # second left join back onto labels) keeps each round at two
            # shuffles: the edge-probe join and the min-agg; both are
            # map-side combinable and keyed on the node id.
            nbr = und.join(labels, und["dst"] == labels["id"], "inner").select(
                F.col("src").alias("id"), "component"
            )
            cand = (
                labels.unionByName(nbr)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
            # Pointer jumping: replace each label with that label-node's own
            # (possibly smaller) label.  Labels only ever decrease, so the
            # monotone sum(label) convergence test stays valid; every label
            # is a node id present in cand, the left join is belt-and-braces.
            jump = cand.select(
                F.col("id").alias("component"), F.col("component").alias("_jump")
            )
            labels = (
                cand.join(jump, on="component", how="left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("_jump", F.col("component"))
                    ).alias("component"),
                )
                .localCheckpoint(eager=False)
            )
            cur_sum = labels.agg(F.sum("component")).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    finally:
        und.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the iterative
    numeric sibling of :func:`connected_components` (which converges a
    label; this converges a score).  Reference parallel: the closure walks
    of record_socket.py generalize to "importance over the record DAG".

    Engine-portable float discipline: every iteration ROUNDS the
    per-edge contribution to 9 dp and sums it as ``decimal(28,12)`` —
    order-independent — then rounds the damped update to 9 dp, so N
    iterations produce bit-identical ranks in any engine (the oracle
    unrolls the same N steps as chained CTEs).  Dangling-node mass is
    dropped (not redistributed) in both, the common simplification.

    100 TB story: per iteration ONE equi-join of ranks onto the
    out-degree-annotated edges (both keyed on the source — co-partitioned
    after the first shuffle) and ONE map-combinable sum keyed by
    destination.  Lineage is cut with a lazy localCheckpoint whose
    materializing count doubles as the driver's progress check, exactly
    the j8 loop contract; iterations are inherently serial, work per
    iteration is linear in edges.
    """
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .dropDuplicates(["id"])
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    ed = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("_dst"))
        .join(deg, "id")
        .localCheckpoint(eager=True)
    )
    # JVM HALF_UP round (matches SQL ROUND on doubles; Python's banker's
    # round would diverge on exact .5 boundaries)
    ranks = nodes.withColumn("pagerank", F.round(F.lit(1.0 / n), 9))
    for _ in range(iterations):
        contrib = (
            ranks.join(ed, "id")
            .select(
                F.col("_dst").alias("id"),
                F.round(F.col("pagerank") / F.col("_deg"), 9)
                .cast("decimal(28,12)")
                .alias("_c"),
            )
            .groupBy("id")
            .agg(F.sum("_c").cast("double").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0)),
                    9,
                ).alias("pagerank"),
            )
            .localCheckpoint(eager=False)
        )
        ranks.count()  # materialize + cut lineage, one job per iteration
    return ranks
