"""Operator unit tests — mirror the reference's component-socket test style
(SURVEY.md §5: exact-count assertions over combinatorial fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.operators import graph, keyed, topk
from qcfractal_spark.operators.dataset import missing_cells
from qcfractal_spark.plans import apply_projection, keyset_page


def test_bulk_get_ordered_preserves_input_order_with_gaps(spark):
    table = spark.createDataFrame([(1, "a"), (2, "b"), (5, "e")], "id long, v string")
    out = keyed.bulk_get_ordered(spark, table, [5, 99, 1], id_col="id").collect()
    assert [r["_input_idx"] for r in out] == [0, 1, 2]
    assert [r["v"] for r in out] == ["e", None, "a"]
    # missing_ok=False drops the gap (reference raises; set semantics here)
    strict = keyed.bulk_get_ordered(spark, table, [5, 99, 1], id_col="id", missing_ok=False)
    assert [r["id"] for r in strict.collect()] == [5, 1]


def test_insert_dedup_classify(spark):
    table = spark.createDataFrame([("x", 1), ("y", 2)], "k string, v int")
    batch = spark.createDataFrame(
        [("x", 10), ("z", 30), ("z", 31)], "k string, v int"
    )
    to_insert, classified = keyed.insert_dedup_classify(table, batch, ["k"])
    assert [r["k"] for r in to_insert.collect()] == ["z"]  # deduped, missing only
    flags = {(r["k"], r["v"]): r["_existing"] for r in classified.collect()}
    assert flags[("x", 10)] is True
    assert flags[("z", 30)] is False and flags[("z", 31)] is False


def test_upsert_classify(spark):
    table = spark.createDataFrame([(1,), (2,)], "id long")
    batch = spark.createDataFrame([(2,), (3,)], "id long")
    out = {r["id"]: r["_inserted"] for r in keyed.upsert_classify(table, batch, ["id"]).collect()}
    assert out == {2: False, 3: True}


def test_projection_include_exclude_wildcards(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, v double")
    assert apply_projection(df, include=["id", "v"]).columns == ["id", "v"]
    assert apply_projection(df, include=["*"], exclude=["name"]).columns == ["id", "v"]
    assert apply_projection(df, exclude=["v"]).columns == ["id", "name"]


def test_keyset_pagination_pages_are_disjoint_and_ordered(spark):
    df = spark.range(1, 101).withColumnRenamed("id", "rid")
    page1 = [r["rid"] for r in keyset_page(df, "rid", None, 10).collect()]
    assert page1 == list(range(100, 90, -1))
    page2 = [r["rid"] for r in keyset_page(df, "rid", page1[-1], 10).collect()]
    assert page2 == list(range(90, 80, -1))


def test_priority_claim_topk_eligibility_and_order(spark):
    from datetime import datetime

    rows = [
        # id, record_id, tag, priority, sort_date, available, required_programs
        (1, 11, "t1", 2, datetime(2024, 1, 1), True, ["p1"]),
        (2, 12, "t1", 2, datetime(2024, 1, 2), True, ["p1"]),
        (3, 13, "t1", 1, datetime(2024, 1, 1), True, ["p1"]),
        (4, 14, "t1", 9, datetime(2024, 1, 1), True, ["p1", "px"]),  # px missing
        (5, 15, "t1", 9, datetime(2024, 1, 1), False, ["p1"]),  # unavailable
        (6, 16, "t2", 5, datetime(2024, 1, 1), True, ["p1"]),  # other tag
    ]
    tasks = spark.createDataFrame(
        rows,
        "id long, record_id long, compute_tag string, compute_priority int, "
        "sort_date timestamp, available boolean, required_programs array<string>",
    )
    got = topk.priority_claim_topk(
        tasks, 2, tags=["t1"], available_programs=["p1", "p2"]
    )
    assert [r["id"] for r in got.orderBy("id").collect()] == [1, 2]
    # '*' tag claims across tags; per-tag top-k
    star = topk.priority_claim_topk(tasks, 1, tags=["*"], available_programs=["p1"])
    assert {r["id"] for r in star.collect()} == {1, 6}


def test_closure_descendants_ancestors_relatives_with_cycle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10)],  # chain + 2-cycle
        "parent_id long, child_id long",
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    desc = {r["id"] for r in graph.descendants(seeds, edges).collect()}
    assert desc == {2, 3, 4}
    anc = {r["id"] for r in graph.ancestors(spark.createDataFrame([(4,)], "id long"), edges).collect()}
    assert anc == {1, 2, 3}
    # cycle terminates; relatives of 10 = {10, 11}
    rel = {r["id"] for r in graph.relatives(spark.createDataFrame([(10,)], "id long"), edges).collect()}
    assert rel == {10, 11}
    # depth limit
    d1 = {r["id"] for r in graph.descendants(seeds, edges, max_depth=1).collect()}
    assert d1 == {2}


def test_one_hop_children_and_parents(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "parent_id long, child_id long"
    )
    seeds = spark.createDataFrame([(1,), (1,), (99,)], "id long")  # dup + missing
    kids = {
        (r["parent_id"], r["child_id"])
        for r in graph.one_hop_children(seeds, edges).collect()
    }
    assert kids == {(1, 2), (1, 3)}
    par = {
        (r["parent_id"], r["child_id"])
        for r in graph.one_hop_parents(
            spark.createDataFrame([(4,)], "id long"), edges
        ).collect()
    }
    assert par == {(2, 4), (3, 4)}


def test_closure_one_job_per_level(spark):
    """The BFS loop must cost ONE driver job per level (lazy localCheckpoint
    materialized by the fixpoint count), not two (eager checkpoint job +
    count job).  Measured on this 6-hop chain with AQE off: lazy = 23 jobs,
    the old eager form = 31; the bound sits between them so an eager
    regression fails loudly while broadcast-job jitter doesn't."""
    sc = spark.sparkContext
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 7)], "parent_id long, child_id long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        sc.setJobGroup("closure-jobcount", "one job per BFS level")
        out = graph.descendants(seeds, edges)
        assert {r["id"] for r in out.collect()} == {2, 3, 4, 5, 6, 7}
        jobs = len(sc.statusTracker().getJobIdsForGroup("closure-jobcount"))
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert jobs <= 27, f"closure spent {jobs} driver jobs on a 7-level BFS"


def test_connected_components_chain_cycle_and_separate(spark):
    # component {1,2,3,4} (chain), {10,11} (cycle), {20,21,22} (star on 21)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 10), (21, 20), (21, 22)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["component"] for r in graph.connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_asof_join_backward_tie_break_inclusive_and_null_payload(spark):
    from qcfractal_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(100, 1, 10.0), (101, 1, 20.0), (102, 1, 5.0), (103, 2, 50.0)],
        "event_id long, user_id long, ts double",
    )
    right = spark.createDataFrame(
        # user 1: two rights at ts=10.0 (exact-ts tie with left 100 → inclusive,
        # max event_id wins); event 7 has NULL value (payload must still come
        # from event 7, not fall back to event 6's value)
        [(6, 1, 10.0, 1.5), (7, 1, 10.0, None), (8, 1, 15.0, 3.0)],
        "event_id long, user_id long, ts double, value double",
    )
    out = {
        r["event_id"]: (r["ref_event_id"], r["ref_value"])
        for r in asof_join_backward(
            left, right, "user_id", "ts", "event_id", ("value",)
        ).collect()
    }
    assert out == {
        100: (7, None),   # inclusive exact-ts; tie → max right id; NULL stays
        101: (8, 3.0),    # latest at-or-before 20.0
        102: (None, None),  # no right at-or-before 5.0
        103: (None, None),  # user 2 has no rights at all
    }


def test_interval_join_bucket_boundaries(spark):
    import datetime as dt

    from qcfractal_spark.operators.joins import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, 1, ts(100.0)), (2, 1, ts(850.0)), (3, 2, ts(100.0))],
        "lid long, user_id long, lts timestamp",
    )
    right = spark.createDataFrame(
        # for lid=1 (window (100, 1000]): 100.0 excluded (strict lower),
        # 1000.0 included (inclusive upper), 1000.5 excluded; 950 crosses
        # the 900s bucket boundary — the explode must still find it.
        [
            (10, 1, ts(100.0)),
            (11, 1, ts(950.0)),
            (12, 1, ts(1000.0)),
            (13, 1, ts(1000.5)),
            (14, 2, ts(2000.0)),
        ],
        "rid long, user_id long, rts timestamp",
    )
    out = interval_join(
        left, right, "user_id", "lts", "rts", lower_s=0.0, upper_s=900.0
    )
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    assert pairs == {(1, 11), (1, 12), (2, 11), (2, 12), (2, 13)}


def test_missing_cells(spark):
    entries = spark.createDataFrame([("e1",), ("e2",)], "entry_name string")
    specs = spark.createDataFrame([("s1",), ("s2",)], "specification_name string")
    items = spark.createDataFrame(
        [("e1", "s1"), ("e2", "s2")], "entry_name string, specification_name string"
    )
    missing = {
        (r["entry_name"], r["specification_name"])
        for r in missing_cells(entries, specs, items).collect()
    }
    assert missing == {("e1", "s2"), ("e2", "s1")}


def test_compile_values_pivot_and_properties_df(spark):
    from qcfractal_spark.operators.pivot import (
        compile_values_pivot,
        drop_all_null_columns,
        properties_df,
    )

    long_df = spark.createDataFrame(
        [
            ("e1", "s1", {"energy": 1.0, "grad": 0.1}),
            ("e1", "s2", {"energy": 2.0}),
            ("e2", "s1", {"energy": 3.0}),
        ],
        "entry string, spec string, props map<string,double>",
    )
    mat = compile_values_pivot(
        long_df, "entry", "spec", F.element_at("props", "energy"), spec_values=["s1", "s2"]
    )
    rows = {r["entry"]: (r["s1"], r["s2"]) for r in mat.collect()}
    assert rows == {"e1": (1.0, 2.0), "e2": (3.0, None)}

    props = properties_df(long_df, "entry", "spec", "props", ["energy", "grad"], ["s1", "s2"])
    cols = set(props.columns)
    assert cols == {"entry", "s1_energy", "s2_energy", "s1_grad", "s2_grad"}
    cleaned = drop_all_null_columns(props, keep=["entry"])
    assert "s2_grad" not in cleaned.columns  # all-null column dropped
    assert "s1_grad" in cleaned.columns


def test_argmin_tie_break(spark):
    from qcfractal_spark.operators.aggregates import argmin_per_group

    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 5.0), (1, 12, 7.0), (2, 20, 1.0)],
        "g long, id long, e double",
    )
    got = {
        r["g"]: r["id"]
        for r in argmin_per_group(df, ["g"], [F.col("e").asc(), F.col("id").asc()]).collect()
    }
    assert got == {1: 10, 2: 20}  # ties break to lowest id (DISTINCT ON order)


def test_cc_driver_fast_path_matches_distributed(spark):
    """connected_components with a known small edge count takes the exact
    driver union-find arm; its labels must equal the distributed
    label-propagation arm's on the same graph (chain + cycle + star +
    isolated pair)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
         (20, 21), (20, 22), (20, 23), (30, 31)],
        "src long, dst long",
    )
    fast = {
        (r["id"], r["component"])
        for r in graph.connected_components(edges, approx_edges=10).collect()
    }
    dist = {
        (r["id"], r["component"])
        for r in graph.connected_components(edges).collect()
    }
    assert fast == dist
    assert (4, 1) in fast and (12, 10) in fast and (23, 20) in fast


def test_insert_dedup_null_keys_match_null_keys(spark):
    """dropDuplicates treats NULL keys as equal; the existence checks must
    agree: a NULL-keyed batch row matching a NULL-keyed table row is
    EXISTING, not re-inserted on every call."""
    table = spark.createDataFrame([(None, 1), ("x", 2)], "k string, v int")
    batch = spark.createDataFrame([(None, 10), ("y", 20)], "k string, v int")
    to_insert, classified = keyed.insert_dedup_classify(table, batch, ["k"])
    assert [r["k"] for r in to_insert.collect()] == ["y"]
    flags = {r["k"]: r["_existing"] for r in classified.collect()}
    assert flags[None] is True and flags["y"] is False
    up = {r["k"]: r["_inserted"] for r in keyed.upsert_classify(table, batch, ["k"]).collect()}
    assert up[None] is False and up["y"] is True


def test_bulk_get_ordered_string_keys(spark):
    table = spark.createDataFrame(
        [("ab", 1), ("cd", 2)], "hash string, v int"
    )
    out = keyed.bulk_get_ordered(spark, table, ["cd", "zz", "ab"], id_col="hash")
    assert [r["v"] for r in out.collect()] == [2, None, 1]


def test_group_map_agg_duplicate_keys_keep_max(spark):
    from qcfractal_spark.operators.aggregates import group_map_agg

    df = spark.createDataFrame(
        [(1, "k", 2.0), (1, "k", 5.0), (1, "j", 1.0)], "g long, key string, v double"
    )
    out = group_map_agg(df, ["g"], "key", "v").collect()[0]["group_map"]
    assert out == {"k": 5.0, "j": 1.0}


def test_query_filters_none_bounds_skipped(spark):
    from qcfractal_spark.plans import QueryFilters, apply_filters

    df = spark.range(1, 6).withColumnRenamed("id", "rid")
    f = QueryFilters(before={"rid": None}, after={"rid": None}, id_col="rid")
    assert apply_filters(df, f).count() == 5


def test_semi_join_values_null_tuples_match_null_rows(spark):
    from qcfractal_spark.operators.joins import semi_join_values

    df = spark.createDataFrame(
        [("hf", None, 1), ("hf", "dz", 2), ("b3lyp", None, 3)],
        "method string, basis string, id long",
    )
    out = semi_join_values(spark, df, ["method", "basis"], [("hf", None)])
    assert [r["id"] for r in out.collect()] == [1]
    # mixed int/float position promotes to double instead of crashing
    df2 = spark.createDataFrame([(1.0, 1), (2.5, 2)], "q double, id long")
    got = {r["id"] for r in semi_join_values(spark, df2, ["q"], [(1,), (2.5,)]).collect()}
    assert got == {1, 2}


def test_asof_join_null_keys_get_no_match(spark):
    from qcfractal_spark.operators.joins import asof_join_backward

    left = spark.createDataFrame(
        [(1, None, 10.0), (2, 7, 10.0)], "event_id long, user_id long, ts double"
    )
    right = spark.createDataFrame(
        [(91, None, 5.0, 1.0), (92, 7, 5.0, 2.0)],
        "event_id long, user_id long, ts double, value double",
    )
    out = {
        r["event_id"]: r["ref_event_id"]
        for r in asof_join_backward(
            left, right, key_col="user_id", ts_col="ts",
            right_id_col="event_id", payload_cols=("value",),
        ).collect()
    }
    assert out == {1: None, 2: 92}  # NULL key never equi-matches


def test_projection_star_means_defaults(spark):
    from qcfractal_spark.plans import apply_projection

    df = spark.createDataFrame([(1, "a", 2.0, b"x")], "id long, name string, v double, blob binary")
    out = apply_projection(df, include=["*"], default_cols=["id", "name"])
    assert out.columns == ["id", "name"]  # '*' = defaults, payload deferred
    out2 = apply_projection(df, include=["*", "v"], default_cols=["id", "name"])
    assert out2.columns == ["id", "name", "v"]
    out3 = apply_projection(df, include=["**"], default_cols=["id", "name"])
    assert out3.columns == ["id", "name", "v", "blob"]


def test_descendants_keeps_seed_reachable_from_another_seed(spark):
    """include_self=False must drop only UNREACHED seeds: a seed that is a
    genuine descendant of another seed (or of itself via a cycle) stays."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 10)], "parent_id long, child_id long"
    )
    seeds = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r["id"] for r in graph.descendants(seeds, edges).collect()}
    assert got == {2, 3}  # 2 is seed AND child of seed 1; 1 unreached
    cyc = {r["id"] for r in graph.descendants(
        spark.createDataFrame([(10,)], "id long"), edges).collect()}
    assert cyc == {10, 11}  # 10 reaches itself through the cycle


def test_descendants_seed_rescue_respects_max_depth(spark):
    """A seed whose only >=1-hop path arrives BEYOND max_depth must be
    dropped under include_self=False: with edges A->X->B and seeds {A, B},
    B is reachable only at depth 2, so max_depth=1 returns just {X}
    (ADVICE r5: reached_targets must come from members at depth < bound)."""
    edges = spark.createDataFrame([(1, 5), (5, 2)], "parent_id long, child_id long")
    seeds = spark.createDataFrame([(1,), (2,)], "id long")
    d1 = {r["id"] for r in graph.descendants(seeds, edges, max_depth=1).collect()}
    assert d1 == {5}  # B (=2) is 2 hops away; must not be rescued
    d2 = {r["id"] for r in graph.descendants(seeds, edges, max_depth=2).collect()}
    assert d2 == {5, 2}  # at depth 2 the seed-to-seed path is in bound
    # seed-to-seed 1-hop edge stays in bound at max_depth=1
    e2 = spark.createDataFrame([(1, 2)], "parent_id long, child_id long")
    assert {r["id"] for r in graph.descendants(seeds, e2, max_depth=1).collect()} == {2}
    # ancestors mirror: B<-X<-A with seeds {A, B}, bound 1 keeps only X
    a1 = {r["id"] for r in graph.ancestors(
        spark.createDataFrame([(2,), (1,)], "id long"), edges, max_depth=1).collect()}
    assert a1 == {5}


def test_descendants_include_self_with_depth_bound(spark):
    """include_self=True returns seeds + closure truncated at max_depth,
    with the internal depth column never leaking into the public schema."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "parent_id long, child_id long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    out = graph.descendants(seeds, edges, max_depth=2, include_self=True)
    assert out.columns == ["id"]
    assert {r["id"] for r in out.collect()} == {1, 2, 3}
    rel = graph.relatives(spark.createDataFrame([(3,)], "id long"), edges)
    assert rel.columns == ["id"]
    assert {r["id"] for r in rel.collect()} == {1, 2, 3, 4}


def test_snapshot_diff_classifies_all_four_states(spark):
    from qcfractal_spark.operators.dataset import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {
        r["k"]: r["diff_status"]
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert out == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"
    }


def test_snapshot_diff_null_vs_literal_null_string(spark):
    from qcfractal_spark.operators.dataset import snapshot_diff

    # A NULL and the literal string 'NULL' must NOT hash equal (the
    # length-prefix tagging), nor concatenation-straddling values.
    old = spark.createDataFrame([(1, None, "ab"), (2, "x", "y")],
                                "k long, a string, b string")
    new = spark.createDataFrame([(1, "NULL", "ab"), (2, "xy", "")],
                                "k long, a string, b string")
    out = {
        r["k"]: r["diff_status"]
        for r in snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert out == {1: "changed", 2: "changed"}


def test_sliding_window_layout_covers_every_token(spark):
    from qcfractal_spark.functions.packing import sliding_window_layout

    df = spark.createDataFrame(
        [(1, 300), (2, 128), (3, 64), (4, 1), (5, 0)],
        "id long, n long",
    )
    rows = sliding_window_layout(
        df, token_col="n", id_col="id", window=128, stride=64
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 5 (n=0) emits nothing
    assert 5 not in by_doc
    # n=300: starts 0,64,128,192,256 -> lens 128,128,128,108,44
    w1 = sorted(by_doc[1], key=lambda r: r["win_idx"])
    assert [r["win_start"] for r in w1] == [0, 64, 128, 192, 256]
    assert [r["win_len"] for r in w1] == [128, 128, 128, 108, 44]
    # n=128: starts 0,64 (last window short) — every token covered
    w2 = sorted(by_doc[2], key=lambda r: r["win_idx"])
    assert [(r["win_start"], r["win_len"]) for r in w2] == [(0, 128), (64, 64)]
    # n=64 and n=1: single window
    assert [(r["win_start"], r["win_len"]) for r in by_doc[3]] == [(0, 64)]
    assert [(r["win_start"], r["win_len"]) for r in by_doc[4]] == [(0, 1)]
    # coverage invariant: max(start+len) == n for every doc
    for doc, rs in by_doc.items():
        n = {1: 300, 2: 128, 3: 64, 4: 1}[doc]
        assert max(r["win_start"] + r["win_len"] for r in rs) == n
        assert min(r["win_start"] for r in rs) == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sliding_window_layout(df, token_col="n", id_col="id", stride=0)


def test_sliding_window_rejects_stride_over_window(spark):
    from qcfractal_spark.functions.packing import sliding_window_layout

    df = spark.createDataFrame([(1, 10)], "id long, n long")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stride must be <= window"):
        sliding_window_layout(df, token_col="n", id_col="id",
                              window=64, stride=65)


def test_pagerank_mass_and_ordering(spark):
    from qcfractal_spark.operators.graph import pagerank

    # star: hub 1 -> {2,3,4}; chain: 2 -> 5.  5 receives from a
    # single-out-degree node, {3,4} split the hub's mass with 2.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 5)], "s long, d long"
    )
    out = {r["id"]: r["pagerank"] for r in pagerank(edges, "s", "d").collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # source-only node keeps just the teleport share
    assert out[1] == min(out.values())
    assert out[2] == out[3] == out[4]  # equal shares of the hub's mass
    # 2 feeds 5: 5's rank reflects 2's full out-mass, so 5 > 3
    assert out[5] > out[3]
    # all ranks positive and bounded by 1
    assert all(0 < v < 1 for v in out.values())
    # deterministic across runs
    again = {r["id"]: r["pagerank"] for r in pagerank(edges, "s", "d").collect()}
    assert out == again
