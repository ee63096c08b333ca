"""r13 spot-decade regression guards: every fact-to-fact pair-generation
join in the dedup/similarity family must SHUFFLE, never broadcast — the
sf10 run proved the planner's scan-sized statistics on checkpointed or
exploded corpus relations mislead it into broadcasting a corpus side
(dd_winnow OOM'd at sf10 on exactly that).  These tests pin the executed
join strategy so a refactor can't silently reopen the hole, and pin the
one deliberate exception (knn_join_bucketed's bounded-probe broadcast
arm)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qcfractal_spark.functions import dedup as dd
from qcfractal_spark.functions import similarity as sim


def _docs(spark, n=64):
    rows = [(i, ("lorem ipsum dolor sit amet " * 8) + f"tail{i % 7}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark, n=64, dim=8):
    rows = [(i, [float((i * 7 + j * 3) % 10) / 10 for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "build",
    [
        pytest.param(
            lambda spark: dd.winnow_pairs(_docs(spark), k=8, w=4, min_common=1),
            id="winnow_pairs",
        ),
        pytest.param(
            lambda spark: dd.minhash_lsh_candidates(
                dd.minhash_signatures(_docs(spark)).localCheckpoint(eager=True)
            ),
            id="minhash_lsh_candidates",
        ),
        pytest.param(
            lambda spark: dd.simhash_candidate_pairs(
                dd.simhash(_docs(spark)).localCheckpoint(eager=True)
            ),
            id="simhash_candidate_pairs",
        ),
        pytest.param(
            lambda spark: sim.embed_neardup_pairs(_vecs(spark), threshold=0.5, dim=8),
            id="embed_neardup_pairs",
        ),
        pytest.param(
            lambda spark: dd.minhash_estimate_pairs(_docs(spark)),
            id="minhash_estimate_pairs",
        ),
    ],
)
def test_pair_generation_joins_never_broadcast(spark, build):
    """The pair join's both sides are the corpus by definition — the plan
    must show a shuffle join (SortMergeJoin) and no BroadcastHashJoin,
    even when the input is a checkpointed relation whose size statistic
    lies.  (Scalar/dim broadcasts elsewhere in these plans would show as
    BroadcastHashJoin too, so the assertion is strict: none at all.)"""
    plan = _plan(build(spark))
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_knn_join_corpus_side_never_builds(spark):
    """Default arm: merge-hinted — no broadcast at all.  broadcast_left
    arm: the bounded probe batch is the ONLY broadcast build side."""
    vecs = _vecs(spark, n=64, dim=8)
    probe = vecs.where(F.col("vec_id") < 4)

    default_plan = _plan(sim.knn_join_bucketed(probe, vecs, k=2, dim=8))
    assert "SortMergeJoin" in default_plan, default_plan
    assert "BroadcastHashJoin" not in default_plan, default_plan

    served_plan = _plan(
        sim.knn_join_bucketed(probe, vecs, k=2, dim=8, broadcast_left=True)
    )
    assert "BuildLeft" in served_plan, served_plan  # the probe side builds
    # results agree between the arms (strategy must not change semantics)
    a = sim.knn_join_bucketed(probe, vecs, k=2, dim=8).collect()
    b = sim.knn_join_bucketed(probe, vecs, k=2, dim=8, broadcast_left=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lev_verify_hydration_never_broadcasts_texts(spark):
    """dd_lev_verify's text hydration joins shuffle on the id keys — the
    corpus text table must never be a broadcast build (r13: the old
    broadcast-the-pairs form pushed the planner into broadcasting the
    full text side of the second join)."""
    from qcfractal_spark.queries import REGISTRY

    df = REGISTRY["dd_lev_verify"][0](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # candidate generation (merge-hinted band join) + both id-keyed
    # hydration joins are SMJ — nothing in this plan may broadcast
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_winnow_hot_fingerprint_cap(spark):
    """max_doc_freq drops boilerplate fingerprints shared by more than f
    docs BEFORE the pair join (the dd_jaccard_capped pattern): a shared
    template paragraph pairs every doc with every other without the cap,
    and only genuinely-similar pairs survive with it."""
    template = "this license header is identical across every document in the corpus "
    rows = [(i, template + f"unique body {i} " * 4) for i in range(12)]
    # docs 100/101 share a real near-dup body beyond the template
    rows += [(100, template + "shared payload alpha beta gamma delta " * 6),
             (101, template + "shared payload alpha beta gamma delta " * 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dd.winnow_pairs(df, k=8, w=4, min_common=2).count()
    capped = dd.winnow_pairs(df, k=8, w=4, min_common=2, max_doc_freq=4)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got          # true near-dups survive the cap
    assert len(got) < uncapped        # boilerplate cliques are gone
    assert all(a < b for a, b in got)
