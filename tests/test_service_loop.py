"""T5 golden service-iteration replay (VERDICT r10 item 5): a 3-level
many-body-style service driven end-to-end through SingleWriterQueue —
dependency fan-out, A8 completion gate, state evolution, terminal
completion — with the documented set-semantics assertions (each
dependency spawned once / claimed once / consumed by exactly one
iteration; the gate never fires early; later fan-outs are invisible to
earlier iterations).  Reference: services/socket.py:65-300."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcfractal_spark.streaming.queue import ServiceLoop, SingleWriterQueue

TASK_SCHEMA = (
    "id long, record_id long, compute_tag string, compute_priority int, "
    "sort_date timestamp, available boolean, required_programs array<string>"
)

FANOUT = {0: 3, 1: 2, 2: 1}


def _mbe_iterate(state, results):
    """Golden fixture: accumulate dependency results level by level
    (the many-body-expansion shape — level k spawns FANOUT[k] fragment
    computations, consumes their energies, then advances)."""
    level = state["level"]
    total = state["total"] + sum(results.values())
    if level >= len(FANOUT):
        return {"level": level, "total": total}, [], True
    specs = [f"frag_l{level}_{i}" for i in range(FANOUT[level])]
    return {"level": level + 1, "total": total}, specs, False


def _empty_queue(spark):
    return SingleWriterQueue(tasks=spark.createDataFrame([], TASK_SCHEMA))


def _spark_gate(spark, deps, statuses) -> bool:
    """The A8 aggregate over the outstanding dependency set — what the
    gate IS at scale (bool_and over the service⋈dependency join; the
    a8_status_gate registry query is the same aggregate on real data)."""
    if not deps:
        return True
    df = spark.createDataFrame(
        [(int(r), statuses.get(r)) for r in deps], "record_id long, status string"
    )
    row = df.agg(
        F.bool_and(F.col("status") == "complete").alias("g"),
        F.bool_or(F.col("status") == "error").alias("e"),
    ).collect()[0]
    return bool(row["g"]) and not bool(row["e"])


def _drain(queue, loop, manager, values):
    """Worker pass: claim everything outstanding, return ok results.
    Records each (task, value) so the test can recompute the expected
    total independently."""
    claimed = queue.claim(manager, limit=100)
    for row in claimed:
        v = float(row["record_id"] % 7 + 1)
        values[row["record_id"]] = v
        loop.record_result(row["record_id"], v)
        queue.return_task(manager, row["id"], row["record_id"], ok=True)
    return claimed


def test_three_level_replay_with_set_semantics(spark):
    queue = _empty_queue(spark)
    queue.register_manager("w1", programs=["prog"], tags=["service"])
    loop = ServiceLoop(queue=queue, service_state={"level": 0, "total": 0.0},
                       iterate_fn=_mbe_iterate)

    all_claims: list[int] = []
    spawned_per_iter: list[set] = []
    values: dict[int, float] = {}

    # iteration 1: empty dependency set -> gate fires trivially, level-0
    # fan-out spawns
    assert loop.iterate()
    assert loop.history[-1]["consumed"] == []
    spawned_per_iter.append(set(loop.deps))
    assert len(loop.deps) == FANOUT[0]

    for expected_fanout in (FANOUT[1], FANOUT[2], None):
        # gate must NOT fire while dependencies are outstanding (Spark
        # aggregate and driver mirror agree)
        assert not _spark_gate(spark, loop.deps, queue.statuses)
        assert not loop.iterate()
        claimed = _drain(queue, loop, "w1", values)
        all_claims.extend(r["id"] for r in claimed)
        # every outstanding dep is now complete -> both gates agree
        assert _spark_gate(spark, loop.deps, queue.statuses)
        before = set(loop.deps)
        assert loop.iterate()
        assert set(loop.history[-1]["consumed"]) == before
        if expected_fanout is None:
            assert loop.history[-1]["done"] and loop.status == "complete"
        else:
            spawned_per_iter.append(set(loop.deps))
            assert len(loop.deps) == expected_fanout

    # >= 3 advancing iterations (4 here: spawn, 2 advance+spawn, finish)
    assert len(loop.history) == 4

    # SET SEMANTICS: no task claimed twice across the whole replay
    assert len(all_claims) == len(set(all_claims))
    # every spawned dependency was consumed by EXACTLY ONE iteration
    consumed = [set(h["consumed"]) for h in loop.history]
    for a in range(len(consumed)):
        for b in range(a + 1, len(consumed)):
            assert consumed[a].isdisjoint(consumed[b])
    assert set().union(*consumed) == set().union(*spawned_per_iter)
    # iteration k+1's fan-out invisible to iteration k: each iteration
    # consumed exactly the set spawned by the previous one
    assert [set(h["consumed"]) for h in loop.history[1:]] == spawned_per_iter

    # state evolution: the service_state total is the sum of every
    # dependency result, recomputed independently from the worker log
    assert abs(loop.service_state["total"] - sum(values.values())) < 1e-9
    assert loop.service_state["level"] == 3

    # terminal: a finished service never advances again
    assert not loop.iterate()


def test_dependency_error_fails_the_service(spark):
    queue = _empty_queue(spark)
    queue.register_manager("w1", programs=["prog"], tags=["service"])
    loop = ServiceLoop(queue=queue, service_state={"level": 0, "total": 0.0},
                       iterate_fn=_mbe_iterate)
    assert loop.iterate()  # spawn level-0 deps
    claimed = queue.claim("w1", limit=100)
    ok_flags = [True] * (len(claimed) - 1) + [False]
    for row, ok in zip(claimed, ok_flags):
        loop.record_result(row["record_id"], 1.0)
        queue.return_task("w1", row["id"], row["record_id"], ok=ok)
    # Spark gate and driver mirror both refuse; service lands in error
    assert not _spark_gate(spark, loop.deps, queue.statuses)
    assert not loop.iterate()
    assert loop.status == "error"
    assert len(loop.history) == 1  # no further state evolution


def test_reaped_claim_keeps_gate_closed(spark):
    """A dead manager's claim is reaped back to waiting mid-iteration:
    the gate stays closed until a live worker re-claims and finishes —
    no double consumption, no premature advance."""
    from datetime import timedelta

    queue = _empty_queue(spark)
    queue.register_manager("dead", programs=["prog"], tags=["service"])
    queue.register_manager("live", programs=["prog"], tags=["service"])
    loop = ServiceLoop(queue=queue, service_state={"level": 0, "total": 0.0},
                       iterate_fn=_mbe_iterate)
    assert loop.iterate()
    dead_claims = queue.claim("dead", limit=1)
    assert len(dead_claims) == 1
    queue.managers["dead"].last_heartbeat -= timedelta(hours=1)
    released = queue.reap_dead_managers(timedelta(minutes=5))
    assert released == [dead_claims[0]["id"]]
    assert not loop.iterate()  # reaped dep is back to waiting, gate closed
    values: dict[int, float] = {}
    _drain(queue, loop, "live", values)
    assert set(values) == set(loop.deps)  # live worker got ALL deps, once each
    assert loop.iterate()


def test_spawn_records_specs_and_iterate_fails_loudly_on_missing_result(spark):
    """r11 ADVICE: each spawned dependency's spec is retrievable by its
    record id (the reference's service_dependency row), and a dependency
    that reaches 'complete' without record_result fails iterate() with a
    clear error instead of a bare KeyError."""
    import pytest

    queue = _empty_queue(spark)
    queue.register_manager("w1", programs=["prog"], tags=["service"])
    loop = ServiceLoop(
        queue=queue,
        service_state={"level": 0, "total": 0.0},
        iterate_fn=_mbe_iterate,
    )
    rids = loop.spawn([{"frag": "a"}, {"frag": "b"}])
    assert [loop.specs[r] for r in rids] == [{"frag": "a"}, {"frag": "b"}]

    # complete the deps but "forget" to record one result
    claims = queue.claim("w1", limit=10)
    for row in claims:
        if row["record_id"] == rids[0]:
            loop.record_result(rids[0], 1.0)
        queue.return_task("w1", row["id"], row["record_id"], ok=True)
    with pytest.raises(RuntimeError, match=f"{rids[1]}.*without a"):
        loop.iterate()
