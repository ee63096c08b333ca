"""Property-based tests for the r12 operators:

- pr_curve matches a brute-force driver-side confusion matrix on
  arbitrary (score, label) multisets — the distributed bucket/cumsum
  shape is an optimization, not a different metric;
- status_transition_replay agrees with a literal driver-side replay of
  the reference's matrices on arbitrary (op, status) multisets;
- reap_dead_managers never recycles a record the reference's
  reset_assigned would not touch, on arbitrary manager/record tables.

Examples are kept small: every example runs Spark jobs."""

from __future__ import annotations

import os
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ST = ["waiting", "running", "complete", "error", "cancelled", "invalid", "deleted"]
_OPS = ["delete", "cancel", "invalidate", "reset"]
_APPLICABLE = {
    "delete": set(_ST) - {"deleted"},
    "cancel": {"waiting", "running", "error"},
    "invalidate": {"complete"},
    "reset": {"error"},
}
_TARGET = {"delete": "deleted", "cancel": "cancelled",
           "invalidate": "invalid", "reset": "waiting"}


@given(
    scores=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # score on a 0.05 grid
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_pr_curve_matches_brute_force(spark, scores):
    from qcfractal_spark.functions.text import pr_curve

    rows = [(s / 20.0, int(y)) for s, y in scores]
    df = spark.createDataFrame(rows, "score double, y int")
    got = {r["threshold"]: r for r in pr_curve(df, "score", "y", 2).collect()}

    thresholds = sorted({round(s, 2) for s, _ in rows}, reverse=True)
    assert set(got) == set(thresholds)
    tot_pos = sum(y for _, y in rows)
    for t in thresholds:
        kept = [(s, y) for s, y in rows if round(s, 2) >= t]
        tp = sum(y for _, y in kept)
        fp = len(kept) - tp
        r = got[t]
        assert (r["tp"], r["fp"]) == (tp, fp), (t, rows)
        assert r["precision"] == round(tp / (tp + fp), 6)
        if tot_pos:
            assert r["recall"] == round(tp / tot_pos, 6)
        else:
            assert r["recall"] is None


@given(
    cells=st.lists(
        st.tuples(st.sampled_from(_OPS), st.sampled_from(_ST)),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_status_replay_matches_reference_mirror(spark, cells):
    from qcfractal_spark.operators.diagnostics import status_transition_replay

    df = spark.createDataFrame(list(cells), "op string, status string")
    got = {
        (r["op"], r["original_status"]): r
        for r in status_transition_replay(df).collect()
    }
    expect = Counter(cells)
    assert sum(r["n"] for r in got.values()) == len(cells)
    for (op, status), n in expect.items():
        r = got[(op, status)]
        assert r["n"] == n
        accepted = status in _APPLICABLE[op]
        demoted = "waiting" if status == "running" else status
        assert r["outcome"] == ("updated" if accepted else "rejected")
        assert r["after_forward"] == (_TARGET[op] if accepted else status)
        if accepted and op != "reset":
            assert r["backup_status"] == demoted
            assert r["after_revert"] == demoted
        elif accepted:  # reset
            assert r["backup_status"] is None
            assert r["after_revert"] == "waiting"
        else:
            assert r["backup_status"] is None
            assert r["after_revert"] == status


@given(
    managers=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=100)),
        min_size=1,
        max_size=8,
    ),
    assignments=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),   # manager index
            st.sampled_from(["waiting", "running", "complete"]),
            st.booleans(),                            # is_service
        ),
        min_size=0,
        max_size=25,
    ),
    cutoff=st.integers(min_value=0, max_value=100),
)
@settings(**SETTINGS)
def test_reap_counts_match_reference_mirror(spark, managers, assignments, cutoff):
    from qcfractal_spark.operators.diagnostics import reap_dead_managers

    mrows = [
        (f"m{i}", "active" if act else "inactive", age)
        for i, (act, age) in enumerate(managers)
    ]
    mdf = spark.createDataFrame(
        mrows, "m_name string, m_status string, m_modified_on bigint"
    )
    rrows = [
        (i, status, svc, f"m{mi % len(managers)}")
        for i, (mi, status, svc) in enumerate(assignments)
    ]
    rdf = spark.createDataFrame(
        rrows, "record_id long, status string, is_service boolean, manager_name string"
    )
    got = {r["m_name"]: r for r in reap_dead_managers(mdf, rdf, cutoff).collect()}
    assert set(got) == {m[0] for m in mrows}
    for name, m_status, age in mrows:
        dead = m_status == "active" and age < cutoff
        expected = (
            sum(
                1
                for _, st_, svc, mn in rrows
                if mn == name and st_ == "running" and not svc
            )
            if dead
            else 0
        )
        r = got[name]
        assert r["n_recycled"] == expected
        assert r["status_after"] == (
            "inactive" if dead or m_status == "inactive" else "active"
        )
        assert r["reason"] == ("missing heartbeat" if dead else None)
