"""Model-based property test for MutableTable: a random interleaving of
mutations and schema evolutions must keep ``read()`` equal to a plain
Python dict model at every step — the whole CAS-commit + read-time-
reconciliation machinery against an oracle with none of it."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qcfractal_spark.sources.table import MutableTable

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# op encodings: each step is one of
#   ("upsert", [(id, val)])          — replace/append by key
#   ("delete", [ids])                — keyed delete, no referencing set
#   ("add_col", default)             — metadata-only evolution
#   ("rename",)                      — v -> w (once)
_ids = st.integers(min_value=1, max_value=9)
_val = st.integers(min_value=0, max_value=99)

_step = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(st.tuples(_ids, _val), min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete"), st.lists(_ids, min_size=1, max_size=3)),
)

_script = st.lists(_step, min_size=1, max_size=6)


@given(script=_script, evolve_at=st.integers(min_value=0, max_value=6))
@settings(**SETTINGS)
def test_mutations_with_evolution_match_dict_model(spark, tmp_path_factory, script, evolve_at):
    root = str(tmp_path_factory.mktemp("model") / "tbl")
    t = MutableTable(spark, root)
    t.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    )
    model: dict[int, dict] = {1: {"v": 10}, 2: {"v": 20}}
    evolved = False

    def _row(i, v):
        if evolved:
            # existence-default (r11 ADVICE): an EXPLICIT NULL written
            # after the add reads back NULL — only pre-add files fill
            # with the default
            return (i, v, None)
        return (i, v)

    for step_no, step in enumerate(script):
        if step_no == evolve_at and not evolved:
            t.evolve(
                [{"op": "add", "name": "tier", "dtype": "string", "default": "std"}]
            )
            evolved = True
            for m in model.values():
                m.setdefault("tier", "std")
        kind = step[0]
        if kind == "upsert":
            # dedupe in-batch keys BEFORE the call (upsert documents
            # in-batch duplicates as resolving arbitrarily — the model
            # needs a deterministic batch)
            rows = list({i: v for i, v in step[1]}.items())
            schema = "id long, v long, tier string" if evolved else "id long, v long"
            batch = spark.createDataFrame([_row(i, v) for i, v in rows], schema)
            t.upsert(batch, ["id"])
            for i, v in rows:
                model[i] = {"v": v}
                if evolved:
                    model[i]["tier"] = None  # explicit NULL stays NULL
        elif kind == "delete":
            ids = step[1]
            t.delete_ids(ids, "id")
            for i in ids:
                model.pop(i, None)

        got = {
            r["id"]: {
                k: r[k] for k in (["v", "tier"] if evolved else ["v"])
            }
            for r in t.read().collect()
        }
        want = {
            i: ({"v": m["v"], "tier": m.get("tier", "std")} if evolved else {"v": m["v"]})
            for i, m in model.items()
        }
        assert got == want, f"diverged at step {step_no}: {step}"
