"""Driver-window rotation invariants — the rules every round's rotation
must satisfy, encoded so a future rotation can't silently break them:
the window is exactly the registry's first 50 entries, every query the
driver has never stamped is inside it, and every RED stamp (hash failed)
re-enters for a re-stamp."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from qcfractal_spark.queries import REGISTRY, _DRIVER_WINDOW
from tools.stale_stamps import stamps


def test_window_is_registry_head():
    assert len(_DRIVER_WINDOW) == 50
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW
    assert len(set(_DRIVER_WINDOW)) == 50  # no duplicates


def test_never_stamped_queries_are_in_window():
    seen = stamps()
    never = [q for q in REGISTRY if q not in seen]
    outside = [q for q in never if q not in set(_DRIVER_WINDOW)]
    assert not outside, (
        f"queries with no driver stamp must be in the window: {outside}"
    )


def test_red_stamps_reenter_the_window():
    seen = stamps()
    reds = [q for q, (_, kind) in seen.items() if kind == "RED" and q in REGISTRY]
    outside = [q for q in reds if q not in set(_DRIVER_WINDOW)]
    assert not outside, f"hash-red queries must re-enter for a re-stamp: {outside}"


def test_window_queries_all_runnable_contract():
    """Every window entry resolves to a callable and (unless declared
    rows-only with a None oracle) carries oracle SQL — the driver's
    minimum contract."""
    for name in _DRIVER_WINDOW:
        fn, sql = REGISTRY[name]
        assert callable(fn), name
        assert sql is None or (isinstance(sql, str) and "SELECT" in sql.upper()), name
