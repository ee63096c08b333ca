"""_scratch_dir stale-sibling reaper (ADVICE r7): pid-suffixed scratch dirs
from dead processes must be pruned on first use, live owners never touched,
and the reap must run once per process."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import qcfractal_spark.queries as q
from qcfractal_spark.session import scratch_base


def _mk(name: str, age_sec: float = 0.0) -> str:
    p = os.path.join(scratch_base(), name)
    os.makedirs(p, exist_ok=True)
    if age_sec:
        os.utime(p, (time.time() - age_sec, time.time() - age_sec))
    return p


def test_reaper_prunes_dead_spares_live_and_young():
    dead = _mk("qcfractal_spark_t_abcdef012345_999999999", age_sec=7200)
    young_dead = _mk("qcfractal_spark_t_abcdef012345_999999998")
    live = _mk(f"qcfractal_spark_t_abcdef012345_{os.getppid()}", age_sec=7200)
    unrelated = _mk("qcfractal_spark_keepme")  # no _<hash>_<pid> suffix
    try:
        q._SCRATCH_REAPED = False
        p = q._scratch_dir("/root/testdata/sf0.001", "x")
        assert str(os.getpid()) in p
        assert not os.path.exists(dead), "old dead-owner dir must be reaped"
        assert os.path.exists(young_dead), "age guard spares young dirs"
        assert os.path.exists(live), "live-owner dir must never be reaped"
        assert os.path.exists(unrelated), "non-matching names untouched"
        # once-per-process: aging the young dir then calling again is a no-op
        os.utime(young_dead, (time.time() - 7200, time.time() - 7200))
        q._scratch_dir("/root/testdata/sf0.001", "x")
        assert os.path.exists(young_dead)
    finally:
        for d in (dead, young_dead, live, unrelated):
            shutil.rmtree(d, ignore_errors=True)


def test_reaper_sweeps_all_candidate_bases(monkeypatch):
    """r15 ADVICE: dirs stranded in a base this process did not choose
    (threshold crossing, env change between runs) must still be reaped."""
    import qcfractal_spark.session as sess

    other = tempfile.mkdtemp(prefix="qcfs_altbase_")
    dead = os.path.join(other, "qcfractal_spark_t_abcdef012345_999999997")
    os.makedirs(dead, exist_ok=True)
    os.utime(dead, (time.time() - 7200, time.time() - 7200))
    monkeypatch.setattr(
        sess, "scratch_base_candidates", lambda: [scratch_base(), other]
    )
    try:
        q._SCRATCH_REAPED = False
        q._scratch_dir("/root/testdata/sf0.001", "x")
        assert not os.path.exists(dead), "dead dir in a sibling base must be reaped"
    finally:
        shutil.rmtree(other, ignore_errors=True)


def test_prune_stale_local_dirs_ages():
    """r15 ADVICE: dead-JVM spark-*/blockmgr-* litter under the session's
    local dir is pruned by age at build time; young and foreign names
    survive."""
    from qcfractal_spark.session import _prune_stale_local_dirs

    base = tempfile.mkdtemp(prefix="qcfs_localdir_")
    old = os.path.join(base, "spark-deadbeef")
    young = os.path.join(base, "blockmgr-young")
    foreign = os.path.join(base, "not-spark")
    for p in (old, young, foreign):
        os.makedirs(p, exist_ok=True)
    os.utime(old, (time.time() - 8 * 3600, time.time() - 8 * 3600))
    os.utime(foreign, (time.time() - 8 * 3600, time.time() - 8 * 3600))
    try:
        _prune_stale_local_dirs(base)
        assert not os.path.exists(old)
        assert os.path.exists(young)
        assert os.path.exists(foreign)
    finally:
        shutil.rmtree(base, ignore_errors=True)
