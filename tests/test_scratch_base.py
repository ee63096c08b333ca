"""scratch_base (r15): env override wins; default is an existing,
writable directory; spark.local.dir derives from it."""

from __future__ import annotations

import os

from qcfractal_spark.session import scratch_base


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", "/some/fast/nvme")
    assert scratch_base() == "/some/fast/nvme"


def test_default_is_usable_dir(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_DIR", raising=False)
    base = scratch_base()
    assert os.path.isdir(base)
    assert os.access(base, os.W_OK)
