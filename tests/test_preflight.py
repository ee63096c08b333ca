"""Every registry query must execute without raising (tools/preflight.py
wired into pytest so `pytest tests/` alone catches an
AnalysisException-class breakage — the failure mode that went unnoticed
for two rounds when only j14 was broken and nothing in the default loop
forced it)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from preflight import run_preflight  # noqa: E402


def test_every_registry_query_executes(spark):
    errors = run_preflight(spark, "/root/testdata/sf0.001")
    assert not errors, f"queries failed preflight: {sorted(errors)}"
