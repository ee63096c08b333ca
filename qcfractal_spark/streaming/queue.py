"""Single-writer task-queue state machine (T4).

The reference's claim path uses FOR UPDATE SKIP LOCKED so concurrent Flask
workers partition the queue (qcfractal/qcfractal/components/tasks/socket.py:
243-421); returns flow through update_completed; a reaper resets tasks of
dead managers (components/managers/socket.py:328-349).

Spark has no row locks — per BASELINE.json the honest design is "Spark jobs
as compute tasks, external scheduler": *selection* is the distributed top-k
plan (operators/topk.py); *state transitions* serialize through this
single-writer driver object.  Correctness contract is set-semantics (no
task claimed twice), asserted in tests, not lock behavior (SURVEY §7 hard
part #2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topk import priority_claim_topk


@dataclass
class _ManagerState:
    programs: tuple[str, ...]
    tags: tuple[str, ...]
    last_heartbeat: datetime


@dataclass
class SingleWriterQueue:
    """In-memory authoritative claim state over an immutable tasks snapshot.

    ``tasks`` must carry (id, record_id, compute_tag, compute_priority,
    sort_date, available, required_programs).  At deployment scale the
    claimed-set would live in a Delta table updated with optimistic
    transactions; the driver loop below is the same logic with the state
    held locally.
    """

    tasks: DataFrame
    claimed: dict[int, str] = field(default_factory=dict)  # task_id -> manager
    managers: dict[str, _ManagerState] = field(default_factory=dict)
    statuses: dict[int, str] = field(default_factory=dict)  # record_id -> status

    def register_manager(
        self, name: str, programs: Sequence[str], tags: Sequence[str]
    ) -> None:
        self.managers[name] = _ManagerState(
            tuple(programs), tuple(tags), datetime.now(timezone.utc)
        )

    def heartbeat(self, name: str) -> None:
        self.managers[name].last_heartbeat = datetime.now(timezone.utc)

    def claim(self, manager: str, limit: int) -> list[dict]:
        """Claim up to ``limit`` tasks for ``manager`` (tasks/socket.py:303-358):
        eligibility + per-tag priority top-k run as a Spark plan; the
        serialized section below only filters already-claimed ids and
        records the new claims."""
        st = self.managers[manager]
        eligible = priority_claim_topk(
            self.tasks, limit + len(self.claimed), tags=st.tags, available_programs=st.programs
        )
        # collect() returns rows in nondeterministic partition order; the
        # reference claims strictly by priority DESC, sort_date ASC, id ASC
        # (tasks/socket.py:303-358), so re-sort before taking the first
        # `limit` unclaimed rows.
        rows = sorted(
            eligible.collect(),
            key=lambda r: (-r["compute_priority"], r["sort_date"], r["id"]),
        )
        out: list[dict] = []
        for r in rows:
            if len(out) >= limit:
                break
            if r["id"] in self.claimed:
                continue
            self.claimed[r["id"]] = manager
            self.statuses[r["record_id"]] = "running"
            out.append(r.asDict())
        return out

    def return_task(self, manager: str, task_id: int, record_id: int, ok: bool) -> None:
        if self.claimed.get(task_id) != manager:
            raise ValueError(f"task {task_id} not claimed by {manager}")
        del self.claimed[task_id]
        self.statuses[record_id] = "complete" if ok else "error"

    def reap_dead_managers(self, max_age: timedelta) -> list[int]:
        """Return tasks of managers whose heartbeat is stale
        (managers/socket.py:328-349): claims are released and records go
        back to waiting."""
        now = datetime.now(timezone.utc)
        dead = [m for m, s in self.managers.items() if now - s.last_heartbeat > max_age]
        released = []
        for task_id, mgr in list(self.claimed.items()):
            if mgr in dead:
                del self.claimed[task_id]
                released.append(task_id)
        for m in dead:
            del self.managers[m]
        return released
