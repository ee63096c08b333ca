"""Deterministic domain-fixture generator — the QCFractal-shaped tables.

Builds the combinatorial record grid the reference's query tests use
(qcfractal/qcfractal/components/test_record_client_query.py:23-55: 10
molecules × 2 programs × 2 drivers × 2 methods × 2 bases × 2 keyword sets =
320 records, every status represented per components/testing_helpers.py:26),
plus specifications, molecules, dataset entry×spec matrices, record-graph
edges, and a task queue — schemas per FIXTURES.md.

Everything is a pure function of the row index (seed-free determinism) so
tests and oracles can re-derive expected counts exactly.  At deployment
scale these would be ingest jobs writing partitioned parquet; here they
return DataFrames.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

STATUSES = ["complete", "invalid", "running", "error", "waiting", "cancelled", "deleted"]
RECORD_TYPES = [
    "singlepoint",
    "singlepoint",
    "singlepoint",
    "optimization",
    "torsiondrive",
    "gridoptimization",
    "reaction",
    "manybody",
    "neb",
]
SERVICE_TYPES = {"torsiondrive", "gridoptimization", "reaction", "manybody", "neb"}
PROGRAMS = ["prog1", "prog2"]
DRIVERS = ["energy", "properties"]
METHODS = ["hf", "b3lyp"]
BASES = ["sto-3g", "def2-tzvp", ""]  # '' exercises null↔empty normalization (P10)
_BASE_TS = datetime(2024, 1, 1)


def specifications(spark: SparkSession) -> DataFrame:
    """32-row spec grid (program × driver × method × basis(2 of 3) × kw)."""
    rows = []
    sid = 0
    for prog in PROGRAMS:
        for drv in DRIVERS:
            for meth in METHODS:
                # '' (no basis) appears for hf so the P10 null↔empty
                # normalization path has real rows to match
                for basis in (["sto-3g", ""] if meth == "hf" else BASES[:2]):
                    for kw in (0, 1):
                        sid += 1
                        rows.append(
                            (
                                sid,
                                prog,
                                drv,
                                meth,
                                basis,
                                {"maxiter": "100"} if kw else {},
                            )
                        )
    return spark.createDataFrame(
        rows,
        "spec_id long, program string, driver string, method string, "
        "basis string, keywords map<string,string>",
    )


def molecules(spark: SparkSession, n: int = 10) -> DataFrame:
    els = ["h", "he", "li", "be", "b", "c", "n", "o", "f", "ne"]
    rows = []
    for i in range(n):
        el = els[i % len(els)]
        rows.append(
            (
                i + 1,
                el,
                [el],
                [0.1 * i, 0.2 * i, 0.3 * i],
                {
                    "molecular_formula": el.capitalize(),
                    "smiles": f"madeupsmiles_{el}",
                    "inchikey": f"madeupinchi_{el}",
                },
                0.0,
                1,
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, name string, symbols array<string>, geometry array<double>, "
        "identifiers map<string,string>, molecular_charge double, "
        "molecular_multiplicity int",
    )


def records(spark: SparkSession, n: int = 320) -> DataFrame:
    """The combinatorial grid: record i joins molecule (i%10)+1 and spec
    (i%32)+1; statuses cycle so every status appears (n ≥ 7)."""
    rows = []
    for i in range(n):
        status = STATUSES[i % len(STATUSES)]
        rtype = RECORD_TYPES[i % len(RECORD_TYPES)]
        created = _BASE_TS + timedelta(minutes=i)
        rows.append(
            (
                i + 1,
                rtype,
                rtype in SERVICE_TYPES,
                status,
                f"manager_{i % 4}" if status in ("running", "complete", "error") else None,
                created,
                created + timedelta(hours=i % 7),
                i % 5 if i % 5 else None,
                {"return_energy": -1.0 - 0.01 * i, "scf_total_energy": -2.0 - 0.01 * i}
                if status == "complete"
                else None,
                (i % 32) + 1,
                (i % 10) + 1,
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, record_type string, is_service boolean, status string, "
        "manager_name string, created_on timestamp, modified_on timestamp, "
        "creator_user_id long, properties map<string,double>, spec_id long, "
        "molecule_id long",
    )


def record_edges(spark: SparkSession, n_records: int = 320) -> DataFrame:
    """Parent→child edges with ≥3-level chains: every torsiondrive record
    owns the next 3 optimization-typed ids; every optimization owns the next
    2 singlepoint-typed ids (trajectory) — deterministic, acyclic."""
    recs = [(i + 1, RECORD_TYPES[i % len(RECORD_TYPES)]) for i in range(n_records)]
    by_type: dict[str, list[int]] = {}
    for rid, rt in recs:
        by_type.setdefault(rt, []).append(rid)
    edges = []
    opts = by_type.get("optimization", [])
    sps = by_type.get("singlepoint", [])
    for k, td in enumerate(by_type.get("torsiondrive", [])):
        for j in range(3):
            if 3 * k + j < len(opts):
                edges.append((td, opts[3 * k + j]))
    for k, opt in enumerate(opts):
        for j in range(2):
            if 2 * k + j < len(sps):
                edges.append((opt, sps[2 * k + j]))
    return spark.createDataFrame(edges, "parent_id long, child_id long")


def dataset_tables(
    spark: SparkSession, n_entries: int = 12, n_specs: int = 4, fill: float = 0.9
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(entries, specifications, record_items) for one dataset; ~fill of the
    entry×spec matrix has records (holes exercise submit-missing),
    record ids cycle through the 320-grid so statuses vary."""
    entries = spark.createDataFrame(
        [(1, f"entry_{j}") for j in range(n_entries)], "dataset_id long, name string"
    )
    specs = spark.createDataFrame(
        [(1, f"spec_{k}", k + 1) for k in range(n_specs)],
        "dataset_id long, name string, spec_id long",
    )
    items = []
    cell = 0
    for j in range(n_entries):
        for k in range(n_specs):
            cell += 1
            if (cell % 10) < int(fill * 10):
                items.append((1, f"entry_{j}", f"spec_{k}", (cell * 7) % 320 + 1))
    record_items = spark.createDataFrame(
        items,
        "dataset_id long, entry_name string, specification_name string, record_id long",
    )
    return entries, specs, record_items


def task_queue(spark: SparkSession, records_df: DataFrame) -> DataFrame:
    """One task per waiting record (tasks/socket.py claim fixtures):
    tags/priorities/sort dates with deliberate ties."""
    waiting = [r["id"] for r in records_df.where("status = 'waiting'").collect()]
    rows = []
    for t, rid in enumerate(waiting):
        rows.append(
            (
                t + 1,
                rid,
                ["tag1", "tag2", "*"][t % 3],
                t % 3,
                _BASE_TS + timedelta(minutes=t % 5),  # ties on sort_date
                True,
                [["prog1"], ["prog1", "prog2"], ["prog2"]][t % 3],
            )
        )
    return spark.createDataFrame(
        rows,
        "id long, record_id long, compute_tag string, compute_priority int, "
        "sort_date timestamp, available boolean, required_programs array<string>",
    )
