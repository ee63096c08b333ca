"""Molecule modify (operators/molecules.py; reference
molecules/socket.py:277-340).  Registry parity is covered by
s17_molecule_modify; these tests pin the immutability, merge/overwrite,
None-field and pre-commit-gate arms."""

from __future__ import annotations

import pytest

from qcfractal_spark.operators.molecules import (
    MissingMoleculeError,
    modify_molecule,
)
from qcfractal_spark.sources.table import MutableTable

SCHEMA = (
    "molecule_id long, name string, comment string, "
    "identifiers map<string,string>"
)


def _table(spark, tmp_path):
    t = MutableTable(spark, str(tmp_path / "mols"))
    t.overwrite(
        spark.createDataFrame(
            [
                (1, "water", None, {"molecule_hash": "h1",
                                    "molecular_formula": "H2O",
                                    "smiles": "O"}),
                (2, "ethanol", "old", {"molecule_hash": "h2",
                                       "molecular_formula": "C2H6O"}),
            ],
            SCHEMA,
        )
    )
    return t


def _row(t, mid):
    return t.read().where(f"molecule_id = {mid}").collect()[0]


def test_name_and_comment_update_only_target_row(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert modify_molecule(t, 1, name="dihydrogen monoxide") == {"updated": 1}
    modify_molecule(t, 1, comment="c")
    r1, r2 = _row(t, 1), _row(t, 2)
    assert r1["name"] == "dihydrogen monoxide" and r1["comment"] == "c"
    assert r2["name"] == "ethanol" and r2["comment"] == "old"
    # None fields are "not changed", not "set to NULL"
    modify_molecule(t, 2, name="EtOH")
    assert _row(t, 2)["comment"] == "old"


def test_merge_shadows_and_adds_but_never_immutables(spark, tmp_path):
    t = _table(spark, tmp_path)
    modify_molecule(
        t, 1,
        identifiers={"smiles": "[OH2]", "inchikey": "XLY",
                     "molecule_hash": "evil", "molecular_formula": "XeF6"},
    )
    got = _row(t, 1)["identifiers"]
    assert got == {"molecule_hash": "h1", "molecular_formula": "H2O",
                   "smiles": "[OH2]", "inchikey": "XLY"}


def test_overwrite_drops_old_keys_keeps_immutables(spark, tmp_path):
    t = _table(spark, tmp_path)
    modify_molecule(
        t, 1, identifiers={"pubchem_cid": "962"}, overwrite_identifiers=True
    )
    got = _row(t, 1)["identifiers"]
    assert got == {"molecule_hash": "h1", "molecular_formula": "H2O",
                   "pubchem_cid": "962"}


def test_overwrite_with_empty_map_leaves_only_immutables(spark, tmp_path):
    t = _table(spark, tmp_path)
    modify_molecule(t, 1, identifiers={}, overwrite_identifiers=True)
    got = _row(t, 1)["identifiers"]
    assert got == {"molecule_hash": "h1", "molecular_formula": "H2O"}


def test_none_valued_identifiers_are_dropped_like_exclude_none(spark, tmp_path):
    t = _table(spark, tmp_path)
    modify_molecule(t, 2, identifiers={"smiles": "CCO", "inchi": None})
    got = _row(t, 2)["identifiers"]
    assert got == {"molecule_hash": "h2", "molecular_formula": "C2H6O",
                   "smiles": "CCO"}


def test_missing_id_raises_before_any_commit(spark, tmp_path):
    t = _table(spark, tmp_path)
    v = t.current_version()
    with pytest.raises(MissingMoleculeError):
        modify_molecule(t, 42, name="ghost")
    assert t.current_version() == v
