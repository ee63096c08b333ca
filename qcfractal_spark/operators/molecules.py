"""Molecule modify — field update of name/comment/identifiers with
merge-vs-overwrite semantics (reference molecules/socket.py:277-340):
only name, comment and identifiers are updatable, and the
``molecule_hash`` / ``molecular_formula`` identifier keys are IMMUTABLE
— the reference re-validates the incoming identifiers with the stored
hash and formula forced back in, whatever the caller sent.

Spark-first mapping: the molecules table is a MutableTable whose
``identifiers`` column is a ``map<string,string>``; one ``transform``
commit rewrites the single matched row with pure map algebra
(``map_filter`` + ``map_concat`` — codegen, no UDF):

* merge (default): new keys win over old EXCEPT the immutable pair,
  which always comes from the stored map;
* overwrite: the stored non-immutable keys are dropped entirely, then
  the immutable pair is forced back in (the reference's
  exclude_unset model_dump + update_dict splice).

At 100 TB the table rewrite stays a metadata-sized op: the transform
touches one row by id — with an id-partitioned layout the staged
rewrite is partition-scoped (the S13 record-status pattern), and the
identifier maps are KB-sized per row.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import functions as F

IMMUTABLE_IDENTIFIERS = ("molecule_hash", "molecular_formula")


class MissingMoleculeError(KeyError):
    """MissingDataError analog: the molecule id does not exist."""


def modify_molecule(
    table,
    molecule_id: int,
    name: str | None = None,
    comment: str | None = None,
    identifiers: Mapping[str, str] | None = None,
    overwrite_identifiers: bool = False,
) -> dict:
    """Apply the reference's ``modify`` contract to ``table`` (a
    MutableTable over ``molecule_id long, name string, comment string,
    identifiers map<string,string>`` plus any extra columns, which pass
    through untouched).  Returns UpdateMetadata-shaped counts
    (``{"updated": 1}``).  Raises MissingMoleculeError when the id is
    absent — checked BEFORE the commit, so a failed modify mutates
    nothing (molecules/socket.py:327-329)."""
    mid = int(molecule_id)
    n = (
        table.read()
        .where(F.col("molecule_id") == mid)
        .limit(1)
        .count()
    )
    if not n:
        raise MissingMoleculeError(
            f"Molecule with id {molecule_id} not found in the database"
        )

    hit = F.col("molecule_id") == mid

    def build(df):
        out = df
        if name is not None:
            out = out.withColumn(
                "name", F.when(hit, F.lit(name)).otherwise(F.col("name"))
            )
        if comment is not None:
            out = out.withColumn(
                "comment", F.when(hit, F.lit(comment)).otherwise(F.col("comment"))
            )
        if identifiers is not None:
            # incoming map with any immutable keys stripped — the caller
            # can never change hash or formula (socket.py:336-340)
            clean = {
                k: v
                for k, v in identifiers.items()
                if k not in IMMUTABLE_IDENTIFIERS and v is not None
            }
            new_map = (
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k in clean]),
                    F.array(*[F.lit(v) for v in clean.values()]),
                )
                if clean
                else F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<string>")
                )
            )
            immutable = F.map_filter(
                F.col("identifiers"),
                lambda k, _: k.isin(*IMMUTABLE_IDENTIFIERS),
            )
            if overwrite_identifiers:
                merged = F.map_concat(immutable, new_map)
            else:
                # merge: stored keys not shadowed by the new map survive;
                # the immutable pair is already outside `new_map`
                keep_old = F.map_filter(
                    F.col("identifiers"),
                    lambda k, _: ~k.isin(*[F.lit(x) for x in clean])
                    if clean
                    else F.lit(True),
                )
                merged = F.map_concat(keep_old, new_map)
            out = out.withColumn(
                "identifiers", F.when(hit, merged).otherwise(F.col("identifiers"))
            )
        return out

    table.transform(build)
    return {"updated": 1}
