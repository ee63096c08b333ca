"""functions/text.py:append_text_index — the incremental posting append:
only touched buckets gain files, probes see old + new postings, and the
incremental build equals a from-scratch full build posting-for-posting."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from qcfractal_spark.functions.text import (
    append_text_index,
    phrase_hits_indexed,
    write_text_index,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta gamma delta"),
        (3, "alpha delta epsilon"),
        (4, "gamma alpha beta gamma"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_append_equals_full_rebuild(spark, tmp_path):
    docs = _docs(spark)
    full = str(tmp_path / "full")
    incr = str(tmp_path / "incr")
    write_text_index(docs, full)
    write_text_index(docs.where(F.col("doc_id") <= 2), incr)
    append_text_index(docs.where(F.col("doc_id") > 2), incr)
    a = {
        (r["term"], r["doc_id"], r["pos"])
        for r in spark.read.parquet(full).collect()
    }
    b = {
        (r["term"], r["doc_id"], r["pos"])
        for r in spark.read.parquet(incr).collect()
    }
    assert a == b


def test_append_touches_only_its_buckets(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "touch")
    write_text_index(docs.where(F.col("doc_id") <= 3), path)
    before = {
        d: len(glob.glob(os.path.join(path, d, "part-*")))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    append_text_index(
        spark.createDataFrame([(9, "zeta")], "doc_id long, text string"), path
    )
    after = {
        d: len(glob.glob(os.path.join(path, d, "part-*")))
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    grown = [d for d in after if after[d] > before.get(d, 0)]
    assert len(grown) == 1  # the single new term lands in exactly one bucket
    untouched = [d for d in before if d not in grown]
    assert all(after[d] == before[d] for d in untouched)


def test_probe_sees_appended_postings(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "probe")
    write_text_index(docs.where(F.col("doc_id") <= 2), path)
    append_text_index(
        spark.createDataFrame(
            [(7, "x alpha beta gamma y")], "doc_id long, text string"
        ),
        path,
    )
    hits = {
        r["doc_id"]: r["first_pos"]
        for r in phrase_hits_indexed(spark, path, ["alpha", "beta", "gamma"]).collect()
    }
    assert hits == {1: 0, 7: 1}
