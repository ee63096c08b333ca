"""Bin-packing contracts (bin_pack_layout, bfd_pack): validity, waste
ordering vs the baselines, determinism, shard behavior, and BFD tightness
on a constructed instance.  The bucketed layout additionally has a DuckDB
oracle via the registry (pk_bin_pack); BFD's per-doc assignment is
sequential by nature, so these algebraic gates pin the bin table itself,
while the registry's pk_bfd_pack gates the same invariants (capacity,
dense bins, bin-count lower bound, padding ≤ FFD/singleton baselines) as
hash-checked SQL columns at the driver (r12 VERDICT item 2)."""

from __future__ import annotations

import pytest

from qcfractal_spark.functions.packing import (
    bfd_pack,
    bin_pack_layout,
    concat_chunk_layout,
)

CAP = 100


def _docs(spark, lengths, sources=None):
    rows = [
        (sources[i] if sources else "s0", i, int(n))
        for i, n in enumerate(lengths)
    ]
    return spark.createDataFrame(rows, "source string, doc_id long, n_tok long")


def _waste(assignments, cap=CAP):
    """Total padded waste over NON-oversize bins: n_bins*cap - packed tokens."""
    bins = {}
    for r in assignments:
        d = r.asDict()
        key = (d["source"], d["shard"], d.get("bucket", 0), d["local_bin"])
        if not d["oversize"]:
            bins[key] = bins.get(key, 0) + d["n_tokens"]
    return sum(cap - tot for tot in bins.values())


def test_bucketed_layout_validity_and_waste(spark):
    lengths = [90, 60, 55, 50, 33, 33, 32, 20, 12, 11, 10, 9, 5, 3, 2, 1]
    out = bin_pack_layout(
        _docs(spark, lengths), "n_tok", capacity=CAP, bucket_width=10
    ).collect()
    assert len(out) == len(lengths)  # every doc assigned exactly once
    # bin validity: sum of any non-oversize bin <= capacity
    bins = {}
    for r in out:
        assert not r["oversize"]
        bins.setdefault((r["source"], r["shard"], r["bucket"], r["local_bin"]), []).append(
            r["n_tokens"]
        )
    assert all(sum(v) <= CAP for v in bins.values())
    # docs per bin never exceeds the bucket's k_b
    k_of = {r["doc_id"]: r["bin_docs"] for r in out}
    for key, members in bins.items():
        assert len(members) <= max(k_of.values())
    # packing beats the no-packing baseline (pad every doc to capacity)
    assert _waste(out) < CAP * len(lengths) - sum(lengths)


def test_bucketed_layout_oversize_singleton(spark):
    out = bin_pack_layout(
        _docs(spark, [250, 150, 40, 30]), "n_tok", capacity=CAP, bucket_width=10
    ).collect()
    over = [r for r in out if r["oversize"]]
    assert {r["n_tokens"] for r in over} == {250, 150}
    # each oversize doc is alone in its bin (k_b floored to 1)
    assert all(r["bin_docs"] == 1 for r in over)


def test_bfd_validity_waste_and_determinism(spark):
    lengths = [90, 60, 55, 50, 33, 33, 32, 20, 12, 11, 10, 9, 5, 3, 2, 1]
    df = _docs(spark, lengths)
    out = bfd_pack(df, "n_tok", capacity=CAP).collect()
    out2 = bfd_pack(df, "n_tok", capacity=CAP).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))  # bit-identical re-run
    assert len(out) == len(lengths)
    bins = {}
    for r in out:
        assert not r["oversize"]
        bins.setdefault(r["local_bin"], 0)
        bins[r["local_bin"]] += r["n_tokens"]
    assert all(tot <= CAP for tot in bins.values())
    # BFD waste <= the bucketed layout's on the same corpus ...
    bucketed = bin_pack_layout(df, "n_tok", capacity=CAP, bucket_width=10).collect()
    bfd_waste = len(bins) * CAP - sum(lengths)
    assert bfd_waste <= _waste(bucketed)
    # ... and strictly < the pad-to-capacity baseline
    assert bfd_waste < CAP * len(lengths) - sum(lengths)


def test_bfd_best_fit_rule_exactness(spark):
    """Pin the best-fit rule, walked in decreasing order: 60 opens bin A
    (rem 40); 50 doesn't fit A, opens bin B (rem 50); 40 fits BOTH but
    best-fit takes the smallest sufficient remainder — A's exact 40, not
    B's 50; 35 then fits only B.  Result: {60,40}{50,35}, optimal."""
    out = {
        r["doc_id"]: r["local_bin"]
        for r in bfd_pack(
            _docs(spark, [60, 50, 40, 35]), "n_tok", capacity=CAP
        ).collect()
    }
    assert out[2] == out[0]  # 40 joins the 60-bin (best fit, rem 40 < 50)
    assert out[3] == out[1]  # 35 joins the 50-bin
    assert len(set(out.values())) == 2


def test_bfd_oversize_and_zero_length(spark):
    out = bfd_pack(
        _docs(spark, [150, 0, 0, 10]), "n_tok", capacity=CAP
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["oversize"] and not by_id[3]["oversize"]
    # oversize bin is a singleton: nothing else shares its local_bin
    over_bin = by_id[0]["local_bin"]
    assert [r["doc_id"] for r in out if r["local_bin"] == over_bin] == [0]
    # zero-length docs still get exactly one assignment
    assert by_id[1] is not None and by_id[2] is not None


def test_sharding_partitions_are_independent(spark):
    lengths = list(range(1, 41))
    df = _docs(spark, lengths)
    sharded = bfd_pack(df, "n_tok", capacity=CAP, n_shards=4).collect()
    assert {r["shard"] for r in sharded} == {0, 1, 2, 3}
    # per-(source, shard) bins are valid independently
    bins = {}
    for r in sharded:
        bins.setdefault((r["shard"], r["local_bin"]), 0)
        bins[(r["shard"], r["local_bin"])] += r["n_tokens"]
    assert all(tot <= CAP for tot in bins.values())
    # sharding costs at most (n_shards - 1) extra partial bins vs unsharded
    unsharded_bins = len(
        {r["local_bin"] for r in bfd_pack(df, "n_tok", capacity=CAP).collect()}
    )
    assert len(bins) <= unsharded_bins + 3 + 1


def test_packing_vs_concat_chunk_tradeoff(spark):
    """concat-and-chunk is the waste lower bound (it splits docs): its
    per-stream waste is < one capacity; whole-doc packing pays more waste
    but never splits — the documented trade both layouts' docstrings make."""
    lengths = [90, 60, 55, 50, 33, 33, 32, 20, 12, 11, 10, 9, 5, 3, 2, 1]
    df = _docs(spark, lengths)
    chunks = concat_chunk_layout(df, "n_tok", budget=CAP, order_col="doc_id").collect()
    n_chunks = max(r["last_chunk"] for r in chunks) + 1
    concat_waste = n_chunks * CAP - sum(lengths)
    assert concat_waste < CAP  # splitting packs to within one window
    bfd_bins = {
        r["local_bin"] for r in bfd_pack(df, "n_tok", capacity=CAP).collect()
    }
    bfd_waste = len(bfd_bins) * CAP - sum(lengths)
    assert concat_waste <= bfd_waste
    # and BFD stays within the 11/9 OPT + 1 bin envelope vs the token lower bound
    import math

    opt_lb = math.ceil(sum(lengths) / CAP)
    assert len(bfd_bins) <= math.ceil(11 / 9 * opt_lb) + 1
