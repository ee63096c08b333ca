"""Property tests for the round-8 operators: BFD packing against a pure
reference implementation on random instances, bucketed-layout validity, and
fuzzed Spark↔DuckDB byte-parity of the URL canonicalization chain (the
keep-in-sync twins must never drift)."""

from __future__ import annotations

import bisect
import os

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPO_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

CAP = 64


def _ref_bfd(lengths: list[int], cap: int) -> dict[int, int]:
    """Reference best-fit-decreasing: the same rule bfd_pack documents —
    (length desc, id asc) order, smallest sufficient remainder, ties to
    the lowest bin id, oversize docs in singleton bins."""
    order = sorted(range(len(lengths)), key=lambda i: (-lengths[i], i))
    bins: list[tuple[int, int]] = []
    n_bins = 0
    out = {}
    for i in order:
        n = lengths[i]
        j = len(bins) if (n > cap or not bins) else bisect.bisect_left(bins, (n, -1))
        if j < len(bins):
            rem, b = bins.pop(j)
            bisect.insort(bins, (rem - n, b))
            out[i] = b
        else:
            b = n_bins
            n_bins += 1
            if n <= cap:
                bisect.insort(bins, (cap - n, b))
            out[i] = b
    return out


@given(lengths=st.lists(st.integers(min_value=0, max_value=96), min_size=1, max_size=80))
@settings(**SETTINGS)
def test_bfd_matches_reference_on_random_instances(spark, lengths):
    from qcfractal_spark.functions.packing import bfd_pack

    df = spark.createDataFrame(
        [("s", i, n) for i, n in enumerate(lengths)],
        "source string, doc_id long, n_tok long",
    ).repartition(3)  # partitioning must not matter: groupBy re-collects
    got = {
        r["doc_id"]: r["local_bin"]
        for r in bfd_pack(df, "n_tok", capacity=CAP).collect()
    }
    assert got == _ref_bfd(lengths, CAP)


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=60),
    shards=st.integers(min_value=1, max_value=4),
)
@settings(**SETTINGS)
def test_bucketed_layout_always_valid(spark, lengths, shards):
    from qcfractal_spark.functions.packing import bin_pack_layout

    df = spark.createDataFrame(
        [("s", i, n) for i, n in enumerate(lengths)],
        "source string, doc_id long, n_tok long",
    )
    out = bin_pack_layout(
        df, "n_tok", capacity=CAP, bucket_width=16, n_shards=shards
    ).collect()
    assert len(out) == len(lengths)
    bins: dict[tuple, int] = {}
    for r in out:
        assert r["oversize"] == (r["n_tokens"] > CAP)
        if not r["oversize"]:
            key = (r["shard"], r["bucket"], r["local_bin"])
            bins[key] = bins.get(key, 0) + r["n_tokens"]
    assert all(tot <= CAP for tot in bins.values())


_URL_CHARS = st.text(
    alphabet="abcXY01./:?#&=_-", min_size=0, max_size=24
)


@given(
    scheme=st.sampled_from(["", "http://", "https://", "HTTPS://"]),
    www=st.sampled_from(["", "www.", "WWW."]),
    host=st.sampled_from(
        ["site1.com", "a.b.co.uk", "x.org", "localhost", "s.com:443", "s.com:8080"]
    ),
    rest=_URL_CHARS,
)
@settings(**SETTINGS)
def test_canonical_url_spark_duckdb_parity_fuzz(spark, scheme, www, host, rest):
    """Any URL assembled from the fuzz grammar canonicalizes to the SAME
    bytes in Spark (Java regex) and DuckDB (RE2) — the twin-chain
    contract.  The grammar covers the separators the chain keys on
    (:, /, ?, #, .) in arbitrary combinations."""
    from qcfractal_spark.functions import urls

    raw = f"{scheme}{www}{host}/{rest}"
    s_row = (
        spark.createDataFrame([(raw,)], "url string")
        .select(urls.canonical_url(F.col("url")).alias("c"))
        .collect()[0]
    )
    con = duckdb.connect()
    d_val = con.execute(
        f"SELECT {urls.canonical_url_sql('?')}", [raw]
    ).fetchone()[0]
    assert s_row["c"] == d_val, raw
