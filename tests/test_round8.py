"""Round-8 additions: interleave anti-clumping, diversity-report bounds,
phrase-hit brute-force parity.  (Oracle value-parity for all three is the
registry gate; these pin the algebraic contracts the oracle can't state.)"""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from qcfractal_spark.queries import (
    q_a25_diversity,
    q_tx_phrase_hits,
    q_u12_interleave,
)


def test_u12_round_robin_anti_clumping(spark):
    """Sorting by interleave_key, any consecutive run of <= n_sources docs
    touches n_sources DISTINCT sources while every source still has docs
    remaining (strict round-robin), and the schedule is a permutation."""
    rows = q_u12_interleave(spark, SF_SMOKE).collect()
    n_docs = len(rows)
    assert len({r["doc_id"] for r in rows}) == n_docs  # permutation
    order = sorted(rows, key=lambda r: r["interleave_key"])
    keys = [r["interleave_key"] for r in order]
    assert len(set(keys)) == n_docs  # key is a total order
    srcs = sorted({r["source"] for r in rows})
    n_src = len(srcs)
    per_src = {s: sum(1 for r in rows if r["source"] == s) for s in srcs}
    min_count = min(per_src.values())
    # while every source has docs left (first min_count full rounds), each
    # block of n_src consecutive docs is one visit to every source
    for b in range(min_count):
        block = {r["source"] for r in order[b * n_src:(b + 1) * n_src]}
        assert len(block) == n_src, f"clumped block at round {b}"


def test_u12_rank_is_epoch_hash_order(spark):
    """epoch_rank within a source follows the seeded portable hash — the
    same draw epoch_shuffle uses, so re-runs reproduce it exactly."""
    a = {r["doc_id"]: r["epoch_rank"] for r in q_u12_interleave(spark, SF_SMOKE).collect()}
    b = {r["doc_id"]: r["epoch_rank"] for r in q_u12_interleave(spark, SF_SMOKE).collect()}
    assert a == b


def test_a25_diversity_bounds(spark):
    row = q_a25_diversity(spark, SF_SMOKE).collect()[0]
    n = row["n_sources"]
    assert n > 1
    # entropy in (0, log2 n] (+6dp rounding slack); HHI in [1/n, 1]
    assert 0.0 < row["entropy_bits"] <= math.log2(n) + 1e-4
    assert 1.0 / n - 1e-4 <= row["hhi"] <= 1.0
    assert 0.0 < row["top_share"] < 1.0
    # uniform-mix sanity: entropy near max implies HHI near 1/n
    if row["entropy_bits"] > math.log2(n) - 0.05:
        assert row["hhi"] < 1.0 / n + 0.01


def test_phrase_hits_match_brute_force(spark):
    """The posting-list join must find exactly the occurrences a plain
    Python scan over the tokenized docs finds."""
    from qcfractal_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    want = {}
    for r in docs:
        if r["text"] is None:
            continue
        toks = [t for t in r["text"].strip().lower().split() if t]
        hits = [
            i
            for i in range(len(toks) - 2)
            if toks[i] == "big" and toks[i + 1] == "order" and toks[i + 2] == "scan"
        ]
        if hits:
            want[r["doc_id"]] = (len(hits), min(hits))
    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in q_tx_phrase_hits(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0


def test_stream_url_dedup_matches_batch_first_occurrence(spark):
    """The streaming URL dedup keeps exactly one row per canonical URL
    (parity with batch dropDuplicates when all data fits one batch), and
    cross-micro-batch state suppresses later re-arrivals of the same page
    in a different surface form."""
    import os
    import tempfile
    from datetime import datetime

    from qcfractal_spark.streaming.ingest import stream_url_dedup

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, "https://www.site1.com/p/1"),
        (1, t0, "http://site1.com/p/1/"),          # same page, new surface
        (2, t0, "https://site1.com:443/p/1?utm_x=1"),  # same page again
        (3, t0, "https://blog.site2.co.uk/p/2"),
    ]
    schema = "doc_id long, ts timestamp, url string"
    batch = spark.createDataFrame(rows, schema)
    got_batch = stream_url_dedup(batch).collect()
    assert len(got_batch) == 2
    assert {r["canonical_url"] for r in got_batch} == {
        "site1.com/p/1", "blog.site2.co.uk/p/2"
    }
    assert {r["domain"] for r in got_batch} == {"site1.com", "site2.co.uk"}

    src = spark.createDataFrame(rows, schema)
    with tempfile.TemporaryDirectory() as d:
        land = os.path.join(d, "landing")
        # 2 files => 2 micro-batches: the duplicate pages straddle batches
        src.repartition(2).write.parquet(land)
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        out = stream_url_dedup(stream, watermark="3650 days")
        qh = (
            out.writeStream.format("memory")
            .queryName("url_stream")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qh.awaitTermination(120)
        survivors = spark.sql("SELECT canonical_url FROM url_stream").collect()
    assert len(survivors) == 2
    assert {r["canonical_url"] for r in survivors} == {
        "site1.com/p/1", "blog.site2.co.uk/p/2"
    }
