"""Sequence packing for LLM pre-training: the concat-and-chunk layout.

Training pipelines concatenate documents within a stream and split the token
stream into fixed-size context windows; each document then occupies a span
of chunks.  This module computes that layout declaratively — per-stream
running token offsets via a window cumsum, chunk ids by integer division —
so the plan is one shuffle on the stream key and stays in whole-stage
codegen (integer math only, bit-exact in any engine).

Scale shape: the window partitions by the stream key (``part_col``), never
globally — a global ordered cumsum would serialize into a single partition.
At 100 TB the stream key is the shard/source, so each partition's cumsum is
independent and the shuffle is the one the data already needs for layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concat_chunk_layout(
    df: DataFrame,
    token_col: str,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each document its span of fixed-``budget`` chunks under
    concat-and-chunk packing, per stream ``part_col`` in ``order_col`` order.

    Returns the input keys plus ``start_offset`` (tokens before this doc in
    its stream), ``first_chunk``/``last_chunk`` (chunk ids the doc touches),
    and ``n_chunks`` (span width).  Zero-token documents occupy no tokens
    and are pinned to the chunk at their offset.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.col(token_col).cast("long")
    cum = F.sum(n_tok).over(w)
    # TRUE integer division (`div`), not floor(double /): Spark's `/` on
    # longs goes through double, which loses exactness past 2^53 cumulative
    # tokens and can round a quotient across an integer boundary — the
    # "integer math only, bit-exact in any engine" contract requires div.
    staged = df.select(
        part_col,
        order_col,
        n_tok.alias("n_tokens"),
        (cum - n_tok).alias("start_offset"),
        F.greatest(cum - 1, cum - n_tok).alias("_last_off"),
    )
    b = int(budget)
    return staged.select(
        part_col,
        order_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {b}").alias("first_chunk"),
        F.expr(f"_last_off div {b}").alias("last_chunk"),
        (
            F.expr(f"_last_off div {b}") - F.expr(f"start_offset div {b}") + 1
        ).alias("n_chunks"),
    )


def bin_pack_layout(
    df: DataFrame,
    token_col: str,
    capacity: int,
    bucket_width: int = 64,
    part_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 1,
) -> DataFrame:
    """Whole-document bin packing, bucketed first-fit-decreasing: pack each
    document UNSPLIT into fixed-``capacity`` bins (the trainer layout that
    avoids cross-document attention, the failure mode
    :func:`concat_chunk_layout` accepts in exchange for zero padding).

    The greedy rule is deliberately window-expressible so any engine
    replays it bit-for-bit: docs are length-bucketed (``n div W``), each
    bin draws only from one (stream, shard, bucket) — docs of near-equal
    length, the regime where first-fit-decreasing is at its best — and
    holds ``k_b = max(1, capacity div bucket_cap)`` of them, filled in
    (length desc, id) order.  So bin membership is pure rank arithmetic:
    ``local_bin = (row_number - 1) div k_b``.  A doc longer than
    ``capacity`` gets ``k_b = 1`` via the ``max(1, ·)`` floor (its bucket
    cap exceeds the capacity) and is flagged ``oversize`` for the caller
    to split or drop.  For tighter (but sequential, non-SQL-replayable)
    packing see :func:`bfd_pack`.

    Returns one row per document: the keys, ``n_tokens``, ``bucket``,
    ``shard``, ``bin_docs`` (= k_b) and ``local_bin``.

    100 TB story: ONE shuffle, on (stream, shard, bucket); the window is
    rank-only (row_number streams, no frame buffering).  ``n_shards``
    splinters hot (stream, bucket) pairs — billions of same-length short
    docs land on one reducer otherwise — at the cost of at most one
    partial bin per extra shard; the shard is a deterministic portable
    hash of the id, so re-runs and oracle replays agree.
    """
    from .text import portable_hash64

    n = F.col(token_col).cast("long")
    w_ = int(bucket_width)
    c_ = int(capacity)
    shard = (
        F.pmod(
            portable_hash64(F.concat(F.lit("pk:"), F.col(id_col).cast("string"))),
            F.lit(n_shards),
        )
        if n_shards > 1
        else F.lit(0).cast("long")
    )
    staged = df.select(
        F.col(part_col),
        F.col(id_col),
        n.alias("n_tokens"),
        F.expr(f"cast({token_col} as long) div {w_}").alias("bucket"),
        shard.alias("shard"),
    ).withColumn(
        "bin_docs",
        F.greatest(F.lit(1).cast("long"), F.expr(f"{c_} div ((bucket + 1) * {w_})")),
    )
    w = Window.partitionBy(part_col, "shard", "bucket").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    return staged.select(
        part_col,
        id_col,
        "n_tokens",
        "bucket",
        "shard",
        "bin_docs",
        (F.row_number().over(w) - 1).cast("long").alias("_rn0"),
    ).select(
        part_col,
        id_col,
        "n_tokens",
        "bucket",
        "shard",
        "bin_docs",
        F.expr("_rn0 div bin_docs").alias("local_bin"),
        (F.col("n_tokens") > c_).alias("oversize"),
    )


def bfd_pack(
    df: DataFrame,
    token_col: str,
    capacity: int,
    part_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 1,
) -> DataFrame:
    """Exact best-fit-decreasing bin packing within (stream, shard) groups
    — the production packing algorithm (Garey & Johnson bound: BFD uses at
    most 11/9·OPT + 2/3 bins), for when the padding budget matters more
    than SQL replayability (:func:`bin_pack_layout` is the
    oracle-replayable arm).

    Within each group, docs are sorted (length desc, id asc) and each doc
    goes to the open bin with the SMALLEST remaining capacity that still
    fits it (ties → lowest bin id), else opens a new bin; a doc longer
    than ``capacity`` gets a singleton bin, flagged oversize.  The bin
    table is a sorted list keyed on (remainder, bin_id) probed with
    ``bisect`` — O(n log n) per group, fully deterministic.

    BFD is inherently sequential (bin state after doc i feeds doc i+1), so
    this is the one packing op that runs as ``applyInPandas`` rather than
    window math — the Spark shape is still one shuffle on (stream, shard),
    and ``n_shards`` bounds group size so the per-group O(n log n) stays
    memory-resident at 100 TB (same knob, same waste trade as
    :func:`bin_pack_layout`).

    Returns one row per document: (part, shard, id, n_tokens, local_bin,
    oversize).
    """
    import bisect

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from .text import portable_hash64

    c_ = int(capacity)
    part_t = StringType() if dict(df.dtypes).get(part_col) == "string" else LongType()
    out_schema = StructType(
        [
            StructField(part_col, part_t),
            StructField("shard", LongType()),
            StructField(id_col, LongType()),
            StructField("n_tokens", LongType()),
            StructField("local_bin", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True], kind="mergesort"
        )
        bins: list[tuple[int, int]] = []  # sorted (remainder, bin_id)
        n_bins = 0
        assigned = []
        for n_tok in pdf["n_tokens"].to_list():
            if n_tok > c_ or not bins:
                i = len(bins)
            else:
                i = bisect.bisect_left(bins, (n_tok, -1))
            if i < len(bins):
                rem, b = bins.pop(i)
                bisect.insort(bins, (rem - n_tok, b))
                assigned.append(b)
            else:
                b = n_bins
                n_bins += 1
                if n_tok <= c_:
                    bisect.insort(bins, (c_ - n_tok, b))
                assigned.append(b)
        return pd.DataFrame(
            {
                part_col: pdf[part_col].to_list(),
                "shard": pdf["shard"].to_list(),
                id_col: pdf[id_col].to_list(),
                "n_tokens": pdf["n_tokens"].to_list(),
                "local_bin": assigned,
                "oversize": [t > c_ for t in pdf["n_tokens"].to_list()],
            }
        )

    n = F.col(token_col).cast("long")
    shard = (
        F.pmod(
            portable_hash64(F.concat(F.lit("pk:"), F.col(id_col).cast("string"))),
            F.lit(n_shards),
        )
        if n_shards > 1
        else F.lit(0).cast("long")
    )
    staged = df.select(
        F.col(part_col),
        F.col(id_col).cast("long").alias(id_col),
        n.alias("n_tokens"),
        shard.alias("shard"),
    )
    return staged.groupBy(part_col, "shard").applyInPandas(pack, schema=out_schema)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic sharded epoch shuffle — the training-loader's
    "different random order every epoch, same order on every re-run" op.

    The permutation key is ``md5(epoch ':' id)``: seeded by the epoch, so
    each epoch is an independent pseudo-random order; derived from the id,
    so resubmissions and stragglers reproduce it exactly (no RNG state to
    checkpoint).  Shard = the portable 32-bit prefix of the same digest
    mod ``n_shards``; position = rank of the key within the shard.

    100 TB story: training readers consume SHARDS, so no global total
    order is ever needed — the plan is one hash exchange on the shard id
    plus an in-partition sort, never a global range sort.  The rank window
    is rank-only (row_number streams, no buffering), and shard populations
    are uniform by construction (hash prefix), so the sort is balanced.
    ``n_shards`` scales with corpus size to keep per-shard sorts
    memory-resident (the same knob as any external sort).

    Returns (id, shard, pos) — pos is 1-based within the shard.
    """
    from .text import portable_hash64

    seed = F.concat_ws(":", F.lit(str(epoch)), F.col(id_col).cast("string"))
    out = df.select(
        F.col(id_col),
        F.pmod(portable_hash64(seed), F.lit(n_shards)).alias("shard"),
        F.md5(seed).alias("_key"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_key").asc(), F.col(id_col).asc())
    return out.select(
        id_col, "shard", F.row_number().over(w).alias("pos")
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic exact-k sample per group — the "cap every source at K
    documents" mixing op, the count-exact complement of rate-based
    stratified sampling (``q_u5``): rank rows within each group by a
    seeded portable hash and keep the ``k`` lowest.  Reseeding ``seed``
    draws an independent sample; re-running reproduces it exactly.

    100 TB story: the rank is a rank-only window filtered on
    ``row_number <= k``, which Spark rewrites with a map-side
    ``WindowGroupLimit`` — every input partition keeps at most k rows per
    group BEFORE the exchange, so the shuffle carries O(partitions × k ×
    groups-per-partition) rows, never the corpus (asserted by the plan
    audit's GROUP_TOPK gate).

    Returns the input rows of the sample plus ``sample_rank`` (1..k
    within the group).
    """
    from .text import portable_hash64

    key = portable_hash64(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def length_bucket_stats(
    df: DataFrame,
    token_col: str,
    group_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Padding-efficiency report for length-bucketed batching — the op a
    training scheduler runs before choosing bucket boundaries: group
    sequences into fixed-width token-length buckets and measure, per
    (group, bucket), how much compute padding-to-the-bucket-cap would
    waste.

    For each row the bucket is ``floor(n_tokens / width)`` and the cap is
    ``(bucket + 1) * width`` (the batch's padded length).  Per (group,
    bucket) we emit the doc count, token sum, observed max, the absolute
    padded-token waste ``n_docs * cap - sum_tokens``, and the fill
    efficiency ``sum_tokens / (n_docs * cap)``.

    100 TB story: one map-combinable hash aggregate on a low-cardinality
    composite key (sources × buckets) — counts/sums/max all combine
    map-side, so the exchange carries one row per (group, bucket) per
    input partition.  Integer math end to end; the single division is
    performed once per output row and rounded to 6 dp.
    """
    bucket = F.floor(F.col(token_col) / F.lit(bucket_width)).cast("long")
    cap = (bucket + 1) * F.lit(bucket_width)
    return (
        df.select(F.col(group_col), F.col(token_col).cast("long").alias("_n"),
                  bucket.alias("bucket"), cap.alias("bucket_cap"))
        .groupBy(group_col, "bucket", "bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("sum_tokens"),
            F.max("_n").alias("max_tokens"),
        )
        .select(
            group_col, "bucket", "bucket_cap", "n_docs", "sum_tokens",
            "max_tokens",
            (F.col("n_docs") * F.col("bucket_cap") - F.col("sum_tokens"))
            .alias("padding_waste"),
            F.round(
                F.col("sum_tokens")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("fill_efficiency"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling without replacement, A-Res style (Efraimidis &
    Spirakis 2006): each row draws a deterministic pseudo-uniform
    ``u ∈ (0, 1]`` from a seeded hash of its id and competes with the key
    ``-ln(u) / w`` — the ``k`` SMALLEST keys are a weight-proportional
    sample without replacement.  The op behind "sample 1M docs
    proportional to quality" in a curation pipeline: reseeding redraws,
    re-running reproduces bit-for-bit (no RNG state, no rejection loop).

    Weights are floored at 1e-6 so zero/negative-quality rows keep a
    (vanishing) chance instead of dividing by zero.

    100 TB story: the key is scan-side arithmetic (hash + ln, whole-stage
    codegen) and the global top-k compiles to ``TakeOrderedAndProject`` —
    per-partition k-row heaps, ONE k-row exchange, never a global sort.
    That is the streaming-reservoir property of A-Res expressed as a
    Spark plan: each partition maintains its own reservoir and the driver
    merges k-row summaries.  Selection orders by the ROUNDED key with an
    id tie-break so the boundary is engine-portable (ln differs across
    libms only below the 6 dp round).
    """
    from .text import portable_hash64

    u = (
        portable_hash64(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
        + F.lit(1)
    ) / F.lit(4294967297.0)  # (0, 1]: hash is uniform on [0, 2^32-1]
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-6))
    skey = F.round(-F.log(u) / w, 6)
    return (
        df.select(F.col(id_col), F.col(weight_col), skey.alias("sample_key"))
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def sliding_window_layout(
    df: DataFrame,
    token_col: str,
    id_col: str,
    window: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Overlapping sliding-window layout for long-document training — the
    "split every doc into windows of W tokens with stride S" op that
    complements :func:`concat_chunk_layout` (which packs SHORT docs; this
    slices LONG ones).  Windows start at 0, S, 2S, … while the start is
    inside the document, so every token is covered and only the last
    window may be short.

    Pure integer layout math from the token count — the text itself never
    moves: downstream slicing joins this layout back to the tokens (or
    feeds a reader that seeks).  Emits (id, win_idx, win_start, win_len).

    100 TB story: ``sequence()`` + ``explode`` generate window indices
    scan-side with zero shuffles — the fan-out is ~n_tokens/S per doc and
    stays inside whole-stage codegen.  No window function, no state:
    each output row is pure arithmetic on (n_tokens, win_idx).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # With S > W the layout would subsample with gaps AND could leave
        # the tail uncovered — not a sliding window.  Refuse rather than
        # silently break the every-token-covered contract above.
        raise ValueError("stride must be <= window (overlapping layout)")
    n = F.col(token_col).cast("long")
    last_k = F.floor((n - 1) / F.lit(stride)).cast("long")
    ks = F.sequence(F.lit(0).cast("long"), last_k)
    out = df.where(n > 0).select(
        F.col(id_col),
        n.alias("_n"),
        F.explode(ks).alias("win_idx"),
    )
    start = F.col("win_idx") * F.lit(stride)
    return out.select(
        id_col,
        "win_idx",
        start.alias("win_start"),
        F.least(F.lit(window).cast("long"), F.col("_n") - start).alias("win_len"),
    )


# DoReMi-style domain-mixture reweighting (Xie et al. 2023, "DoReMi:
# Optimizing Data Mixtures Speeds Up Language Model Pretraining" — the
# public group-DRO update rule).  Shared hyperparameters + expression
# strings: the oracle generator reads these, so the arms cannot drift.
DOREMI_PARAMS = {"rounds": 5, "eta": 1.0, "smooth": 0.01}


def doremi_init_sql() -> str:
    return "ROUND(CAST(1.0 AS DOUBLE) / k, 9)"


def doremi_w_sql(eta: float) -> str:
    """Exponentiated-gradient step: w_k = alpha_k · exp(eta · excess_k),
    9-dp rounded and DECIMAL-held so the normalization sum is exact."""
    return (
        f"CAST(ROUND(alpha * exp(CAST({eta!r} AS DOUBLE) * excess), 9)"
        " AS DECIMAL(28,9))"
    )


def doremi_alpha_sql(smooth: float) -> str:
    """Normalize + uniform smoothing: alpha'_k = (1−c)·w_k/Σw + c/K."""
    c = f"CAST({smooth!r} AS DOUBLE)"
    return (
        f"ROUND((CAST(1.0 AS DOUBLE) - {c})"
        f" * (CAST(w AS DOUBLE) / CAST(sw AS DOUBLE)) + {c} / k, 9)"
    )


def doremi_weights(
    dom: DataFrame,
    rounds: int = 5,
    eta: float = 1.0,
    smooth: float = 0.01,
) -> DataFrame:
    """DoReMi domain reweighting over a per-domain loss relation
    ``(source, loss, excess)``: ``rounds`` exponentiated-gradient updates
    from the uniform mixture — domains with positive excess loss (harder
    than the reference) are upweighted multiplicatively, then the mixture
    renormalizes with a ``smooth``/K uniform floor so no domain starves.

    In the paper the excess is re-measured between rounds by retraining
    the proxy model; this op is the UPDATE MACHINERY with the excess held
    by the caller (a production loop alternates external proxy training
    with exactly this relation-level update).

    100 TB story: the relation is K rows (one per domain) — every round
    is a K-row projection plus a 1-row broadcast of the normalizer; the
    only corpus-scale work is the per-domain loss the caller computes
    (one LM-scoring scan).  Returns (source, loss, excess, weight)
    ordered by source; weights sum to 1 up to 9-dp rounding.
    """
    # the caller's loss relation is corpus-derived: checkpoint the K-row
    # result ONCE so the per-round normalizer jobs below never re-execute
    # the LM cascade (and each round checkpoints its K rows, cutting the
    # lineage like every other driver-loop op)
    dom = dom.localCheckpoint(eager=True)
    k_df = dom.agg(F.count(F.lit(1)).alias("k"))
    cur = dom.crossJoin(F.broadcast(k_df)).withColumn(
        "alpha", F.expr(doremi_init_sql())
    )
    for _ in range(rounds):
        cur = cur.withColumn("w", F.expr(doremi_w_sql(eta)))
        sw = cur.agg(F.sum("w").alias("sw"))
        cur = (
            cur.crossJoin(F.broadcast(sw))
            .withColumn("alpha", F.expr(doremi_alpha_sql(smooth)))
            .drop("w", "sw")
            .localCheckpoint(eager=True)
        )
    return cur.select(
        "source", "loss", "excess", F.col("alpha").alias("weight")
    ).orderBy("source")
