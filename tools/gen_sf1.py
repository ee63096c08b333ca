"""Generate a local sf1 decade-scaling dataset from sf0.1 (VERDICT r6
item 5): 10 deterministic copies of documents (word-shuffled per copy so
copies are NOT near-duplicates of each other — duplicate DENSITY stays at
the sf0.1 level instead of exploding into 10-cliques) and 10 copies of
embeddings (vector rolled by the copy index — random vectors stay random,
norms preserved).  Other tables are symlinked from sf0.1: the scaling
targets (dd_substring, dd_minhash_lsh, dd_cluster, pipe_prepare,
sim_ivf_batch_topk) read only documents/embeddings.

Output: /root/repo/scratch/sf1/*.parquet (git-ignored scratch).
Usage: python tools/gen_sf1.py
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scratch/sf1"
COPIES = 10
ID_STRIDE = 1_000_000


def main() -> None:
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    out = []
    for c in range(COPIES):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * ID_STRIDE
        if c > 0:
            rng = np.random.RandomState(1000 + c)

            # Word-shuffle AND token-substitute each copy: shuffling alone
            # keeps the token SET identical, which leaves order-insensitive
            # signatures (SimHash over distinct tokens, TF vectors)
            # IDENTICAL across copies — the r9 sf1 run measured
            # dd_simhash_pairs at exponent +1.53 because every page became
            # a 10-clique of simhash-equal twins.  Replacing every 5th
            # token with a copy-tagged variant perturbs the token set
            # (~20% — far past the Hamming<=3 band radius) so duplicate
            # DENSITY stays at the sf0.1 level for order-insensitive
            # signatures too, matching this generator's stated contract.
            def _mutate(t, c=c, rng=rng):
                ws = t.split(" ")
                perm = rng.permutation(len(ws))
                ws = [ws[i] for i in perm]
                return " ".join(
                    w if i % 5 else f"{w}x{c}" for i, w in enumerate(ws)
                )

            d["text"] = [
                _mutate(t) if isinstance(t, str) and t else t for t in d["text"]
            ]
        out.append(d)
    big = pd.concat(out, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        os.path.join(DST, "documents.parquet"),
    )
    print(f"documents: {len(big)} rows")

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    out = []
    for c in range(COPIES):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + c * ID_STRIDE
        if c > 0:
            e["embedding"] = [
                np.roll(np.asarray(v, dtype=np.float32), c).tolist()
                for v in e["embedding"]
            ]
        out.append(e)
    bige = pd.concat(out, ignore_index=True)
    schema = pq.read_schema(os.path.join(SRC, "embeddings.parquet"))
    pq.write_table(
        pa.Table.from_pandas(bige, preserve_index=False).cast(
            pa.schema([schema.field(i) for i in range(len(schema.names))])
        ),
        os.path.join(DST, "embeddings.parquet"),
    )
    print(f"embeddings: {len(bige)} rows")

    # Round-8 additions (VERDICT r7 item 5): scale the tables behind the
    # iterative newcomers too — events (t11_scd2 / t12_islands: 10×
    # users, per-user history unchanged — more window partitions, same
    # per-key work) and the customer→orders→lineitem hierarchy
    # (g1_pagerank / j8_closure: 10 DISJOINT copies of the graph — same
    # diameter, 10× nodes and edges, so per-round join cost per unit is
    # the measured quantity).  Nations/regions stay shared roots.
    ev = pq.read_table(os.path.join(SRC, "events.parquet")).to_pandas()
    out = []
    for c in range(COPIES):
        e = ev.copy()
        e["event_id"] = e["event_id"] + c * ID_STRIDE
        e["user_id"] = e["user_id"] + c * ID_STRIDE
        out.append(e)
    bige = pd.concat(out, ignore_index=True)
    _write_like(bige, os.path.join(SRC, "events.parquet"),
                os.path.join(DST, "events.parquet"))
    print(f"events: {len(bige)} rows")

    KEY_OFFSETS = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey"],
    }
    for t, keys in KEY_OFFSETS.items():
        base = pq.read_table(os.path.join(SRC, f"{t}.parquet")).to_pandas()
        out = []
        for c in range(COPIES):
            d = base.copy()
            for k in keys:
                d[k] = d[k] + c * ID_STRIDE
            out.append(d)
        big_t = pd.concat(out, ignore_index=True)
        _write_like(big_t, os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(DST, f"{t}.parquet"))
        print(f"{t}: {len(big_t)} rows")

    for t in ("region", "nation", "supplier", "part"):
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    print("done:", DST)


def _write_like(df: pd.DataFrame, src_path: str, dst_path: str) -> None:
    """Write df with the SOURCE file's schema (keeps timestamp units and
    nullability identical to the sf0.1 originals, the same cast the
    embeddings writer does)."""
    if os.path.islink(dst_path):
        os.unlink(dst_path)
    schema = pq.read_schema(src_path)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([schema.field(i) for i in range(len(schema.names))])
        ),
        dst_path,
    )


if __name__ == "__main__":
    main()
