"""Generate a local sf10 SPOT-DECADE dataset (r12 VERDICT item 6): a
second scaling decade above scratch/sf1 so the heavy dedup family's
exponents are pinned by TWO decades (sf0.1→sf1→sf10) instead of one.

Only the tables the expensive subset reads are materialized at 100×:
documents + embeddings (the dd_*/sim_*/pipe_* targets) plus the
lineitem/orders/customer hierarchy and events (a23_corr, j8_closure,
tx_* scans); region/nation/supplier/part stay symlinked shared roots.

Same duplicate-density contract as gen_sf1.py: each of the 100 document
copies is word-shuffled AND every-5th-token substituted with a
copy-tagged variant (seeds 1000+c, so copies 1..9 are BIT-IDENTICAL to
the sf1 copies — sf1 ⊂ sf10 by construction), keeping near-dup density
at the sf0.1 level instead of exploding into 100-cliques.  Embedding
copies roll by c (wrapping the dimension) and flip sign once per
wrap-around so no two copies are vector-identical — norms and
randomness preserved.

Output: /root/repo/scratch/sf10/*.parquet (git-ignored scratch).
Usage: python tools/gen_sf10.py
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scratch/sf10"
COPIES = 100
ID_STRIDE = 1_000_000


def _write_like(df: pd.DataFrame, src_path: str, dst_path: str) -> None:
    if os.path.islink(dst_path):
        os.unlink(dst_path)
    schema = pq.read_schema(src_path)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([schema.field(i) for i in range(len(schema.names))])
        ),
        dst_path,
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    out = []
    for c in range(COPIES):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + c * ID_STRIDE
        if c > 0:
            rng = np.random.RandomState(1000 + c)

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
    _write_like(big, os.path.join(SRC, "documents.parquet"),
                os.path.join(DST, "documents.parquet"))
    print(f"documents: {len(big)} rows")

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    out = []
    for c in range(COPIES):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + c * ID_STRIDE
        if c > 0:
            dim = len(np.asarray(emb["embedding"].iloc[0]))
            sign = -1.0 if (c // max(dim, 1)) % 2 else 1.0
            e["embedding"] = [
                (sign * np.roll(np.asarray(v, dtype=np.float32), c)).tolist()
                for v in e["embedding"]
            ]
        out.append(e)
    bige = pd.concat(out, ignore_index=True)
    _write_like(bige, os.path.join(SRC, "embeddings.parquet"),
                os.path.join(DST, "embeddings.parquet"))
    print(f"embeddings: {len(bige)} rows")

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


if __name__ == "__main__":
    main()
