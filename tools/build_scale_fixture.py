#!/usr/bin/env python
"""Build a PERF-ONLY scale-up fixture: replicate an sf dir K times with
shifted keys, producing ~K x the rows of the source.

PURPOSE: performance A/Bs and core-scaling studies at scales the driver
ships no testdata for (VERDICT r12 items 4 and 7 — e.g. q36's parked
composite-histogram fusion is row-sized at sf0.1 and needs sf0.3+ to show
its domain bound). The replicas shift every key column by
``i * 10^12`` so joins fan out exactly K-fold with no cross-replica
collisions; value columns are left byte-identical, so value DOMAINS
(quantities, prices, event types) stay realistic while row counts scale.

NEVER use this for correctness claims — the driver's oracle only sees
/root/testdata. Output goes to /tmp by default and is keyed by the
source's identity so it rebuilds after a testdata regeneration.

Usage: python tools/build_scale_fixture.py [K] [src] [dst]
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 10**12

# key columns to shift per table; everything else copies verbatim
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# region/nation are fixed dimensions (25/5 rows) — replicating them would
# break FK semantics; copy once.
COPY_ONCE = {"region", "nation"}


def build(k: int, src: str, dst: str) -> str:
    st = os.stat(os.path.join(src, "lineitem.parquet"))
    out = dst or os.path.join(
        "/tmp", f"sfperf_{os.path.basename(src.rstrip('/'))}_x{k}_{st.st_size}"
    )
    if os.path.isdir(out) and len(os.listdir(out)) == len(KEYS):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYS.items():
        srcf = f"{src}/{t}.parquet"
        dstf = f"{out}/{t}.parquet"
        if t in COPY_ONCE or not keys:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{srcf}')) TO '{dstf}' (FORMAT PARQUET)"
            )
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{srcf}')").fetchall()]
        sels = []
        for i in range(k):
            proj = ", ".join(
                f'("{c}" + {i * SHIFT}) AS "{c}"' if c in keys else f'"{c}"'
                for c in cols
            )
            sels.append(f"SELECT {proj} FROM read_parquet('{srcf}')")
        con.execute(
            f"COPY ({' UNION ALL '.join(sels)}) TO '{dstf}' (FORMAT PARQUET)"
        )
    con.close()
    return out


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else None
    print(build(k, src, dst))
