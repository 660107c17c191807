#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def normalize(df, cols):
    """Sort columns by name, stringify values, sort rows."""
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                # Exact (shortest round-trip) repr: the driver's gate hashes
                # exact values, so a sub-1e-6 divergence must fail here too.
                vals.append(repr(v))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                vals.append(str([x for x in v]))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    import duckdb

    from kafka2delta_spark.queryset import QUERIES, ORACLES, load_all_querysets
    from kafka2delta_spark.session import build_session

    load_all_querysets()
    spark = build_session("check_correctness")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(QUERIES.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        took = time.time() - t0
        if name not in ORACLES:
            print(f"rows  {name}: {len(sdf)} rows ({took:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL  {name}: schema mismatch spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        s_vals, o_vals = normalize(sdf, s_cols), normalize(odf, s_cols)
        if s_vals != o_vals:
            diffs = [
                (a, b) for a, b in zip(s_vals, o_vals) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sdf)} rows ({took:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
