#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and
order-insensitive values. Usage:

    python tools/check_correctness.py [--json OUT] [--layout stress] [sf_dir] [query_name ...]
    python tools/check_correctness.py --fixture {nullvals,nullkeys,nonfinite,unicode,pathological,timeskew} [query_name ...]

``--fixture`` builds the named degenerate fixture from sf0.001 via
tools/build_degenerate_fixtures.py (the same builders the test suite
imports), runs the full sweep over it, and writes
CORRECTNESS_DEGEN_<name>.json — the one-command reproduction of the
"228/228 on all fixtures" claim (clean sf0.001/sf0.01 plus the
degenerate copies).

Results too large for a single-node collect (spark.driver.maxResultSize)
degrade automatically to a distributed row-count comparison, recorded as
``mode: rows_only_bigresult`` — output-bound queries (q87b's near-dup
pairs) legitimately exceed driver memory on large replicas while both
engines still agree on the full result's cardinality.

``--layout stress`` runs the sweep under a radically different physical
layout — 64 KB input splits, 64-way shuffle, AQE disabled — the task
geometry a 1000-executor cluster would see. Any query whose hash depends
on partition layout (per-partition ids, within-partition ordering,
accumulation order) fails here even though the default layout hides it.
Default JSON artifact: CORRECTNESS_LAYOUT.json.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

JSON_OUT = None
FIXTURE = None
LAYOUT = None
SF_DIR = "/root/testdata/sf0.01"
ONLY: set[str] = set()


def _parse_cli() -> None:
    """Parse ``sys.argv`` into the module globals. Called ONLY under
    ``__main__``: this module is imported by tests and gate_rehearsal,
    and parsing at import time read pytest's argv — any pytest flag this
    script doesn't know (e.g. ``--durations=40``) aborted the entire
    test collection with an INTERNALERROR.

    Order-independent flag parsing (2026-08-16 ADVICE: the old
    leading-token chain only recognized flags in one fixed order, so
    `--layout stress --json out.json` silently treated `--json` as the
    positional sf_dir)."""
    global JSON_OUT, FIXTURE, LAYOUT, SF_DIR, ONLY
    _args = sys.argv[1:]
    _FLAGS = {"--json", "--layout", "--fixture"}
    _positional: list[str] = []
    _i = 0
    while _i < len(_args):
        tok = _args[_i]
        if tok in _FLAGS:
            if _i + 1 >= len(_args):
                raise SystemExit(f"{tok} requires a value")
            val = _args[_i + 1]
            if tok == "--json":
                JSON_OUT = val
            elif tok == "--layout":
                LAYOUT = val
            else:
                FIXTURE = val
            _i += 2
        elif tok.startswith("--"):
            raise SystemExit(f"unknown flag {tok!r}; known: {sorted(_FLAGS)}")
        else:
            _positional.append(tok)
            _i += 1
    if LAYOUT is not None:
        if LAYOUT != "stress":
            raise SystemExit(f"unknown --layout {LAYOUT!r}; only 'stress'")
        if JSON_OUT is None:
            JSON_OUT = "/root/repo/CORRECTNESS_LAYOUT.json"
    if FIXTURE is not None:
        from build_degenerate_fixtures import DEFAULT_SRC, build_fixture

        SF_DIR = build_fixture(FIXTURE, src=DEFAULT_SRC)
        print(f"fixture {FIXTURE} built at {SF_DIR} (from {DEFAULT_SRC})")
        if JSON_OUT is None:
            JSON_OUT = f"/root/repo/CORRECTNESS_DEGEN_{FIXTURE}.json"
        ONLY = set(_positional)
    else:
        SF_DIR = _positional[0] if _positional else "/root/testdata/sf0.01"
        ONLY = set(_positional[1:])


# The driver pre-registers exactly these testdata tables as DuckDB views
# (TESTDATA.md); one shared constant so the rehearsal tool cannot drift
# from the real gate's oracle environment.
ORACLE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_oracle_views(con, sf_dir: str) -> None:
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def normalize(df, cols):
    """Sort columns by name, stringify values, sort rows.

    Iterates ``to_numpy()`` rows instead of ``iterrows()`` (which builds a
    pandas Series per row — ~10x slower on million-row results like the
    degenerate-fixture q47 grid, where normalize dominated the parity
    tests). ``to_numpy()`` applies the same cross-column common-dtype
    promotion ``iterrows`` did (mixed int/float frames promote to float —
    value strings are unchanged), except single-dtype datetime frames,
    which iterrows boxed to Timestamps; box those explicitly so the
    stringification stays byte-identical to the historical loop."""
    sub = df[cols]
    arr = sub.to_numpy()
    if arr.dtype.kind in "Mm":  # datetime64/timedelta64: box like iterrows
        arr = sub.astype(object).to_numpy()
    out = []
    for row in arr:
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

    from kafka2delta_spark.queryset import (
        QUERIES,
        ORACLES,
        ROW_ORACLES,
        load_all_querysets,
    )
    from kafka2delta_spark.session import build_session

    load_all_querysets()
    spark = build_session("check_correctness")
    if LAYOUT == "stress":
        # the task geometry of a 1000-executor cluster: tiny input
        # splits, wide shuffles, and no AQE re-planning to coalesce the
        # mess back — layout-sensitive operators have nowhere to hide
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        print("layout=stress: 64 KB splits, 64-way shuffle, AQE off")

    con = duckdb.connect()
    register_oracle_views(con, SF_DIR)

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}

    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None, sec=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err, "sec": sec,
        }

    for name, fn in sorted(QUERIES.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            if "maxResultSize" in str(exc) and name in ORACLES:
                # Result too large to collect — NOT an engine failure:
                # some outputs are genuinely output-bound (q87b's
                # near-dup pairs grow ~quadratically in duplicate-cluster
                # size, by design and documented). At such scales a real
                # verification compares engine-side aggregates instead of
                # materializing rows on one node — degrade HONESTLY to a
                # distributed row-count comparison and record it as
                # rows-only so the artifact shows the weaker check.
                try:
                    spark_n = fn(spark, SF_DIR).count()
                    oracle_n = int(con.execute(
                        f"SELECT count(*) FROM ({ORACLES[name]}) t"
                    ).fetchone()[0])
                except Exception as exc2:  # noqa: BLE001
                    print(f"FAIL  {name}: bigresult count error: {exc2}")
                    record(name, err=f"bigresult count error: {exc2}"[:200])
                    n_fail += 1
                    continue
                took = round(time.time() - t0, 2)
                if spark_n != oracle_n:
                    print(f"FAIL  {name}: bigresult rowcount spark={spark_n} "
                          f"oracle={oracle_n}")
                    record(name, rows_match=False, spark_rows=spark_n,
                           oracle_rows=oracle_n,
                           err="rowcount mismatch (bigresult)", sec=took)
                    n_fail += 1
                    continue
                print(f"rows  {name}: {spark_n} rows ({took:.1f}s) "
                      f"[rows-only: result exceeds driver collect limit]")
                record(name, rows_match=True, spark_rows=spark_n,
                       oracle_rows=oracle_n, sec=took)
                results[name]["mode"] = "rows_only_bigresult"
                n_rows_only += 1
                continue
            print(f"FAIL  {name}: spark error: {exc}")
            record(name, err=f"spark error: {exc}"[:200])
            n_fail += 1
            continue
        took = round(time.time() - t0, 2)
        if name not in ORACLES:
            if name in ROW_ORACLES:
                # Count-only invariant: verify the row count for a real
                # rows_match verdict (values are not SQL-expressible).
                try:
                    expected = int(con.execute(ROW_ORACLES[name]).fetchone()[0])
                except Exception as exc:  # noqa: BLE001
                    print(f"FAIL  {name}: row-oracle error: {exc}")
                    record(name, spark_rows=len(sdf),
                           err=f"row-oracle error: {exc}"[:200], sec=took)
                    n_fail += 1
                    continue
                if len(sdf) != expected:
                    print(f"FAIL  {name}: rowcount spark={len(sdf)} "
                          f"row-oracle={expected}")
                    record(name, rows_match=False, spark_rows=len(sdf),
                           oracle_rows=expected, err="rowcount mismatch",
                           sec=took)
                    n_fail += 1
                    continue
                print(f"rows  {name}: {len(sdf)} rows ({took:.1f}s) "
                      f"[rows-only: count verified]")
                record(name, rows_match=True, spark_rows=len(sdf),
                       oracle_rows=expected, sec=took)
                n_rows_only += 1
                continue
            print(f"rows  {name}: {len(sdf)} rows ({took:.1f}s) [no oracle]")
            record(name, spark_rows=len(sdf), err="no_oracle", sec=took)
            n_rows_only += 1
            continue
        try:
            odf = con.execute(ORACLES[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            record(name, spark_rows=len(sdf), err=f"oracle error: {exc}"[:200], sec=took)
            n_fail += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL  {name}: schema mismatch spark={s_cols} oracle={o_cols}")
            record(name, schema_match=False, spark_rows=len(sdf),
                   oracle_rows=len(odf), err="schema mismatch", sec=took)
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            record(name, rows_match=False, schema_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err="rowcount mismatch", sec=took)
            n_fail += 1
            continue
        s_vals, o_vals = normalize(sdf, s_cols), normalize(odf, s_cols)
        if s_vals != o_vals:
            diffs = [
                (a, b) for a, b in zip(s_vals, o_vals) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err="value mismatch", sec=took)
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sdf)} rows ({took:.1f}s)")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(sdf), oracle_rows=len(odf), sec=took)
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if JSON_OUT:
        import json

        payload = {"sf_dir": SF_DIR, "results": results}
        if FIXTURE:
            payload["fixture"] = FIXTURE
        if LAYOUT:
            payload["layout"] = LAYOUT
        with open(JSON_OUT, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {JSON_OUT}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    _parse_cli()
    raise SystemExit(main())
