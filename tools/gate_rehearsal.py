#!/usr/bin/env python
"""Rehearse the driver's correctness gate through the driver's own layer.

The driver records the first 50 entries of ``__spark_entry__.queries()``
in sorted-name order and compares each against ``oracle_sql()`` with a
column-sort + stringify + row-sort compare. This tool does exactly that
(reusing ``check_correctness.normalize``) so a gate rotation can be
verified end-to-end before the round's driver run. Usage:

    python tools/gate_rehearsal.py [sf_dir] [--json out.json]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from tools.check_correctness import (  # noqa: E402
    normalize,
    register_oracle_views,
)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from kafka2delta_spark.session import build_session

    spark = build_session("gate_rehearsal")
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    gate = sorted(qmap)[:50]  # the driver's selection rule, verbatim
    n_alias = sum(1 for n in gate if not n.startswith("q"))
    print(f"gate block: {len(gate)} entries, {n_alias} aliases; "
          f"first={gate[0]} last={gate[-1]}")

    con = duckdb.connect()
    register_oracle_views(con, sf_dir)

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name in gate:
        t0 = time.time()
        try:
            sdf = qmap[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            results[name] = {"err": f"spark error: {exc}"[:200]}
            n_fail += 1
            continue
        took = round(time.time() - t0, 2)
        if name not in omap:
            print(f"rows  {name}: {len(sdf)} rows [no oracle]")
            results[name] = {"spark_rows": len(sdf), "err": "no_oracle"}
            n_rows_only += 1
            continue
        try:
            odf = con.execute(omap[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            results[name] = {"err": f"oracle error: {exc}"[:200]}
            n_fail += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        ok = (
            s_cols == o_cols
            and len(sdf) == len(odf)
            and normalize(sdf, s_cols) == normalize(odf, s_cols)
        )
        results[name] = {
            "rows_match": len(sdf) == len(odf),
            "schema_match": s_cols == o_cols,
            "hash_match": ok,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "sec": took,
        }
        if ok:
            print(f"PASS  {name}: {len(sdf)} rows ({took:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: schema={s_cols == o_cols} "
                  f"rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
