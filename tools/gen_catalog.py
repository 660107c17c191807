#!/usr/bin/env python
"""Generate QUERIES.md: the full registry catalog (name, module, oracle
kind, first docstring line) — the line-by-line index for auditing the
query surface against SURVEY §2."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets


def main() -> None:
    load_all_querysets()
    lines = [
        "# QUERIES — generated registry catalog",
        "",
        f"{len(QUERIES)} registered queries; {len(ORACLES)} with a DuckDB",
        "value-hash oracle, the rest rows-only by design. Regenerate with",
        "`python tools/gen_catalog.py`.",
        "",
        "| query | module | oracle | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        mod = fn.__module__.replace("kafka2delta_spark.", "")
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        # collapse a sentence that wraps onto the next line
        if doc and len(first) < 60 and len(doc) > 1 and doc[1].strip():
            first = f"{first} {doc[1].strip()}"
        oracle = "hash" if name in ORACLES else "rows-only"
        first = first.replace("|", "\\|")
        lines.append(f"| `{name}` | `{mod}` | {oracle} | {first} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(QUERIES)} queries")


if __name__ == "__main__":
    main()
