#!/usr/bin/env python
"""Compare two bench artifacts and report real movements.

A per-query delta only counts as a regression/improvement when the two
runs' [min, max] spreads do NOT overlap — the host-VM run-to-run variance
on identical code has measured up to +/-25%, so point medians alone are
not evidence (ROUNDLOG round 4). Usage:

    python tools/bench_compare.py BENCH_old.json BENCH_new.json [top_n]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    osp, nsp = old.get("spread", {}), new.get("spread", {})

    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    tot_old = sum(oq[q] for q in common if oq[q] >= 0)
    tot_new = sum(nq[q] for q in common if nq[q] >= 0)
    print(
        f"common {len(common)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x)" if tot_old else "no common queries"
    )
    if added:
        add_t = sum(nq[q] for q in added if nq[q] >= 0)
        print(f"added {len(added)} queries (+{add_t:.1f}s): {', '.join(added[:8])}"
              + (" ..." if len(added) > 8 else ""))
    if removed:
        print(f"removed {len(removed)}: {', '.join(removed[:8])}")

    moved = []
    for q in common:
        a, b = oq.get(q, -1), nq.get(q, -1)
        if a < 0 or b < 0:
            continue
        sa, sb = osp.get(q) or [a, a], nsp.get(q) or [b, b]
        overlap = not (sb[0] > sa[1] or sb[1] < sa[0])
        if not overlap and abs(b - a) >= 0.1:
            moved.append((b - a, q, a, b, sa, sb))
    moved.sort(reverse=True)
    if not moved:
        print("no spread-separated per-query movements")
    for d, q, a, b, sa, sb in moved[:top_n]:
        kind = "REGRESSION" if d > 0 else "improvement"
        print(f"{kind:<12} {q}: {a:.2f}s {sa} -> {b:.2f}s {sb}  ({d:+.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
