#!/usr/bin/env python
"""Compare two bench artifacts and report real movements.

Two defenses against host-VM noise (measured up to ±30% on identical code —
ROUNDLOG rounds 4/8):

* **Spread separation** — a per-query delta only counts when the two runs'
  [min, max] spreads do NOT overlap; point medians alone are not evidence.
* **Calibration normalization** — artifacts written by bench.py since round 8
  carry ``calib_sec`` (median of 3 runs of a fixed, data-independent
  shuffle+agg timed like the queries). When BOTH artifacts have it, totals
  and per-query ratios are additionally reported in calibrated units
  (sec / calib_sec), and only calibrated regressions > 1.2x are flagged as
  real. Older artifacts (r7 and earlier) lack calib; the tool says so
  rather than guessing a correction.

Usage:

    python tools/bench_compare.py BENCH_old.json BENCH_new.json [top_n]
"""

from __future__ import annotations

import json
import sys

CALIBRATED_REGRESSION_THRESHOLD = 1.2


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old.get("queries", {}), new.get("queries", {})
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    ocal, ncal = old.get("calib_sec"), new.get("calib_sec")

    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    tot_old = sum(oq[q] for q in common if oq[q] >= 0)
    tot_new = sum(nq[q] for q in common if nq[q] >= 0)
    print(
        f"common {len(common)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
        f"(raw {tot_new / tot_old:.2f}x)" if tot_old else "no common queries"
    )
    over, nver = old.get("calib_ver", 1), new.get("calib_ver", 1)
    same_ver = over == nver
    if ocal and ncal:
        if tot_old and tot_new:
            cal_old, cal_new = tot_old / ocal, tot_new / ncal
            print(
                f"calibrated (sec/calib): {cal_old:.1f} -> {cal_new:.1f} "
                f"({cal_new / cal_old:.2f}x)  [calib_sec {ocal:.3f} -> "
                f"{ncal:.3f}; host-speed ratio {ncal / ocal:.2f}x]"
            )
        if not same_ver:
            print(
                f"calibration WARNING: estimator versions differ "
                f"(ver {over} vs ver {nver}) — calibrated ratios mix "
                "methodologies, so per-query movements below are reported "
                "RAW (spread-separated only); trust those, not the "
                "calibrated total"
            )
    else:
        missing = [p for p, c in ((old_path, ocal), (new_path, ncal)) if not c]
        print(
            "calibration: NOT COMPARABLE — no calib_sec in "
            + ", ".join(missing)
            + " (pre-round-8 artifact); raw ratios above include host drift"
        )
    if added:
        add_t = sum(nq[q] for q in added if nq[q] >= 0)
        print(f"added {len(added)} queries (+{add_t:.1f}s): {', '.join(added[:8])}"
              + (" ..." if len(added) > 8 else ""))
    if removed:
        print(f"removed {len(removed)}: {', '.join(removed[:8])}")

    # Mixed estimator versions (e.g. a ver-1 calib inflated by the warm-up
    # run ver 2 discards) would deflate cross-version calibrated ratios and
    # silently swallow real spread-separated regressions under the 1.2x
    # threshold — so the movement filter only calibrates within one version.
    calibrated = bool(ocal and ncal and same_ver)
    moved = []
    for q in common:
        a, b = oq.get(q, -1), nq.get(q, -1)
        if a < 0 or b < 0:
            continue
        sa, sb = osp.get(q) or [a, a], nsp.get(q) or [b, b]
        overlap = not (sb[0] > sa[1] or sb[1] < sa[0])
        if overlap or abs(b - a) < 0.1:
            continue
        if calibrated:
            ratio = (b / ncal) / (a / ocal) if a else float("inf")
            # Only a calibrated ratio past the threshold is a real movement;
            # spread-separated raw drift inside it is host envelope.
            if max(ratio, 1 / ratio) <= CALIBRATED_REGRESSION_THRESHOLD:
                continue
            moved.append((ratio, q, a, b, sa, sb))
        else:
            moved.append((b / a if a else float("inf"), q, a, b, sa, sb))
    moved.sort(key=lambda t: t[0], reverse=True)
    unit = "calibrated" if calibrated else "RAW (uncalibrated)"
    if not moved:
        print(f"no spread-separated {unit} per-query movements"
              + (f" past {CALIBRATED_REGRESSION_THRESHOLD}x" if calibrated else ""))
    for r, q, a, b, sa, sb in moved[:top_n]:
        kind = "REGRESSION" if r > 1 else "improvement"
        print(f"{kind:<12} {q}: {a:.2f}s {sa} -> {b:.2f}s {sb}  "
              f"({unit} {r:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
