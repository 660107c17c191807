#!/usr/bin/env python
"""Compare two bench artifacts and report real movements.

Two defenses against host-VM noise (measured up to ±30% on identical code —
ROUNDLOG rounds 4/8):

* **Spread separation** — a per-query delta only counts when the two runs'
  [min, max] spreads do NOT overlap; point medians alone are not evidence.
* **Calibration normalization** — artifacts written by bench.py since round 8
  carry ``calib_sec`` (median of runs of a fixed, data-independent
  shuffle+agg timed like the queries). When BOTH artifacts have it, totals
  and per-query ratios are additionally reported in calibrated units
  (sec / calib_sec), and only calibrated regressions > 1.2x are flagged as
  real. Older artifacts (r7 and earlier) lack calib; the tool says so
  rather than guessing a correction.
* **Interval propagation (round 10)** — the calib probe itself is noisy: a
  dedicated 10-sample experiment on this host measured within-session spread
  of 5.07x at the standard 30M-row workload and 5.86x at a 3x (90M-row)
  workload — some 3x runs finished FASTER than 1x runs, i.e. the variance is
  co-tenant scheduling of the shared VM, not probe length, so lengthening
  the probe cannot reach a <1.5x spread. Instead of trusting the point
  ``calib_sec``, the tool derives a host-speed-ratio INTERVAL from each
  artifact's raw ``calib_runs`` (trimmed to the middle samples) and flags a
  per-query movement only when the ENTIRE calibrated-ratio interval clears
  the 1.2x threshold — i.e. even the calib pairing most favorable to "no
  change" still says regression. Movements whose interval straddles the
  threshold are host envelope and are not flagged.

Usage:

    python tools/bench_compare.py BENCH_old.json BENCH_new.json [top_n]
"""

from __future__ import annotations

import json
import sys

CALIBRATED_REGRESSION_THRESHOLD = 1.2


def _calib_interval(art: dict) -> tuple[float, float] | None:
    """[lo, hi] host-speed interval from an artifact's raw calib samples.

    Drops the single min and max of ``calib_runs`` (6 samples under
    calib_ver 2) and returns the range of the middle samples. Falls back to
    the point ``calib_sec`` (zero-width interval) for artifacts that carry a
    calib_sec but no raw samples.
    """
    runs = sorted(r for r in art.get("calib_runs", []) if r and r > 0)
    if len(runs) >= 4:
        trimmed = runs[1:-1]
        return trimmed[0], trimmed[-1]
    cal = art.get("calib_sec")
    return (cal, cal) if cal else None


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
    oiv, niv = _calib_interval(old), _calib_interval(new)
    if ocal and ncal:
        if tot_old and tot_new:
            cal_old, cal_new = tot_old / ocal, tot_new / ncal
            print(
                f"calibrated (sec/calib): {cal_old:.1f} -> {cal_new:.1f} "
                f"({cal_new / cal_old:.2f}x)  [calib_sec {ocal:.3f} -> "
                f"{ncal:.3f}; host-speed ratio {ncal / ocal:.2f}x]"
            )
            if oiv and niv and same_ver:
                rr = tot_new / tot_old
                lo, hi = rr * oiv[0] / niv[1], rr * oiv[1] / niv[0]
                verdict = (
                    "REGRESSION" if lo > CALIBRATED_REGRESSION_THRESHOLD
                    else "improvement"
                    if hi < 1 / CALIBRATED_REGRESSION_THRESHOLD
                    else "within host-noise interval — not evidence of change"
                )
                print(
                    f"calibrated total ratio interval [{lo:.2f}x, {hi:.2f}x] "
                    f"(calib intervals {oiv[0]:.2f}-{oiv[1]:.2f}s -> "
                    f"{niv[0]:.2f}-{niv[1]:.2f}s): {verdict}"
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
            # spread-separated raw drift inside it is host envelope. When
            # both artifacts carry raw calib samples, require the ENTIRE
            # calibrated-ratio interval to clear the threshold — the probe's
            # own within-session spread (measured 5x on this host) makes a
            # point ratio inside the interval meaningless.
            if oiv and niv:
                rr = b / a if a else float("inf")
                lo, hi = rr * oiv[0] / niv[1], rr * oiv[1] / niv[0]
                if not (lo > CALIBRATED_REGRESSION_THRESHOLD
                        or hi < 1 / CALIBRATED_REGRESSION_THRESHOLD):
                    continue
            elif max(ratio, 1 / ratio) <= CALIBRATED_REGRESSION_THRESHOLD:
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
