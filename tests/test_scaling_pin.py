"""Scaling-ratchet artifact integrity (round-12 verdict item 4).

The one-shot 64x linearity study (SCALING.json) became a regression
gate: ``tools/bench_scaling.py --assert-against SCALING_PIN.json`` fails
when any band query's tail exponent exceeds its pinned value + margin.
These tests keep the PIN itself honest — the gate is only as good as the
file it asserts against:

  * the pin covers the full default query band (a silently-shrunk pin
    would let a regressing query escape the ratchet);
  * every pinned exponent is itself ~linear (<= 1.1): a pin captured
    during a regression would launder the regression into the baseline;
  * the committed 64x study artifact agrees (zero super-linear flags).

The measurement itself runs per-round via the tool (wall-clock minutes —
not suite material); what the suite checks is that the ratchet's
reference state cannot silently rot.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

PIN_PATH = "/root/repo/SCALING_PIN.json"
STUDY_PATH = "/root/repo/SCALING.json"


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_pin_covers_default_band():
    from bench_scaling import DEFAULT_QUERIES

    pin = _load(PIN_PATH)
    missing = [n for n in DEFAULT_QUERIES if n not in pin["exponents"]]
    assert not missing, f"ratchet pin missing queries: {missing}"


def test_pinned_exponents_are_linear():
    pin = _load(PIN_PATH)
    bad = {n: a for n, a in pin["exponents"].items() if a > 1.1}
    assert not bad, (
        f"pinned exponents exceed the linearity claim (<=1.1): {bad} — "
        "a pin captured during a regression would launder it into the "
        "ratchet baseline; re-measure on known-good code instead"
    )
    assert pin["margin"] > 0
    assert pin["real_work_floor_sec"] > 0


def test_64x_study_has_no_superlinear_flags():
    study = _load(STUDY_PATH)
    assert study["superlinear"] == []
    assert study["factors"][-1] >= 64
