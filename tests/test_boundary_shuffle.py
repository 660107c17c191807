"""Batch-boundary invariance for the streaming-maintained families.

The maintained-aggregate queries claim additive/idempotent state — their
result must not depend on WHERE the micro-batch boundary falls inside the
event time range. Until round 11 that claim was tested at exactly ONE
split point (the time midpoint the oracle gate uses). This regression
test re-runs four family members with the boundary at several other
placements (early, late, extreme-late) and asserts the result hash is
identical to the midpoint run — the temporal-disorder analogue of the
forced-layout partition-robustness sweep: any divergence means the state
fold is order- or boundary-sensitive, the exact class of bug that shows
up at scale when trigger contents shift.
"""

from __future__ import annotations

import hashlib

import pytest

from kafka2delta_spark.streaming import stateful

SF_DIR = "/root/testdata/sf0.001"

# family members whose results are CLAIMED boundary-invariant (the
# snapshot-diff style queries, e.g. qx13, are deliberately NOT here —
# their semantics reference the midpoint itself)
FAMILIES = [
    "q49_incremental_user_rollup",
    "qx46_streaming_anomalies",
    "qx92_streaming_retention",
    "qx99_streaming_concurrency",
    "qy10_streaming_interarrival",
]

PLACEMENTS = [0.25, 0.5, 0.72, 0.9]


def _result_hash(spark, name: str) -> str:
    from kafka2delta_spark.queryset import QUERIES, load_all_querysets

    load_all_querysets()
    df = QUERIES[name](spark, SF_DIR)
    cols = sorted(df.columns)
    rows = sorted(
        tuple(repr(row[c]) for c in cols) for row in df.collect()
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", FAMILIES)
def test_result_invariant_to_batch_boundary(spark, name, monkeypatch):
    hashes = {}
    for frac in PLACEMENTS:
        monkeypatch.setattr(stateful, "SPLIT_FRAC", frac)
        hashes[frac] = _result_hash(spark, name)
    assert len(set(hashes.values())) == 1, (
        f"{name}: result depends on the micro-batch boundary placement "
        f"— {hashes}"
    )
