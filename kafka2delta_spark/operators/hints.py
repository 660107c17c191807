"""Size-gated broadcast hints — the repo's dimension-join policy, made
enforceable in code instead of by convention.

A forced ``F.broadcast`` is a promise the hinted side stays under Spark's
8 GB broadcast hard cap at ANY scale (Spark fails oversized broadcasts
rather than degrading). Only region (5 rows) and nation (25 rows) are
literally bounded; TPC-H-style dimensions (customer / supplier / part)
scale with SF, so at a literal 100 TB a 2-column customer projection
alone blows the cap. Those tables may still broadcast — they usually
should — but the hint has to be earned from a size estimate, not
asserted.

:func:`dim_broadcast` applies the hint only when Catalyst's
optimized-plan size estimate for the hinted side is under
``BROADCAST_CAP_BYTES``; past the cap it returns the frame un-hinted and
AQE picks the strategy at runtime (broadcast if the runtime stats say it
fits after all, shuffled hash join worst case — the round-7 precedent
for corpus-sized sides). The estimate is driver-side planning metadata
(file size x column pruning x filter selectivity) — computing it runs no
job.

Raw ``F.broadcast`` remains correct, and the structural test
``tests/test_broadcast_policy.py`` enforces where: literally-bounded
tables (region/nation), scalar/grouped aggregates over bounded key
domains, and explicitly capped samples. Everything loaded from an
SF-scaled table must come through here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Forced-broadcast budget. Deliberately far under Spark's 8 GB driver-side
# hard cap: a hinted side is built on the driver and re-sent to every
# executor, so "fits" must mean "fits comfortably next to everything else
# the driver holds", not "barely under the failure line".
BROADCAST_CAP_BYTES = 256 << 20  # 256 MiB


def plan_size_estimate(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan sizeInBytes estimate for ``df``.

    Driver-side planning metadata only (no job). Returns ``None`` when
    the estimate is unavailable (plan not analyzable yet, py4j hiccup) —
    callers treat unknown as too-big and skip the hint.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        # py4j hands the Scala BigInt back as a Python int (or a JavaObject
        # whose str() is the decimal digits on older bridges)
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def dim_broadcast(df: DataFrame, cap_bytes: int = BROADCAST_CAP_BYTES) -> DataFrame:
    """Broadcast hint for an SF-scaled dimension side, gated on size.

    Under ``cap_bytes`` (per Catalyst's estimate): the frame gets the
    hint — a dim-enrichment join stays shuffle-free on the fact side.
    Over the cap, or when the estimate is unavailable: the frame is
    returned un-hinted and AQE decides at runtime. Either way results
    are identical; only the physical join strategy moves.
    """
    size = plan_size_estimate(df)
    if size is not None and size <= cap_bytes:
        return F.broadcast(df)
    return df
