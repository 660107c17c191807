"""Regression tests for round-3 review findings.

* Listener generation barrier: a stale error from a long-terminated query
  must not fail-fast a waiter on a fresh query after ``mark()``, while a
  NEW failure still does (the round-2 ADVICE fix kept errors per-query but
  let them poison every later wait).
* q67 short-document guard: ``sequence(1, 0)`` is DESCENDING in Spark, so
  documents shorter than one chunk must contribute zero chunks, not two
  bogus wrap-around ones.
* ``connected_components`` must raise (not silently return split labels)
  when the iteration cap is hit before the fixpoint.
"""

import time
from types import SimpleNamespace

import pytest

from kafka2delta_spark.functions.dedup import (
    BOILER_CHUNK,
    BOILER_MIN_DOCS,
    connected_components,
    q67_boilerplate_chunks,
)
from kafka2delta_spark.streaming.listener import StreamProgressListener


def _terminated(qid, exc=None):
    return SimpleNamespace(id=qid, exception=exc)


def _progress(n):
    return SimpleNamespace(progress=SimpleNamespace(numInputRows=n))


def test_listener_stale_error_does_not_poison_new_generation():
    lst = StreamProgressListener()
    lst.onQueryStarted(SimpleNamespace(id="A"))
    lst.onQueryTerminated(_terminated("A", exc="boom"))
    # current generation: A's failure fails the wait fast
    t0 = time.monotonic()
    assert lst.wait_for_rows(1, timeout=5.0) is False
    assert time.monotonic() - t0 < 1.0
    assert lst.error == "boom"  # still observable

    # new generation: healthy query B makes progress; A's stale error
    # must not abort the wait
    lst.mark()
    lst.onQueryStarted(SimpleNamespace(id="B"))
    lst.onQueryProgress(_progress(3))
    assert lst.wait_for_rows(3, timeout=5.0) is True

    # ... but a NEW failure (B's own) still fails fast
    lst.mark()
    lst.onQueryTerminated(_terminated("B", exc="late"))
    t0 = time.monotonic()
    assert lst.wait_for_rows(1, timeout=5.0) is False
    assert time.monotonic() - t0 < 1.0


def test_listener_stale_termination_does_not_satisfy_new_wait():
    lst = StreamProgressListener()
    lst.onQueryStarted(SimpleNamespace(id="A"))
    lst.onQueryTerminated(_terminated("A"))
    assert lst.wait_for_termination(timeout=1.0) is True
    lst.mark()
    # A's old termination is pre-generation; no new one → timeout
    assert lst.wait_for_termination(timeout=0.2) is False
    lst.onQueryStarted(SimpleNamespace(id="B"))
    lst.onQueryTerminated(_terminated("B"))
    assert lst.wait_for_termination(timeout=1.0) is True


def test_q67_short_documents_emit_no_chunks(spark, tmp_path):
    # one boilerplate chunk shared by BOILER_MIN_DOCS long docs, plus short
    # docs (< BOILER_CHUNK tokens) that must contribute nothing
    chunk = " ".join(f"w{i}" for i in range(BOILER_CHUNK))
    rows = [(i, f"{chunk} unique{i}") for i in range(BOILER_MIN_DOCS)]
    rows += [(100 + i, "tiny doc text") for i in range(BOILER_MIN_DOCS + 1)]
    spark.createDataFrame(rows, "doc_id INT, text STRING").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = q67_boilerplate_chunks(spark, str(tmp_path)).collect()
    # without the guard, every "tiny doc text" doc emits two bogus chunks
    # (sequence(1,0) == [1, 0]) whose hashes coincide across docs and would
    # show up here as an extra boilerplate row
    assert len(out) == 1
    assert out[0]["n_docs"] == BOILER_MIN_DOCS


def test_connected_components_raises_on_cap_exhaustion(spark):
    # a path graph 0-1-2-...-9 needs ~O(n) rounds; cap at 2 must raise
    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node INT")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a INT, doc_b INT"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(nodes, edges, max_iters=2).collect()
    # and a sufficient cap converges to one component
    labels = connected_components(nodes, edges).collect()
    assert {r["label"] for r in labels} == {0}
