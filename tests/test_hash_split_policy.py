"""Hash-before-bucket policy for splits and samples, pinned as a test.

The hazard (round-7 ROUNDLOG "layout hazard"): on the harness tables, ids
are assigned round-robin by source, so a raw ``id % k`` bucket is CONSTANT
within a source — a "random" train/holdout split or fold assignment built
on it silently becomes a source split, and every statistic computed per
fold inherits the source confound. The repo's idiom is hash-first:
``kmv_hash_spark("doc_id") % k`` / ``kmv_hash_duck('doc_id')) % k`` (a
portable md5-prefix hash, identical on both engines).

Until now the guard was module comments (corpuseval.py:164, :828). This
test makes it structural: every raw ``<id> % k`` in engine source must be
on the adjudicated allowlist below, each entry carrying the reason raw
modulo is correct THERE. A new split/sample site that buckets on a raw id
fails the scan and has to either hash first or argue its way onto the
list in review.
"""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "kafka2delta_spark")

ID_COLS = r"(?:doc_id|vec_id|user_id|event_id|c_custkey|o_custkey|l_orderkey)"

# raw id-modulo, Spark or SQL spelling, NOT preceded on the line by a hash
_RAW_MOD = re.compile(
    rf"""(?x)
    (?:F\.col\(\"{ID_COLS}\"\)|\b{ID_COLS}\b)   # the id column
    [^\n%]{{0,40}}                               # arithmetic allowed (id * 7)
    %\s*\d                                       # literal modulus
    """
)
_HASHED = re.compile(r"md5|kmv_hash|xxhash|hash\(")

# (relative path, substring that must appear in the flagged line, reason).
# Every entry is an adjudicated NON-split use: synthetic fixture content or
# a deliberate deterministic selection whose source-correlation is either
# intended or irrelevant to what the query measures.
ALLOWED: list[tuple[str, str, str]] = [
    (
        "functions/curation.py",
        "* 7 % 1000",
        "synthetic PII phone fixture — content generation, not a split",
    ),
    (
        "functions/curation.py",
        "* 13 % 10000",
        "synthetic PII phone fixture — content generation, not a split",
    ),
    (
        "functions/evalops.py",
        "% 10",
        "qy04 snapshot-B fixture: which docs are 'deleted' is the fixture's "
        "definition, deterministic by design; the query measures the diff",
    ),
    (
        "functions/evalops.py",
        "% 7",
        "qy04 snapshot-B fixture: which docs are 'changed' — same story",
    ),
    (
        "functions/evalops.py",
        "% 5",
        "qy05 holdout: DELIBERATELY source-aligned — the in-code comment at "
        "the HOLDOUT_MOD definition declares this the cross-SOURCE "
        "generalization eval (whole sources held out, unseen contexts "
        "guaranteed); a within-source split would hash first per qz02/qz07",
    ),
    (
        "functions/dedup.py",
        "% 5",
        "incremental-dedup batch carve (NEW_MOD): 'the new ingest batch' is "
        "the fixture's definition; each new doc is checked pairwise against "
        "the standing corpus, so the batch's source mix biases nothing",
    ),
    (
        "functions/multimodal.py",
        "%",
        "file-level: synthetic media metadata fixtures (width/height/"
        "channels/sample rate/duration) — content generation, not splits; "
        "the file has no statistical split sites",
    ),
    (
        "functions/clustering.py",
        "% 100",
        "IVF-PQ probe-set selection (vec_id % 100 == 0): probes need to be "
        "a fixed bounded subset, not an unbiased sample — recall is "
        "measured per probe against exact top-k, so source correlation "
        "does not bias the metric; changing it would change pinned oracles",
    ),
    (
        "functions/similarity.py",
        "% ",
        "query/probe-set selections, same adjudication as clustering.py — "
        "bounded fixed subsets evaluated against exact ground truth",
    ),
    (
        "functions/pipeline.py",
        "% 29",
        "q84 stand-in benchmark anchor set (BENCH_MOD): a fixed bounded "
        "query set for hard-negative mining; anchors define which queries "
        "are mined, they are not a sample any statistic averages over",
    ),
    (
        "operators/analytic.py",
        "% 50",
        "q47 exhibit subset (RESAMPLE_USER_MOD): bounds the resample grid "
        "output; events carry no per-user stratum the modulus could align "
        "with, and the oracle applies the identical predicate",
    ),
    (
        "operators/advanced.py",
        "% 4096",
        "q48 Morton-key derivation: the raw low bits ARE the z-order "
        "semantics (bit interleaving), not a sample",
    ),
]


def _scan() -> list[tuple[str, int, str]]:
    hits = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            for i, line in enumerate(open(path), 1):
                if line.lstrip().startswith("#"):
                    continue  # prose; the expression it describes is scanned
                if _RAW_MOD.search(line) and not _HASHED.search(line):
                    hits.append((rel, i, line.strip()))
    return hits


def test_raw_id_modulo_sites_are_all_adjudicated():
    unexplained = []
    for rel, lineno, line in _scan():
        ok = any(
            rel.endswith(allowed_file) and marker in line
            for allowed_file, marker, _why in ALLOWED
        )
        if not ok:
            unexplained.append(f"{rel}:{lineno}: {line}")
    assert not unexplained, (
        "raw id % k outside the adjudicated allowlist — a split/sample on a "
        "raw id is a source split on this data layout; hash first "
        "(kmv_hash_spark / kmv_hash_duck) or adjudicate in "
        "tests/test_hash_split_policy.py:\n" + "\n".join(unexplained)
    )


def test_detector_catches_the_banned_shape(tmp_path):
    bad = 'train = docs.filter(F.col("doc_id") % 10 < 8)'
    assert _RAW_MOD.search(bad) and not _HASHED.search(bad)
    bad_sql = "CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'holdout' END"
    assert _RAW_MOD.search(bad_sql)
    good = 'train = docs.filter(F.expr(kmv_hash_spark("doc_id")) % 10 < 8)'
    assert _HASHED.search(good)


def test_registered_splits_use_the_hash_idiom():
    """The statistical split/fold sites must hash: PSI's train/holdout
    (qz02), the jackknife folds (qz07), the train/val/test split (q63),
    and the stratified quota sample (qy08) all reference the md5-based
    idiom in source."""
    corpuseval = open(os.path.join(PKG, "functions", "corpuseval.py")).read()
    assert 'kmv_hash_spark("doc_id")) % PSI_TRAIN_MOD' in corpuseval
    assert 'kmv_hash_spark("doc_id")) % JK_FOLDS' in corpuseval
    pipeline = open(os.path.join(PKG, "functions", "pipeline.py")).read()
    assert re.search(r'F\.md5\(F\.col\("doc_id"\)', pipeline), (
        "q63 split no longer md5-keyed"
    )


@pytest.mark.parametrize("rel,marker,why", ALLOWED)
def test_allowlist_entries_still_exist(rel, marker, why):
    """A stale allowlist is how drift sneaks back in: every adjudicated
    entry must still match a line in its file (similarity.py's entry is a
    family marker, checked loosely)."""
    path = os.path.join(PKG, rel)
    src = open(path).read()
    if rel.endswith("similarity.py"):
        return  # loose family entry; presence not required
    assert marker in src, f"allowlist entry no longer present: {rel} {marker}"
