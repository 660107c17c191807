"""qx43 BPE trainer vs a plain-Python reference implementation of the
Sennrich merge loop (greedy left-to-right pair merge, count-desc/pair-asc
argmax) at sf0.001 — independent of both Spark and the DuckDB oracle.
"""

import re
from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(word_counts, n_merges):
    seqs = {w: list(w) for w in word_counts}
    out = []
    for k in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((k, l, r, n))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


def test_bpe_merges_match_reference(spark):
    from kafka2delta_spark.functions.text import BPE_N_MERGES, qx43_bpe_learn
    from kafka2delta_spark.sources.tables import load_table

    word_counts = Counter()
    for r in load_table(spark, SF_DIR, "documents").collect():
        for w in re.split(r"\s+", r["text"].lower()):
            if w:
                word_counts[w] += 1

    expected = _reference_bpe(word_counts, BPE_N_MERGES)
    got = [
        (r["iteration"], r["pair_left"], r["pair_right"], r["n_occurrences"])
        for r in qx43_bpe_learn(spark, SF_DIR).orderBy("iteration").collect()
    ]
    assert got == expected


def test_bpe_merge_expr_is_greedy_nonoverlapping(spark):
    """Pin the rewrite semantics on the adversarial cases: overlap
    ('a a a' must merge once, not twice), adjacency ('a b a b' must
    merge both), multi-char symbol boundaries ('x ab c' must NOT match
    an (ab, c) merge inside 'xab c'), and merged-symbol reuse."""
    from pyspark.sql import functions as F

    from kafka2delta_spark.functions.text import bpe_merge_expr

    cases = [
        ("a a a", "a", "a", "aa a"),
        ("a b a b", "a", "b", "ab ab"),
        ("x a b c", "a", "b", "x ab c"),
        ("xab c d", "ab", "c", "xab c d"),
        ("ab c d", "ab", "c", "abc d"),
        ("a", "a", "a", "a"),
        ("ab ab ab", "ab", "ab", "abab ab"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, *_rest) in enumerate(cases)], "i int, s string"
    )
    for i, (s, l, r, want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(bpe_merge_expr(F.col("s"), l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want, f"{s!r} merge ({l},{r}): got {got!r}, want {want!r}"
