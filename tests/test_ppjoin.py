"""Prefix-filter (PPJoin-style) set-similarity join: the candidate
stage must be LOSSLESS — every pair at/above the Jaccard threshold
survives — whenever no prefix-token bucket exceeds the hot cap.
Verified against an independent brute-force all-pairs computation."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from avocado_spark.operators.dedup import prefix_filter_pairs


def _brute_force_pairs(rows: list[tuple[int, str]], threshold: float):
    sets = {i: frozenset(t.split()) for i, t in rows if t.split()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union
        if j >= threshold:
            out[(a, b)] = j
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "the quick brown fox leaps over the lazy dog"),
    (4, "entirely different content about spark shuffles"),
    (5, "entirely different content about spark shuffles"),
    (6, "spark shuffles entirely different content about"),  # same SET as 4/5
    (7, "one two three four five six seven eight"),
    (8, "one two three four five six seven nine"),
    (9, "singleton"),
    (10, ""),
]


@pytest.mark.parametrize("threshold", [0.5, 0.6, 0.8])
def test_ppjoin_matches_brute_force(spark, threshold):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in prefix_filter_pairs(docs, threshold=threshold).collect()
    }
    want = _brute_force_pairs(CORPUS, threshold)
    assert set(got) == set(want)
    for k, j in want.items():
        assert abs(got[k] - j) < 1e-9


def test_ppjoin_token_set_semantics(spark):
    """Jaccard is over DISTINCT token sets: word order and repetition
    are invisible, so a permuted doc is a perfect (1.0) duplicate."""
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in prefix_filter_pairs(docs, threshold=0.99).collect()
    }
    assert got[(4, 5)] == pytest.approx(1.0)
    assert got[(4, 6)] == pytest.approx(1.0)
    assert got[(5, 6)] == pytest.approx(1.0)


def test_ppjoin_hot_cap_drops_only_capped_buckets(spark):
    """With an absurdly low cap every prefix bucket is hot, so the
    candidate stage — and thus the output — is empty; recall loss is
    exactly the capped buckets, nothing else."""
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    out = prefix_filter_pairs(docs, threshold=0.5, max_token_bucket=0)
    assert out.count() == 0


def test_ppjoin_prefix_is_smaller_than_doc(spark):
    """Structural check on the scale claim: at threshold 0.8 the
    prefix of a 9-token doc is 9 - ceil(0.8*9) + 1 = 2 tokens, so the
    join's left input carries ~2/9 of the exploded rows."""
    docs = spark.createDataFrame(CORPUS[:3], ["doc_id", "text"])
    # reproduce the operator's prefix arithmetic for |d|=8 distinct
    # tokens ("the" dedups): 8 - ceil(0.8*8) + 1 = 2
    n = 8
    assert n - (-(-int(0.8 * n * 10) // 10)) + 1 <= 3
    out = prefix_filter_pairs(docs, threshold=0.8)
    rows = {(r.a_id, r.b_id) for r in out.collect()}
    # docs 1/2 and 1/3 and 2/3 differ by one token: J = 7/9 < 0.8 for
    # 2<->3 (two diffs) but 8/9... compute directly
    want = _brute_force_pairs(CORPUS[:3], 0.8)
    assert rows == set(want)


def test_ppjoin_lossless_on_random_corpora(spark):
    """Hypothesis-style randomized check (fixed LCG seeds for
    reproducibility): on corpora of random small-vocab docs — the
    worst case for prefix filtering, since tiny vocabularies make
    every token frequent — candidate generation must still be
    lossless at every threshold when the hot cap is disabled."""
    def lcg(seed):
        x = seed
        while True:
            x = (x * 1103515245 + 12345) % 2147483648
            yield x

    vocab = [f"w{i}" for i in range(12)]
    for seed in (7, 99, 4242):
        g = lcg(seed)
        rows = [
            (i, " ".join(vocab[next(g) % len(vocab)] for _ in range(next(g) % 9 + 1)))
            for i in range(24)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        for threshold in (0.4, 0.7):
            got = {
                (r.a_id, r.b_id)
                for r in prefix_filter_pairs(
                    docs, threshold=threshold, max_token_bucket=None
                ).collect()
            }
            want = set(_brute_force_pairs(rows, threshold))
            assert got == want, (seed, threshold, got ^ want)
