"""MMR diversification semantics: the greedy re-rank must displace a
redundant near-duplicate that plain relevance top-k would keep."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators.similarity import brute_force_topk, mmr_diversify_topk


def _emb(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),          # the query vector
        (2, [0.99, 0.1, 0.0]),         # highly relevant
        (3, [0.99, 0.0995, 0.001]),    # near-duplicate of 2 (slightly closer to q)
        (4, [0.99, -0.1, 0.0]),        # equally relevant, opposite side of q
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_mmr_displaces_near_duplicate(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") == 1).limit(1)
    plain = {
        r["n_id"]
        for r in brute_force_topk(emb, q, k=2).collect()
    }
    assert plain == {2, 3}  # relevance alone keeps the duplicate pair
    mmr = {
        r["mmr_rank"]: r["vec_id"]
        for r in mmr_diversify_topk(emb, q, n_candidates=3, k=2).collect()
    }
    assert mmr[1] == 3       # most relevant first
    assert mmr[2] == 4       # duplicate displaced by the diverse pick


def test_mmr_rank1_equals_relevance_argmax(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") == 1).limit(1)
    top1 = brute_force_topk(emb, q, k=1).collect()[0]
    mmr1 = (
        mmr_diversify_topk(emb, q, n_candidates=3, k=3)
        .where(F.col("mmr_rank") == 1)
        .collect()[0]
    )
    assert mmr1["vec_id"] == top1["n_id"]
    assert abs(mmr1["score"] - top1["cos"]) < 1e-12


def test_mmr_short_candidate_list_truncates(spark):
    # only 3 non-query vectors exist: k=5 must yield exactly 3 picks
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") == 1).limit(1)
    out = mmr_diversify_topk(emb, q, n_candidates=5, k=5).collect()
    assert sorted(r["mmr_rank"] for r in out) == [1, 2, 3]
    assert len({r["vec_id"] for r in out}) == 3


def test_mmr_leaves_no_persistent_blocks(spark):
    # the operator checkpoints cand/sims internally and must release
    # them before returning (its output is a literal table). Compare
    # against a BEFORE snapshot — other operators in a shared session
    # may hold documented result residuals of their own.
    def _ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = _ids()
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") == 1).limit(1)
    mmr_diversify_topk(emb, q, n_candidates=3, k=2).collect()
    leaked = _ids() - before
    assert not leaked, leaked
