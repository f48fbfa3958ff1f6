"""Retrieval-evaluation metrics over a ranked result table — the eval
harness every retrieval pipeline (BM25, ANN, hybrid RRF) ships with:
given per-query rankings and a relevance oracle, score MRR, nDCG@k,
precision@k and recall@k PER QUERY, so regressions localize to the
queries that caused them instead of hiding inside a corpus mean.

Scale shape: one equi-join of the ranking table onto the relevance
table on (q_id, doc_id) — both sides keyed identically, no window, no
collect — then ONE per-query hash aggregation in which every metric is
an ordered fold over the (rank, relevant) pairs:

  * rank-ordered sums are computed with ``sum(expr · [rank ≤ k])``
    per-row terms, so no sort is required inside the aggregation;
  * the DCG fold uses the closed per-row term rel/log2(rank+1) —
    summation order over ≤ k doubles is sub-ulp noise, rounded away at
    6 decimals (the repo-wide float-differential convention).

Determinism: ranks must be deterministic (the producing operators
break ties by id — brute_force_topk, bm25_topk); relevance is an
integer column. IDCG divides by the ideal DCG from the TRUE number of
relevant docs capped at k, so recall-starved queries are scored
honestly rather than against their own retrieved set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval metrics.

    ``ranked``: (q_id, doc_id, rank) with rank 1-based, deterministic.
    ``qrels``:  (q_id, doc_id) — the relevant set per query (binary
    relevance; graded relevance folds in by adding a weight column and
    multiplying it into the DCG term).

    Returns one row per query that appears in ``qrels``:
    (q_id, n_relevant, n_retrieved_at_k, n_hits_at_k, precision_at_k,
    recall_at_k, mrr, ndcg_at_k). Queries with relevant docs but no
    retrieved rows score zero (left join from the qrels side), so a
    recall collapse is visible instead of silently dropped.
    """
    rel = qrels.select("q_id", "doc_id", F.lit(1).alias("rel"))
    n_rel = rel.groupBy("q_id").agg(F.count("*").cast("bigint").alias("n_relevant"))
    j = ranked.join(rel, ["q_id", "doc_id"], "left").select(
        "q_id",
        "rank",
        F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
    )
    at_k = F.col("rank") <= k
    per_q = j.groupBy("q_id").agg(
        F.sum(at_k.cast("int")).cast("bigint").alias("n_retrieved_at_k"),
        F.sum((at_k & (F.col("rel") == 1)).cast("int"))
        .cast("bigint")
        .alias("n_hits_at_k"),
        # MRR: 1 / first relevant rank (0 when nothing relevant ranked)
        F.coalesce(
            1.0 / F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0.0)
        ).alias("_mrr"),
        F.sum(
            F.when(
                at_k & (F.col("rel") == 1),
                1.0 / F.log2(F.col("rank").cast("double") + 1.0),
            ).otherwise(0.0)
        ).alias("_dcg"),
    )
    # ideal DCG for m = min(n_relevant, k) relevant docs at ranks 1..m:
    # a k-term fold over a sequence literal — pure expression, no join
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(k)).cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return (
        n_rel.join(per_q, "q_id", "left")
        .select(
            "q_id",
            "n_relevant",
            F.coalesce("n_retrieved_at_k", F.lit(0)).alias("n_retrieved_at_k"),
            F.coalesce("n_hits_at_k", F.lit(0)).alias("n_hits_at_k"),
            F.round(
                F.coalesce(F.col("n_hits_at_k"), F.lit(0)).cast("double") / k, 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce(F.col("n_hits_at_k"), F.lit(0)).cast("double")
                / F.least(F.col("n_relevant"), F.lit(k)),
                6,
            ).alias("recall_at_k"),
            F.round(F.coalesce("_mrr", F.lit(0.0)), 6).alias("mrr"),
            F.round(F.coalesce(F.col("_dcg"), F.lit(0.0)) / idcg, 6).alias(
                "ndcg_at_k"
            ),
        )
    )
