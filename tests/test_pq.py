"""Product-quantization ANN: codebook/code invariants and the
shortlist-closure property — with a shortlist covering the whole
corpus, ADC ordering no longer matters and the exact re-rank must
reproduce brute force bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators import similarity as S
from avocado_spark.session import load_table
from tests.conftest import SF_SMOKE

M, K = 8, 4  # small geometry keeps the smoke fixture fast


def _emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < 120)


def test_codebook_shape_and_code_completeness(spark):
    emb = _emb(spark)
    cb = S.train_pq_codebooks(emb, n_subspaces=M, n_centroids=K, n_iters=1)
    rows = cb.collect()
    assert len(rows) == M * K
    dim = len(emb.select("embedding").first()[0])
    assert all(len(r["c_v"]) == dim // M for r in rows)
    # every vector gets exactly M codes, every code id within range
    n = emb.count()
    codes = S.pq_adc_topk(emb, emb.limit(3), k=5, n_subspaces=M, n_centroids=K,
                          n_iters=1, codebooks=cb)
    assert codes.count() == 15


def test_full_shortlist_rerank_equals_brute_force(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") < 6)
    n = emb.count()
    got = S.pq_rerank_topk(
        emb, q, k=5, shortlist=n, n_subspaces=M, n_centroids=K, n_iters=1
    ).select("q_id", "n_id", "rank")
    want = S.brute_force_topk(emb, q, k=5).select("q_id", "n_id", "rank")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
