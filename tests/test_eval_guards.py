"""The brute-force top-k arms are O(q·n) evaluation baselines; the
guard must refuse a large queries side so a future caller can't ship an
accidental all-pairs plan (r5 verdict #7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avocado_spark.operators import similarity as S


def _emb(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            (F.col("id") % 5).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
    )


def test_small_query_side_allowed(spark):
    emb = _emb(spark, 200)
    out = S.brute_force_topk(emb, emb.limit(5), k=3)
    assert out.count() == 15


@pytest.mark.parametrize("op", [S.brute_force_topk, S.int8_topk])
def test_large_query_side_refused(spark, op, monkeypatch):
    monkeypatch.setattr(S, "MAX_EVAL_QUERIES", 50)
    emb = _emb(spark, 200)
    with pytest.raises(ValueError, match="MAX_EVAL_QUERIES"):
        op(emb, emb, k=3)
    # the explicit override keeps the documented escape hatch working
    assert op(emb, emb.limit(60), k=1, allow_full_scan=True).count() == 60
