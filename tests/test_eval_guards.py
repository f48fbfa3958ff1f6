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


def test_static_bound_triggers_no_job(spark, monkeypatch):
    """r7 verdict #6: a .limit(n)-topped queries side carries a
    plan-time rowCount, so builder construction must be job-free —
    any count() during the build is the bug."""
    import pyspark.sql.dataframe as pdf

    emb = _emb(spark, 200)
    bounded = emb.limit(5)

    def _boom(self):
        raise AssertionError("eval guard ran an eager job on a statically bounded side")

    monkeypatch.setattr(pdf.DataFrame, "count", _boom)
    out = S.brute_force_topk(emb, bounded, k=3)  # must not raise
    out2 = S.int8_topk(emb, bounded, k=3)
    monkeypatch.undo()
    assert out.count() == 15
    assert out2.count() == 15


def test_static_over_bound_refused_without_job(spark, monkeypatch):
    """A statically-provable bound ABOVE the cap refuses immediately —
    also without running the probe job."""
    import pyspark.sql.dataframe as pdf

    monkeypatch.setattr(S, "MAX_EVAL_QUERIES", 50)
    emb = _emb(spark, 200)

    def _boom(self):
        raise AssertionError("probe job ran despite a static over-bound")

    monkeypatch.setattr(pdf.DataFrame, "count", _boom)
    with pytest.raises(ValueError, match="MAX_EVAL_QUERIES"):
        S.brute_force_topk(emb, emb.limit(60), k=3)


def test_bpe_merge_count_warns_past_threshold(spark):
    """bpe_phrase_merges is O(n_merges * corpus); past the documented
    threshold it must say so (r8 advice: cost-note the loop)."""
    import warnings

    from avocado_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TX.bpe_phrase_merges(docs, n_merges=TX.BPE_MERGE_WARN_THRESHOLD + 1)
        assert any("full-corpus pass PER MERGE" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        TX.bpe_phrase_merges(docs, n_merges=2)
        assert not any(issubclass(x.category, RuntimeWarning) for x in w)
