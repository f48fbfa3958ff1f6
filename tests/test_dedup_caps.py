"""Hot-bucket / hot-block bounds for the pairwise dedup operators.

The scale contract under test: a degenerate corpus (every doc landing
on the same LSH band key, or one blocking key holding the whole
corpus) must NOT go quadratic — candidates stay bounded by the cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators import dedup as D


def _boilerplate_docs(spark, n=300):
    # identical text => identical shingles => every band bucket has n docs
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate header text repeated everywhere verbatim").alias(
            "text"
        ),
    )


def test_minhash_hot_bucket_dropped(spark):
    docs = _boilerplate_docs(spark, 300)
    out = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_band_bucket=50)
    # every band bucket holds all 300 docs > cap 50 => no candidates at all
    assert out.count() == 0


def test_minhash_cap_keeps_small_buckets(spark):
    # distinct docs + one truly-near-dup pair; buckets are tiny, the cap
    # must not disturb real matches
    base = [
        (i, f"unique document number {i} with its own words alpha beta gamma delta run {i*7}")
        for i in range(20)
    ]
    base.append((100, "unique document number 5 with its own words alpha beta gamma delta run 35 x"))
    docs = spark.createDataFrame(base, "doc_id long, text string")
    out = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_band_bucket=50)
    pairs = {(r.a_id, r.b_id) for r in out.collect()}
    assert (5, 100) in pairs


def test_minhash_uncapped_is_quadratic_in_bucket(spark):
    # with the cap disabled the same corpus yields n(n-1)/2 candidates —
    # documents identical, so all pairs verify at jaccard 1.0
    docs = _boilerplate_docs(spark, 40)
    out = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_band_bucket=None)
    assert out.count() == 40 * 39 // 2


def test_ngram_big_block_routes_to_lsh(spark):
    # one block of 60 rows with cap 10: exact path must not run the
    # O(n^2) join on it; LSH routing still surfaces identical docs
    texts = [
        "alpha bravo charlie delta echo alpha bravo charlie",
        "foxtrot golf hotel india juliet foxtrot golf hotel",
        "kilo lima mike november oscar kilo lima mike",
    ]
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.element_at(
            F.array(*[F.lit(t) for t in texts]), (F.col("id") % 3).cast("int") + 1
        ).alias("text"),
    )
    out = D.ngram_jaccard_pairs(
        docs, ["lang"], k=2, threshold=0.6, max_block_rows=10
    )
    rows = out.collect()
    # identical-text pairs (same id%3 class) survive the verify at 1.0;
    # cross-class shingle sets are disjoint so nothing else appears
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in rows)
    assert len(rows) == 3 * 20 * 19 // 2
    assert all((r.a_id - r.b_id) % 3 == 0 for r in rows)


def test_embedding_big_block_routes_to_srp(spark):
    # 50 vectors in one block with cap 10: routed through SRP buckets;
    # identical vectors share a bucket, so exact dups are still found
    rows = [(i, "L", [1.0, 2.0, 3.0, 4.0]) for i in range(25)]
    rows += [(100 + i, "L", [-4.0, 3.0, -2.0, 1.0]) for i in range(25)]
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    out = D.embedding_dup_pairs(emb, block_col="label", threshold=0.9, max_block_rows=10)
    got = {(r.a_id, r.b_id) for r in out.collect()}
    # every within-group pair is cosine 1.0 and bucket-identical
    assert len(got) == 2 * (25 * 24 // 2)
    # no cross-group pair (cosine 0) leaks through
    assert all((a < 100) == (b < 100) for a, b in got)


def test_shingle_table_matches_hof_column(spark):
    """The Arrow shingle kernel (r9 speedup: interpreted HOFs were the
    dedup family's dominant linear scan) must stay VALUE-IDENTICAL to
    the shingle_hashes column expression — unicode, embedded tabs,
    quotes, empty/short docs, k=2 and k=3, and extra passthrough
    columns all covered."""
    from pyspark.sql import functions as F

    from avocado_spark.operators.dedup import shingle_hashes, shingle_table

    rows = [
        (1, "en", "the quick brown fox jumps over the lazy dog"),
        (2, "de", "héllo wörld tab\there and o'quote back\\slash"),
        (3, "en", "short doc"),          # < k tokens for k=3
        (4, "en", ""),                    # empty
        (5, "en", None),                  # null
        (6, "fr", "a a a a a a"),         # repeated tokens → distinct shingles
        (7, "en", "  leading  double  spaces  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    for k in (2, 3):
        hof = docs.select(
            "doc_id", "lang", shingle_hashes(F.col("text"), k=k).alias("sh")
        ).where(F.size("sh") > 0)
        arrow = shingle_table(
            docs, "text", k=k, out_col="sh", extra_cols=("lang",)
        )
        assert hof.exceptAll(arrow).count() == 0
        assert arrow.exceptAll(hof).count() == 0
        assert arrow.count() == hof.count() > 0


def test_shingle_table_sig_matches_hof_fold(spark):
    """with_sig=True must emit the exact minhash_signature values."""
    from pyspark.sql import functions as F

    from avocado_spark.operators.dedup import (
        minhash_signature,
        shingle_table,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i%7} tok{(i*3)%11} tok{(i*5)%13} tok{i%4} end{i%2}")
         for i in range(60)],
        "doc_id long, text string",
    )
    arrow = shingle_table(docs, with_sig=True).select("doc_id", "sig")
    hof = shingle_table(docs).select(
        "doc_id", minhash_signature(F.col("shingles")).alias("sig")
    )
    assert arrow.exceptAll(hof).count() == 0
    assert hof.exceptAll(arrow).count() == 0


def test_simhash_arrow_matches_hof(spark):
    """The Arrow simhash kernel must equal the nested-HOF column form
    bit for bit — empty docs, unicode, single tokens included."""
    from avocado_spark.operators.dedup import simhash, simhash_hof

    rows = [
        (1, "the quick brown fox"),
        (2, "héllo wörld"),
        (3, "one"),
        (4, ""),
        (5, "a b a b a b a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = simhash(docs)
    h = simhash_hof(docs)
    assert a.exceptAll(h).count() == 0 and h.exceptAll(a).count() == 0
    assert a.count() == len(rows)


def test_kgram_table_matches_hof_explode(spark):
    from pyspark.sql import functions as F

    from avocado_spark.operators.dedup import kgram_hashes, kgram_table

    rows = [
        (1, " ".join(f"t{i%5}" for i in range(30))),  # repeats → distinct grams
        (2, "too short"),
        (3, ""),
        (4, " ".join(f"w{i}" for i in range(12))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (4, 10):
        a = kgram_table(docs, k=k)
        h = docs.select(
            "doc_id", F.explode(kgram_hashes(F.col("text"), k)).alias("g")
        )
        assert a.exceptAll(h).count() == 0 and h.exceptAll(a).count() == 0


def test_arrow_kernels_hypothesis_differential(spark):
    """Randomized text through all three Arrow kernels vs their HOF
    column forms — whitespace runs, unicode, punctuation, short docs.
    One batched comparison (hypothesis generates the corpus, Spark
    compares once) keeps the Spark round trips bounded."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from avocado_spark.operators.dedup import (
        kgram_hashes,
        kgram_table,
        shingle_hashes,
        shingle_table,
        simhash,
        simhash_hof,
    )

    alphabet = st.sampled_from(list("ab éø'\\#2  "))
    texts = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=60),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=5, deadline=None)
    @given(corpus=texts)
    def check(corpus):
        docs = spark.createDataFrame(
            list(enumerate(corpus)), "doc_id long, text string"
        )
        sh_h = docs.select(
            "doc_id", shingle_hashes(F.col("text")).alias("shingles")
        ).where(F.size("shingles") > 0)
        sh_a = shingle_table(docs)
        assert sh_h.exceptAll(sh_a).count() == 0
        assert sh_a.exceptAll(sh_h).count() == 0
        si_a, si_h = simhash(docs), simhash_hof(docs)
        assert si_a.exceptAll(si_h).count() == 0
        assert si_h.exceptAll(si_a).count() == 0
        kg_h = docs.select(
            "doc_id", F.explode(kgram_hashes(F.col("text"), 4)).alias("g")
        )
        kg_a = kgram_table(docs, k=4)
        assert kg_h.exceptAll(kg_a).count() == 0
        assert kg_a.exceptAll(kg_h).count() == 0

    check()
