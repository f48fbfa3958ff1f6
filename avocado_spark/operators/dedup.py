"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, blocked n-gram Jaccard, embedding-cosine.

Scale stance (100 TB):
  * exact dedup is a hash groupBy — one shuffle on the content key;
  * MinHash/LSH avoids the O(n²) pair space: signatures are computed
    per-row with JVM higher-order functions (no UDF), candidates come
    from an equi self-join on (band_id, band_hash) — shuffle-hash
    joinable and skew-salvageable by AQE — and only candidates pay the
    exact-Jaccard verification;
  * SimHash gives a 32-bit signature whose Hamming buckets can block
    near-dup search;
  * blocked Jaccard/cosine bound the pair space by a blocking key
    (lang/source/label), the classic sorted-neighborhood compromise.

Hash arithmetic matches the DuckDB oracles bit-for-bit (see text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from avocado_spark.operators.text import P, token_hash, tokens

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def exact_dedup(docs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical content key."""
    return (
        docs.groupBy(*key_cols)
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Token k-gram shingles → 64-bit-safe hashes:
    S = ((h1*10007 + h2)*101 + h3) % P over consecutive token hashes."""
    th = F.transform(tokens(text), token_hash)
    n = F.size(th)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))

    def shingle(i: Column) -> Column:
        # S_3 = ((h1*10007 + h2)*101 + h3) % P; S_2 drops the last term
        s = F.element_at(th, i + 1) * 10007 + F.element_at(th, i + 2)
        s = s * 101 + (F.element_at(th, i + 3) if k == 3 else F.lit(0))
        return s % P

    if k not in (2, 3):
        raise ValueError(f"unsupported shingle width {k}")
    return F.when(n < k, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(F.transform(idx, shingle))
    )


def minhash_signature(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash: sig[i] = min over shingles of (a_i·s + b_i) % P with
    a_i = 2i+3, b_i = 5i+7."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: ((2 * i + 3) * s + (5 * i + 7)) % P)
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame, text_col: str = "text", jaccard_threshold: float = 0.5
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs with exact-Jaccard verify.

    shingle → signature (per-row, JVM) → explode bands → self-join on
    (band, band signature) → dedup pairs → verify Jaccard on the true
    shingle sets. Only candidate pairs ever materialize.
    """
    sh = docs.select(
        "doc_id", shingle_hashes(F.col(text_col)).alias("shingles")
    ).where(F.size("shingles") > 0)
    sig = sh.withColumn("sig", minhash_signature(F.col("shingles")))
    bands = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "shingles", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .dropDuplicates(["a_id", "b_id"])
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        cand.withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash signature: bit b is set iff Σ_tokens (±1 by bit b of the
    token hash) ≥ 0. Computed with nested HOFs — no explode, no UDF."""
    # shiftleft/shiftright need literal shift amounts in Spark, so bit
    # extraction uses 2^b arithmetic (exact in double for b < 53 and
    # token hashes < 2^30)
    def pow2(b: Column) -> Column:
        return F.pow(F.lit(2.0), b.cast("double"))

    th = F.transform(tokens(F.col(text_col)), token_hash)
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when((h / pow2(b)).cast("long") % 2 == 1, 1).otherwise(-1),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(v >= 0, pow2(b).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select("doc_id", sig.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    k: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Blocked n-gram Jaccard: pairwise only within a blocking key."""
    sh = docs.select(
        "doc_id", *block_cols, shingle_hashes(F.col(text_col), k=k).alias("sh")
    ).where(F.size("sh") > 0)
    a = sh.select(
        *block_cols, F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh")
    )
    b = sh.select(
        *block_cols, F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh")
    )
    pairs = a.join(b, block_cols).where(F.col("a_id") < F.col("b_id"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        pairs.withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity over array<double> via zip_with/aggregate —
    stays in codegen, sequential accumulation (oracle-stable)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def embedding_dup_pairs(
    embeddings: DataFrame, block_col: str = "label", threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-dup detection, blocked on a coarse key."""
    e = embeddings.select(
        "vec_id", block_col, F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = e.select(F.col(block_col), F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"))
    b = e.select(F.col(block_col), F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"))
    pairs = a.join(b, [block_col]).where(F.col("a_id") < F.col("b_id"))
    return (
        pairs.withColumn("cos", cosine(F.col("a_v"), F.col("b_v")))
        .where(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )
