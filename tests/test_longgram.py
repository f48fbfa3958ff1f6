"""General-k rolling gram hashes and the verbatim-overlap screen,
checked against direct Python replays of the same arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from avocado_spark.operators.dedup import kgram_hashes, longgram_overlap_pairs

P = 1_000_000_007


def _py_token_hash(tok: str) -> int:
    acc = 7
    for ch in tok:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def _py_kgrams(text: str, k: int) -> list[int]:
    th = [_py_token_hash(t) for t in text.split() if t]
    out = []
    for i in range(len(th) - k + 1):
        acc = 0
        for h in th[i : i + k]:
            acc = (acc * 1009 + h) % P
        out.append(acc)
    # distinct, first-occurrence order is irrelevant (sets compared)
    return sorted(set(out))


def test_kgram_hashes_match_python_fold(spark):
    texts = [
        "a b c d e f g h i j k l",
        "one two three",          # shorter than k -> empty
        "x x x x x x x x x x x",  # repeated token -> one distinct gram
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {
        r.doc_id: sorted(r.g)
        for r in df.select("doc_id", kgram_hashes(F.col("text"), 5).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_kgrams(t, 5), (i, t)


def test_longgram_pairs_find_copied_passage(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, base + " kilo lima"),
        (2, "prefix words then " + base + " and a suffix"),  # copied 10-gram
        (3, "completely unrelated text with no shared window at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.a_id, r.b_id): r.n_shared_grams
        for r in longgram_overlap_pairs(df, k=10).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert all(3 not in pair for pair in got)
