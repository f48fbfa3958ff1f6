"""Numeric kernels as Column expressions (SURVEY §2.8 X10-X17).

The reference implements these as Scala scalar functions; here they are
pure ``pyspark.sql.functions`` expression trees so they stay inside
whole-stage codegen (no Python in the hot path). Only Fisher's exact
test needs lgamma, which Spark lacks as a built-in — that one is an
Arrow-batched pandas UDF.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

LOG10 = math.log(10.0)


def phred_to_log_success(q: Column) -> Column:
    """log P(no error) for Phred q — reference
    avocado-core/.../genotyping/Observer.scala:163-164,
    avocado-core/.../util/LogPhred.scala:38-40."""
    return F.log1p(-F.pow(F.lit(10.0), -q / F.lit(10.0)))


def phred_to_success_prob(q: Column) -> Column:
    return F.lit(1.0) - F.pow(F.lit(10.0), -q / F.lit(10.0))


def log_to_phred(log_p: Column) -> Column:
    """−10·log10(p) from a natural-log input."""
    return F.lit(-10.0) * log_p / F.lit(LOG10)


def genotype_log_likelihood(g: Column, m: Column, epsilon: Column) -> Column:
    """X12 — per-observation genotype-state likelihood
    L(g) = log((m−g)·ε + g·(1−ε)) − log(m)
    (avocado-core/.../genotyping/Observer.scala:151-185). Used as column
    math to generate the score dimension table (P3)."""
    return F.log((m - g) * epsilon + g * (F.lit(1.0) - epsilon)) - F.log(m)


def log_sum_exp(cols: list[Column]) -> Column:
    """X11 — numerically-stable log(Σ exp(xi)) as a pure expression
    (avocado-core/.../util/LogUtils.scala:39-137): max + log(Σ exp(xi−max))."""
    mx = F.greatest(*cols) if len(cols) > 1 else cols[0]
    return mx + F.log(
        sum((F.exp(c - mx) for c in cols), F.lit(0.0))
    )


def log_normalize_array(arr: Column) -> Column:
    """X11 over an array column: subtract log-sum-exp elementwise."""
    mx = F.array_max(arr)
    lse = mx + F.log(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + F.exp(x - mx))
    )
    return F.transform(arr, lambda x: x - lse)


def reversed_array_add(a: Column, b: Column) -> Column:
    """X16 — out[i] = a[i] + b[n−1−i]
    (avocado-core/.../genotyping/BiallelicGenotyper.scala:585-595,717-729)."""
    return F.zip_with(a, F.reverse(b), lambda x, y: x + y)


def rms_mapq(sum_sq: Column, n: Column) -> Column:
    """X17 — sqrt(Σ mapq² / coverage)
    (avocado-core/.../genotyping/BiallelicGenotyper.scala:709)."""
    return F.sqrt(sum_sq / n)


def genotype_state_and_quality(likelihoods: Column) -> tuple[Column, Column]:
    """X15 — argmax genotype state + Phred quality from the gap to the
    runner-up: 10/ln10 × (max − second)
    (avocado-core/.../genotyping/BiallelicGenotyper.scala:622-668).
    Pure array expressions — no UDF."""
    sorted_desc = F.reverse(F.array_sort(likelihoods))
    mx = F.element_at(sorted_desc, 1)
    second = F.element_at(sorted_desc, 2)
    state = F.array_position(likelihoods, mx) - F.lit(1)
    qual = F.lit(10.0 / LOG10) * (mx - second)
    return state.cast("int"), qual


def binomial_log_pmf(k: Column, n: Column, p: Column) -> Column:
    """X14 — log C(n,k) + k·log p + (n−k)·log(1−p)
    (avocado-core/.../genotyping/JointAnnotatorCaller.scala:162-176).
    log C(n,k) via Σ log — exact for the tiny n (= ploidy) used here,
    and stays JVM-side."""
    # n is ploidy (≤ a few); expand log C(n,k) = Σ_{i=1..k} log((n-k+i)/i)
    log_comb = F.aggregate(
        F.sequence(F.lit(1), k),
        F.lit(0.0),
        lambda acc, i: acc + F.log((n - k + i).cast("double") / i.cast("double")),
    )
    return (
        log_comb
        + k.cast("double") * F.log(p)
        + (n - k).cast("double") * F.log(F.lit(1.0) - p)
    )


@F.pandas_udf(DoubleType())
def fisher_exact_two_sided(
    ref_fwd: pd.Series, ref_rev: pd.Series, alt_fwd: pd.Series, alt_rev: pd.Series
) -> pd.Series:
    """X13 — Fisher exact strand-bias p-value, log-factorial form
    (avocado-core/.../genotyping/BiallelicGenotyper.scala:755-797).

    Vectorized over Arrow batches with numpy lgamma; two-sided by
    summing hypergeometric pmfs ≤ pmf(observed) (1+1e-7 tolerance, the
    standard convention, matching R/scipy and DuckDB-side oracles).
    """
    lgam = np.vectorize(math.lgamma, otypes=[np.float64])

    a = ref_fwd.to_numpy(np.int64)
    b = ref_rev.to_numpy(np.int64)
    c = alt_fwd.to_numpy(np.int64)
    d = alt_rev.to_numpy(np.int64)
    out = np.empty(len(a), dtype=np.float64)

    for i in range(len(a)):
        r1, r2 = a[i] + b[i], c[i] + d[i]
        c1 = a[i] + c[i]
        n = r1 + r2

        def log_pmf(x: int) -> float:
            return (
                lgam(r1 + 1) + lgam(r2 + 1) + lgam(c1 + 1) + lgam(n - c1 + 1)
                - lgam(n + 1) - lgam(x + 1) - lgam(r1 - x + 1)
                - lgam(c1 - x + 1) - lgam(r2 - c1 + x + 1)
            )

        lo, hi = max(0, c1 - r2), min(c1, r1)
        obs = log_pmf(a[i])
        total = 0.0
        for x in range(lo, hi + 1):
            lp = log_pmf(x)
            if lp <= obs + 1e-7:
                total += math.exp(lp)
        out[i] = min(total, 1.0)
    return pd.Series(out)
