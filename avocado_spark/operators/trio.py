"""Trio (pedigree) calling (SURVEY §2.2 F5/F6, §2.4 J6).

Reference: avocado-core/.../genotyping/TrioCaller.scala:103-221 —
per site: drop all-ref sites; check the child call for Mendelian
consistency against the parents (inconsistent → no-call); phase
consistent hets when exactly one parent carries the alt.

Spark-first shape: 3-way union of per-sample genotype tables →
groupBy(site) with conditional aggregation (a static pivot over the
three pedigree roles) → one ``when`` cascade. The alt-count algebra
replaces per-allele enumeration: a child alt-count c is Mendelian-
consistent iff (p1==2)+(p2==2) ≤ c ≤ (p1≥1)+(p2≥1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SITE_KEYS = ["contig", "start", "ref_allele", "alt_allele"]


def union_samples(dfs: list[DataFrame]) -> DataFrame:
    """J6 — 3-way union (TrioGenotyper.scala:216,253-259)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _role_state(role: str) -> Column:
    return F.max(F.when(F.col("role") == role, F.col("gt_state"))).alias(role)


def trio_call(
    genotypes: DataFrame,
    first_parent: str,
    second_parent: str,
    child: str,
) -> DataFrame:
    """genotypes carries (site keys, sample_id, gt_state). Output: one
    row per site with parent/child states, Mendelian consistency, the
    possibly-nulled child call, and phasing (TrioCaller.scala:120-221):

      * missing samples → no-call fill (:212-219);
      * all-ref/no-call sites dropped (F5, :103-109);
      * inconsistent child → no-call (:167-203);
      * consistent het phased 'ALT|REF' when only the first parent can
        donate the alt, 'REF|ALT' when only the second can.
    """
    tagged = genotypes.withColumn(
        "role",
        F.when(F.col("sample_id") == first_parent, "p1")
        .when(F.col("sample_id") == second_parent, "p2")
        .when(F.col("sample_id") == child, "child"),
    ).filter(F.col("role").isNotNull())

    pivoted = tagged.groupBy(*SITE_KEYS).agg(
        _role_state("p1"), _role_state("p2"), _role_state("child")
    )
    # missing sample = no-call (3)
    p1 = F.coalesce(F.col("p1"), F.lit(3))
    p2 = F.coalesce(F.col("p2"), F.lit(3))
    ch = F.coalesce(F.col("child"), F.lit(3))

    # F5: keep only sites where someone carries an alt
    has_alt = p1.isin(1, 2) | p2.isin(1, 2) | ch.isin(1, 2)

    # no-call parents are unconstraining: min donation 0, max donation 1
    p1_min = F.when(p1 == 2, 1).otherwise(0)
    p2_min = F.when(p2 == 2, 1).otherwise(0)
    p1_max = F.when(p1.isin(1, 2, 3), 1).otherwise(0)
    p2_max = F.when(p2.isin(1, 2, 3), 1).otherwise(0)
    consistent = (
        ch.isin(0, 1, 2)
        & (ch >= p1_min + p2_min)
        & (ch <= p1_max + p2_max)
    )

    called_child = F.when(consistent, ch).otherwise(F.lit(3))
    phase = (
        F.when(
            consistent & (ch == 1) & (p1_max == 1) & (p2_max == 0), F.lit("ALT|REF")
        )
        .when(consistent & (ch == 1) & (p2_max == 1) & (p1_max == 0), F.lit("REF|ALT"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        pivoted.filter(has_alt)
        .select(
            *SITE_KEYS,
            p1.alias("p1_state"),
            p2.alias("p2_state"),
            ch.alias("child_state"),
            consistent.alias("mendelian_consistent"),
            called_child.cast("int").alias("called_child_state"),
            phase.alias("child_phase"),
        )
    )
