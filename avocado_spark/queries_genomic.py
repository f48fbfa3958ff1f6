"""Genomic-pipeline queries: the real string kernels (CIGAR/MD parse,
observation classify, likelihood genotyping) run in Spark, while the
DuckDB oracle computes the EXPECTED output arithmetically from the
generation parameters — an independent differential check of the
kernels, not a re-run of them.

Two derived read tables (shared SQL text, valid in both engines):

* ``reads_indel`` — per-read variant shapes (SNP at a per-read offset,
  a fixed 2-bp insertion, a fixed 3-bp deletion, pure match), for the
  E1 discovery differential.
* ``reads_hot`` — an all-'A' reference genome with SNP "hotspots" at
  every multiple of 97 (reads are ≤49 bp so each covers at most one
  hotspot); carriers read 'G' there. Drives the full biallelic
  pipeline differential: discovery → interval join → classification →
  score join → site roll-up → genotype state/quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avocado_spark import tables
from avocado_spark.queries import query

# --------------------------------------------------------------------------
# shared derivations (both engines): chr()/repeat()/CASE only
# --------------------------------------------------------------------------

READS_INDEL_SQL = """
SELECT
  o_orderkey AS read_id,
  concat('chr', CAST(o_orderkey % 4 AS STRING)) AS contig,
  (o_orderkey * 37) % 100000 AS start,
  CASE
    WHEN o_orderkey % 11 = 0 THEN (o_orderkey * 37) % 100000 + 33
    WHEN o_orderkey % 13 = 0 THEN (o_orderkey * 37) % 100000 + 28
    ELSE (o_orderkey * 37) % 100000 + 20 + o_orderkey % 30
  END AS end,
  CASE
    WHEN o_orderkey % 11 = 0 THEN '10M3D20M'
    WHEN o_orderkey % 13 = 0 THEN '10M2I18M'
    ELSE concat(CAST(20 + o_orderkey % 30 AS STRING), 'M')
  END AS cigar,
  CASE
    WHEN o_orderkey % 11 = 0 THEN '10^CCC20'
    WHEN o_orderkey % 13 = 0 THEN '28'
    WHEN o_orderkey % 5 <> 0 THEN concat(
      CAST((o_orderkey * 7) % (20 + o_orderkey % 30) AS STRING), 'C',
      CAST(20 + o_orderkey % 30 - (o_orderkey * 7) % (20 + o_orderkey % 30) - 1 AS STRING))
    ELSE CAST(20 + o_orderkey % 30 AS STRING)
  END AS md,
  CASE
    WHEN o_orderkey % 11 = 0 THEN repeat('A', 30)
    WHEN o_orderkey % 13 = 0 THEN concat(repeat('A', 10), 'GG', repeat('A', 18))
    WHEN o_orderkey % 5 <> 0 THEN concat(
      repeat('A', CAST((o_orderkey * 7) % (20 + o_orderkey % 30) AS INT)), 'G',
      repeat('A', CAST(20 + o_orderkey % 30 - (o_orderkey * 7) % (20 + o_orderkey % 30) - 1 AS INT)))
    ELSE repeat('A', CAST(20 + o_orderkey % 30 AS INT))
  END AS sequence,
  repeat(chr(33 + 25 + CAST(o_orderkey % 10 AS INT)),
         CASE WHEN o_orderkey % 11 = 0 OR o_orderkey % 13 = 0 THEN 30
              ELSE CAST(20 + o_orderkey % 30 AS INT) END) AS qual,
  CAST(20 + o_orderkey % 40 AS INT) AS mapq,
  concat('s', CAST(o_orderkey % 2 AS STRING)) AS sample_id
FROM orders
"""

READS_HOT_SQL = """
SELECT
  o_orderkey AS read_id,
  concat('chr', CAST(o_orderkey % 4 AS STRING)) AS contig,
  (o_orderkey * 37) % 3000 AS start,
  (o_orderkey * 37) % 3000 + 20 + o_orderkey % 30 AS end,
  20 + o_orderkey % 30 AS read_len,
  CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97 AS hot,
  CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97
    < (o_orderkey * 37) % 3000 + 20 + o_orderkey % 30 AS covered,
  (CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97
    < (o_orderkey * 37) % 3000 + 20 + o_orderkey % 30) AND o_orderkey % 3 <> 0 AS is_carrier,
  concat(CAST(20 + o_orderkey % 30 AS STRING), 'M') AS cigar,
  CASE WHEN (CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97
             < (o_orderkey * 37) % 3000 + 20 + o_orderkey % 30) AND o_orderkey % 3 <> 0
    THEN concat(
      CAST(CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97 - (o_orderkey * 37) % 3000 AS STRING),
      'A',
      CAST((o_orderkey * 37) % 3000 + 20 + o_orderkey % 30 - 1
           - CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97 AS STRING))
    ELSE CAST(20 + o_orderkey % 30 AS STRING)
  END AS md,
  CASE WHEN (CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97
             < (o_orderkey * 37) % 3000 + 20 + o_orderkey % 30) AND o_orderkey % 3 <> 0
    THEN concat(
      repeat('A', CAST(CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97 - (o_orderkey * 37) % 3000 AS INT)),
      'G',
      repeat('A', CAST((o_orderkey * 37) % 3000 + 20 + o_orderkey % 30 - 1
                       - CAST(FLOOR(((o_orderkey * 37) % 3000 + 96) / 97) AS BIGINT) * 97 AS INT)))
    ELSE repeat('A', CAST(20 + o_orderkey % 30 AS INT))
  END AS sequence,
  repeat(chr(33 + 25 + CAST(o_orderkey % 10 AS INT)), CAST(20 + o_orderkey % 30 AS INT)) AS qual,
  CAST(25 + o_orderkey % 10 AS INT) AS phred,
  CAST(20 + o_orderkey % 40 AS INT) AS mapq,
  concat('s', CAST(o_orderkey % 2 AS STRING)) AS sample_id
FROM orders
"""

tables.DERIVED_SQL["reads_indel"] = READS_INDEL_SQL
tables.DERIVED_SQL["reads_hot"] = READS_HOT_SQL


@query(
    "discover_variants",
    f"""
    WITH reads_indel AS ({READS_INDEL_SQL}),
    expected AS (
      -- vstart/vend avoid lateral-alias shadowing of the source column
      SELECT contig,
             CASE WHEN read_id % 11 = 0 THEN start + 9
                  WHEN read_id % 13 = 0 THEN start + 9
                  ELSE start + (read_id * 7) % (20 + read_id % 30) END AS vstart,
             CASE WHEN read_id % 11 = 0 THEN start + 13
                  WHEN read_id % 13 = 0 THEN start + 10
                  ELSE start + (read_id * 7) % (20 + read_id % 30) + 1 END AS vend,
             CASE WHEN read_id % 11 = 0 THEN 'ACCC'
                  WHEN read_id % 13 = 0 THEN 'A'
                  ELSE 'C' END AS ref_allele,
             CASE WHEN read_id % 11 = 0 THEN 'A'
                  WHEN read_id % 13 = 0 THEN 'AGG'
                  ELSE 'G' END AS alt_allele
      FROM reads_indel
      WHERE read_id % 11 = 0 OR read_id % 13 = 0 OR read_id % 5 <> 0
    )
    SELECT DISTINCT contig, vstart AS start, vend AS "end", ref_allele, alt_allele FROM expected
    """,
)
def discover_variants_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/A2 — real CIGAR+MD parsing and per-read variant extraction
    (DiscoverVariants.scala:112-252) over reads carrying SNP, insertion
    and deletion shapes; the oracle derives the expected variants
    arithmetically from the generation rule — a true differential test
    of the alignment-algebra kernel."""
    from avocado_spark.operators.discovery import discover_variants

    reads = tables.derived(spark, sf_dir, "reads_indel")
    return discover_variants(reads, phred_threshold=18, min_observations=None)


_PIPELINE_ORACLE = f"""
    WITH reads_hot AS ({READS_HOT_SQL}),
    sites AS (
      SELECT contig, hot AS site_start
      FROM reads_hot WHERE is_carrier
      GROUP BY contig, hot HAVING COUNT(*) > 2
    ),
    obs AS (
      SELECT r.contig, s.site_start, r.sample_id, r.is_carrier, r.mapq,
             1.0 - (1.0 - POW(10.0, -r.phred / 10.0)) * (1.0 - POW(10.0, -r.mapq / 10.0)) AS e
      FROM reads_hot r
      JOIN sites s ON r.contig = s.contig AND r.hot = s.site_start AND r.covered
    ),
    scored AS (
      SELECT contig, site_start, sample_id, is_carrier, mapq,
             CASE WHEN is_carrier THEN LN(2.0 * e) - LN(2.0)
                  ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END AS ll0,
             CASE WHEN is_carrier THEN LN(e + (1.0 - e)) - LN(2.0)
                  ELSE LN((1.0 - e) + e) - LN(2.0) END AS ll1,
             CASE WHEN is_carrier THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                  ELSE LN(2.0 * e) - LN(2.0) END AS ll2
      FROM obs
    ),
    rolled AS (
      SELECT contig, site_start, sample_id,
             SUM(ll0) AS l0, SUM(ll1) AS l1, SUM(ll2) AS l2,
             COUNT(*) AS read_depth,
             CAST(SUM(CASE WHEN is_carrier THEN 1 ELSE 0 END) AS INT) AS alt_read_depth,
             CAST(SUM(CASE WHEN is_carrier THEN 0 ELSE 1 END) AS INT) AS ref_read_depth,
             SUM(CAST(mapq AS BIGINT) * mapq) AS sum_mapq_sq
      FROM scored
      GROUP BY contig, site_start, sample_id
    )
    SELECT contig, site_start, sample_id,
           CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                WHEN l1 >= l0 AND l1 >= l2 THEN 1
                ELSE 2 END AS gt_state,
           ROUND((10.0 / LN(10.0)) *
                 (GREATEST(l0, l1, l2) -
                  CASE WHEN l0 >= l1 AND l0 >= l2 THEN GREATEST(l1, l2)
                       WHEN l1 >= l0 AND l1 >= l2 THEN GREATEST(l0, l2)
                       ELSE GREATEST(l0, l1) END), 5) AS gq,
           CAST(read_depth AS INT) AS read_depth,
           ref_read_depth, alt_read_depth,
           ROUND(SQRT(CAST(sum_mapq_sq AS DOUBLE) / read_depth), 6) AS rms_mapq
    FROM rolled
"""


@query("biallelic_pipeline", _PIPELINE_ORACLE)
def biallelic_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 flagship — the full biallelicGenotyper hot path on the
    hotspot read table: E1 discovery (count > 2 support, A1/P5), J1
    binned-broadcast interval join, E3 Arrow classification, J2
    broadcast score-table join (P3/X12), A3 wide site roll-up,
    F9/X15/X17 genotype emission. The oracle recomputes every stage
    arithmetically from the generation rule."""
    from avocado_spark.operators.genotyping import biallelic_pipeline

    reads = tables.derived(spark, sf_dir, "reads_hot")
    g = biallelic_pipeline(spark, reads, phred_threshold=18, min_observations=2)
    return g.select(
        "contig",
        "site_start",
        "sample_id",
        "gt_state",
        F.round("gq", 5).alias("gq"),
        "read_depth",
        "ref_read_depth",
        "alt_read_depth",
        F.round("rms_mapq", 6).alias("rms_mapq"),
    )


# ==========================================================================
# Filter / post-processing layers (F2/F3/F4), joint caller (A5-A7, E4,
# X14), trio (F5/F6), allele trim (X8) — all over the calls_rel spine.
# ==========================================================================

from avocado_spark.tables import CALLS_REL_SQL  # noqa: E402

TRIM_REL_SQL = """
SELECT
  l_orderkey * 10 + l_linenumber AS call_id,
  concat('chr', CAST(l_partkey % 4 AS STRING)) AS contig,
  (l_partkey * 911) % 100000 AS start,
  CASE CAST((l_orderkey * 10 + l_linenumber) % 5 AS INT)
    WHEN 0 THEN 'TAC' WHEN 1 THEN 'AA' WHEN 2 THEN 'ACCC'
    WHEN 3 THEN 'AGG' ELSE 'G' END AS ref_allele,
  CASE CAST((l_orderkey * 10 + l_linenumber) % 5 AS INT)
    WHEN 0 THEN 'TC' WHEN 1 THEN 'A' WHEN 2 THEN 'A'
    WHEN 3 THEN 'CGG' ELSE 'G' END AS alt_allele,
  (l_partkey * 911) % 100000 + CASE CAST((l_orderkey * 10 + l_linenumber) % 5 AS INT)
    WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 3 ELSE 1 END AS end
FROM lineitem
"""
tables.DERIVED_SQL["trim_rel"] = TRIM_REL_SQL


@query(
    "rewrite_hets",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL})
    SELECT call_id,
           CASE WHEN gt_state = 1
                 AND CAST(alt_read_depth AS DOUBLE) / read_depth >= 0.666
                THEN 2 ELSE gt_state END AS gt_state_out,
           CASE WHEN gt_state = 1
                 AND CAST(alt_read_depth AS DOUBLE) / read_depth >= 0.666
                THEN NULL ELSE genotype_quality END AS gq_out
    FROM calls_rel
    """,
)
def rewrite_hets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — RewriteHets (RewriteHets.scala:64-140)."""
    from avocado_spark.operators.hard_filters import rewrite_hets

    c = tables.derived(spark, sf_dir, "calls_rel")
    out = rewrite_hets(c, max_het_af=0.666)
    return out.select(
        "call_id",
        F.col("gt_state").alias("gt_state_out"),
        F.col("genotype_quality").alias("gq_out"),
    )


@query(
    "emit_genotype_filter",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL})
    SELECT call_id, gt_state, genotype_quality
    FROM calls_rel
    WHERE genotype_quality >= 10 AND gt_state IN (1, 2)
    """,
)
def emit_genotype_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — emission filter (HardFilterGenotypes.scala:349-383)."""
    from avocado_spark.operators.hard_filters import emit_genotype_filter

    c = tables.derived(spark, sf_dir, "calls_rel")
    return emit_genotype_filter(c, min_quality=10).select(
        "call_id", "gt_state", "genotype_quality"
    )


@query(
    "hard_filter_annotate",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL}),
    g AS (
      SELECT *,
             CASE WHEN call_id % 7 = 0 THEN concat(ref_allele, 'C') ELSE ref_allele END AS refx
      FROM calls_rel
    ),
    flagged AS (
      SELECT *,
             length(refx) = 1 AND length(alt_allele) = 1 AS is_snp,
             gt_state = 2 AS hom,
             CAST(genotype_quality AS DOUBLE) / read_depth AS qd,
             CAST(alt_read_depth AS DOUBLE) / read_depth AS af
      FROM g
    ),
    checked AS (
      SELECT call_id,
             list_filter([
               CASE WHEN is_snp AND NOT hom AND qd < 2.0 THEN 'HETSNPQD' END,
               CASE WHEN is_snp AND hom AND qd < 1.0 THEN 'HOMSNPQD' END,
               CASE WHEN is_snp AND rms_mapq < 30.0 THEN 'SNPMQ' END,
               CASE WHEN is_snp AND read_depth < 10 THEN 'SNPMINDP' END,
               CASE WHEN is_snp AND read_depth > 200 THEN 'SNPMAXDP' END,
               CASE WHEN is_snp AND NOT hom AND af <= 0.333 THEN 'HETSNPMINAF' END,
               CASE WHEN is_snp AND NOT hom AND af > 0.666 THEN 'HETSNPMAXAF' END,
               CASE WHEN is_snp AND hom AND af <= 0.666 THEN 'HOMSNPMINAF' END,
               CASE WHEN NOT is_snp AND NOT hom AND qd < 2.0 THEN 'HETINDELQD' END,
               CASE WHEN NOT is_snp AND hom AND qd < 1.0 THEN 'HOMINDELQD' END,
               CASE WHEN NOT is_snp AND read_depth < 10 THEN 'INDELMINDP' END,
               CASE WHEN NOT is_snp AND read_depth > 200 THEN 'INDELMAXDP' END,
               CASE WHEN NOT is_snp AND NOT hom AND af <= 0.333 THEN 'HETINDELMINAF' END,
               CASE WHEN NOT is_snp AND NOT hom AND af > 0.666 THEN 'HETINDELMAXAF' END,
               CASE WHEN NOT is_snp AND hom AND af <= 0.666 THEN 'HOMINDELMINAF' END
             ], x -> x IS NOT NULL) AS failed
      FROM flagged
    )
    SELECT call_id,
           COALESCE(array_to_string(list_sort(failed), ','), '') AS filters_failed_str,
           len(failed) = 0 AS filters_passed
    FROM checked
    """,
)
def hard_filter_annotate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — hard filters annotate, SNP/indel split
    (HardFilterGenotypes.scala:176-343,571-660). call_id%7 rows get a
    2-bp ref to exercise the indel branch."""
    from avocado_spark.operators.hard_filters import hard_filter_annotate

    c = tables.derived(spark, sf_dir, "calls_rel").withColumn(
        "ref_allele",
        F.when(F.col("call_id") % 7 == 0, F.concat(F.col("ref_allele"), F.lit("C"))).otherwise(
            F.col("ref_allele")
        ),
    )
    out = hard_filter_annotate(c)
    return out.select(
        "call_id",
        F.concat_ws(",", F.array_sort("filters_failed")).alias("filters_failed_str"),
        "filters_passed",
    )


@query(
    "variant_summary",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL})
    SELECT contig, start, ref_allele, alt_allele,
           CAST(SUM(read_depth) AS BIGINT) AS total_read_depth,
           CAST(SUM(ref_read_depth) AS BIGINT) AS total_ref_depth,
           CAST(SUM(alt_read_depth) AS BIGINT) AS total_alt_depth,
           CAST(SUM(ref_fwd) AS BIGINT) AS ref_fwd,
           CAST(SUM(ref_rev) AS BIGINT) AS ref_rev,
           CAST(SUM(alt_fwd) AS BIGINT) AS alt_fwd,
           CAST(SUM(alt_rev) AS BIGINT) AS alt_rev,
           COUNT(*) AS n_genotypes
    FROM calls_rel
    GROUP BY contig, start, ref_allele, alt_allele
    """,
)
def variant_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-site depth/strand roll-up (VariantSummary.scala:93-117)."""
    from avocado_spark.operators.joint import variant_summary

    return variant_summary(tables.derived(spark, sf_dir, "calls_rel"))


@query(
    "maf_site_quality",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL})
    SELECT contig, start, ref_allele, alt_allele,
           CAST(SUM(CASE WHEN gt_state IN (0,1,2) THEN 2 ELSE 0 END) AS BIGINT) AS called_alleles,
           CAST(SUM(CASE WHEN gt_state = 1 THEN 1 WHEN gt_state = 2 THEN 2 ELSE 0 END) AS BIGINT) AS alt_alleles,
           ROUND(CAST(SUM(CASE WHEN gt_state = 1 THEN 1 WHEN gt_state = 2 THEN 2 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN gt_state IN (0,1,2) THEN 2 ELSE 0 END), 8) AS maf,
           ROUND((-10.0 / LN(10.0)) * SUM(ll0), 5) AS site_quality,
           COUNT(*) AS n_genotypes
    FROM calls_rel
    GROUP BY contig, start, ref_allele, alt_allele
    """,
)
def maf_site_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 — minor-allele frequency + site quality
    (JointAnnotatorCaller.scala:117-128,270-281)."""
    from avocado_spark.operators.joint import maf_and_quality

    out = maf_and_quality(tables.derived(spark, sf_dir, "calls_rel"))
    return out.select(
        "contig",
        "start",
        "ref_allele",
        "alt_allele",
        "called_alleles",
        "alt_alleles",
        F.round("maf", 8).alias("maf"),
        F.round("site_quality", 5).alias("site_quality"),
        "n_genotypes",
    )


@query(
    "joint_recall",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL}),
    with_maf AS (
      SELECT *,
             CAST(SUM(CASE WHEN gt_state = 1 THEN 1 WHEN gt_state = 2 THEN 2 ELSE 0 END)
                    OVER (PARTITION BY contig, start, ref_allele, alt_allele) AS DOUBLE)
             / SUM(CASE WHEN gt_state IN (0,1,2) THEN 2 ELSE 0 END)
                    OVER (PARTITION BY contig, start, ref_allele, alt_allele) AS maf
      FROM calls_rel
    ),
    clamped AS (
      SELECT *, LEAST(GREATEST(maf, 0.05), 0.95) AS p
      FROM with_maf WHERE maf > 0
    ),
    posts AS (
      SELECT call_id,
             ll0 + 2.0 * LN(1.0 - p) AS post0,
             ll1 + LN(2.0) + 1.0 * LN(p) + 1.0 * LN(1.0 - p) AS post1,
             ll2 + 2.0 * LN(p) AS post2
      FROM clamped
    )
    SELECT call_id,
           ROUND(post0, 6) AS post0, ROUND(post1, 6) AS post1, ROUND(post2, 6) AS post2,
           CASE WHEN post0 >= post1 AND post0 >= post2 THEN 0
                WHEN post1 >= post0 AND post1 >= post2 THEN 1
                ELSE 2 END AS recalled_state
    FROM posts
    """,
)
def joint_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/X14 — binomial-prior joint recall
    (JointAnnotatorCaller.scala:74-109,156-262)."""
    from avocado_spark.operators.joint import joint_recall

    out = joint_recall(tables.derived(spark, sf_dir, "calls_rel"))
    return out.select(
        "call_id",
        F.round("post0", 6).alias("post0"),
        F.round("post1", 6).alias("post1"),
        F.round("post2", 6).alias("post2"),
        "recalled_state",
    )


@query(
    "trio_mendelian",
    f"""
    WITH calls_rel AS ({CALLS_REL_SQL}),
    pivoted AS (
      SELECT contig, start, ref_allele, alt_allele,
             MAX(CASE WHEN sample_id = 's0' THEN gt_state END) AS p1r,
             MAX(CASE WHEN sample_id = 's1' THEN gt_state END) AS p2r,
             MAX(CASE WHEN sample_id = 's2' THEN gt_state END) AS chr_
      FROM calls_rel
      GROUP BY contig, start, ref_allele, alt_allele
    ),
    filled AS (
      SELECT contig, start, ref_allele, alt_allele,
             COALESCE(p1r, 3) AS p1, COALESCE(p2r, 3) AS p2, COALESCE(chr_, 3) AS ch
      FROM pivoted
    ),
    judged AS (
      SELECT *,
             CASE WHEN p1 = 2 THEN 1 ELSE 0 END AS p1min,
             CASE WHEN p2 = 2 THEN 1 ELSE 0 END AS p2min,
             CASE WHEN p1 IN (1,2,3) THEN 1 ELSE 0 END AS p1max,
             CASE WHEN p2 IN (1,2,3) THEN 1 ELSE 0 END AS p2max
      FROM filled
      WHERE p1 IN (1,2) OR p2 IN (1,2) OR ch IN (1,2)
    )
    SELECT contig, start, ref_allele, alt_allele,
           p1 AS p1_state, p2 AS p2_state, ch AS child_state,
           (ch IN (0,1,2) AND ch >= p1min + p2min AND ch <= p1max + p2max) AS mendelian_consistent,
           CASE WHEN ch IN (0,1,2) AND ch >= p1min + p2min AND ch <= p1max + p2max
                THEN ch ELSE 3 END AS called_child_state,
           CASE WHEN ch = 1 AND ch >= p1min + p2min AND ch <= p1max + p2max
                     AND p1max = 1 AND p2max = 0 THEN 'ALT|REF'
                WHEN ch = 1 AND ch >= p1min + p2min AND ch <= p1max + p2max
                     AND p2max = 1 AND p1max = 0 THEN 'REF|ALT'
                ELSE NULL END AS child_phase
    FROM judged
    """,
)
def trio_mendelian_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 — trio pivot + Mendelian consistency + phasing
    (TrioCaller.scala:103-221)."""
    from avocado_spark.operators.trio import trio_call

    c = tables.derived(spark, sf_dir, "calls_rel").select(
        "contig", "start", "ref_allele", "alt_allele", "sample_id", "gt_state"
    )
    return trio_call(c, "s0", "s1", "s2")


@query(
    "allele_trim",
    f"""
    WITH trim_rel AS ({TRIM_REL_SQL})
    SELECT call_id,
           CASE CAST(call_id % 5 AS INT)
             WHEN 0 THEN 'TA' WHEN 1 THEN 'AA' WHEN 2 THEN 'ACCC'
             WHEN 3 THEN 'A' ELSE 'G' END AS ref_trim,
           CASE CAST(call_id % 5 AS INT)
             WHEN 0 THEN 'T' WHEN 1 THEN 'A' WHEN 2 THEN 'A'
             WHEN 3 THEN 'C' ELSE 'G' END AS alt_trim,
           "end" - CASE CAST(call_id % 5 AS INT)
             WHEN 0 THEN 1 WHEN 3 THEN 2 ELSE 0 END AS end_trim
    FROM trim_rel
    """,
)
def allele_trim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — shared-suffix allele canonicalization as a pure HOF
    expression (SquareOffReferenceModel.scala:106-127); the oracle
    states the expected trim per pattern class."""
    from avocado_spark.operators.squareoff import trim_alleles

    t = tables.derived(spark, sf_dir, "trim_rel")
    out = trim_alleles(t)
    return out.select(
        "call_id",
        F.col("ref_allele").alias("ref_trim"),
        F.col("alt_allele").alias("alt_trim"),
        F.col("end").alias("end_trim"),
    )


# --------------------------------------------------------------------------
# F7 realigner — the `reassemble` pipeline (SURVEY §3.3)
# --------------------------------------------------------------------------

# reads with deterministically mis-left-shifted homopolymer indels:
#   shape 0: deletion placed at the RIGHT edge of a C-run (canonical
#            alignment left-shifts it),
#   shape 1: insertion likewise right-shifted,
#   shape 2: simple SNP (canonical already — not a realign candidate),
#   shape 3: unmapped (passthrough).
# PFIX/SFIX contain no 'C', so the run boundary is unambiguous and the
# realigned CIGAR/MD is a closed-form function of (rs, c).
READS_REALIGN_SQL = """
SELECT
  o_orderkey AS read_id,
  CAST(o_orderkey % 4 AS INT) AS shape,
  CAST(8 + o_orderkey % 5 AS INT) AS rs,
  CAST(2 + o_orderkey % 3 AS INT) AS c,
  (o_orderkey % 4) <> 3 AS read_mapped,
  CASE CAST(o_orderkey % 4 AS INT)
    WHEN 0 THEN concat(substring('ATGATTGAATAG', 1, CAST(8 + o_orderkey % 5 AS INT)),
                       repeat('C', CAST(2 + o_orderkey % 3 AS INT)),
                       'TGATTAGGATTGAATTGGTATTGAATTGGA')
    WHEN 1 THEN concat(substring('ATGATTGAATAG', 1, CAST(8 + o_orderkey % 5 AS INT)),
                       repeat('C', CAST(3 + o_orderkey % 3 AS INT)),
                       'TGATTAGGATTGAATTGGTATTGAATTGGA')
    WHEN 2 THEN concat(substring('ATGATTGAATAG', 1, CAST(8 + o_orderkey % 5 AS INT)),
                       'C', 'TGATTAGGATTGAATTGGTATTGAATTGGA')
    ELSE 'TGATTAGGATTGAATTGGTATTGAATTGGA'
  END AS sequence,
  CASE CAST(o_orderkey % 4 AS INT)
    WHEN 0 THEN concat(CAST(10 + o_orderkey % 5 + o_orderkey % 3 AS STRING), 'M1D30M')
    WHEN 1 THEN concat(CAST(10 + o_orderkey % 5 + o_orderkey % 3 AS STRING), 'M1I30M')
    WHEN 2 THEN concat(CAST(39 + o_orderkey % 5 AS STRING), 'M')
    ELSE '*'
  END AS cigar,
  CASE CAST(o_orderkey % 4 AS INT)
    WHEN 0 THEN concat(CAST(10 + o_orderkey % 5 + o_orderkey % 3 AS STRING), '^C30')
    WHEN 1 THEN CAST(40 + o_orderkey % 5 + o_orderkey % 3 AS STRING)
    WHEN 2 THEN concat(CAST(8 + o_orderkey % 5 AS STRING), 'A30')
    ELSE ''
  END AS md
FROM orders
"""

tables.DERIVED_SQL["reads_realign"] = READS_REALIGN_SQL


@query(
    "realign_reads",
    f"""
    WITH r AS ({READS_REALIGN_SQL})
    SELECT read_id,
      CASE shape
        WHEN 0 THEN concat(CAST(rs AS STRING), '=1D', CAST(c + 30 AS STRING), '=')
        WHEN 1 THEN concat(CAST(rs AS STRING), '=1I', CAST(c + 30 AS STRING), '=')
        ELSE cigar
      END AS new_cigar,
      CASE shape
        WHEN 0 THEN concat(CAST(rs AS STRING), '^C', CAST(c + 30 AS STRING))
        ELSE md
      END AS new_md,
      shape IN (0, 1) AS was_realigned
    FROM r
    """,
)
def realign_reads_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/X18/X19 — k-mer anchored read realignment over mis-shifted
    homopolymer indels (Realigner.scala:46-158, Aligner.scala:175-233):
    a shuffle-free Arrow-batched map; the oracle states the closed-form
    left-shifted alignment per generation rule."""
    from avocado_spark.operators.realigner import realign_reads

    r = tables.derived(spark, sf_dir, "reads_realign")
    out = realign_reads(r, kmer_length=6)
    return out.select(
        "read_id",
        F.col("cigar").alias("new_cigar"),
        F.col("md").alias("new_md"),
        "was_realigned",
    )


# --------------------------------------------------------------------------
# O2 coverage cap — HardLimiter's exact sweep
# --------------------------------------------------------------------------

# non-overlapping clusters of identical intervals: the exact sweep's
# admitted set has a closed form (lowest max_cov read_ids per cluster),
# giving the order-dependent operator a true SQL oracle; general
# overlap chains are covered by unit tests (tests/test_coverage.py).
READS_CLUSTERED_SQL = """
SELECT
  o_orderkey AS read_id,
  concat('chr', CAST(o_orderkey % 4 AS STRING)) AS contig,
  CAST((o_orderkey % 500) * 100 AS BIGINT) AS start,
  CAST((o_orderkey % 500) * 100 + 80 AS BIGINT) AS end
FROM orders
"""

tables.DERIVED_SQL["reads_clustered"] = READS_CLUSTERED_SQL


@query(
    "coverage_cap",
    f"""
    WITH r AS ({READS_CLUSTERED_SQL}),
    ranked AS (
      SELECT read_id, contig, start, "end",
             ROW_NUMBER() OVER (PARTITION BY contig, start ORDER BY read_id) AS rn
      FROM r
    )
    SELECT read_id, contig, start, "end" FROM ranked WHERE rn <= 5
    """,
)
def coverage_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — HardLimiter exact per-site coverage cap
    (avocado-core/.../util/HardLimiter.scala:40-137): sorted sweep with
    an admitted-interval buffer, run per contig via applyInPandas."""
    from avocado_spark.operators.coverage import coverage_cap_exact

    r = tables.derived(spark, sf_dir, "reads_clustered")
    return coverage_cap_exact(r, max_coverage=5)


# --------------------------------------------------------------------------
# small catalog operators: F8 mate nullify, A8 sample catalog, A9 ploidy
# --------------------------------------------------------------------------

READS_MATE_SQL = """
SELECT
  o_orderkey AS read_id,
  concat('chr', CAST(o_orderkey % 4 AS STRING)) AS contig,
  (o_orderkey * 37) % 100000 AS start,
  concat('s', CAST(o_orderkey % 3 AS STRING)) AS sample_id,
  (o_orderkey % 7) <> 0 AS mate_mapped,
  concat('chr', CAST(o_orderkey % 8 AS STRING)) AS mate_contig,
  (o_orderkey * 53) % 100000 AS mate_start
FROM orders
"""

tables.DERIVED_SQL["reads_mate"] = READS_MATE_SQL


@query(
    "mate_nullify",
    f"""
    WITH r AS ({READS_MATE_SQL})
    SELECT read_id,
           CASE WHEN mate_mapped AND NOT regexp_matches(mate_contig, '^chr[0-3]$')
                THEN NULL ELSE mate_contig END AS mate_contig,
           CASE WHEN mate_mapped AND NOT regexp_matches(mate_contig, '^chr[0-3]$')
                THEN NULL ELSE mate_start END AS mate_start,
           CASE WHEN mate_mapped AND NOT regexp_matches(mate_contig, '^chr[0-3]$')
                THEN FALSE ELSE mate_mapped END AS mate_mapped
    FROM r
    """,
)
def mate_nullify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — mate-field nullify when the mate's contig was dropped by
    the catalog filter (PrefilterReads.scala:99-116)."""
    from avocado_spark.operators.relational import nullify_mate

    r = tables.derived(spark, sf_dir, "reads_mate")
    return nullify_mate(r, "^chr[0-3]$").select(
        "read_id", "mate_contig", "mate_start", "mate_mapped"
    )


@query(
    "sample_catalog",
    f"""
    WITH r AS ({READS_MATE_SQL})
    SELECT sample_id, COUNT(*) AS n_reads FROM r GROUP BY sample_id
    """,
)
def sample_catalog_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — distinct sample extraction over the read-group catalog
    (TrioCaller.scala:45-55)."""
    from avocado_spark.operators.relational import sample_catalog

    return sample_catalog(tables.derived(spark, sf_dir, "reads_mate"))


@query(
    "ploidy_extremes",
    """
    WITH cnv AS (
      SELECT CAST(CASE WHEN n_nationkey % 2 = 0 THEN 3 ELSE 1 END AS INT) AS copy_number
      FROM nation
    )
    SELECT LEAST(MIN(copy_number), 2) AS min_ploidy,
           GREATEST(MAX(copy_number), 2) AS max_ploidy
    FROM cnv
    """,
)
def ploidy_extremes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — CNV-map ploidy extremes with base-ploidy fold
    (CopyNumberMap.scala:82-95)."""
    from avocado_spark.operators.relational import ploidy_extremes
    from avocado_spark.session import load_table

    n = load_table(spark, sf_dir, "nation")
    cnv = n.select(
        F.when(F.col("n_nationkey") % 2 == 0, 3).otherwise(1).cast("int").alias("copy_number")
    )
    return ploidy_extremes(cnv, base_ploidy=2)


_GVCF_ORACLE = f"""
    WITH reads_hot AS ({READS_HOT_SQL}),
    obs AS (
      SELECT contig, hot AS site_start, sample_id, is_carrier, mapq,
             1.0 - (1.0 - POW(10.0, -phred / 10.0)) * (1.0 - POW(10.0, -mapq / 10.0)) AS e
      FROM reads_hot WHERE covered
    ),
    scored AS (
      SELECT contig, site_start, sample_id, is_carrier, mapq,
             CASE WHEN is_carrier THEN LN(2.0 * e) - LN(2.0)
                  ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END AS ll0,
             CASE WHEN is_carrier THEN LN(e + (1.0 - e)) - LN(2.0)
                  ELSE LN((1.0 - e) + e) - LN(2.0) END AS ll1,
             CASE WHEN is_carrier THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                  ELSE LN(2.0 * e) - LN(2.0) END AS ll2
      FROM obs
    ),
    rolled AS (
      SELECT contig, site_start, sample_id,
             SUM(ll0) AS l0, SUM(ll1) AS l1, SUM(ll2) AS l2,
             COUNT(*) AS read_depth,
             CAST(SUM(CASE WHEN is_carrier THEN 1 ELSE 0 END) AS INT) AS alt_read_depth,
             CAST(SUM(CASE WHEN is_carrier THEN 0 ELSE 1 END) AS INT) AS ref_read_depth,
             SUM(CAST(mapq AS BIGINT) * mapq) AS sum_mapq_sq
      FROM scored
      GROUP BY contig, site_start, sample_id
    )
    SELECT contig, site_start, 'A' AS ref_allele, sample_id,
           CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                WHEN l1 >= l0 AND l1 >= l2 THEN 1
                ELSE 2 END AS gt_state,
           ROUND((10.0 / LN(10.0)) *
                 (GREATEST(l0, l1, l2) -
                  CASE WHEN l0 >= l1 AND l0 >= l2 THEN GREATEST(l1, l2)
                       WHEN l1 >= l0 AND l1 >= l2 THEN GREATEST(l0, l2)
                       ELSE GREATEST(l0, l1) END), 5) AS gq,
           CAST(read_depth AS INT) AS read_depth,
           ref_read_depth, alt_read_depth,
           ROUND(SQRT(CAST(sum_mapq_sq AS DOUBLE) / read_depth), 6) AS rms_mapq
    FROM rolled
"""


@query("gvcf_all_sites", _GVCF_ORACLE)
def gvcf_all_sites_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`-score_all_sites` gVCF mode — every covered site on the 97
    lattice is scored against the symbolic non-ref model, INCLUDING
    hom-ref reference blocks (no discovery filter): the per-read E2
    explode feeds the same score join + roll-up as the variant path.
    Oracle recomputes everything from the generation rule."""
    from avocado_spark.operators.genotyping import gvcf_score_all_sites

    reads = tables.derived(spark, sf_dir, "reads_hot")
    out = gvcf_score_all_sites(spark, reads, site_stride=97)
    return out.select(
        "contig",
        "site_start",
        "ref_allele",
        "sample_id",
        "gt_state",
        F.round("gq", 5).alias("gq"),
        "read_depth",
        "ref_read_depth",
        "alt_read_depth",
        F.round("rms_mapq", 6).alias("rms_mapq"),
    )


# --------------------------------------------------------------------------
# J5 gVCF square-off — oracle-level differential
# --------------------------------------------------------------------------

# genotype cohort with reference-model likelihood columns: nr_ll = the
# nonReferenceLikelihoods that get EXCISED into genotypeLikelihoods when
# a sample lacks an exact scored call at the variant
_NR_CALLS_SQL = """
  SELECT contig, start, "end", ref_allele, alt_allele, sample_id, gt_state,
         ll0, ll1, ll2,
         ll0 - 0.05 AS nr_ll0, ll1 - 0.05 AS nr_ll1, ll2 - 0.05 AS nr_ll2
  FROM calls_rel
"""

_SQUARE_OFF_ORACLE = f"""
    WITH calls_rel AS ({tables.CALLS_REL_SQL}),
    variants_rel AS ({tables.VARIANTS_REL_SQL}),
    g AS ({_NR_CALLS_SQL}),
    pairs AS (
      SELECT v.contig, v.start, v."end", v.ref_allele, v.alt_allele,
             g.sample_id,
             (v.start = g.start AND v.ref_allele = g.ref_allele
              AND g.alt_allele IS NOT NULL AND v.alt_allele = g.alt_allele) AS exact,
             g.gt_state, g.ll0, g.ll1, g.ll2, g.nr_ll0, g.nr_ll1, g.nr_ll2
      FROM variants_rel v JOIN g
        ON v.contig = g.contig AND v.start < g."end" AND v."end" > g.start
    ),
    scored AS (
      SELECT contig, start, "end", ref_allele, alt_allele, sample_id, exact,
             CASE WHEN exact THEN gt_state ELSE 0 END AS pick_state,
             CASE WHEN exact THEN ll0 ELSE nr_ll0 END AS pll0,
             CASE WHEN exact THEN ll1 ELSE nr_ll1 END AS pll1,
             CASE WHEN exact THEN ll2 ELSE nr_ll2 END AS pll2
      FROM pairs
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY contig, start, "end", ref_allele, alt_allele, sample_id
               ORDER BY exact DESC, pll0 DESC) AS rn,
             MAX(CASE WHEN exact THEN 1 ELSE 0 END) OVER (
               PARTITION BY contig, start, "end", ref_allele, alt_allele, sample_id
             ) AS any_exact
      FROM scored
    )
    SELECT contig, start, "end", ref_allele, alt_allele, sample_id,
           pick_state AS gt_state,
           ROUND(pll0, 9) AS ll0, ROUND(pll1, 9) AS ll1, ROUND(pll2, 9) AS ll2,
           any_exact = 1 AS had_exact
    FROM ranked WHERE rn = 1
"""


@query("gvcf_square_off", _SQUARE_OFF_ORACLE)
def gvcf_square_off_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — square-off at the operator level: per (variant, sample),
    the exact-match scored genotype orElse likelihoods excised from the
    overlapping reference model (SquareOffReferenceModel.scala:182-245).
    Ties on (exact, ll0) imply identical picks (ll triple is a bijection
    of gt_state in calls_rel), so the pick is deterministic."""
    from avocado_spark.operators.squareoff import square_off

    calls = tables.derived(spark, sf_dir, "calls_rel")
    g = calls.select(
        "contig", "start", "end", "ref_allele", "alt_allele", "sample_id",
        "gt_state", "ll0", "ll1", "ll2",
        (F.col("ll0") - 0.05).alias("nr_ll0"),
        (F.col("ll1") - 0.05).alias("nr_ll1"),
        (F.col("ll2") - 0.05).alias("nr_ll2"),
    )
    v = tables.derived(spark, sf_dir, "variants_rel").select(
        "contig", "start", "end", "ref_allele", "alt_allele"
    )
    out = square_off(v, g, strategy="binned")
    return out.select(
        "contig", "start", "end", "ref_allele", "alt_allele", "sample_id",
        "gt_state",
        F.round("ll0", 9).alias("ll0"),
        F.round("ll1", 9).alias("ll1"),
        F.round("ll2", 9).alias("ll2"),
        "had_exact",
    )


# ==========================================================================
# Round 2: indel genotyping + CNV-aware ploidy differentials
# ==========================================================================

# Indel hotspot reads: an all-'A' genome with INDEL hotspots at every
# multiple of 97 (reads ≤49 bp cover at most one). Even-k hotspots are
# INSERTION sites (carriers insert 'GG' anchored at h), odd-k hotspots
# are DELETION sites (carriers delete 'AAA' spanning [h, h+3), anchored
# at h−1 — the span covers the 97-lattice so gVCF mode sees it).
# Carrier shapes need the anchor in-read and room for the event, so
# carrier ⇔ read covers h with offset 1 ≤ hoff ≤ len−4 and id%3 ≠ 0.
READS_HOT_INDEL_SQL = """
SELECT
  oid AS read_id,
  contig,
  start,
  CASE WHEN carrier AND k_even THEN start + read_len - 2
       WHEN carrier THEN start + read_len + 3
       ELSE start + read_len END AS end,
  read_len, phred, mapq, sample_id, hot, hoff, k_even, covered, carrier,
  CASE WHEN carrier AND k_even
         THEN concat(CAST(hoff + 1 AS STRING), 'M2I', CAST(read_len - hoff - 3 AS STRING), 'M')
       WHEN carrier
         THEN concat(CAST(hoff AS STRING), 'M3D', CAST(read_len - hoff AS STRING), 'M')
       ELSE concat(CAST(read_len AS STRING), 'M') END AS cigar,
  CASE WHEN carrier AND k_even THEN CAST(read_len - 2 AS STRING)
       WHEN carrier THEN concat(CAST(hoff AS STRING), '^AAA', CAST(read_len - hoff AS STRING))
       ELSE CAST(read_len AS STRING) END AS md,
  CASE WHEN carrier AND k_even
         THEN concat(repeat('A', CAST(hoff + 1 AS INT)), 'GG',
                     repeat('A', CAST(read_len - hoff - 3 AS INT)))
       ELSE repeat('A', CAST(read_len AS INT)) END AS sequence,
  repeat(chr(33 + CAST(phred AS INT)), CAST(read_len AS INT)) AS qual,
  (oid % 7) % 2 = 0 AS forward_strand
FROM (
  SELECT *,
         (hoff <= read_len - 1) AS covered,
         ((oid % 3) <> 0 AND hoff >= 1 AND hoff <= read_len - 4) AS carrier
  FROM (
    SELECT o_orderkey AS oid,
           concat('chr', CAST(o_orderkey % 4 AS STRING)) AS contig,
           (o_orderkey * 37) % 3000 AS start,
           CAST(20 + o_orderkey % 30 AS INT) AS read_len,
           CAST(25 + o_orderkey % 10 AS INT) AS phred,
           CAST(20 + o_orderkey % 40 AS INT) AS mapq,
           concat('s', CAST(o_orderkey % 2 AS STRING)) AS sample_id,
           CAST(FLOOR((((o_orderkey * 37) % 3000) + 96) / 97) AS BIGINT) * 97 AS hot,
           CAST(FLOOR((((o_orderkey * 37) % 3000) + 96) / 97) AS BIGINT) * 97
             - (o_orderkey * 37) % 3000 AS hoff,
           CAST(FLOOR((((o_orderkey * 37) % 3000) + 96) / 97) AS BIGINT) % 2 = 0 AS k_even
    FROM orders
  ) base
) flags
"""

tables.DERIVED_SQL["reads_hot_indel"] = READS_HOT_INDEL_SQL

_PIPELINE_INDEL_ORACLE = f"""
    WITH r AS ({READS_HOT_INDEL_SQL}),
    sites AS (
      SELECT contig, hot, k_even
      FROM r WHERE carrier
      GROUP BY contig, hot, k_even HAVING COUNT(*) > 2
    ),
    obs AS (
      -- ALT obs: carriers. REF obs: ins site = any covering read;
      -- del site = reads covering the anchor (h-1) AND the span (h+3)
      SELECT r.contig, s.k_even,
             CASE WHEN s.k_even THEN s.hot ELSE s.hot - 1 END AS site_start,
             r.sample_id, r.carrier AS is_alt, r.mapq, r.phred,
             1.0 - (1.0 - POW(10.0, -r.phred / 10.0)) * (1.0 - POW(10.0, -r.mapq / 10.0)) AS e
      FROM r JOIN sites s ON r.contig = s.contig AND r.hot = s.hot
      WHERE r.carrier
         OR (s.k_even AND r.hoff <= r.read_len - 1)
         OR ((NOT s.k_even) AND r.hoff >= 1 AND r.hoff <= r.read_len - 3)
    ),
    scored AS (
      SELECT contig, k_even, site_start, sample_id, is_alt, mapq,
             CASE WHEN is_alt THEN LN(2.0 * e) - LN(2.0)
                  ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END AS ll0,
             LN(1.0) - LN(2.0) AS ll1,
             CASE WHEN is_alt THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                  ELSE LN(2.0 * e) - LN(2.0) END AS ll2
      FROM obs
    ),
    rolled AS (
      SELECT contig, k_even, site_start, sample_id,
             SUM(ll0) AS l0, SUM(ll1) AS l1, SUM(ll2) AS l2,
             COUNT(*) AS read_depth,
             CAST(SUM(CASE WHEN is_alt THEN 1 ELSE 0 END) AS INT) AS alt_read_depth,
             CAST(SUM(CASE WHEN is_alt THEN 0 ELSE 1 END) AS INT) AS ref_read_depth,
             SUM(CAST(mapq AS BIGINT) * mapq) AS sum_mapq_sq
      FROM scored
      GROUP BY contig, k_even, site_start, sample_id
    )
    SELECT contig, site_start,
           CASE WHEN k_even THEN 'A' ELSE 'AAAA' END AS ref_allele,
           CASE WHEN k_even THEN 'AGG' ELSE 'A' END AS alt_allele,
           sample_id,
           CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                WHEN l1 >= l0 AND l1 >= l2 THEN 1
                ELSE 2 END AS gt_state,
           ROUND((10.0 / LN(10.0)) *
                 (GREATEST(l0, l1, l2) -
                  CASE WHEN l0 >= l1 AND l0 >= l2 THEN GREATEST(l1, l2)
                       WHEN l1 >= l0 AND l1 >= l2 THEN GREATEST(l0, l2)
                       ELSE GREATEST(l0, l1) END), 5) AS gq,
           CAST(read_depth AS INT) AS read_depth,
           ref_read_depth, alt_read_depth,
           ROUND(SQRT(CAST(sum_mapq_sq AS DOUBLE) / read_depth), 6) AS rms_mapq
    FROM rolled
"""


@query("biallelic_pipeline_indel", _PIPELINE_INDEL_ORACLE)
def biallelic_pipeline_indel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 round 2 — the full pipeline over INSERTION and DELETION
    hotspot carriers: discovery finds the indel alleles, the parse-once
    event pass + JVM classify matches insertion bases / deletion widths
    (incl. the deletion REF span check), and the score roll-up genotypes
    them (BiallelicGenotyper.scala:227-336). The oracle recomputes
    every genotype arithmetically from the generation rule — this is
    the differential the r01 SNP-only oracle could not see."""
    from avocado_spark.operators.genotyping import biallelic_pipeline

    reads = tables.derived(spark, sf_dir, "reads_hot_indel")
    g = biallelic_pipeline(spark, reads, phred_threshold=18, min_observations=2)
    return g.select(
        "contig",
        "site_start",
        "ref_allele",
        "alt_allele",
        "sample_id",
        "gt_state",
        F.round("gq", 5).alias("gq"),
        "read_depth",
        "ref_read_depth",
        "alt_read_depth",
        F.round("rms_mapq", 6).alias("rms_mapq"),
    )


_GVCF_INDEL_ORACLE = f"""
    WITH r AS ({READS_HOT_INDEL_SQL}),
    obs AS (
      -- on the 97-lattice every covering read attests site h exactly
      -- once: ins carriers via the flipped anchor, del carriers via the
      -- spanned deleted base, everyone else via the aligned match
      SELECT contig, hot AS site_start, sample_id, carrier AS nonref, mapq, phred,
             1.0 - (1.0 - POW(10.0, -phred / 10.0)) * (1.0 - POW(10.0, -mapq / 10.0)) AS e
      FROM r WHERE covered
    ),
    scored AS (
      SELECT contig, site_start, sample_id, nonref, mapq,
             CASE WHEN nonref THEN LN(2.0 * e) - LN(2.0)
                  ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END AS ll0,
             LN(1.0) - LN(2.0) AS ll1,
             CASE WHEN nonref THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                  ELSE LN(2.0 * e) - LN(2.0) END AS ll2
      FROM obs
    ),
    rolled AS (
      SELECT contig, site_start, sample_id,
             SUM(ll0) AS l0, SUM(ll1) AS l1, SUM(ll2) AS l2,
             COUNT(*) AS read_depth,
             CAST(SUM(CASE WHEN nonref THEN 1 ELSE 0 END) AS INT) AS alt_read_depth,
             CAST(SUM(CASE WHEN nonref THEN 0 ELSE 1 END) AS INT) AS ref_read_depth,
             SUM(CAST(mapq AS BIGINT) * mapq) AS sum_mapq_sq
      FROM scored
      GROUP BY contig, site_start, sample_id
    )
    SELECT contig, site_start, 'A' AS ref_allele, sample_id,
           CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                WHEN l1 >= l0 AND l1 >= l2 THEN 1
                ELSE 2 END AS gt_state,
           ROUND((10.0 / LN(10.0)) *
                 (GREATEST(l0, l1, l2) -
                  CASE WHEN l0 >= l1 AND l0 >= l2 THEN GREATEST(l1, l2)
                       WHEN l1 >= l0 AND l1 >= l2 THEN GREATEST(l0, l2)
                       ELSE GREATEST(l0, l1) END), 5) AS gq,
           CAST(read_depth AS INT) AS read_depth,
           ref_read_depth, alt_read_depth,
           ROUND(SQRT(CAST(sum_mapq_sq AS DOUBLE) / read_depth), 6) AS rms_mapq
    FROM rolled
"""


@query("gvcf_all_sites_indel", _GVCF_INDEL_ORACLE)
def gvcf_all_sites_indel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 round 2 — gVCF all-sites mode over indel carriers: an
    insertion anchored at a lattice site and a deletion SPANNING one
    both score as non-reference evidence (Observer.scala:83-135),
    which the r01 match/mismatch-only observer could not express."""
    from avocado_spark.operators.genotyping import gvcf_score_all_sites

    reads = tables.derived(spark, sf_dir, "reads_hot_indel")
    out = gvcf_score_all_sites(spark, reads, site_stride=97)
    return out.select(
        "contig",
        "site_start",
        "ref_allele",
        "sample_id",
        "gt_state",
        F.round("gq", 5).alias("gq"),
        "read_depth",
        "ref_read_depth",
        "alt_read_depth",
        F.round("rms_mapq", 6).alias("rms_mapq"),
    )


_CNV_PLOIDY_ORACLE = f"""
    WITH reads_hot AS ({READS_HOT_SQL}),
    sites AS (
      SELECT contig, hot AS site_start
      FROM reads_hot WHERE is_carrier
      GROUP BY contig, hot HAVING COUNT(*) > 2
    ),
    obs AS (
      SELECT r.contig, s.site_start, r.sample_id, r.is_carrier,
             CAST(CASE WHEN r.contig = 'chr0' AND s.site_start < 1500 THEN 3
                       WHEN r.contig = 'chr1' AND s.site_start < 1500 THEN 1
                       ELSE 2 END AS DOUBLE) AS m,
             1.0 - (1.0 - POW(10.0, -r.phred / 10.0)) * (1.0 - POW(10.0, -r.mapq / 10.0)) AS e
      FROM reads_hot r
      JOIN sites s ON r.contig = s.contig AND r.hot = s.site_start AND r.covered
    ),
    scored AS (
      SELECT contig, site_start, sample_id, m,
             CASE WHEN is_carrier THEN LN(m * e) - LN(m)
                  ELSE LN(m * (1.0 - e)) - LN(m) END AS s0,
             CASE WHEN is_carrier THEN LN((m - 1) * e + (1.0 - e)) - LN(m)
                  ELSE LN((m - 1) * (1.0 - e) + e) - LN(m) END AS s1,
             CASE WHEN m >= 2 THEN
               CASE WHEN is_carrier THEN LN((m - 2) * e + 2 * (1.0 - e)) - LN(m)
                    ELSE LN((m - 2) * (1.0 - e) + 2 * e) - LN(m) END END AS s2,
             CASE WHEN m >= 3 THEN
               CASE WHEN is_carrier THEN LN((m - 3) * e + 3 * (1.0 - e)) - LN(m)
                    ELSE LN((m - 3) * (1.0 - e) + 3 * e) - LN(m) END END AS s3
      FROM obs
    ),
    rolled AS (
      SELECT contig, site_start, sample_id,
             CAST(MAX(m) AS INT) AS ploidy,
             SUM(s0) AS l0, SUM(s1) AS l1, SUM(s2) AS l2, SUM(s3) AS l3,
             CAST(COUNT(*) AS INT) AS read_depth
      FROM scored
      GROUP BY contig, site_start, sample_id
    )
    SELECT contig, site_start, sample_id, ploidy, read_depth,
           CASE WHEN ploidy = 1 THEN CASE WHEN l0 >= l1 THEN 0 ELSE 1 END
                WHEN ploidy = 2 THEN
                  CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                       WHEN l1 >= l0 AND l1 >= l2 THEN 1
                       ELSE 2 END
                ELSE
                  CASE WHEN l0 >= l1 AND l0 >= l2 AND l0 >= l3 THEN 0
                       WHEN l1 >= l0 AND l1 >= l2 AND l1 >= l3 THEN 1
                       WHEN l2 >= l0 AND l2 >= l1 AND l2 >= l3 THEN 2
                       ELSE 3 END END AS gt_state,
           ROUND(l0, 5) AS ll0, ROUND(l1, 5) AS ll1,
           ROUND(l2, 5) AS ll2, ROUND(l3, 5) AS ll3
    FROM rolled
"""


@query("biallelic_cnv_ploidy", _CNV_PLOIDY_ORACLE)
def biallelic_cnv_ploidy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12/J4 round 2 — copy-number-aware genotyping: sites inside the
    chr0 DUP interval genotype against ploidy 3 (states 0..3), sites in
    the chr1 LOSS interval against ploidy 1, everything else diploid —
    the reference's CNV dimension (ScoredObservation.scala:101-165,
    BiallelicGenotyper.scala:376-383, CopyNumberMap.scala:45-111). The
    oracle recomputes the per-ploidy likelihood grids arithmetically."""
    from avocado_spark.operators.genotyping import biallelic_pipeline

    reads = tables.derived(spark, sf_dir, "reads_hot")
    cnv = spark.createDataFrame(
        [("chr0", 0, 1500, 3), ("chr1", 0, 1500, 1)],
        "contig string, start long, end long, copy_number int",
    )
    g = biallelic_pipeline(spark, reads, phred_threshold=18, min_observations=2, cnv=cnv)
    return g.select(
        "contig",
        "site_start",
        "sample_id",
        "ploidy",
        "read_depth",
        "gt_state",
        F.round("ll0", 5).alias("ll0"),
        F.round("ll1", 5).alias("ll1"),
        F.round("ll2", 5).alias("ll2"),
        F.round("ll3", 5).alias("ll3"),
    )


# ==========================================================================
# Round 2: gVCF jointer end-to-end — genotyper output feeds the cohort layer
# ==========================================================================

_JOINTER_E2E_ORACLE = f"""
    WITH r AS ({READS_HOT_SQL}),
    cov AS (SELECT * FROM r WHERE covered),
    -- per-SAMPLE discovery (each sample's own gVCF run): carrier
    -- support strictly greater than min_observations=2
    vsites AS (
      SELECT contig, hot, sample_id
      FROM cov WHERE is_carrier
      GROUP BY contig, hot, sample_id HAVING COUNT(*) > 2
    ),
    -- per-(site, sample) likelihood sums over that sample's covering
    -- reads; identical arithmetic serves the exact-call rows AND the
    -- gVCF reference-model rows (symbolic non-ref, no OTHER evidence)
    ll AS (
      SELECT contig, hot, sample_id,
             SUM(CASE WHEN is_carrier THEN LN(2.0 * e) - LN(2.0)
                      ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END) AS l0,
             SUM(LN(1.0) - LN(2.0)) AS l1,
             SUM(CASE WHEN is_carrier THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                      ELSE LN(2.0 * e) - LN(2.0) END) AS l2
      FROM (
        SELECT contig, hot, sample_id, is_carrier,
               1.0 - (1.0 - POW(10.0, -phred / 10.0)) * (1.0 - POW(10.0, -mapq / 10.0)) AS e
        FROM cov
      ) GROUP BY contig, hot, sample_id
    ),
    states AS (
      SELECT contig, hot, sample_id, l0, l1, l2,
             CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                  WHEN l1 >= l0 AND l1 >= l2 THEN 1
                  ELSE 2 END AS st
      FROM ll
    ),
    -- cohort variant list: a site enters iff some sample's OWN gVCF
    -- call there is ALT-carrying (extract_variants semantics)
    varset AS (
      SELECT DISTINCT s.contig, s.hot
      FROM states s
      JOIN vsites v ON s.contig = v.contig AND s.hot = v.hot
                   AND s.sample_id = v.sample_id
      WHERE s.st IN (1, 2)
    ),
    squared AS (
      SELECT vs.contig, vs.hot AS start, s.sample_id,
             CASE WHEN v.sample_id IS NOT NULL THEN s.st ELSE 0 END AS gt_state,
             v.sample_id IS NOT NULL AS had_exact,
             s.l0, s.l1, s.l2
      FROM varset vs
      JOIN states s ON s.contig = vs.contig AND s.hot = vs.hot
      LEFT JOIN vsites v ON v.contig = vs.contig AND v.hot = vs.hot
                        AND v.sample_id = s.sample_id
    ),
    with_maf AS (
      SELECT *,
             CAST(SUM(CASE WHEN gt_state = 1 THEN 1
                           WHEN gt_state = 2 THEN 2 ELSE 0 END)
                  OVER (PARTITION BY contig, start) AS DOUBLE)
             / SUM(2) OVER (PARTITION BY contig, start) AS maf
      FROM squared
    ),
    recalled AS (
      SELECT *,
             l0 + 2.0 * LN(1.0 - p) AS post0,
             l1 + LN(2.0) + LN(p) + LN(1.0 - p) AS post1,
             l2 + 2.0 * LN(p) AS post2
      FROM (SELECT *, LEAST(GREATEST(maf, 0.05), 0.95) AS p
            FROM with_maf WHERE maf > 0)
    )
    SELECT contig, start, 'A' AS ref_allele, 'G' AS alt_allele, sample_id,
           gt_state, had_exact, ROUND(maf, 9) AS maf,
           ROUND(post0, 5) AS post0, ROUND(post1, 5) AS post1,
           ROUND(post2, 5) AS post2,
           CASE WHEN post0 >= post1 AND post0 >= post2 THEN 0
                WHEN post1 >= post0 AND post1 >= post2 THEN 1
                ELSE 2 END AS recalled_state
    FROM recalled
"""


@query("gvcf_jointer_e2e", _JOINTER_E2E_ORACLE)
def gvcf_jointer_e2e_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9→J5→E4 round 2 — the full cohort chain ON ENGINE OUTPUT: two
    per-sample gVCF genotyper runs + the all-sites reference model,
    unioned, then jointer() = extract_variants → square_off (exact pick
    or nr_ll excision) → joint_recall (MAF prior re-call). Round 1's
    chain only worked on fixture tables (the genotyper emitted neither
    ll* nor nr_ll* names); this entry proves the payload contract
    end-to-end (BiallelicGenotyper.scala:579-748, Jointer.scala:97-148,
    SquareOffReferenceModel.scala:87-245)."""
    from avocado_spark.operators.genotyping import (
        biallelic_pipeline,
        gvcf_score_all_sites,
    )
    from avocado_spark.plans.pipelines import jointer

    reads = tables.derived(spark, sf_dir, "reads_hot")
    keep = [
        "contig",
        F.col("site_start").alias("start"),
        F.col("site_end").alias("end"),
        "ref_allele",
        "alt_allele",
        "sample_id",
        "gt_state",
        "ll0",
        "ll1",
        "ll2",
        "nr_ll0",
        "nr_ll1",
        "nr_ll2",
    ]
    per_sample = [
        biallelic_pipeline(
            spark,
            reads.where(F.col("sample_id") == s),
            phred_threshold=18,
            min_observations=2,
        ).select(*keep)
        for s in ("s0", "s1")
    ]
    gvcf = gvcf_score_all_sites(spark, reads, site_stride=97).select(*keep)
    genotypes = per_sample[0].unionByName(per_sample[1]).unionByName(gvcf)
    out = jointer(genotypes, from_gvcf=True, join_strategy="binned", maf_floor=0.05)
    return out.select(
        "contig",
        "start",
        "ref_allele",
        "alt_allele",
        "sample_id",
        "gt_state",
        "had_exact",
        F.round("maf", 9).alias("maf"),
        F.round("post0", 5).alias("post0"),
        F.round("post1", 5).alias("post1"),
        F.round("post2", 5).alias("post2"),
        "recalled_state",
    )


# ==========================================================================
# Round 2: trio genotyper from READS end-to-end
# ==========================================================================

# reads_hot re-sampled into three pedigree roles; (read_id % 7) % 3 is
# coprime-ish with the carrier lattice (read_id % 3) so every role has
# carrier and non-carrier reads at every hotspot
READS_HOT_TRIO_SQL = f"""
SELECT read_id, contig, start, read_len, hot, covered, is_carrier,
       cigar, md, sequence, qual, phred, mapq,
       concat('s', CAST((read_id % 7) % 3 AS STRING)) AS sample_id,
       TRUE AS read_mapped, TRUE AS primary_alignment,
       FALSE AS duplicate_read
FROM ({READS_HOT_SQL}) base_reads
"""

tables.DERIVED_SQL["reads_hot_trio"] = READS_HOT_TRIO_SQL

_TRIO_FROM_READS_ORACLE = f"""
    WITH r AS ({READS_HOT_TRIO_SQL}),
    sites AS (  -- cohort-wide discovery over the 3-way union
      SELECT contig, hot FROM r WHERE is_carrier
      GROUP BY contig, hot HAVING COUNT(*) > 2
    ),
    obs AS (
      SELECT r.contig, s.hot, r.sample_id, r.is_carrier,
             1.0 - (1.0 - POW(10.0, -r.phred / 10.0)) * (1.0 - POW(10.0, -r.mapq / 10.0)) AS e
      FROM r JOIN sites s ON r.contig = s.contig AND r.hot = s.hot AND r.covered
    ),
    rolled AS (
      SELECT contig, hot, sample_id,
             SUM(CASE WHEN is_carrier THEN LN(2.0 * e) - LN(2.0)
                      ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END) AS l0,
             SUM(LN(1.0) - LN(2.0)) AS l1,
             SUM(CASE WHEN is_carrier THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                      ELSE LN(2.0 * e) - LN(2.0) END) AS l2,
             COUNT(*) AS dp,
             SUM(CASE WHEN is_carrier THEN 1 ELSE 0 END) AS alt_dp
      FROM obs GROUP BY contig, hot, sample_id
    ),
    called AS (
      SELECT contig, hot, sample_id,
             CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                  WHEN l1 >= l0 AND l1 >= l2 THEN 1
                  ELSE 2 END AS st0,
             (10.0 / LN(10.0)) *
               (GREATEST(l0, l1, l2) -
                CASE WHEN l0 >= l1 AND l0 >= l2 THEN GREATEST(l1, l2)
                     WHEN l1 >= l0 AND l1 >= l2 THEN GREATEST(l0, l2)
                     ELSE GREATEST(l0, l1) END) AS gq,
             CAST(alt_dp AS DOUBLE) / dp AS af
      FROM rolled
    ),
    rewritten AS (  -- F4 then F2 with the CLI defaults
      SELECT contig, hot, sample_id,
             CASE WHEN st0 = 1 AND af >= 0.666 THEN 2 ELSE st0 END AS st,
             CASE WHEN st0 = 1 AND af >= 0.666 THEN NULL ELSE gq END AS gq2
      FROM called
    ),
    emitted AS (
      SELECT * FROM rewritten
      WHERE (gq2 IS NULL OR gq2 >= 10) AND st IN (1, 2)
    ),
    pivoted AS (
      SELECT contig, hot AS start,
             MAX(CASE WHEN sample_id = 's0' THEN st END) AS p1r,
             MAX(CASE WHEN sample_id = 's1' THEN st END) AS p2r,
             MAX(CASE WHEN sample_id = 's2' THEN st END) AS chr_
      FROM emitted GROUP BY contig, hot
    ),
    judged AS (
      SELECT contig, start,
             COALESCE(p1r, 3) AS p1, COALESCE(p2r, 3) AS p2, COALESCE(chr_, 3) AS ch,
             CASE WHEN COALESCE(p1r, 3) = 2 THEN 1 ELSE 0 END AS p1min,
             CASE WHEN COALESCE(p2r, 3) = 2 THEN 1 ELSE 0 END AS p2min,
             CASE WHEN COALESCE(p1r, 3) IN (1,2,3) THEN 1 ELSE 0 END AS p1max,
             CASE WHEN COALESCE(p2r, 3) IN (1,2,3) THEN 1 ELSE 0 END AS p2max
      FROM pivoted
      WHERE COALESCE(p1r, 3) IN (1,2) OR COALESCE(p2r, 3) IN (1,2)
         OR COALESCE(chr_, 3) IN (1,2)
    )
    SELECT contig, start, 'A' AS ref_allele, 'G' AS alt_allele,
           p1 AS p1_state, p2 AS p2_state, ch AS child_state,
           (ch IN (0,1,2) AND ch >= p1min + p2min AND ch <= p1max + p2max)
             AS mendelian_consistent,
           CASE WHEN ch IN (0,1,2) AND ch >= p1min + p2min AND ch <= p1max + p2max
                THEN ch ELSE 3 END AS called_child_state,
           CASE WHEN ch = 1 AND ch >= p1min + p2min AND ch <= p1max + p2max
                     AND p1max = 1 AND p2max = 0 THEN 'ALT|REF'
                WHEN ch = 1 AND ch >= p1min + p2min AND ch <= p1max + p2max
                     AND p2max = 1 AND p1max = 0 THEN 'REF|ALT'
                ELSE NULL END AS child_phase
    FROM judged
"""


@query("trio_from_reads", _TRIO_FROM_READS_ORACLE)
def trio_from_reads_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 round 2 — `trioGenotyper` end to end FROM READS
    (TrioGenotyper.scala:192-275): 3-way union feeds one cohort
    discovery, each member genotypes against the shared site set
    through the full biallelic stack (prefilter → discover → genotype
    → rewrite-hets → emission filter), then Mendelian check + phasing.
    Round 1 only gated the trio state table on fixtures; the oracle
    here recomputes every member's calls from the generation rule."""
    from avocado_spark.plans.pipelines import trio_genotyper

    r = tables.derived(spark, sf_dir, "reads_hot_trio")
    out = trio_genotyper(
        spark,
        r.where(F.col("sample_id") == "s0"),
        r.where(F.col("sample_id") == "s1"),
        r.where(F.col("sample_id") == "s2"),
        ("s0", "s1", "s2"),
    )
    return out.select(
        "contig",
        "start",
        "ref_allele",
        "alt_allele",
        "p1_state",
        "p2_state",
        "child_state",
        "mendelian_consistent",
        "called_child_state",
        "child_phase",
    )


# ==========================================================================
# Round 2: F1 contig-preset whitelist + catalog filter + mate nullify
# ==========================================================================

# reads spread over every contig-naming class the reference's preset
# filters distinguish (PrefilterReads.scala:206-264): GRC / non-GRC
# autosome, sex, mitochondrial, plus decoy/unplaced junk; mate pointers
# land on the NEXT class so mate-nullification is exercised too
READS_CONTIGS_SQL = """
SELECT
  o_orderkey AS read_id,
  CASE CAST(o_orderkey % 10 AS INT)
    WHEN 0 THEN 'chr1'  WHEN 1 THEN '12'   WHEN 2 THEN 'chrX'
    WHEN 3 THEN 'Y'     WHEN 4 THEN 'chrM' WHEN 5 THEN 'MT'
    WHEN 6 THEN 'chrUn_gl000220' WHEN 7 THEN 'GL000192.1'
    WHEN 8 THEN 'chr2_gl000191_random' ELSE 'HLA-A'
  END AS contig,
  (o_orderkey * 37) % 100000 AS start,
  CAST(o_orderkey % 94 AS INT) AS mapq,
  (o_orderkey % 19) <> 0 AS read_mapped,
  (o_orderkey % 17) <> 0 AS primary_alignment,
  (o_orderkey % 23) = 0 AS duplicate_read,
  (o_orderkey % 5) <> 0 AS mate_mapped,
  CASE CAST((o_orderkey + 1) % 10 AS INT)
    WHEN 0 THEN 'chr1'  WHEN 1 THEN '12'   WHEN 2 THEN 'chrX'
    WHEN 3 THEN 'Y'     WHEN 4 THEN 'chrM' WHEN 5 THEN 'MT'
    WHEN 6 THEN 'chrUn_gl000220' WHEN 7 THEN 'GL000192.1'
    WHEN 8 THEN 'chr2_gl000191_random' ELSE 'HLA-A'
  END AS mate_contig,
  (o_orderkey * 53) % 100000 AS mate_start,
  concat('s', CAST(o_orderkey % 3 AS STRING)) AS sample_id
FROM orders
"""

tables.DERIVED_SQL["reads_contigs"] = READS_CONTIGS_SQL

# default preset: autosomes (both schemes) + sex, no MT —
# ^(chr[0-9]+|[0-9]+|chr[XYZW]|[XYZW])$
_PRESET_RE = "^(chr[0-9]+|[0-9]+|chr[XYZW]|[XYZW])$"

_PREFILTER_PRESET_ORACLE = f"""
    WITH r AS ({READS_CONTIGS_SQL}),
    kept AS (
      SELECT * FROM r
      WHERE read_mapped AND primary_alignment AND NOT duplicate_read
        AND (mapq IS NULL OR mapq > 10)
        AND regexp_matches(contig, '{_PRESET_RE}')
    )
    SELECT read_id, contig, start, mapq, sample_id,
           CASE WHEN mate_mapped AND NOT regexp_matches(mate_contig, '{_PRESET_RE}')
                THEN NULL ELSE mate_contig END AS mate_contig,
           CASE WHEN mate_mapped AND NOT regexp_matches(mate_contig, '{_PRESET_RE}')
                THEN NULL ELSE mate_start END AS mate_start,
           CASE WHEN mate_mapped AND NOT regexp_matches(mate_contig, '{_PRESET_RE}')
                THEN FALSE ELSE mate_mapped END AS mate_mapped
    FROM kept
"""


@query("prefilter_reads_preset", _PREFILTER_PRESET_ORACLE)
def prefilter_reads_preset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 round 2 — the preset contig whitelist (GRC + non-GRC
    autosome/sex naming schemes, MT excluded by default) with
    filtered-mate nullification, the reference's PrefilterReads.apply
    shape end to end (PrefilterReads.scala:52-85,206-264)."""
    from avocado_spark.operators.relational import prefilter_reads_preset

    r = tables.derived(spark, sf_dir, "reads_contigs")
    out = prefilter_reads_preset(
        r,
        min_mapq=10,
        autosomal_only=False,
        keep_mitochondrial=False,
        nullify_filtered_mates=True,
    )
    return out.select(
        "read_id", "contig", "start", "mapq", "sample_id",
        "mate_contig", "mate_start", "mate_mapped",
    )


# ==========================================================================
# Round 3: multi-allelic shared-anchor differential (VERDICT r02 ask #3)
# ==========================================================================

# Multi-allelic hotspot reads: all-'A' genome, hotspots every 97 (reads
# ≤49 bp cover at most one). Reads split into three classes by id % 3:
# class 1 carries a G mismatch at the hotspot, class 2 carries a T at
# the SAME anchor, class 0 is reference. Each (site, allele) with >2
# carriers is discovered, so most lattice sites host TWO variants at
# one position — the overlapping-observation case where the reference's
# OTHER_ALT correction applies (BiallelicGenotyper.scala:297-336): a T
# read scored against the A→G variant attests a third allele, so it
# counts toward depth and other_read_depth but is EXCLUDED from the
# biallelic likelihood.
READS_HOT_MULTI_SQL = """
SELECT
  oid AS read_id, contig, start, start + read_len AS end,
  read_len, phred, mapq, sample_id, hot, carrier_class, alt_base,
  (hot - start < read_len) AS covered,
  (hot - start < read_len AND carrier_class <> 0) AS is_carrier,
  concat(CAST(read_len AS STRING), 'M') AS cigar,
  CASE WHEN hot - start < read_len AND carrier_class <> 0
    THEN concat(CAST(hot - start AS STRING), 'A',
                CAST(start + read_len - 1 - hot AS STRING))
    ELSE CAST(read_len AS STRING) END AS md,
  CASE WHEN hot - start < read_len AND carrier_class <> 0
    THEN concat(repeat('A', CAST(hot - start AS INT)), alt_base,
                repeat('A', CAST(start + read_len - 1 - hot AS INT)))
    ELSE repeat('A', CAST(read_len AS INT)) END AS sequence,
  repeat(chr(33 + CAST(phred AS INT)), CAST(read_len AS INT)) AS qual
FROM (
  SELECT o_orderkey AS oid,
         concat('chr', CAST(o_orderkey % 4 AS STRING)) AS contig,
         (o_orderkey * 37) % 3000 AS start,
         20 + o_orderkey % 30 AS read_len,
         CAST(25 + o_orderkey % 10 AS INT) AS phred,
         CAST(20 + o_orderkey % 40 AS INT) AS mapq,
         concat('s', CAST(o_orderkey % 2 AS STRING)) AS sample_id,
         CAST(FLOOR((((o_orderkey * 37) % 3000) + 96) / 97) AS BIGINT) * 97 AS hot,
         CAST(o_orderkey % 3 AS INT) AS carrier_class,
         CASE WHEN o_orderkey % 3 = 1 THEN 'G'
              WHEN o_orderkey % 3 = 2 THEN 'T' END AS alt_base
  FROM orders
) base
"""

tables.DERIVED_SQL["reads_hot_multi"] = READS_HOT_MULTI_SQL

_MULTIALLELIC_ORACLE = f"""
    WITH r AS ({READS_HOT_MULTI_SQL}),
    alleles AS (
      SELECT contig, hot AS site_start, alt_base AS alt_allele
      FROM r WHERE is_carrier
      GROUP BY contig, hot, alt_base HAVING COUNT(*) > 2
    ),
    obs AS (
      SELECT a.contig, a.site_start, a.alt_allele, r.sample_id, r.mapq,
             CASE WHEN r.carrier_class = 0 THEN 'ref'
                  WHEN r.alt_base = a.alt_allele THEN 'alt'
                  ELSE 'other' END AS cls,
             1.0 - (1.0 - POW(10.0, -r.phred / 10.0))
                 * (1.0 - POW(10.0, -r.mapq / 10.0)) AS e
      FROM r
      JOIN alleles a ON r.contig = a.contig AND r.hot = a.site_start
      WHERE r.covered
    ),
    scored AS (
      -- OTHER_ALT rows contribute NULL to every biallelic likelihood
      -- (SUM skips them) but still count in depth / rms_mapq
      SELECT contig, site_start, alt_allele, sample_id, cls, mapq,
             CASE WHEN cls = 'other' THEN NULL
                  WHEN cls = 'alt' THEN LN(2.0 * e) - LN(2.0)
                  ELSE LN(2.0 * (1.0 - e)) - LN(2.0) END AS ll0,
             CASE WHEN cls = 'other' THEN NULL
                  ELSE LN(1.0) - LN(2.0) END AS ll1,
             CASE WHEN cls = 'other' THEN NULL
                  WHEN cls = 'alt' THEN LN(2.0 * (1.0 - e)) - LN(2.0)
                  ELSE LN(2.0 * e) - LN(2.0) END AS ll2
      FROM obs
    ),
    rolled AS (
      SELECT contig, site_start, alt_allele, sample_id,
             SUM(ll0) AS l0, SUM(ll1) AS l1, SUM(ll2) AS l2,
             COUNT(*) AS read_depth,
             CAST(SUM(CASE WHEN cls = 'ref' THEN 1 ELSE 0 END) AS INT) AS ref_read_depth,
             CAST(SUM(CASE WHEN cls = 'alt' THEN 1 ELSE 0 END) AS INT) AS alt_read_depth,
             CAST(SUM(CASE WHEN cls = 'other' THEN 1 ELSE 0 END) AS INT) AS other_read_depth,
             SUM(CAST(mapq AS BIGINT) * mapq) AS sum_mapq_sq
      FROM scored
      GROUP BY contig, site_start, alt_allele, sample_id
    )
    SELECT contig, site_start, 'A' AS ref_allele, alt_allele, sample_id,
           CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
                WHEN l1 >= l0 AND l1 >= l2 THEN 1
                ELSE 2 END AS gt_state,
           ROUND((10.0 / LN(10.0)) *
                 (GREATEST(l0, l1, l2) -
                  CASE WHEN l0 >= l1 AND l0 >= l2 THEN GREATEST(l1, l2)
                       WHEN l1 >= l0 AND l1 >= l2 THEN GREATEST(l0, l2)
                       ELSE GREATEST(l0, l1) END), 5) AS gq,
           CAST(read_depth AS INT) AS read_depth,
           ref_read_depth, alt_read_depth, other_read_depth,
           ROUND(SQRT(CAST(sum_mapq_sq AS DOUBLE) / read_depth), 6) AS rms_mapq
    FROM rolled
"""


@query("biallelic_multiallelic", _MULTIALLELIC_ORACLE)
def biallelic_multiallelic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 round 3 — TWO alleles sharing one anchor: per variant, reads
    carrying the OTHER allele classify as OTHER_ALT — excluded from the
    biallelic genotype likelihood, included in read_depth /
    other_read_depth / RMS mapQ (BiallelicGenotyper.scala:297-336).
    The oracle recomputes both variants' genotypes per site
    arithmetically, so any cross-allele leakage into the likelihoods or
    depth miscounting hash-mismatches."""
    from avocado_spark.operators.genotyping import biallelic_pipeline

    reads = tables.derived(spark, sf_dir, "reads_hot_multi")
    g = biallelic_pipeline(spark, reads, phred_threshold=18, min_observations=2)
    return g.select(
        "contig",
        "site_start",
        "ref_allele",
        "alt_allele",
        "sample_id",
        "gt_state",
        F.round("gq", 5).alias("gq"),
        "read_depth",
        "ref_read_depth",
        "alt_read_depth",
        "other_read_depth",
        F.round("rms_mapq", 6).alias("rms_mapq"),
    )


@query(
    "interval_union_length",
    f"""
    WITH reads_rel AS ({tables.oracle_cte("reads_rel")}),
    flagged AS (
      SELECT contig, start, "end",
             CASE WHEN MAX("end") OVER (PARTITION BY contig ORDER BY start, "end"
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                   OR start > MAX("end") OVER (PARTITION BY contig ORDER BY start, "end"
                                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM reads_rel
    ),
    islands AS (
      SELECT contig, start, "end",
             SUM(new_island) OVER (PARTITION BY contig ORDER BY start, "end"
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    per_island AS (
      SELECT contig, island, MIN(start) AS i_start, MAX("end") AS i_end
      FROM islands GROUP BY contig, island
    )
    SELECT contig, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_end - i_start) AS BIGINT) AS covered_len
    FROM per_island GROUP BY contig
    """,
)
def interval_union_length_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covered-bases rollup: merge overlapping read intervals into
    islands (running-max sweep, one contig shuffle, no per-position
    explode) and total the union length per contig — the coverage
    summary the reference derives by walking positions, at O(reads)
    instead of O(reads x read length)."""
    from avocado_spark.operators.coverage import interval_union_length

    reads = tables.derived(spark, sf_dir, "reads_rel")
    return interval_union_length(reads)
