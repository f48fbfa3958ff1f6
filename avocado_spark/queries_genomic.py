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
