"""Table registration + derived genomic-shaped tables.

The driver provides a TPC-H-ish star schema plus ``events``,
``documents`` and ``embeddings`` (TESTDATA.md). The genomic operator
semantics of the reference (reads / variants / genotypes keyed by
interval — SURVEY §1.1) are exercised against *derived* tables built
deterministically from the star schema with scalar arithmetic that is
expressible identically in Spark SQL and DuckDB SQL. The derivation
text is shared verbatim between both engines, so the differential
oracle tests the OPERATOR, not the data generator.

Oracle-determinism conventions used across the query registry:
  * aggregate money/quantity sums are computed as integer sums of
    per-row-rounded integers (exact in both engines — no FP
    accumulation-order drift);
  * per-row doubles use identical formula text in both engines and are
    rounded to 6-8 digits to absorb last-ulp libm differences;
  * all output columns are lower_snake_case and explicitly aliased on
    both sides (the driver's compare sorts columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from avocado_spark.session import load_table

RAW_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# ---------------------------------------------------------------------------
# Shared derivation SQL (valid in BOTH Spark SQL and DuckDB).
#
# reads_rel   — interval fact table shaped like the reference's
#               AlignmentRecord scan (FIXTURES.md §1): one genomic
#               interval + mapping flags per row, derived from `orders`.
# variants_rel — site dimension shaped like DiscoveredVariant
#               (FIXTURES.md §2), derived from `part`.
# calls_rel   — flat genotype-call table shaped like the scalar spine of
#               Genotype (FIXTURES.md §3, arrays handled per-query),
#               derived from `lineitem`.
# ---------------------------------------------------------------------------

READS_REL_SQL = """
SELECT
  o_orderkey                                            AS read_id,
  concat('chr', CAST(o_orderkey % 4 AS STRING))         AS contig,
  (o_orderkey * 37) % 100000                            AS start,
  (o_orderkey * 37) % 100000 + 50 + o_orderkey % 51     AS end,
  CAST(o_orderkey % 94 AS INT)                          AS mapq,
  (o_orderkey % 19) <> 0                                AS read_mapped,
  (o_orderkey % 17) <> 0                                AS primary_alignment,
  (o_orderkey % 23) = 0                                 AS duplicate_read,
  (o_orderkey % 2) = 0                                  AS forward_strand,
  CAST(30 + o_orderkey % 41 AS INT)                     AS base_qual,
  concat('s', CAST(o_orderkey % 3 AS STRING))           AS sample_id
FROM orders
"""

VARIANTS_REL_SQL = """
SELECT
  p_partkey                                             AS variant_id,
  concat('chr', CAST(p_partkey % 4 AS STRING))          AS contig,
  (p_partkey * 911) % 100000                            AS start,
  (p_partkey * 911) % 100000 + 1 + CAST(p_partkey % 3 AS INT) AS end,
  substring('ACGT', CAST(p_partkey % 4 AS INT) + 1, 1)  AS ref_allele,
  substring('TGCA', CAST(p_partkey % 4 AS INT) + 1, 1)  AS alt_allele
FROM part
"""

# genotype-call spine: scalar columns only (allele arrays are built
# per-query on each side, since array literal syntax differs).
# gt_state: 0=hom-ref 1=het 2=hom-alt 3=no-call — drives allele arrays.
CALLS_REL_SQL = """
SELECT
  l_orderkey * 10 + l_linenumber                        AS call_id,
  concat('chr', CAST(l_partkey % 4 AS STRING))          AS contig,
  (l_partkey * 911) % 100000                            AS start,
  (l_partkey * 911) % 100000 + 1                        AS end,
  substring('ACGT', CAST(l_partkey % 4 AS INT) + 1, 1)  AS ref_allele,
  substring('TGCA', CAST(l_partkey % 4 AS INT) + 1, 1)  AS alt_allele,
  concat('s', CAST(l_suppkey % 3 AS STRING))            AS sample_id,
  CAST((l_orderkey + l_linenumber) % 4 AS INT)          AS gt_state,
  CAST(10 + (l_orderkey % 50) AS INT)                   AS read_depth,
  -- FLOOR before CAST: DuckDB rounds on double->int casts, Spark truncates
  CAST(FLOOR((l_orderkey % 50) * (100 - l_suppkey % 30) / 100) AS INT) AS ref_read_depth,
  CAST(10 + (l_orderkey % 50) AS INT)
    - CAST(FLOOR((l_orderkey % 50) * (100 - l_suppkey % 30) / 100) AS INT) AS alt_read_depth,
  CAST(l_suppkey % 99 AS INT)                           AS genotype_quality,
  CAST(20 + l_partkey % 41 AS INT)                      AS rms_mapq,
  -- strand-bias 2x2 counts (X13 input)
  CAST(1 + l_orderkey % 20 AS INT)                      AS ref_fwd,
  CAST(1 + l_partkey % 20 AS INT)                       AS ref_rev,
  CAST(1 + l_suppkey % 12 AS INT)                       AS alt_fwd,
  CAST(1 + l_linenumber % 12 AS INT)                    AS alt_rev,
  -- log-likelihood triple (ploidy 2): identical formula text both engines;
  -- CAST AS DOUBLE so neither engine keeps DECIMAL literal arithmetic
  CAST(-0.1 AS DOUBLE) - CAST((l_orderkey + l_linenumber) % 4 AS INT) * CAST(1.5 AS DOUBLE)      AS ll0,
  CAST(-0.2 AS DOUBLE) - CAST((l_orderkey + l_linenumber + 1) % 4 AS INT) * CAST(1.5 AS DOUBLE)  AS ll1,
  CAST(-0.3 AS DOUBLE) - CAST((l_orderkey + l_linenumber + 2) % 4 AS INT) * CAST(1.5 AS DOUBLE)  AS ll2
FROM lineitem
"""

DERIVED_SQL = {
    "reads_rel": READS_REL_SQL,
    "variants_rel": VARIANTS_REL_SQL,
    "calls_rel": CALLS_REL_SQL,
}


# session → sf_dir currently backing the temp views. Registration
# re-reads 10 parquet footers; doing it once per (session, sf_dir
# switch) — not once per query — keeps driver-gate and bench timings
# honest (the r01 bench charged ~7s of view re-registration overhead
# across queries). Keyed by id(session), NOT applicationId: temp views
# are SparkSession-scoped, and a spark.newSession() sibling shares the
# applicationId but not the views. A tableExists probe also re-registers
# if an external dropTempView cleared them under the cache.
_REGISTERED: dict[int, str] = {}


def register_raw_views(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register the driver parquet tables as temp views (S1-S4), once
    per (session, sf_dir)."""
    key = id(spark)
    if (
        _REGISTERED.get(key) == sf_dir
        and not force
        and spark.catalog.tableExists(RAW_TABLES[0])
    ):
        return
    for name in RAW_TABLES:
        try:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception:
            pass  # some sf dirs may lack optional tables
    _REGISTERED[key] = sf_dir


def derived(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Materialize one derived genomic-shaped table as a DataFrame."""
    register_raw_views(spark, sf_dir)
    return spark.sql(DERIVED_SQL[name])


def oracle_cte(name: str) -> str:
    """The same derivation as a DuckDB CTE body."""
    return DERIVED_SQL[name]
