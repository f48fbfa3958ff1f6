"""Biallelic genotyping core (SURVEY §2.3 E2/E3, §2.4 J2, §2.5 A3,
§2.2 F9, §2.8 X12/X15/X16).

The reference pipeline (BiallelicGenotyper.scala:438-556):
  read ⋈(interval) variants → per-(read,variant) observation →
  broadcast equi-join against a precomputed likelihood dimension table →
  wide groupBy(site) aggregation → per-site genotype state/quality.

Spark-first re-expression:
  * observation extraction = interval join (operators.interval_join)
    + an Arrow ``mapInPandas`` classifier (the only Python step);
  * the score dimension table (P3) is generated once per session from
    ``spark.range`` cross joins — pure column math, broadcast-joined
    on (qual, mapq, is_alt) — "precompute likelihoods … saves on
    runtime" (SummarizedObservation.scala:23-28);
  * the site roll-up keeps likelihoods as FLAT double columns for the
    wide agg exactly because that benches faster than array-typed
    aggregation, the modern form of the reference's flatten/re-nest
    dance (P4) minus the re-nest;
  * genotype state/quality are pure array expressions (X15), no UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avocado_spark.functions import math_fns as M
from avocado_spark.functions.alignment import read_base_at
from avocado_spark.operators.interval_join import interval_join

PLOIDY = 2


def score_table(
    spark: SparkSession, max_qual: int = 60, max_mapq: int = 93, ploidy: int = PLOIDY
) -> DataFrame:
    """P3/X12 — likelihood dimension table: one row per (qual, mapq,
    is_alt) with flat columns ll_g0..ll_g<ploidy>, where
    L(g | alt obs) = log((m−g)ε + g(1−ε)) − log m and the ref-observation
    likelihood is its allele mirror (ε ↔ 1−ε)
    (ScoredObservation.scala:101-165, Observer.scala:151-185)."""
    quals = spark.range(1, max_qual + 1).select(F.col("id").alias("qual"))
    mapqs = spark.range(1, max_mapq + 1).select(F.col("id").alias("mapq"))
    flags = spark.range(0, 2).select(F.col("id").cast("boolean").alias("is_alt"))
    grid = quals.crossJoin(mapqs).crossJoin(flags)
    p_ok = M.phred_to_success_prob(F.col("qual").cast("double")) * M.phred_to_success_prob(
        F.col("mapq").cast("double")
    )
    eps = 1 - p_ok
    m = F.lit(float(ploidy))
    cols = [
        M.genotype_log_likelihood(
            F.lit(float(g)), m, F.when(F.col("is_alt"), eps).otherwise(1 - eps)
        ).alias(f"ll_g{g}")
        for g in range(ploidy + 1)
    ]
    return grid.select("qual", "mapq", "is_alt", *cols)


_OBS_SCHEMA = (
    "contig string, site_start long, site_end long, ref_allele string, "
    "alt_allele string, sample_id string, qual int, mapq int, is_alt boolean"
)


def _classify_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """E3 — classify each (read, variant) pair: the read base aligned to
    the variant position supports ALT / REF (other-alt observations are
    dropped in this biallelic core; OTHER_ALT surfaces in the cohort
    layer). BiallelicGenotyper.scala:195-393."""
    for pdf in batches:
        rows = []
        for r in pdf.itertuples(index=False):
            try:
                hit = read_base_at(
                    int(r.r_start), r.r_sequence, r.r_qual, r.r_cigar, r.r_md, int(r.l_start)
                )
            except (ValueError, IndexError):
                continue
            if hit is None:
                continue
            base, q = hit
            if base == r.l_alt_allele:
                is_alt = True
            elif base == r.l_ref_allele:
                is_alt = False
            else:
                continue
            rows.append(
                (
                    r.l_contig,
                    int(r.l_start),
                    int(r.l_end),
                    r.l_ref_allele,
                    r.l_alt_allele,
                    r.r_sample_id,
                    q,
                    int(r.r_mapq),
                    is_alt,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "contig",
                "site_start",
                "site_end",
                "ref_allele",
                "alt_allele",
                "sample_id",
                "qual",
                "mapq",
                "is_alt",
            ],
        )


def observe_variants(
    reads: DataFrame, variants: DataFrame, strategy: str = "broadcast"
) -> DataFrame:
    """E2/E3 — per-(read, variant) observations via the interval join +
    Arrow classifier. The variant side is expected small (discovery's
    count-prefilter P5 guards the broadcast)."""
    v = variants.select("contig", "start", "end", "ref_allele", "alt_allele")
    r = reads.select(
        "contig", "start", "end", "sequence", "qual", "cigar", "md", "mapq", "sample_id"
    )
    joined = interval_join(v, r, strategy=strategy)
    return joined.mapInPandas(_classify_batches, schema=_OBS_SCHEMA)


def genotype_sites(
    spark: SparkSession, observations: DataFrame, ploidy: int = PLOIDY
) -> DataFrame:
    """J2 + A3 + F9/X15 — join observations against the broadcast score
    table, roll up per (site, sample) with flat likelihood sums, emit
    genotype state/quality/depths (BiallelicGenotyper.scala:458-556,622-668)."""
    scores = score_table(spark, ploidy=ploidy)
    obs = observations.withColumn("qual", F.least(F.col("qual"), F.lit(60)).cast("long")).withColumn(
        "mapq", F.least(F.col("mapq"), F.lit(93)).cast("long")
    )
    joined = obs.join(F.broadcast(scores), ["qual", "mapq", "is_alt"], "inner")

    ll_cols = [F.sum(f"ll_g{g}").alias(f"sum_ll_g{g}") for g in range(ploidy + 1)]
    site_keys = ["contig", "site_start", "site_end", "ref_allele", "alt_allele", "sample_id"]
    rolled = joined.groupBy(*site_keys).agg(
        *ll_cols,
        F.count("*").alias("read_depth"),
        F.sum(F.when(F.col("is_alt"), 1).otherwise(0)).cast("int").alias("alt_read_depth"),
        F.sum(F.when(~F.col("is_alt"), 1).otherwise(0)).cast("int").alias("ref_read_depth"),
        F.sum(F.col("mapq") * F.col("mapq")).alias("sum_mapq_sq"),
    )

    lls = F.array(*[F.col(f"sum_ll_g{g}") for g in range(ploidy + 1)])
    state, gq = M.genotype_state_and_quality(lls)
    return rolled.select(
        *site_keys,
        state.alias("gt_state"),
        gq.alias("gq"),
        F.col("read_depth").cast("int").alias("read_depth"),
        "ref_read_depth",
        "alt_read_depth",
        M.rms_mapq(F.col("sum_mapq_sq").cast("double"), F.col("read_depth")).alias("rms_mapq"),
        *[F.col(f"sum_ll_g{g}") for g in range(ploidy + 1)],
    )


def biallelic_pipeline(
    spark: SparkSession,
    reads: DataFrame,
    phred_threshold: int = 18,
    min_observations: int = 2,
    strategy: str = "broadcast",
) -> DataFrame:
    """The flagship end-to-end pipeline (§3.1): discover → interval join
    → classify → score join → site roll-up → genotypes."""
    from avocado_spark.operators.discovery import discover_variants

    variants = discover_variants(reads, phred_threshold, min_observations)
    obs = observe_variants(reads, variants, strategy=strategy)
    return genotype_sites(spark, obs)


_ALLSITE_SCHEMA = (
    "contig string, site_start long, site_end long, ref_allele string, "
    "alt_allele string, sample_id string, qual int, mapq int, is_alt boolean"
)


def _observe_all_batches(stride: int):
    from avocado_spark.functions.alignment import observe_sites

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    obs = observe_sites(
                        int(r.start), r.sequence, r.qual, r.cigar, r.md, stride
                    )
                except (ValueError, IndexError):
                    continue  # row-level fault isolation
                for pos, ref_base, is_ref, q in obs:
                    rows.append(
                        (
                            r.contig,
                            pos,
                            pos + 1,
                            ref_base,
                            None,  # symbolic non-ref allele (gVCF)
                            r.sample_id,
                            q,
                            int(r.mapq),
                            not is_ref,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "contig",
                    "site_start",
                    "site_end",
                    "ref_allele",
                    "alt_allele",
                    "sample_id",
                    "qual",
                    "mapq",
                    "is_alt",
                ],
            )

    return run


def gvcf_score_all_sites(
    spark: SparkSession, reads: DataFrame, site_stride: int = 1
) -> DataFrame:
    """The reference's `-score_all_sites` gVCF mode
    (avocado-cli/.../BiallelicGenotyper.scala:186-189, classification
    change avocado-core/.../genotyping/BiallelicGenotyper.scala:223-275):
    score EVERY covered reference site against the symbolic non-ref
    model, not just discovered variants — hom-ref blocks included.

    Shape: a per-read explode (no interval join — every site the read
    covers is a site of interest) → broadcast score join → site roll-up.
    ``site_stride`` thins the site lattice (1 = true every-base mode);
    output volume is coverage × covered-positions / stride."""
    cols = ["contig", "start", "sequence", "qual", "cigar", "md", "mapq", "sample_id"]
    obs = reads.select(cols).mapInPandas(
        _observe_all_batches(site_stride), schema=_ALLSITE_SCHEMA
    )
    return genotype_sites(spark, obs)
