"""Variant discovery (SURVEY §2.3 E1, §2.5 A1/A2).

Reference: avocado-core/.../genotyping/DiscoverVariants.scala —
flatMap variantsInRead over the read table, then either distinct()
(no threshold) or groupBy(site).count().where(> minObservations).

Spark-first shape: the string kernel runs in ``mapInPandas`` (Arrow
batches, one output row per candidate variant); everything relational
(dedup, support filter) stays in DataFrame land so Catalyst plans it.
Rows that fail to parse are dropped, mirroring the reference's
row-level fault isolation (BiallelicGenotyper.scala:385-391).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from avocado_spark.functions.alignment import variants_in_read
from avocado_spark.operators.relational import count_filter

_OUT_SCHEMA = "contig string, start long, end long, ref_allele string, alt_allele string"


def _extract_batches(
    batches: Iterator[pd.DataFrame], phred_threshold: int
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple[str, int, int, str, str]] = []
        for contig, start, seq, qual, cigar, md in zip(
            pdf["contig"], pdf["start"], pdf["sequence"], pdf["qual"], pdf["cigar"], pdf["md"]
        ):
            try:
                rows.extend(
                    variants_in_read(contig, int(start), seq, qual, cigar, md, phred_threshold)
                )
            except (ValueError, IndexError):
                continue  # malformed alignment: drop row, not the job
        yield pd.DataFrame(
            rows, columns=["contig", "start", "end", "ref_allele", "alt_allele"]
        )


def discover_variants(
    reads: DataFrame,
    phred_threshold: int = 18,
    min_observations: int | None = None,
) -> DataFrame:
    """reads(contig,start,sequence,qual,cigar,md,...) → candidate
    variant sites. ``min_observations=None`` → distinct (A2), else the
    support count-filter (A1) which doubles as the broadcast-size guard
    for the downstream interval join (P5)."""
    cols = ["contig", "start", "sequence", "qual", "cigar", "md"]
    # spread the single-split local scan so the Arrow kernel
    # parallelizes (AQE-coalesced on a real multi-split cluster scan)
    spread = reads.select(cols).repartition(
        reads.sparkSession.sparkContext.defaultParallelism
    )
    candidates = spread.mapInPandas(
        lambda it: _extract_batches(it, phred_threshold), schema=_OUT_SCHEMA
    )
    keys = ["contig", "start", "end", "ref_allele", "alt_allele"]
    if min_observations is None:
        return candidates.distinct()
    return count_filter(candidates, keys, min_observations)
