"""Realignment operator (SURVEY §2.2 F7 — the `reassemble` pipeline,
§3.3): an embarrassingly-parallel per-read map with NO shuffle.

Spark shape: ``mapInPandas`` over the reads table — Arrow-batched
transfer, one Python worker per input partition, schema = input schema
plus a ``was_realigned`` flag. At 100 TB this is a single map stage:
no exchange, no skew surface, scales linearly with executors; the
string kernel (avocado_spark.functions.realign) is the per-row cost.

Reference: avocado-core/.../realigner/Realigner.scala:46-113 (driver),
row-level fault isolation per :97-105 (errors keep the input row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, StructField, StructType


def realign_reads(
    reads: DataFrame,
    kmer_length: int = 20,
    sequence_col: str = "sequence",
    cigar_col: str = "cigar",
    md_col: str = "md",
    mapped_col: str | None = "read_mapped",
) -> DataFrame:
    """Realign every mapped read's CIGAR/MD via k-mer anchored local
    realignment; unmapped/unparseable rows pass through unchanged."""
    from avocado_spark.functions.realign import realign_read

    # note: StructType.add mutates in place — build a fresh StructType
    out_schema = StructType(
        list(reads.schema.fields) + [StructField("was_realigned", BooleanType(), False)]
    )
    has_mapped = mapped_col is not None and mapped_col in reads.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cigars, mds, flags = [], [], []
            mapped = pdf[mapped_col] if has_mapped else None
            for i, (seq, cig, md) in enumerate(
                zip(pdf[sequence_col], pdf[cigar_col], pdf[md_col])
            ):
                if mapped is not None and not bool(mapped.iloc[i]):
                    cigars.append(cig)
                    mds.append(md)
                    flags.append(False)
                else:
                    c, m, f = realign_read(seq, cig, md, kmer_length)
                    cigars.append(c)
                    mds.append(m)
                    flags.append(f)
            pdf = pdf.copy()
            pdf[cigar_col] = cigars
            pdf[md_col] = mds
            pdf["was_realigned"] = flags
            yield pdf

    # the local fixture scan is one split; round-robin so the Arrow
    # kernel uses every core (no-op semantically, AQE-coalesced on a
    # cluster where the scan has real splits)
    reads = reads.repartition(reads.sparkSession.sparkContext.defaultParallelism)
    return reads.mapInPandas(run, schema=out_schema)
