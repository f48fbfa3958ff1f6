"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline-shaped query (the
biallelicGenotyper hot path re-expressed relationally: scan → filter →
interval join → broadcast dim join → wide agg) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry —
one entry per SURVEY.md §2 operator — for the duckdb differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full biallelic genotyping pipeline — discovery
    (CIGAR/MD kernel) → binned broadcast interval join → Arrow
    classification → broadcast score-table join → wide site roll-up →
    genotype emission — the reference's §3.1 hot path
    (avocado-core/.../genotyping/BiallelicGenotyper.scala:438-556)."""
    from avocado_spark.queries import get_queries

    return get_queries()["biallelic_pipeline"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from avocado_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from avocado_spark.queries import get_oracles

    return get_oracles()
