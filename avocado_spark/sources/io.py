"""Sources & sinks (SURVEY §2.1 S1-S8).

The reference's edge formats (SAM/BAM/VCF via htsjdk) are out of scope
per the driver harness — Parquet is the interchange format. What IS
ported is the *behavior* attached to those edges:

  * S1-S4 scans with projection/predicate pushdown
    (avocado-cli/.../BiallelicGenotyper.scala:218-222 — explicit
    projection filters; Catalyst prunes the parquet scan once the plan
    declares a select/filter);
  * S4 globbed multi-file union scan (avocado-cli/.../Jointer.scala:107-111);
  * S5/S7 Parquet sink (avocado-cli/.../BiallelicGenotyper.scala:285);
  * S6 sorted single-file sink — saveAsVcf's `-single` mode
    (avocado-cli/.../Jointer.scala:73-86,137-145): total genome sort,
    then one output partition;
  * O3/O4 partition-count hints (avocado-cli/.../BiallelicGenotyper.scala:90-97).

Scale notes: the sorted sink's orderBy is a range-partitioned sort
(sampled boundaries, no single-reducer bottleneck); only the final
coalesce(1) serializes, and only when single_file=True — the default
keeps one file per partition, which is what a 1000-executor job wants.
Bucketed writes co-locate future equi-joins on the bucket key with
zero shuffle (the Spark analog of the reference's "pre-partitioned
dataset" assumption).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession


def scan_parquet(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """S1-S3/S8: parquet scan with declared projection + predicate so
    Catalyst pushes both into the scan (ReadSchema / PushedFilters)."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.where(predicate)
    if columns is not None:
        df = df.select(*columns)
    return df


def scan_parquet_glob(spark: SparkSession, paths: Sequence[str] | str) -> DataFrame:
    """S4: multi-file/glob union scan (one logical relation, not a
    unionByName of N scans — keeps partition pruning intact)."""
    if isinstance(paths, str):
        return spark.read.parquet(paths)
    return spark.read.parquet(*paths)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> None:
    """S5/S7 + O3: parquet sink with optional hive partitioning and an
    explicit output-partition-count hint."""
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    order_by: Sequence[str],
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """S6/O1: genome-sorted sink. Range-partitioned total sort; with
    single_file=True the sorted partitions coalesce to one file (the
    saveAsVcf `-single` mode — an edge convenience, not the scale
    path)."""
    out = df.orderBy(*order_by)
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed table sink: co-locates future equi-joins/aggs on the
    bucket key (shuffle-free at read time). The scale answer to the
    reference's sorted-input assumption (HardLimiter O2, TreeRegionJoin
    forest build)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", os.path.abspath(path))
    w.format("parquet").saveAsTable(table_name)


def scan_parquet_evolved(
    spark: SparkSession, paths: Sequence[str]
) -> DataFrame:
    """Schema-evolution scan: one logical relation over parquet
    datasets written at different schema versions (``mergeSchema``) —
    columns absent in older files surface as nulls. The ingest reality
    of any long-lived 100 TB table: readers must span schema versions
    without rewriting history. Merging reads every footer, so
    production tables pin the merged schema in a catalog; this is the
    discovery path."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
