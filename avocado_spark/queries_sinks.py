"""Sink read-back differentials (SURVEY §2.1 S4-S7, §2.6 O3/O4).

The reference exercises its sinks inside every CLI command
(avocado-cli/.../Jointer.scala:137-145, Reassemble.scala:86); these
queries do the Spark-native equivalent: WRITE parquet through
``sources/io.py`` inside the query, READ it back, and hand the driver a
result whose hash can only match the oracle if the sink round-tripped
values, partitioning metadata, and (for the sorted sink) physical row
order faithfully.

Each query writes to a fresh ``tempfile.mkdtemp`` dir; the returned
DataFrame stays lazy over those files, which persist for the session.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avocado_spark import tables
from avocado_spark.queries import query
from avocado_spark.sources import io as IO

_READS = tables.oracle_cte("reads_rel")


@query(
    "sink_roundtrip_partitioned",
    f"""
    WITH reads_rel AS ({_READS})
    SELECT read_id, contig, start, mapq
    FROM reads_rel
    WHERE start < 50000
    """,
)
def sink_roundtrip_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S7 + O3 + S8 — hive-partitioned parquet sink with an explicit
    output-partition-count hint, then a pushdown read-back: the
    partition column (``contig``) leaves the data files entirely and
    must be reconstructed from directory keys on scan; projection +
    predicate reach the read-back scan (write path
    avocado-cli/.../BiallelicGenotyper.scala:285, partition hint
    BiallelicGenotyper.scala:90-97)."""
    df = tables.derived(spark, sf_dir, "reads_rel")
    root = os.path.join(tempfile.mkdtemp(prefix="avocado_sink_"), "reads")
    IO.write_parquet(df, root, partition_by=["contig"], num_partitions=4)
    return IO.scan_parquet(
        spark,
        root,
        columns=["read_id", "contig", "start", "mapq"],
        predicate=F.col("start") < 50000,
    )


@query(
    "sink_glob_union",
    f"""
    WITH reads_rel AS ({_READS})
    SELECT sample_id, COUNT(*) AS n_reads,
           CAST(SUM(start) AS BIGINT) AS sum_start,
           CAST(SUM(mapq) AS BIGINT) AS sum_mapq
    FROM reads_rel
    WHERE sample_id IN ('s0', 's1')
    GROUP BY sample_id
    """,
)
def sink_glob_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + O3 — two independently-written parquet datasets (the
    reference's per-sample gVCF outputs, Jointer.scala:107-111) scanned
    back as ONE logical relation via the glob union scan, then rolled
    up per sample: the counts/sums only match if the union saw every
    row of both sinks exactly once."""
    df = tables.derived(spark, sf_dir, "reads_rel")
    base = tempfile.mkdtemp(prefix="avocado_glob_")
    p0, p1 = os.path.join(base, "s0"), os.path.join(base, "s1")
    IO.write_parquet(df.where(F.col("sample_id") == "s0"), p0, num_partitions=2)
    IO.write_parquet(df.where(F.col("sample_id") == "s1"), p1, num_partitions=2)
    back = IO.scan_parquet_glob(spark, [p0, p1])
    return back.groupBy("sample_id").agg(
        F.count("*").alias("n_reads"),
        F.sum("start").cast("bigint").alias("sum_start"),
        F.sum("mapq").cast("bigint").alias("sum_mapq"),
    )


@query(
    "sink_sorted_single_file",
    f"""
    WITH reads_rel AS ({_READS})
    SELECT read_id, contig, start,
           ROW_NUMBER() OVER (ORDER BY contig, start, read_id) - 1 AS file_order
    FROM reads_rel
    WHERE mapq >= 80
    """,
)
def sink_sorted_single_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 + O4 — the saveAsVcf `-single` sorted sink
    (Jointer.scala:73-86,137-145): range-partitioned total sort,
    coalesced to ONE parquet file. The read-back tags each row with its
    physical file position; the hash only matches the oracle's
    ROW_NUMBER if (a) exactly one file was written and (b) its rows are
    in total (contig, start, read_id) order — physical sortedness is
    part of the differential, not just the values."""
    df = tables.derived(spark, sf_dir, "reads_rel").where(F.col("mapq") >= 80)
    out = os.path.join(tempfile.mkdtemp(prefix="avocado_sorted_"), "sorted")
    IO.write_sorted(df, out, order_by=["contig", "start", "read_id"], single_file=True)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1, f"single-file sink wrote {len(files)} files"
    back = spark.read.parquet(out).coalesce(1)
    return back.select(
        "read_id", "contig", "start", F.monotonically_increasing_id().alias("file_order")
    )


@query(
    "bucketed_colocated_join",
    """
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: write BOTH join sides bucketed
    by the join key (same bucket count), read them back through the
    catalog, and join — the bucket layout carries the partitioning
    proof, so the SortMergeJoin needs NO Exchange on either side
    (plan-gated in tests/test_plans.py). At 100 TB this is THE way to
    amortize a fact-fact join key across every downstream query: pay
    the shuffle once at ingest, never again.

    The hash can only match the oracle if every row of both sinks
    round-tripped the bucketed write exactly once."""
    import uuid

    from avocado_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    base = tempfile.mkdtemp(prefix="avocado_bucketed_")
    tag = uuid.uuid4().hex[:8]
    to, tl = f"avb_orders_{tag}", f"avb_lineitem_{tag}"
    # r13 optimization round (guide §2.6): the two bucketed ingest
    # writes are independent jobs — submit them from a 2-thread pool so
    # the second write's tasks back-fill executors freed by the first's
    # tail instead of waiting for the full commit. Same writes, same
    # files; ~the smaller write's wall time saved.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    @inheritable_thread_target
    def _write(args):
        df, name, key, sub = args
        IO.write_bucketed(
            df, name, [key], num_buckets=8, sort_cols=[key],
            path=os.path.join(base, sub),
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(
            pool.map(
                _write,
                [
                    (
                        o.select("o_orderkey", "o_orderstatus"),
                        to, "o_orderkey", "orders",
                    ),
                    (li, tl, "l_orderkey", "lineitem"),
                ],
            )
        )
    ob, lb = spark.table(to), spark.table(tl)
    return (
        ob.hint("merge")
        .join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_c"),
        )
    )


@query(
    "sink_schema_evolution",
    f"""
    WITH reads_rel AS ({_READS})
    SELECT read_id, contig, start, NULL AS mapq
    FROM reads_rel WHERE sample_id = 's0'
    UNION ALL
    SELECT read_id, contig, start, mapq
    FROM reads_rel WHERE sample_id = 's1'
    """,
)
def sink_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution round-trip: a v1 dataset written WITHOUT the
    mapq column and a v2 dataset written with it, read back as one
    relation via mergeSchema — v1 rows must surface null mapq, v2 rows
    their real values. The hash can only match if the merged scan
    neither drops the new column nor invents values for old files."""
    df = tables.derived(spark, sf_dir, "reads_rel")
    base = tempfile.mkdtemp(prefix="avocado_evolve_")
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    IO.write_parquet(
        df.where(F.col("sample_id") == "s0").select("read_id", "contig", "start"),
        v1, num_partitions=2,
    )
    IO.write_parquet(
        df.where(F.col("sample_id") == "s1").select(
            "read_id", "contig", "start", "mapq"
        ),
        v2, num_partitions=2,
    )
    return IO.scan_parquet_evolved(spark, [v1, v2]).select(
        "read_id", "contig", "start", "mapq"
    )


@query(
    "sink_orc_roundtrip",
    """
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS value_c
    FROM events WHERE event_id < 20000 AND event_type = 'click'
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format breadth beyond parquet: ORC sink + read-back
    with a post-write predicate, exercising ORC's own predicate
    pushdown and column pruning on the return path (the second
    columnar format a lakehouse inevitably has to ingest). Avro is the
    one mainstream format NOT covered: its Spark module is external
    and absent from this container, so it is deliberately out rather
    than stubbed."""
    from avocado_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 20000)
    out = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    root = os.path.join(tempfile.mkdtemp(prefix="avocado_sink_"), "events_orc")
    out.write.mode("overwrite").orc(root)
    return spark.read.orc(root).where(F.col("event_type") == "click")


@query(
    "sink_csv_roundtrip",
    """
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS value_c
    FROM events WHERE event_id < 20000
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-format breadth: CSV sink + schema-declared read-back (the
    reference's htsjdk text edges — SAM/VCF — are line-oriented text
    with an external schema, exactly this shape). Values ride as
    integer cents so text serialization is lossless; the read-back
    declares the schema explicitly (no inferSchema pass — at 100 TB
    schema inference is a full extra scan)."""
    from avocado_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 20000)
    out = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    root = os.path.join(tempfile.mkdtemp(prefix="avocado_sink_"), "events_csv")
    out.write.mode("overwrite").option("header", "true").csv(root)
    return spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value_c bigint"
    ).option("header", "true").csv(root)


@query(
    "sink_json_roundtrip",
    """
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS value_c
    FROM events WHERE event_id < 20000
    """,
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-format breadth: JSON-lines sink + schema-declared
    read-back — the interchange format for downstream tools that don't
    speak parquet. Same lossless integer-cent contract and no-inference
    scan as the CSV arm."""
    from avocado_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 20000)
    out = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    root = os.path.join(tempfile.mkdtemp(prefix="avocado_sink_"), "events_json")
    out.write.mode("overwrite").json(root)
    return spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value_c bigint"
    ).json(root)


_EXPECTED_SCHEMAS = {
    "events": [
        ("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "orders": [
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"), ("o_orderpriority", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int"),
    ],
}


@query(
    "table_schema_contract",
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{t}', '{c}', '{d}')"
        for t, cols in sorted(_EXPECTED_SCHEMAS.items())
        for c, d in cols
    )
    + ") AS v(table_name, column_name, dtype)",
)
def table_schema_contract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract canary: the NORMALIZED schema of every core
    driver table (post load_table timestamp canonicalization) must
    equal the declared contract, column for column, type for type.
    This is the loud-in-pytest guard the round-4 regression called for
    — the driver has silently re-encoded fixtures across rounds
    (TIMESTAMP(NANOS) → long nanos → TIMESTAMP_NTZ), and this
    differential turns the next such change into a red row instead of
    nine downstream failures. Pure metadata: no data is scanned."""
    from avocado_spark.session import load_table

    rows = []
    for t in sorted(_EXPECTED_SCHEMAS):
        for c, d in load_table(spark, sf_dir, t).dtypes:
            rows.append((t, c, d))
    return spark.createDataFrame(rows, ["table_name", "column_name", "dtype"])
