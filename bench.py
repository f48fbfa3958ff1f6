"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall times.

Headline set = the shuffle/join-heavy operators whose physical plans
matter at 100 TB (interval joins, wide agg, window cap, broadcast dim
join) — not the cheap per-row kernels.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from avocado_spark.queries import get_queries
    from avocado_spark.session import get_spark

    spark = get_spark(app_name="avocado_spark_bench")

    headline = [
        "wide_agg_q1",
        "interval_join_broadcast",
        "interval_join_binned",
        "interval_join_group_right",
        "broadcast_equijoin_dim",
        "topk_per_group",
        "count_filter_discovery",
        "cnv_point_lookup",
        "fisher_strand_bias",
        "minhash_dedup_pairs",
        "dedup_clusters",
        "ngram_jaccard_pairs",
        "embedding_dup_pairs",
        "exact_dedup",
        "gopher_quality_gate",
        "stream_attribution_join",
        "ann_topk_cosine",
        "ann_srp_bucketed",
        "biallelic_pipeline",
        "realign_reads",
        "coverage_cap",
        "stream_tumbling_hourly",
        "stream_session_windows",
        "stream_running_total",
    ]
    registry = get_queries()
    # warm the JVM / codegen / parquet-footer caches so the first timed
    # query doesn't absorb session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "part"):
        try:
            from avocado_spark.session import load_table

            load_table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass

    timings: dict[str, float] = {}
    total = 0.0
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    for name in headline:
        fn = registry.get(name)
        if fn is None:
            continue
        # time the full build+action; isolate per-query cache state so
        # one query's persisted intermediates don't skew the next.
        # best-of-N (default 2) damps GC/codegen jitter — round 1 saw
        # ±2× single-run variance on the skew-partition pair queries,
        # which made round-over-round comparison meaningless.
        best, n = float("inf"), 0
        for _ in range(max(runs, 1)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            best = min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": max(runs, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
