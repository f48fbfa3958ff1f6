"""r14 optimization-round measurement harness (guide §1).

For each named query: build + count once warm, then best-of-N timed
runs, capture the formatted plan to plans/r14/<query>_<tag>.txt, and
record how many Spark jobs the build+action triggered (driver-blocking
collects inside operator builds show up here — each is a sequential
job whose scheduling overhead a 100 TB cluster pays too).

Usage:
    python tools/measure_r14.py <tag> [query ...]
    SPARK_GRAFT_MEASURE_RUNS=3  (default)

Writes plans/r14/<query>_<tag>.txt and prints one JSON line per query:
{"query": ..., "best": s, "runs": [...], "jobs": n, "plan_lines": n,
 "exchanges": n, "wscg": n}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_MEASURE_RUNS", "3"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from avocado_spark.queries import get_queries
    from avocado_spark.session import get_spark

    spark = get_spark(app_name="avocado_spark_measure_r14")
    registry = get_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        if name not in registry:
            print(json.dumps({"query": name, "error": "not in registry"}))
            continue
        samples = []
        jobs_used = 0
        err = None
        for i in range(runs + 1):  # first is the warm pass
            jid_before = _next_job_hint(spark)
            t0 = time.perf_counter()
            try:
                df = registry[name](spark, sf_dir)
                df.count()
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"[:300]
                break
            dt = time.perf_counter() - t0
            jid_after = _next_job_hint(spark)
            if i > 0:
                samples.append(round(dt, 3))
            jobs_used = jid_after - jid_before
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        rec: dict = {"query": name, "tag": tag}
        if err:
            rec["error"] = err
        if samples:
            rec["best"] = min(samples)
            rec["runs"] = samples
            rec["jobs"] = jobs_used
        if not err:
            # fresh build for the plan (bench.py discipline: pre-exec plan)
            try:
                df = registry[name](spark, sf_dir)
                txt = df._jdf.queryExecution().explainString(
                    df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                path = os.path.join(out_dir, f"{name}_{tag}.txt")
                with open(path, "w") as fh:
                    fh.write(txt)
                rec["plan_lines"] = txt.count("\n")
                rec["exchanges"] = len(re.findall(r"\bExchange\b", txt))
                rec["wscg"] = len(re.findall(r"WholeStageCodegen", txt))
                rec["bhj"] = len(re.findall(r"BroadcastHashJoin", txt))
                rec["smj"] = len(re.findall(r"SortMergeJoin", txt))
                rec["shj"] = len(re.findall(r"ShuffledHashJoin", txt))
                rec["pyeval"] = len(
                    re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", txt)
                )
            except Exception as e:  # noqa: BLE001
                rec["plan_error"] = f"{e}"[:200]
        print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


def _next_job_hint(spark) -> int:
    """Monotone job counter: number of jobs recorded so far."""
    try:
        return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
    except Exception:  # noqa: BLE001
        return 0


if __name__ == "__main__":
    sys.exit(main())
