"""Gate-rotation policy: the driver's correctness gate samples the
first ~50 registry entries, so get_queries() insertion order IS the
verification rotation. The order must be (0) never-driver-green
queries first, then (1) oldest-green-first from the committed
CORRECTNESS_r*.json artifacts — self-maintaining, no hand curation
(r7 verdict #1)."""

from __future__ import annotations

import glob
import json
from pathlib import Path

from avocado_spark.queries import _gate_priority, get_oracles, get_queries

ROOT = Path(__file__).resolve().parent.parent


def _last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in Path(f).stem.rsplit("_r", 1)[-1] if c.isdigit()))
        rows = json.load(open(f))
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match") in (True, None)
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def test_rotation_is_oldest_green_first():
    order = list(get_queries())
    green = _last_green()
    rounds = [green.get(q, 0) for q in order]
    assert rounds == sorted(rounds), "gate order must be nondecreasing in last-green round"
    # queries and oracles expose the identical rotation
    assert order == list(get_oracles())


def test_never_green_queries_gate_head():
    order = list(get_queries())
    green = _last_green()
    never = {q for q in order if q not in green}
    # every never-verified query sits inside the driver's ~50-sample window
    for q in never:
        assert order.index(q) < 50, f"{q} never driver-verified but outside the gate window"


def test_priority_is_deterministic():
    names = list(get_queries())
    assert _gate_priority(names) == _gate_priority(list(reversed(names)))


def test_query_invocation_sets_job_attribution(spark):
    """r7 verdict #7 (reference P9, Timers.scala:25-69): every
    registered query stamps the driver thread's job group/description
    so event logs attribute stages to the owning query; iterative
    operators refine the description per round but keep the group."""
    qs = get_queries()
    from tests.conftest import SF_SMOKE

    qs["wide_agg_q1"](spark, SF_SMOKE)
    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.job.description") == "avocado:wide_agg_q1"
    assert sc.getLocalProperty("spark.jobGroup.id") == "avocado:wide_agg_q1"
    qs["dedup_clusters"](spark, SF_SMOKE).count()
    assert sc.getLocalProperty("spark.jobGroup.id") == "avocado:dedup_clusters"
    assert sc.getLocalProperty("spark.job.description").startswith(
        "avocado:connected_components:round"
    )
