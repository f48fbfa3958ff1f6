"""Property differential for funnel_stages: the stacked conditional-min
window implementation must agree with a direct per-user replay of the
ordered-funnel definition (stage k counts only at or after stage k-1's
earliest qualifying time) on randomized event streams."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from avocado_spark.streaming.events import funnel_stages

STAGES = ("view", "click", "purchase")


def _replay(rows):
    """Pure-python oracle: earliest qualifying time per stage, chained."""
    by_user: dict[int, list[tuple[int, str]]] = {}
    for uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, et))
    out = {}
    for uid, evs in by_user.items():
        prev = None
        times = []
        for stage in STAGES:
            cand = [
                t
                for t, et in evs
                if et == stage and (prev is None or t >= prev)
            ]
            t = min(cand) if cand else None
            times.append(t)
            prev = t
            if t is None:
                # once broken, later stages can never qualify
                times.extend([None] * (len(STAGES) - len(times)))
                break
        out[uid] = (times, sum(1 for t in times if t is not None))
    return out


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=50),     # second offset
            st.sampled_from(STAGES + ("other",)),       # event type
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_matches_replay(spark, rows):
    df = spark.createDataFrame(
        [
            (uid, f"2024-01-01 00:00:{s:02d}" if s < 60 else None, et)
            for uid, s, et in rows
        ],
        "user_id long, ts string, event_type string",
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "event_type")
    got = {
        r["user_id"]: (
            [r[f"t{i}_us"] for i in range(len(STAGES))],
            r["reached_stage"],
        )
        for r in funnel_stages(df, stages=STAGES).collect()
    }
    base = 1704067200000000  # 2024-01-01 00:00:00 UTC in epoch micros
    want = {
        uid: (
            [None if t is None else base + t * 1_000_000 for t in times],
            reached,
        )
        for uid, (times, reached) in _replay(rows).items()
    }
    assert got == want
