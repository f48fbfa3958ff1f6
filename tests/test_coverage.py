"""Unit tests for the HardLimiter sweep kernel (general overlap
chains; the clustered case is oracle-checked in test_oracle_parity)."""

from avocado_spark.functions import realign  # noqa: F401  (import sanity)
from avocado_spark.operators.coverage import sweep_limit


def test_sweep_basic_cap():
    # 4 identical intervals, cap 2 -> first two kept
    starts = [0, 0, 0, 0]
    ends = [10, 10, 10, 10]
    assert sweep_limit(starts, ends, 2) == [True, True, False, False]


def test_sweep_flush_reopens_capacity():
    # [0,10) [0,10) fill cap; [10,20) starts after both end -> admitted
    assert sweep_limit([0, 0, 10], [10, 10, 20], 2) == [True, True, True]
    # half-open: a read starting AT an admitted end is not overlapped
    assert sweep_limit([0, 10], [10, 20], 1) == [True, True]


def test_sweep_overlap_chain():
    # staircase: [0,15) [5,20) [10,25) with cap 2 -> third blocked by
    # first two still open at 10
    assert sweep_limit([0, 5, 10], [15, 20, 25], 2) == [True, True, False]
    # once [0,15) closes, [15,30) fits again
    assert sweep_limit([0, 5, 10, 15], [15, 20, 25, 30], 2) == [
        True,
        True,
        False,
        True,
    ]


def test_sweep_dropped_reads_free_no_capacity():
    # the dropped read at 10 must NOT occupy capacity later
    keep = sweep_limit([0, 0, 10, 12], [30, 30, 40, 14], 2)
    assert keep == [True, True, False, False]


def test_filter_header_lines_match_enabled_rules():
    from avocado_spark.operators.hard_filters import (
        HardFilterRules,
        filter_header_lines,
    )

    lines = filter_header_lines()
    codes = {ln.split("ID=")[1].split(",")[0] for ln in lines}
    # defaults: FS and indel-MQ rules disabled, all others on
    assert "SNPFS" not in codes and "INDELMQ" not in codes
    assert {"HETSNPQD", "HOMSNPQD", "SNPMQ", "SNPMINDP", "SNPMAXDP",
            "HETSNPMINAF", "HETSNPMAXAF", "HOMSNPMINAF",
            "HETINDELQD", "HOMINDELQD", "INDELMINDP", "INDELMAXDP",
            "HETINDELMINAF", "HETINDELMAXAF", "HOMINDELMINAF"} <= codes
    assert all(ln.startswith("##FILTER=<ID=") for ln in lines)

    # disabling a rule removes its header line
    few = filter_header_lines(HardFilterRules(min_snp_mq=-1.0))
    assert "SNPMQ" not in {ln.split("ID=")[1].split(",")[0] for ln in few}
