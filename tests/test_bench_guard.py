"""The bench guard's flagging contract (r9): a per-query regression
flag requires BOTH ratio > 1.3 AND an absolute delta > FLAG_FLOOR_SEC.

Why both: the guard became the round's source of truth in r8, and its
first quiet run promptly false-flagged `changelog_compaction` on a
92 ms jitter (0.385 s vs 0.293 s pin = 1.31x).  A ratio-only guard
cries wolf on every sub-second noise-dominated query; an absolute-only
guard misses slow creep on big queries.  The conjunction keeps both
failure modes out while a REAL 2x slowdown on any multi-second query
still flags (delta >= the query's own pin >> floor).
"""

from __future__ import annotations

import bench


def test_subsecond_jitter_does_not_flag():
    # the exact r8 false-positive: 92 ms delta at 1.31x
    base = {"changelog_compaction": 0.293}
    lane = {"changelog_compaction": 0.385}
    assert bench.flag_regressions(base, lane) == {}


def test_real_2x_slowdown_on_2s_query_flags():
    base = {"gold_fact_star": 2.0}
    lane = {"gold_fact_star": 4.0}
    assert bench.flag_regressions(base, lane) == {
        "gold_fact_star": (2.0, 4.0)
    }


def test_large_absolute_but_small_ratio_does_not_flag():
    # +0.5 s on a 5 s query is 1.1x — not a regression
    base = {"q": 5.0}
    lane = {"q": 5.5}
    assert bench.flag_regressions(base, lane) == {}


def test_floor_boundary():
    # just over ratio but exactly at the floor: no flag; clearly past
    # both: flag
    base = {"a": 0.5, "b": 0.5}
    lane = {"a": 0.5 + bench.FLAG_FLOOR_SEC, "b": 1.2}
    flags = bench.flag_regressions(base, lane)
    assert "a" not in flags and "b" in flags


def test_unknown_and_zero_baselines_ignored():
    base = {"known": 0.0}
    lane = {"known": 9.9, "new_query": 9.9}
    assert bench.flag_regressions(base, lane) == {}


# -- pollution stamp (r10): two independent sentinels + loadavg ---------


_BASE = {"sentinel_steady": 0.3, "sentinel_shuffle_steady": 1.0}


def test_quiet_run_not_polluted():
    assert bench.pollution_reasons(0.1, 0.31, 1.02, _BASE) == []


def test_loadavg_stamps():
    reasons = bench.pollution_reasons(0.6, 0.3, 1.0, _BASE)
    assert len(reasons) == 1 and "external load" in reasons[0]


def test_map_sentinel_stamps():
    reasons = bench.pollution_reasons(0.1, 0.36, 1.0, _BASE)
    assert len(reasons) == 1 and "host-window drift" in reasons[0]


def test_shuffle_sentinel_stamps_when_map_green():
    # the r9 judge's exact blind spot: loadavg 0.00, map sentinel
    # green, shuffle-heavy plans 1.5-2x slow — the shuffle sentinel
    # alone must stamp the window
    reasons = bench.pollution_reasons(0.0, 0.29, 1.8, _BASE)
    assert len(reasons) == 1 and "exchange-side" in reasons[0]


def test_tolerance_boundary_not_polluted():
    # exactly at 1.15x is NOT over tolerance (strict >)
    assert bench.pollution_reasons(0.0, 0.345, 1.15, _BASE) == []


def test_missing_pins_skip_sentinel_checks():
    # no baseline yet (fresh repo / non-sf0.1 lane): loadavg still
    # guards, sentinels silently skip
    assert bench.pollution_reasons(0.0, 99.0, 99.0, None) == []
    assert bench.pollution_reasons(0.0, 99.0, 99.0, {}) == []
