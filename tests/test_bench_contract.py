"""Pin the bench stdout contract (VERDICT r06 items 1+6).

The driver tail-captures bench.py's stdout — the capture window is 2000
chars (BENCH_r06.json's truncated ``tail`` is exactly that) — and parses
ONE JSON line; r06's per-gate ``runs`` record silently grew that line past
the window and the round's official BENCH record held no number. These
tests make that class of regression a suite failure instead of a
round-later discovery: the formatted line must parse as JSON, carry the
driver-read fields, fit the capture window at full 50-gate width, and must
NOT carry the dispersion record (which belongs in BENCH_runs.json).
"""

from __future__ import annotations

import json

import bench
from apache_jira_scraper_spark import registry


def _fake_timings() -> dict[str, float]:
    # worst-case realistic width: every registered gate name with a
    # full-precision float, exactly what a real run emits
    return {name: 12.3456 for name in registry.queries()}


def test_stdout_line_parses_and_carries_driver_fields():
    timings = _fake_timings()
    line = bench.format_stdout_line(timings, sf=0.1, samples=3)
    assert "\n" not in line
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_wall"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert rec["queries"] == timings
    assert rec["value"] == round(sum(timings.values()), 4)
    # the r06 regression: neither the runs dispersion record nor the
    # cached-gate list rides stdout — both live in BENCH_runs.json
    assert "runs" not in rec
    assert "cached" not in rec


def test_stdout_line_fits_driver_capture_window_at_full_gate_width():
    timings = _fake_timings()
    assert len(timings) == 50  # registry cap — driver registers at most 50
    line = bench.format_stdout_line(timings, sf=0.1, samples=3)
    assert len(line) <= bench.STDOUT_LINE_MAX <= 1990


def test_oversized_line_is_refused_not_emitted():
    # a future field that bloats the line must fail loudly at format time
    timings = {f"gate_{i:04d}": 1.0 for i in range(200)}
    try:
        bench.format_stdout_line(timings, sf=0.1, samples=3)
    except AssertionError as exc:
        assert "BENCH_runs.json" in str(exc)
    else:
        raise AssertionError("oversized stdout line was not refused")


def test_failed_gate_minimum_stays_negative():
    # value sums only positive minima; a -1 sentinel must not inflate it
    timings = {"ok": 2.0, "broken": -1.0}
    rec = json.loads(bench.format_stdout_line(timings, sf=0.01, samples=1))
    assert rec["value"] == 2.0
    assert rec["queries"]["broken"] == -1.0
