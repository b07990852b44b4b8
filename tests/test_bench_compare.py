"""scripts/bench_compare.py: the mechanical round-over-round bench
adjudicator (VERDICT r7 #1). Pure-Python classification semantics —
no Spark session needed."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from bench_compare import compare  # noqa: E402


def test_calibrated_ratio_classification():
    """Both sides calibrated: a query 2× slower in raw seconds on a 2×
    slower host is STABLE (the ratio cancels); a genuinely regressed
    query is flagged even when the host got faster."""
    old = {"calibration_sec": 0.5, "queries_min": {"a": 1.0, "b": 1.0, "c": 1.0}}
    new = {
        "calibration_sec": 1.0,  # host 2× slower
        "queries_min": {"a": 2.0, "b": 4.0, "c": 0.4, "d": 9.9},
    }
    r = compare(old, new, 1.5)
    assert r["old_calibrated"] and r["new_calibrated"]
    assert r["n_stable"] == 1 and "a" not in [e["query"] for e in r["regressed"]]
    assert [e["query"] for e in r["regressed"]] == ["b"]  # 4.0/1.0 vs 1.0/0.5 = 2×
    assert [e["query"] for e in r["improved"]] == ["c"]  # 0.4 vs 2.0 calibrated
    assert r["n_new_only"] == 1 and r["n_old_only"] == 0


def test_uncalibrated_old_falls_back_to_raw():
    """An old record without calibration must compare raw-vs-raw (a
    one-sided division would manufacture fake movers) and say so."""
    old = {"queries_min": {"a": 1.0}}
    new = {"calibration_sec": 0.5, "queries_min": {"a": 1.2}}
    r = compare(old, new, 1.5)
    assert not r["old_calibrated"] and r["new_calibrated"]
    assert r["n_regressed"] == 0 and r["n_stable"] == 1  # 1.2/1.0 < 1.5 raw


def test_median_fallback_and_zero_guard():
    old = {"queries": {"a": 2.0, "z": 0.0}}  # pre-min records used 'queries'
    new = {"queries_min": {"a": 2.9, "z": 1.0}}
    r = compare(old, new, 1.5)
    assert r["n_stable"] == 1  # 'a' at 1.45×; 'z' skipped (old <= 0)
    assert r["n_regressed"] == 0


def test_entries_carry_calibrated_values():
    """ADVICE r8: regressed/improved entries must be self-consistent —
    when calibrations differ, raw old/new can't reproduce the calibrated
    ratio, so each entry carries old_cal/new_cal with ratio == new_cal /
    old_cal."""
    old = {"calibration_sec": 0.5, "queries_min": {"a": 1.0, "c": 2.0}}
    new = {"calibration_sec": 1.0, "queries_min": {"a": 4.0, "c": 0.4}}
    r = compare(old, new, 1.5)
    for e in r["regressed"] + r["improved"]:
        assert "old_cal" in e and "new_cal" in e
        assert abs(e["ratio"] - e["new_cal"] / e["old_cal"]) < 1e-2
    assert [e["query"] for e in r["regressed"]] == ["a"]
    assert r["regressed"][0]["old_cal"] == 2.0  # 1.0 / 0.5
    assert r["regressed"][0]["new_cal"] == 4.0  # 4.0 / 1.0
