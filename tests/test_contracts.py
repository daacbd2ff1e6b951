"""Unit tests for the variance-aware contract adjudicator
(tools/contracts.py; decision rule in NOTES.md round-4)."""
import pytest

from isogs_slam_tpu.tools.contracts import adjudicate

pytestmark = pytest.mark.smoke


def g(*runs):
    """rows of (name, ate, psnr, depth)"""
    return [(f"r{i}", a, p, 0.7) for i, (a, p) in enumerate(runs)]


def test_pass_fail_improve_provisional():
    groups = {
        # control: median 0.135, noise (range) 0.011 -> margin
        # max(0.022, 0.0135) = 0.022
        "ctl": g((0.133, 34.9), (0.135, 35.0), (0.144, 34.7)),
        # within margin, PSNR fine -> contract margin (0.022) <= 2x
        # noise (0.022) -> not decidable -> PROVISIONAL
        "near": g((0.140, 34.9), (0.150, 34.8), (0.152, 34.9)),
        # way outside margin + noise -> FAIL
        "bad": g((2.5, 19.5), (3.4, 19.5), (1.3, 20.3)),
        # really better than control -> IMPROVES
        "good": g((0.09, 35.2), (0.10, 35.1), (0.11, 35.0)),
    }
    c_med, noise, margin, rows = adjudicate(groups, "ctl")
    v = {r[0]: r[4] for r in rows}
    assert c_med == pytest.approx(0.135)
    assert noise == pytest.approx(0.011, abs=1e-9)
    assert v["bad"].startswith("FAIL")
    assert v["good"] == "IMPROVES"
    assert v["near"] == "PROVISIONAL"


def test_pass_when_margin_clears_noise():
    # tight control noise -> 10% margin decisively clears 2x noise
    groups = {
        "ctl": g((1.00, 30.0), (1.01, 30.0), (1.02, 30.0)),
        "ok": g((1.05, 30.0), (1.06, 29.9), (1.07, 30.0)),
        "slow_drop": g((1.30, 30.0), (1.31, 30.0), (1.32, 30.0)),
    }
    _, noise, margin, rows = adjudicate(groups, "ctl")
    v = {r[0]: r[4] for r in rows}
    assert margin == pytest.approx(0.101)
    assert v["ok"] == "PASS"
    assert v["slow_drop"] == "FAIL"


def test_psnr_guard_blocks_pass():
    groups = {
        "ctl": g((1.00, 30.0), (1.01, 30.0), (1.02, 30.0)),
        # ATE fine but PSNR collapses -> cannot PASS
        "blurry": g((1.00, 28.0), (1.01, 28.1), (1.02, 27.9)),
    }
    _, _, _, rows = adjudicate(groups, "ctl")
    v = {r[0]: r[4] for r in rows}
    assert v["blurry"] != "PASS"


def test_missing_control_raises():
    with pytest.raises(SystemExit):
        adjudicate({"a": g((1, 30))}, "nope")


def _silnorm_regime_groups():
    """The real round-4 shape: margins at the decidability edge."""
    return {
        "ctl": g((0.133, 34.9), (0.135, 35.0), (0.144, 34.7)),
        "fastlegal": g((0.137, 36.9), (0.137, 36.9), (0.135, 36.4)),
        # PROVISIONAL but NOT part of the fast candidate -> must stay
        "polyaksn": g((0.145, 35.0), (0.146, 35.0), (0.147, 35.0)),
        "long_ctl": g((0.40, 33.0)),
        "long_fast": g((0.42, 34.5)),
    }


def test_tiebreak_upgrades_covered_provisionals_to_pass():
    from isogs_slam_tpu.tools.contracts import apply_tiebreak
    groups = _silnorm_regime_groups()
    _, noise, _, rows = adjudicate(groups, "ctl")
    v0 = {r[0]: r[4] for r in rows}
    assert v0["fastlegal"] == "PROVISIONAL"
    rows2, verdict, summary = apply_tiebreak(
        groups, rows, noise, "long_ctl:long_fast", "fastlegal,msub4sn")
    v = {r[0]: r[4] for r in rows2}
    assert verdict == "PASS"
    assert v["fastlegal"] == "PASS (long100)"
    # uncovered provisional rows are untouched
    assert v["polyaksn"] == v0["polyaksn"]
    assert "PASS" in summary


def test_tiebreak_fails_on_long_run_drift():
    from isogs_slam_tpu.tools.contracts import apply_tiebreak
    groups = _silnorm_regime_groups()
    # candidate drifts 50% beyond the control at length -> FAIL
    groups["long_fast"] = g((0.60, 33.0))
    _, noise, _, rows = adjudicate(groups, "ctl")
    rows2, verdict, _ = apply_tiebreak(
        groups, rows, noise, "long_ctl:long_fast", "fastlegal")
    v = {r[0]: r[4] for r in rows2}
    assert verdict == "FAIL"
    assert v["fastlegal"] == "FAIL (long100)"


def test_tiebreak_flags_conflict_on_covered_fail():
    from isogs_slam_tpu.tools.contracts import apply_tiebreak
    groups = _silnorm_regime_groups()
    # a covered config that FAILS at 30 frames but whose long run passes
    groups["sub8ish"] = g((0.20, 37.0), (0.20, 37.0), (0.20, 37.0))
    _, noise, _, rows = adjudicate(groups, "ctl")
    v0 = {r[0]: r[4] for r in rows}
    assert v0["sub8ish"].startswith("FAIL")
    rows2, verdict, _ = apply_tiebreak(
        groups, rows, noise, "long_ctl:long_fast", "sub8ish")
    v = {r[0]: r[4] for r in rows2}
    assert verdict == "PASS"
    assert v["sub8ish"] == "CONFLICT (30f FAIL, long100 PASS)"


def test_tiebreak_missing_groups_degrades_gracefully():
    from isogs_slam_tpu.tools.contracts import apply_tiebreak
    groups = {"ctl": g((1.0, 30.0), (1.0, 30.0), (1.0, 30.0)),
              "x": g((1.0, 30.0), (1.0, 30.0), (1.0, 30.0))}
    _, noise, _, rows = adjudicate(groups, "ctl")
    rows2, verdict, summary = apply_tiebreak(
        groups, rows, noise, "nope_a:nope_b", "x")
    assert rows2 == rows
    assert verdict is None
    assert "missing" in summary
