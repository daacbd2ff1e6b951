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
