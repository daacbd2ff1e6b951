"""compare_expected: mechanical quality-parity check against the recorded
reference numbers (configs/replica/expected_metrics.json)."""
import json
import os

import pytest

from isogs_slam_tpu.tools.compare_expected import (compare_scene, main,
                                                   within)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = os.path.join(REPO, "configs", "replica", "expected_metrics.json")

pytestmark = pytest.mark.smoke


def test_expected_metrics_file_loads():
    with open(SPEC) as f:
        spec = json.load(f)
    # room0 carries the reference's measured baseline
    # (python_ordinary/日志/Dec16_first_setup_baseline.md:60,71)
    r0 = spec["scenes"]["room0"]
    assert r0 == {"ate_rmse_cm": 0.28, "psnr": 32.28, "depth_l1_cm": 0.51}
    assert spec["tolerances"]["psnr"]["abs"] == 0.5


def test_within_bands():
    # error metric: only failing ABOVE want + band
    ok, band = within("ate_rmse_cm", 0.30, 0.28, {"rel": 0.10, "abs": 0.05})
    assert ok and band == pytest.approx(0.05)
    assert within("ate_rmse_cm", 0.10, 0.28, {"abs": 0.05})[0]  # beating ok
    assert not within("ate_rmse_cm", 0.40, 0.28, {"abs": 0.05})[0]
    # higher-better metric: only failing BELOW want - band
    assert within("psnr", 31.9, 32.28, {"abs": 0.5})[0]
    assert within("psnr", 40.0, 32.28, {"abs": 0.5})[0]
    assert not within("psnr", 31.5, 32.28, {"abs": 0.5})[0]


def _summary(ate, psnr, l1):
    return {"Final Average ATE RMSE (cm)": ate, "Average PSNR": psnr,
            "Average Depth L1 (cm)": l1}


def test_compare_scene_and_cli(tmp_path, capsys):
    with open(SPEC) as f:
        spec = json.load(f)
    rows, n_fail = compare_scene("room0", _summary(0.29, 32.1, 0.52),
                                 spec["scenes"]["room0"],
                                 spec["tolerances"])
    assert n_fail == 0 and len(rows) == 3

    rows, n_fail = compare_scene("room0", _summary(1.0, 25.0, 0.52),
                                 spec["scenes"]["room0"],
                                 spec["tolerances"])
    assert n_fail == 2  # ate + psnr out of band

    # CLI end-to-end: exit 0 on pass, 1 on fail, scene inferred from path
    p = tmp_path / "room0_0" / "eval"
    p.mkdir(parents=True)
    (p / "eval_summary.json").write_text(
        json.dumps(_summary(0.28, 32.3, 0.50)))
    assert main([SPEC, str(p / "eval_summary.json")]) == 0
    (p / "eval_summary.json").write_text(
        json.dumps(_summary(9.9, 32.3, 0.50)))
    assert main([SPEC, f"room0={p / 'eval_summary.json'}"]) == 1
    capsys.readouterr()
