"""The adjudicated-loser knob registry (slam/experimental.py): enabling
a measured-loser knob must emit a loud verdict warning; default configs
must emit none."""
import pytest

from isogs_slam_tpu.slam.experimental import LOSERS, warn_experimental

pytestmark = pytest.mark.smoke


def test_default_config_is_silent():
    cfg = {"tracking": {"num_iters": 10, "gn_iters": 0, "fan_rounds": 0},
           "mapping": {"num_iters": 40}, "raster": {}}
    assert warn_experimental(cfg) == []


def test_each_loser_warns_with_notes_verdict():
    for (section, key), (trigger, verdict) in LOSERS.items():
        cfg = {section: {key: 3 if key.endswith("iters") or
                         key.endswith("rounds") else True}}
        w = warn_experimental(cfg)
        assert len(w) == 1, (section, key)
        assert "ADJUDICATED LOSER" in w[0]
        assert "NOTES" in w[0]   # every verdict cites its NOTES entry
