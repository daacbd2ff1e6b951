"""The driver contract: `python bench.py` prints ONE JSON line with
metric/value/unit/vs_baseline, and (round 5) an excursion-visible
detail — per-pass FPS list, per-frame times, latency probes. A broken
bench means the round's headline number is lost, so the contract gets
a regression test at toy scale (CPU, ~2-4 min of XLA compiles)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_prints_one_json_line_with_excursion_detail():
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": "",          # skip the axon sitecustomize
        "JAX_PLATFORMS": "cpu",
        "BENCH_H": "96", "BENCH_W": "128",
        "BENCH_FRAMES": "3", "BENCH_PASSES": "2",
        "BENCH_TRACK_ITERS": "2", "BENCH_MAP_ITERS": "4",
        "BENCH_ALSO_FAST": "0",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [ln for ln in out.stdout.splitlines()
                  if ln.startswith("{")]
    assert len(json_lines) == 1, out.stdout
    r = json.loads(json_lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "detail"):
        assert key in r, key
    assert r["unit"] == "fps" and r["value"] > 0
    d = r["detail"]
    # the excursion-proofing contract (VERDICT r4 item 2)
    assert len(d["passes"]) == 2
    assert {"fps", "track_s_per_frame", "map_s_per_frame"} \
        <= set(d["passes"][0])
    # headline value is the median pass's fps
    assert r["value"] in [p["fps"] for p in d["passes"]]
    assert len(d["frame_times_s"]) == 2
    assert len(d["frame_times_s"][0]) == 3
    assert d["latency_probe_ms"]["pre"] > 0
    assert d["latency_probe_ms"]["post"] > 0
