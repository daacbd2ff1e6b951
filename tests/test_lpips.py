"""LPIPS: the export path (eval/lpips_jax.py::export_lpips_weights) is
CI-proven against a fake `lpips` package built from real torch modules
with the true AlexNet topology — the zero-egress environment cannot run
the real export, so this pins that the one-command export
(`python -m isogs_slam_tpu.eval.lpips_jax --export out.npz`) produces an
npz that LPIPSAlex loads, validates, and evaluates (reference LPIPS usage:
utils/eval_helpers.py:21-22)."""
import sys
import types

import numpy as np
import pytest

from isogs_slam_tpu.eval.lpips_jax import (_CONVS, LPIPSAlex,
                                           export_lpips_weights)


def _fake_lpips_module(seed=0):
    """A stand-in `lpips` package whose LPIPS(net='alex') object carries
    the exact module structure export_lpips_weights introspects:
    Conv2d feature layers under .net and .lin{0..4}.model[-1] heads."""
    import torch

    torch.manual_seed(seed)

    class _FakeLPIPS:
        def __init__(self, net="alex"):
            assert net == "alex"
            convs = []
            in_ch = 3
            for (out_ch, k, stride, pad) in _CONVS:
                convs.append(torch.nn.Conv2d(in_ch, out_ch, k,
                                             stride=stride, padding=pad))
                in_ch = out_ch
            self.net = torch.nn.Sequential(*convs)
            for i, (out_ch, *_rest) in enumerate(_CONVS):
                lin = torch.nn.Conv2d(out_ch, 1, 1, bias=False)
                # real LPIPS linear heads are non-negative; keep the fake
                # in that regime so distances are positive
                lin.weight.data.abs_()
                head = types.SimpleNamespace(
                    model=[torch.nn.Dropout(), lin])
                setattr(self, f"lin{i}", head)

    mod = types.ModuleType("lpips")
    mod.LPIPS = _FakeLPIPS
    return mod


def test_export_roundtrip_and_eval(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "lpips", _fake_lpips_module())
    out = tmp_path / "lpips_alex.npz"
    export_lpips_weights(str(out))

    data = np.load(out)
    for i, (out_ch, k, _, _) in enumerate(_CONVS):
        assert data[f"conv{i}_w"].shape[0] == out_ch
        assert data[f"conv{i}_w"].shape[2] == k
        assert data[f"conv{i}_b"].shape == (out_ch,)
        assert data[f"lin{i}_w"].shape == (1, out_ch, 1, 1)

    net = LPIPSAlex(str(out))           # validates all expected keys
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    d_same = net(a, a)
    d_diff = net(a, b)
    assert np.isfinite(d_same) and np.isfinite(d_diff)
    assert abs(d_same) < 1e-5
    assert d_diff > 1e-4


def test_export_missing_key_rejected(tmp_path, monkeypatch):
    """LPIPSAlex refuses an incomplete npz instead of silently zeroing."""
    monkeypatch.setitem(sys.modules, "lpips", _fake_lpips_module())
    out = tmp_path / "lpips_alex.npz"
    export_lpips_weights(str(out))
    data = dict(np.load(out))
    del data["lin3_w"]
    bad = tmp_path / "bad.npz"
    np.savez(bad, **data)
    with pytest.raises(KeyError):
        LPIPSAlex(str(bad))


@pytest.mark.smoke
def test_random_fallback_deterministic():
    """The labeled rand-alexnet fallback is seeded: two instances agree."""
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (3, 48, 48)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 48, 48)).astype(np.float32)
    d1 = LPIPSAlex.random(0)(a, b)
    d2 = LPIPSAlex.random(0)(a, b)
    assert d1 == d2
    assert np.isfinite(d1) and d1 > 0
