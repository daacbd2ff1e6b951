"""MS-SSIM metric robustness: the metric must stay <= 1 and agree with
the f32 computation regardless of input dtype. On TPU the filter
matmuls at DEFAULT precision truncate f32 operands to bf16; the
variance terms (E[x^2] - mu^2) then cancel catastrophically and the
biased cs-ratios produced measured MS-SSIM values > 1.0 in real runs
(e.g. 1.022 at frame 84 of the r5s6 chain). ms_ssim now casts to f32
and pins Precision.HIGHEST (reference eval uses pytorch_msssim in true
f32, utils/eval_helpers.py:518)."""
import numpy as np
import pytest
import jax.numpy as jnp


def _smooth_pair(h=256, w=320, noise=0.01):
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.2, 0.8, size=(3, h, w)).astype(np.float32)
    k = np.ones(9, np.float32) / 9.0
    for c in range(3):
        for ax in (0, 1):
            gt[c] = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), ax, gt[c])
    ren = gt + rng.normal(0, noise, gt.shape).astype(np.float32)
    return ren, gt


@pytest.mark.smoke
def test_ms_ssim_bounded_and_dtype_invariant():
    from isogs_slam_tpu.ops.ssim import ms_ssim

    ren, gt = _smooth_pair()
    v32 = float(ms_ssim(jnp.asarray(ren), jnp.asarray(gt)))
    # bf16-cast inputs (what a bf16 render path would feed): the metric
    # must not exceed 1 and must agree with f32 up to input quantization
    v16 = float(ms_ssim(jnp.asarray(ren, jnp.bfloat16),
                        jnp.asarray(gt, jnp.bfloat16)))
    assert 0.0 <= v32 <= 1.0 + 1e-5
    assert 0.0 <= v16 <= 1.0 + 1e-5
    assert abs(v16 - v32) < 5e-3
    # identical images -> exactly 1
    vid = float(ms_ssim(jnp.asarray(gt), jnp.asarray(gt)))
    assert abs(vid - 1.0) < 1e-5
