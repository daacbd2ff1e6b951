"""tracking.early_stop_patience: exit the per-frame Adam pose loop once
the best-candidate metric stalls.

Pure-throughput knob (opt-in, 0 = reference parity): the returned pose is
the best-so-far candidate either way, so stopping after `patience`
non-improving iterations can only skip iterations whose candidates
best-candidate selection would have discarded. These tests drive
adam_pose_loop directly with a synthetic loss whose floor guarantees a
stall, pinning (a) parity when off, (b) the stop point arithmetic, and
(c) best-pose/min-loss equality with the full run once the floor is hit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isogs_slam_tpu.slam.losses import LossOutputs
from isogs_slam_tpu.slam.tracking import TrackingConfig, adam_pose_loop

# adjudicated-loser knob surface (slam/experimental.py): out of
# the default suite, runnable with `pytest -m experimental` for
# re-adjudication with new evidence (VERDICT r4 item 8)
pytestmark = pytest.mark.experimental


def _loss_fn(floor):
    target_q = jnp.asarray([1.0, 0.02, -0.01, 0.03])
    target_t = jnp.asarray([0.1, -0.2, 0.05])

    def fn(pose):
        q, t = pose
        d = jnp.sum(jnp.abs(q - target_q)) + jnp.sum(jnp.abs(t - target_t))
        loss = jnp.maximum(d, floor)
        z = jnp.zeros(())
        out = LossOutputs(loss=loss, im=loss, depth=z, flat=z, iso=z,
                          mean_density=z, radii=jnp.zeros((1,)),
                          n_overflow=jnp.zeros((), jnp.int32),
                          mask_frac=jnp.ones(()))
        return loss, out

    return fn


POSE0 = (jnp.asarray([1.0, 0.0, 0.0, 0.0]), jnp.zeros(3))


def _tcfg(**kw):
    return TrackingConfig(num_iters=40, lr_quat=0.02, lr_trans=0.04, **kw)


def test_off_is_reference_parity():
    fn = _loss_fn(floor=0.3)
    final = jax.jit(lambda: adam_pose_loop(fn, POSE0, _tcfg()))()
    assert int(final.it) == 40


def test_stall_exits_after_patience():
    fn = _loss_fn(floor=0.3)
    patience = 5
    tcfg = _tcfg(early_stop_patience=patience)
    final = jax.jit(lambda: adam_pose_loop(fn, POSE0, tcfg))()
    it, best_it = int(final.it), int(final.best_it)
    assert it < 40, "loss floor must trigger the early exit"
    # exactly `patience` evaluated iterations since the last improvement
    assert it - 1 - best_it == patience
    # the full run finds the same best (post-floor iterations never improve)
    full = jax.jit(lambda: adam_pose_loop(fn, POSE0, _tcfg()))()
    np.testing.assert_allclose(np.asarray(final.min_loss),
                               np.asarray(full.min_loss), rtol=1e-6)
    for a, b in zip(final.best_pose, full.best_pose):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_improving_loss_never_stops_early():
    # a linear loss strictly decreases under every Adam step, so the
    # candidate metric improves every iteration and patience never fires
    def fn(pose):
        q, t = pose
        loss = -(jnp.sum(q) + jnp.sum(t))
        z = jnp.zeros(())
        out = LossOutputs(loss=loss, im=loss, depth=z, flat=z, iso=z,
                          mean_density=z, radii=jnp.zeros((1,)),
                          n_overflow=jnp.zeros((), jnp.int32),
                          mask_frac=jnp.ones(()))
        return loss, out

    tcfg = _tcfg(early_stop_patience=3)
    final = jax.jit(lambda: adam_pose_loop(fn, POSE0, tcfg))()
    assert int(final.it) == 40
