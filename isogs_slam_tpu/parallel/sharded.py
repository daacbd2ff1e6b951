"""Multi-chip parallel mapping over a `jax.sharding.Mesh`.

The reference is strictly single-process / single-GPU (SURVEY.md §2.3: no
torch.distributed, no NCCL/MPI anywhere in either tree); its only
parallelism is intra-kernel CUDA thread blocks. On TPU the natural scaling
axis for this workload is **data parallelism over keyframe views**: each
mapping iteration in the reference samples ONE random keyframe and takes one
Adam step (scripts/splatam.py:1412-1491). Here a *batch* of keyframe views is
rendered and differentiated concurrently — one view per mesh slot — and the
mean multi-view loss produces a single Adam step. XLA/GSPMD partitions every
per-view tensor (renders, masks, losses, iso-loss queries) over the `view`
axis and inserts the gradient `psum` over ICI automatically; the Gaussian map
state is replicated (it is the "model", and it must be fully visible to every
view's rasterization — the analog of the 20M-Gaussian pool in
cpp/src/core/gaussian_model.cpp:25-45).

This is also a semantically *better* mapping step at equal FLOPs: an Adam
step on the mean loss over B views is lower-variance than B sequential
one-view steps, so multi-chip runs can cut wall-clock per frame by ~B while
improving gradient quality.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import optim
from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..ops.rasterize import RasterConfig
from ..slam.losses import LossConfig, compute_loss
from ..slam.mapping import MappingConfig

VIEW_AXIS = "view"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the view (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def batched_map_loss(params: GaussianParams, alive, kf_quats, kf_transl,
                     gt_ims, gt_depths, keys, cam: Camera,
                     rcfg: RasterConfig, lcfg: LossConfig):
    """Mean mapping loss over a batch of views (leading axis = view)."""

    def one(quat, trans, im, depth, key):
        out = compute_loss(params, alive, jax.lax.stop_gradient(quat),
                           jax.lax.stop_gradient(trans), im, depth,
                           cam, rcfg, lcfg, key=key)
        return out.loss

    losses = jax.vmap(one)(kf_quats, kf_transl, gt_ims, gt_depths, keys)
    return jnp.mean(losses)


def make_sharded_map_step(mesh: Mesh, cam: Camera, rcfg: RasterConfig,
                          lcfg: LossConfig, mcfg: MappingConfig):
    """Build the jitted multi-chip mapping train step.

    Returns step(params, alive, opt, kf_quats [B,4], kf_transl [B,3],
    gt_ims [B,3,H,W], gt_depths [B,1,H,W], keys [B,2])
    -> (new_params, new_opt, loss), with B sharded over the mesh's view axis
    and the Gaussian state replicated. GSPMD inserts the ICI psum for the
    replicated-parameter gradients.
    """
    repl = NamedSharding(mesh, P())
    view = NamedSharding(mesh, P(VIEW_AXIS))
    lrs = mcfg.lrs()

    def step(params, alive, opt, kf_quats, kf_transl, gt_ims, gt_depths,
             keys):
        loss, grads = jax.value_and_grad(batched_map_loss)(
            params, alive, kf_quats, kf_transl, gt_ims, gt_depths, keys,
            cam, rcfg, lcfg)
        new_params, new_opt = optim.step(params, grads, opt, lrs,
                                         eps=mcfg.eps)
        return new_params, new_opt, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, view, view, view, view, view),
        out_shardings=(repl, repl, repl))


def shard_view_batch(mesh: Mesh, *arrays):
    """Place per-view batched arrays (leading axis B) onto the mesh."""
    view = NamedSharding(mesh, P(VIEW_AXIS))
    return tuple(jax.device_put(a, view) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (the Gaussian map state) across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, repl), tree)
