"""LPIPS (AlexNet variant) in pure JAX.

The reference computes LPIPS through torchmetrics' pretrained AlexNet
(utils/eval_helpers.py:21-22, used at :520). Pretrained weights cannot be
downloaded in this environment (zero egress), so this module implements the
*network* and loads weights from an .npz export pointed to by
$ISOGS_LPIPS_WEIGHTS. Without weights, eval reports LPIPS as NaN rather
than silently substituting a different metric (eval/metrics.py).

Export the weights once on any machine with torchvision + lpips:

    import numpy as np, lpips
    net = lpips.LPIPS(net='alex')
    out = {}
    for i, blk in enumerate(net.net.slice1):  # torchvision alexnet features
        pass  # see export_lpips_weights() below for the exact script
    ...

or run `python -m isogs_slam_tpu.eval.lpips_jax --export out.npz` on such a
machine (the export helper is included here).

Expected npz keys: conv{0..4}_w (OIHW), conv{0..4}_b, lin{0..4}_w
([1, C, 1, 1] LPIPS linear heads).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature extractor config: (out_ch, kernel, stride, pad), with
# 3x2 max-pool (stride 2) after convs 0, 1, 4 — torchvision.models.alexnet
_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
          (256, 3, 1, 1), (256, 3, 1, 1)]
# ImageNet scaling used by lpips.LPIPS (its internal ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")


class LPIPSAlex:
    """Callable: (img1, img2) [C,H,W] in [0,1] -> LPIPS distance."""

    def __init__(self, weights_path: str):
        data = np.load(weights_path)
        self.params = {k: jnp.asarray(v) for k, v in data.items()}
        for i in range(5):
            for k in (f"conv{i}_w", f"conv{i}_b", f"lin{i}_w"):
                if k not in self.params:
                    raise KeyError(f"{weights_path} missing {k}")
        self._fn = jax.jit(self._distance)

    @classmethod
    def random(cls, seed: int = 0) -> "LPIPSAlex":
        """Untrained fallback: the same AlexNet topology with seeded
        He-normal conv weights and uniform (1/C) linear heads.

        Random deep conv features are a known serviceable perceptual
        proxy; values are NOT comparable to pretrained-AlexNet LPIPS and
        are labeled `LPIPS (rand-alexnet)` wherever reported. Exists so a
        zero-egress environment still gets a finite, deterministic
        perceptual-distance signal instead of NaN.
        """
        rng = np.random.default_rng(seed)
        obj = cls.__new__(cls)
        params = {}
        in_ch = 3
        for i, (out_ch, k, _, _) in enumerate(_CONVS):
            fan_in = in_ch * k * k
            params[f"conv{i}_w"] = jnp.asarray(
                rng.normal(0.0, np.sqrt(2.0 / fan_in),
                           (out_ch, in_ch, k, k)).astype(np.float32))
            params[f"conv{i}_b"] = jnp.zeros((out_ch,), jnp.float32)
            params[f"lin{i}_w"] = jnp.full((1, out_ch, 1, 1),
                                           1.0 / out_ch, jnp.float32)
            in_ch = out_ch
        obj.params = params
        obj._fn = jax.jit(obj._distance)
        return obj

    def _features(self, x):
        # [1,3,H,W] in [-1,1] -> list of 5 feature maps
        x = ((x - jnp.asarray(_SHIFT)[None, :, None, None])
             / jnp.asarray(_SCALE)[None, :, None, None])
        feats = []
        for i, (_, _, stride, pad) in enumerate(_CONVS):
            x = _conv(x, self.params[f"conv{i}_w"],
                      self.params[f"conv{i}_b"], stride, pad)
            x = jax.nn.relu(x)
            feats.append(x)
            if i in (0, 1):
                x = _maxpool(x)
        return feats

    def _distance(self, a, b):
        a = a[None] * 2.0 - 1.0
        b = b[None] * 2.0 - 1.0
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa * xa, axis=1,
                                       keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb * xb, axis=1,
                                       keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.params[f"lin{i}_w"].reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(diff * w, axis=1))
        return total

    def __call__(self, img1, img2) -> float:
        return float(self._fn(jnp.asarray(img1, jnp.float32),
                              jnp.asarray(img2, jnp.float32)))


def export_lpips_weights(out_path: str):  # pragma: no cover
    """Run on a machine with torch + lpips installed to produce the npz."""
    import lpips as lpips_pkg  # type: ignore
    net = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [m for m in net.net.modules()
             if m.__class__.__name__ == "Conv2d"]
    for i, c in enumerate(convs[:5]):
        out[f"conv{i}_w"] = c.weight.detach().numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3,
                             net.lin4]):
        out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()
    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":  # pragma: no cover
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--export", type=str, required=True)
    export_lpips_weights(p.parse_args().export)
