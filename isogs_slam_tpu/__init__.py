"""isogs_slam_tpu — TPU-native Gaussian-splatting SLAM framework.

A ground-up JAX/XLA re-design with the capabilities of IsoGS-SLAM
(SplaTAM-derived dense RGB-D SLAM with isotropic-Gaussian surface
regularization): differentiable tile rasterizer, jitted tracking/mapping,
silhouette densification, IsoGS flat/iso losses, mesh extraction, evaluation,
and the reference-compatible .npz checkpoint schema.
"""

__version__ = "0.1.0"
