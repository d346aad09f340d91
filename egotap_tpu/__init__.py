"""egotap_tpu — TPU-native stereo-fisheye egocentric 3D pose estimation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of EgoTAP
(CVPR 2024): a two-stage pipeline that estimates per-joint / per-limb 2D
heatmaps from stereo fisheye RGB and lifts them to 3D pose with a Grid-ViT
heatmap encoder plus a propagation network over the kinematic chain.

Everything is designed TPU-first:
  * single fused jit program for the whole stereo-RGB -> 3D-pose path,
  * NHWC layouts, bf16 matmuls with f32 reductions,
  * `lax.scan` (and a fused Pallas kernel) for the propagation chain,
  * data parallelism over a `jax.sharding.Mesh` with named axes.

Reference behavior is documented per-module with `file:line` citations into
the upstream EgoTAP repository.
"""

__version__ = "0.1.0"

from egotap_tpu.core import skeleton, camera  # noqa: F401
