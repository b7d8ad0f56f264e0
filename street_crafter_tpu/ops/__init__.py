"""Numerical kernel layer.

TPU-native replacements for the reference's external CUDA packages
(SURVEY §2.1): Pallas/XLA 3DGS rasterizer (gsplat / diff-gaussian-
rasterization), point z-buffer splatting (diff_point_rasterization), KNN
(simple-knn distCUDA2), flash attention (xformers), cubemap sampling
(nvdiffrast), plus the pure math (quaternions, SH, projection, SSIM).
Each hot kernel has a pure-XLA reference implementation used as the golden
oracle in tests.
"""

from . import maths, sh, quaternion
