"""street_crafter_tpu — a TPU-native street-view synthesis framework.

Re-implements the capabilities of the StreetCrafter stack (CVPR 2025,
arXiv 2412.13188): a LiDAR-conditioned video diffusion model (Vista/SVD
derivative) distilled into a dynamic 3D Gaussian Splatting scene
representation — redesigned for TPU from scratch:

- compute path: JAX / XLA / Pallas kernels (3DGS tile rasterizer, point
  z-buffer splatting, flash attention, KNN) instead of CUDA submodules
  (gsplat, diff-point-rasterization, simple-knn, xformers, nvdiffrast);
- parallelism: a single ``jax.sharding.Mesh`` with named axes
  (data x frames x heads) over ICI; DDP/ZeRO-2 of the reference becomes
  sharded-optimizer data parallelism;
- functional core: scene state is a pytree, training steps are jitted
  pure functions; dynamic Gaussian counts use fixed-capacity pools with
  validity masks.

Package layout:
  config/          declarative config (inheritance + CLI overrides + registry)
  parallel/        mesh construction, sharding rules, collectives
  ops/             numerical kernels (Pallas + XLA reference impls)
  models/gs/       dynamic Gaussian scene graph + renderer
  models/vdm/      video diffusion model (UNet, VAE, conditioner, samplers)
  datasets/        scene readers, cameras, novel-view trajectories
  data_processor/  offline Waymo/Pandaset processing
  training/        3DGS distillation loop, VDM fine-tune loop
  utils/           checkpointing, logging, metrics, io
  native/          C++ host-side runtime (ply io, knn, prefetching loader)
"""

__version__ = "0.1.0"
