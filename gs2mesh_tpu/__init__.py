"""gs2mesh_tpu — a TPU-native Gaussian-Splatting → mesh reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline (yanivw12/gs2mesh): train a 3D Gaussian Splatting model on posed
images, render stereo-calibrated novel view pairs, compute metric depth with a
recurrent stereo network, fuse depths into a TSDF volume, and extract / clean /
evaluate a triangle mesh.

Design is TPU-first:
  * the differentiable tile rasterizer runs as Pallas kernels whose alpha
    compositing is expressed as MXU matmuls (triangular-matrix cumulative
    sums) instead of sequential per-pixel loops,
  * binning/sorting uses XLA's device-wide sort instead of CUB radix sort,
  * gradient accumulation is a deterministic segment-sum instead of atomics,
  * multi-chip scaling uses jax.sharding Mesh + shard_map collectives.

Layout:
  core/       camera & pose math, SH eval, PLY / COLMAP IO
  ops/        Pallas + XLA compute kernels (rasterizer, knn, ssim, ...)
  models/     GaussianModel pytree; DLNR stereo network (Flax)
  train/      jitted GS training loop + densification host logic
  stereo/     stereo depth stage (pair rendering, occlusion masking)
  fusion/     TSDF integration, marching cubes, mesh cleaning
  masker/     object-mask stage (pluggable backends)
  sfm/        COLMAP interop (readers/writers/drivers)
  parallel/   device mesh + sharding rules + sharded steps
  pipeline/   orchestration, config, experiment naming
  eval/       DTU / TNT / MobileBrick evaluation protocols
"""

__version__ = "0.1.0"
