"""sage_slam_tpu — a TPU-native (JAX/XLA/Pallas) factor-graph SLAM framework.

A from-scratch re-design of the capabilities of SAGE-SLAM (ICRA 2022,
reference: lppllppl920/SAGE-SLAM) for TPU hardware:

- keyframes are nodes carrying pose (SE3) + learned depth code + scale,
- photometric / geometric / reprojection / match-geometry factors are edges
  evaluated as batched gather (SDDMM-style residual+Jacobian over feature
  pyramids) + dense matmul reductions (J^T W J) on the MXU,
- Gauss-Newton/LM with Schur complement over (code, scale) runs fully
  on-device under jit; multi-chip scaling shards edges over a jax Mesh.

Package layout:
  geometry/  SE3, pinhole cameras, bilinear gather primitives
  ops/       factor residual/Jacobian/Hessian math (+ pallas kernels)
  solver/    batched GN/LM, Schur complement, factor-graph assembly
  models/    JAX re-implementations of the depth/feature U-Nets
  tracker/   frame-to-keyframe 6/7-DoF LM tracking, matching
  mapping/   keyframe store, mapper (sliding-window + global BA)
  loop/      tensorized BoW vocabulary, loop detection, pose-scale graph
  frontend/  SLAM orchestrator (ProcessFrame / keyframe lifecycle)
  parallel/  mesh / shard_map edge-partitioned BA
  io/        dataset readers, TUM trajectory IO
  utils/     timing, misc
"""

__version__ = "0.1.0"

CODE_SIZE = 16  # CS — latent depth code dimension (reference: system/CMakeLists.txt:41)
FEAT_SIZE = 16  # FS — feature channels (reference: system/CMakeLists.txt:42)
