"""TPU-native interpolated-diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the two-stage
"interpolation-as-corruption" diffusion pipeline (reference:
EquilibriaW/Interpolated_Diffusion). Stage 1 is a Gaussian DDPM over K sparse
keypoints; Stage 2 treats anchor density as the discrete noise level with
nested keyframe masks and deterministic segment-lerp corruption.

Subpackages:
  ops       pure stateless tensor math (schedules, ddpm, keyframes, selection)
  models    flax.linen modules (FiLM transformer, denoisers, selectors, ...)
  kernels   Pallas TPU kernels (block-sparse + linear attention)
  parallel  device mesh / sharding layer (DP/TP over jax.sharding.Mesh)
  data      host-side data generation & loading (maze, trajectories, npz)
  train     jitted train steps + entry points
  sample    end-to-end generation pipeline (single jitted program)
  eval      trajectory metrics and visualization
  utils     EMA, checkpointing, seeding, run-config provenance
"""

__version__ = "0.1.0"
