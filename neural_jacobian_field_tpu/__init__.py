"""Neural Jacobian Fields, rebuilt TPU-native.

A JAX/Flax/Pallas framework with the capabilities of the reference PyTorch
implementation (sizhe-li/neural-jacobian-field): learn a 3D representation of
an arbitrary robot from multi-view video + actuation commands, with no
kinematic model, then control it through the learned Jacobian field.

Layout (mirrors the reference's layer map, re-designed for XLA):
  ops/        pure array ops: encodings, compositing, resampling, losses
  rendering/  ray/camera geometry and samplers (pure functions, explicit RNG)
  models/     Flax modules: encoder, field MLPs, decoders, composed model
  parallel/   mesh + sharding helpers (pjit data parallelism over ICI)
  training/   jitted train step, optax schedules/freezing, orbax checkpoints
  data/       nerfstudio-format parsing, synthetic scenes, host pipelines
  inference/  patch render, inverse dynamics, sensitivity visualization
  jacobian2d/ the 2D toy pipeline (UNet/ViT dense Jacobian prediction)
  flow/       optical-flow supervision (RAFT port / precomputed ingestion)
"""

__version__ = "0.1.0"
