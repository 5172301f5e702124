"""codenerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CodeNeRF framework.

A from-scratch re-design of the capabilities of the reference PyTorch
implementation (akashsharma02/code-nerf): differentiable volume rendering with
per-object shape/texture latent codes (auto-decoder), vanilla-NeRF pathway,
config-driven train/eval harness, test-time latent-code + camera-pose
optimization, and data-parallel scaling over a `jax.sharding.Mesh`.

Design stance (TPU-first, not a port):
  * pure functions over pytrees, explicit threaded PRNG keys
  * one jitted `train_step` / `tto_step` / `render_rays` instead of Python
    chunk loops (reference: train.py:92-114)
  * device mesh + NamedSharding instead of mp.spawn/DDP
    (reference: train.py:145-177, util.py:139-142)
  * Pallas fused ray-march kernels for the hot path
"""

__version__ = "0.1.0"

from codenerf_tpu import core, ops, models  # noqa: F401
