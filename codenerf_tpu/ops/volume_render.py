"""Alpha-compositing volume integration along the sample axis.

Functional replacement for reference view_synthesis/nerf/volumetric_render.py.
The exact activation constants are parity-critical (they set PSNR parity):

  * sigma   = softplus(raw - 1)                ("shifted softplus",
                                                volumetric_render.py:32-33)
  * rgb     = sigmoid(raw) * (1 + 2e-3) - 1e-3 ("widened sigmoid",
                                                volumetric_render.py:28-29)
  * far tail distance = 1e10                    (volumetric_render.py:43)
  * transmittance = exp(-exclusive_cumsum(sigma * delta))
                                                (volumetric_render.py:54-57)

This jnp version is the semantic reference; the fused Pallas ray-march kernel
in codenerf_tpu/ops/fused.py must stay allclose to it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def widened_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    return jax.nn.sigmoid(x) * (1.0 + 2.0 * eps) - eps


def shifted_softplus(x: jax.Array) -> jax.Array:
    return jax.nn.softplus(x - 1.0)


class RenderOutputs(NamedTuple):
    rgb: jax.Array      # [R, 3] composited color
    disp: jax.Array     # [R]    disparity map
    acc: jax.Array      # [R]    accumulated weight (opacity)
    weights: jax.Array  # [R, S] per-sample compositing weights
    depth: jax.Array    # [R]    expected depth


def volume_render(radiance_field: jax.Array, depth_values: jax.Array,
                  ray_directions: jax.Array,
                  white_background: bool = False) -> RenderOutputs:
    """Composite per-sample radiance into per-ray color.

    Args:
      radiance_field: [R, S, 4] raw MLP output (rgb logits + sigma logit).
      depth_values:   [R, S] z values along each ray.
      ray_directions: [R, 3] (unnormalized) ray directions; their norm scales
                      z-spacing into metric distance (volumetric_render.py:45).
      white_background: blend unaccumulated transmittance to white
                      (rgb + (1 - acc)).  The reference declares
                      ``nerf.white_background`` in its configs but never
                      consumes it (SURVEY §3.5); this implements the evident
                      intent, default off to match reference behavior.
    """
    dists = depth_values[..., 1:] - depth_values[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    delta = dists * jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    sigma = shifted_softplus(radiance_field[..., 3])
    sigma_delta = sigma * delta

    rgb = widened_sigmoid(radiance_field[..., :3])

    # Exclusive cumulative optical depth -> transmittance
    # (volumetric_render.py:54-57).  Computed as sigma_delta @ U with U
    # strictly upper triangular: on TPU a [S, S] MXU matmul beats the
    # log-S shifted-add passes XLA emits for cumsum (measured 1.32 ms vs
    # 1.65 ms fwd+bwd at [8192, 128]), and its backward is a single
    # matmul instead of a reverse scan.  Row S-1 of U is all zero, which
    # exactly reproduces the exclusive cumsum over sigma_delta[..., :-1]
    # (the 1e10 far-tail term never enters any prefix).  HIGHEST keeps
    # the f32 inputs from being bf16-truncated on the MXU.
    tri = jnp.triu(jnp.ones((sigma_delta.shape[-1],) * 2,
                            sigma_delta.dtype), k=1)
    accum = jax.lax.dot_general(
        sigma_delta, tri,
        (((sigma_delta.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    transmittance = jnp.exp(-accum)
    alpha = 1.0 - jnp.exp(-sigma_delta)
    weights = alpha * transmittance

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * depth_values, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
