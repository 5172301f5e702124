"""Full-image rendering, sharded over the device mesh.

Replaces the reference's `parallel_image_render` (nerf/__init__.py:137-226):
instead of per-rank contiguous splits, host-side chunk loops, zero padding and
an explicit all_gather, the H*W ray axis is padded once, scanned in
fixed-size chunks under one jit (`lax.map` keeps peak memory bounded — the
TPU analog of the reference's `chunksize` minibatching, util.py:230-235), and
each chunk's ray axis is sharded over the mesh; XLA inserts the gather.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from codenerf_tpu.core.geometry import ray_bundle
from codenerf_tpu.models.mlp import CodeNeRFConfig
from codenerf_tpu.parallel.mesh import shard_rays
from codenerf_tpu.pipeline import RenderSettings, render_rays


def serving_settings(settings: RenderSettings) -> RenderSettings:
    """Forward-only variant of ``settings``: enables the split-fc_out
    layout lever on CodeNeRF models (565k -> 825k rays/s serving; see
    CodeNeRFConfig.split_fc_out — slower under grad, so only
    grad-free paths use this)."""
    def split(cfg):
        if isinstance(cfg, CodeNeRFConfig):
            return dataclasses.replace(cfg, split_fc_out=True)
        return cfg
    return dataclasses.replace(settings,
                               coarse_cfg=split(settings.coarse_cfg),
                               fine_cfg=split(settings.fine_cfg))


def make_image_renderer(settings: RenderSettings, height: int, width: int,
                        chunksize: int = 8192, mesh=None) -> Callable:
    """Build a jitted full-image renderer.

    Returned signature:
      render_image(model_params, directions, pose, z_s, z_t) -> [H*W, 3]

    ``pose``: [4, 4]; ``z_s``/``z_t``: [1, C] codes (or None for vanilla
    NeRF).  Rendering uses the fine model output only, deterministic sampling
    (perturb off), as the reference does for validation renders
    (nerf/__init__.py:205 uses rgb_fine; models in eval mode).
    """
    settings = serving_settings(settings)
    num_rays = height * width
    if mesh is not None and mesh.size > 1:
        # keep each chunk divisible by the mesh for an even ray split
        chunksize = max(mesh.size, chunksize // mesh.size * mesh.size)
    num_chunks = -(-num_rays // chunksize)
    padded = num_chunks * chunksize

    def render_image(model_params, directions, pose, z_s, z_t):
        ro, rd = ray_bundle(directions, pose[None])
        ro = ro.reshape(num_rays, 3)
        rd = rd.reshape(num_rays, 3)
        pad = padded - num_rays
        ro = jnp.pad(ro, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
        ro = ro.reshape(num_chunks, chunksize, 3)
        rd = rd.reshape(num_chunks, chunksize, 3)

        if z_s is not None:
            zs = jnp.broadcast_to(z_s, (chunksize, z_s.shape[-1]))
            zt = jnp.broadcast_to(z_t, (chunksize, z_t.shape[-1]))
        else:
            zs = zt = None

        def render_chunk(chunk):
            cro, crd = shard_rays(mesh, chunk[0], chunk[1])
            _, out_f = render_rays(model_params, settings, cro, crd,
                                   zs, zt, None, False)
            return out_f.rgb

        rgb = jax.lax.map(render_chunk, (ro, rd))
        return rgb.reshape(padded, 3)[:num_rays]

    return jax.jit(render_image)
