"""The jitted training step: rays -> render -> loss -> grads -> update.

This one function replaces the reference's entire inner hot loop
(train.py:70-114): host-side ray selection, chunked minibatching, per-chunk
forward/backward/step.  On TPU the whole ray batch is one SPMD program —
ray selection happens on device with a threaded key, the coarse+fine render
and backward fuse under jit, and the ray axis is sharded over the mesh with
gradients all-reduced by XLA.

Design deviation from the reference, on purpose: the reference chunks the
B*num_random_rays ray batch into `chunksize` slices and takes one optimizer
step per slice (train.py:84-114).  Chunking is a GPU-memory workaround, not
an algorithm; here each step consumes the full ray batch at once.  With
train_batch_size=1 (the 3080 configs) the two are identical.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from codenerf_tpu.core.geometry import ray_bundle, select_ray_indices
from codenerf_tpu.core.metrics import mse2psnr
from codenerf_tpu.models.codes import lookup_codes, code_table_norms
from codenerf_tpu.parallel.mesh import shard_rays
from codenerf_tpu.pipeline import RenderSettings, render_rays
from codenerf_tpu.train.state import TrainState


class StepMetrics(NamedTuple):
    loss: jax.Array
    loss_coarse: jax.Array
    loss_fine: jax.Array
    loss_embedding: jax.Array
    psnr: jax.Array


def gather_ray_batch(directions: jax.Array, pose: jax.Array,
                     pixels: jax.Array, object_ids: jax.Array,
                     key: jax.Array, num_random_rays: int):
    """Device-side ray + target-pixel selection for a batch of images.

    Args:
      directions: [H, W, 3] camera-frame direction grid.
      pose:       [B, 4, 4] camera poses.
      pixels:     [B, H, W, C] target images.
      object_ids: [B] int ids.
      key:        PRNG key.
    Returns: ro, rd [B*S, 3]; target [B*S, C]; ids [B*S].
    """
    B = pose.shape[0]
    H, W = directions.shape[:2]
    ro, rd = ray_bundle(directions, pose)                     # [B,H,W,3]
    ro = ro.reshape(B, H * W, 3)
    rd = rd.reshape(B, H * W, 3)
    flat_pix = pixels.reshape(B, H * W, -1)

    inds = select_ray_indices(key, H * W, num_random_rays, B)  # [B,S]
    ro = jnp.take_along_axis(ro, inds[..., None], axis=1).reshape(-1, 3)
    rd = jnp.take_along_axis(rd, inds[..., None], axis=1).reshape(-1, 3)
    target = jnp.take_along_axis(flat_pix, inds[..., None], axis=1)
    target = target.reshape(B * num_random_rays, -1)
    ids = jnp.repeat(object_ids, num_random_rays)
    return ro, rd, target, ids


def make_train_step(settings: RenderSettings, optimizer, num_random_rays: int,
                    regularizer_lambda: float, perturb: bool,
                    mesh=None, use_checkify: bool = False,
                    ray_chunks: int = 1) -> Callable:
    """Build the jitted train step.

    Returned signature:
      train_step(state, directions, pose, pixels, object_ids, key)
        -> (new_state, StepMetrics)
    with ``state`` donated.  With ``use_checkify`` the step additionally
    carries NaN/inf guards (jax.experimental.checkify float checks — the
    TPU-native stand-in for torch's set_detect_anomaly, SURVEY §5) and
    raises host-side on the first bad value.

    ray_chunks > 1 walks the ray batch in lax.map chunks INSIDE the jit —
    the TPU-native form of the reference's ``chunksize`` minibatching
    (util.py:230-235, train.py:84-86): the render body is traced and
    compiled once per chunk shape instead of for the full batch, cutting
    compile time and activation memory for very large ray batches.  The
    loss (and therefore the gradient and the optimizer step) is identical
    to the unchunked computation — unlike the reference, which takes one
    optimizer step per chunk.
    """
    has_codes = settings.coarse_cfg.__class__.__name__ == "CodeNeRFConfig"

    def render_losses(params, ro, rd, target, ids, k_render):
        """Sum of squared residuals over one ray slab (coarse, fine)."""
        if has_codes:
            z_s, z_t = lookup_codes(params["codes"], ids)
        else:
            z_s = z_t = None
        out_c, out_f = render_rays(
            {"coarse": params["coarse"], "fine": params["fine"]},
            settings, ro, rd, z_s, z_t, k_render, perturb,
            noise_std=settings.noise_std)
        return (jnp.sum((out_c.rgb - target[..., :3]) ** 2),
                jnp.sum((out_f.rgb - target[..., :3]) ** 2))

    def loss_fn(params, directions, pose, pixels, object_ids, key):
        k_sel, k_render = jax.random.split(key)
        ro, rd, target, ids = gather_ray_batch(
            directions, pose, pixels, object_ids, k_sel, num_random_rays)
        R = ro.shape[0]

        if ray_chunks > 1:
            if R % ray_chunks:
                raise ValueError(
                    f"ray batch {R} not divisible by ray_chunks="
                    f"{ray_chunks}")
            from codenerf_tpu.parallel.mesh import shard_chunked_rays
            rc = R // ray_chunks

            def chunked(a):
                return a.reshape(ray_chunks, rc, *a.shape[1:])

            ro, rd, target, ids = shard_chunked_rays(
                mesh, *map(chunked, (ro, rd, target, ids)))
            keys = jax.random.split(k_render, ray_chunks)
            ss_c, ss_f = jax.lax.map(
                lambda args: render_losses(params, *args),
                (ro, rd, target, ids, keys))
            loss_c = jnp.sum(ss_c) / (R * 3)
            loss_f = jnp.sum(ss_f) / (R * 3)
        else:
            # SPMD: split the ray axis across the mesh (data parallelism
            # over rays — the pjit analog of DDP over ray batches,
            # SURVEY §2.1 DP-1).
            ro, rd, target, ids = shard_rays(mesh, ro, rd, target, ids)
            ss_c, ss_f = render_losses(params, ro, rd, target, ids,
                                       k_render)
            loss_c = ss_c / (R * 3)
            loss_f = ss_f / (R * 3)

        # Losses per reference train.py:103-108.
        if has_codes and regularizer_lambda > 0:
            ns, nt = code_table_norms(params["codes"])
            loss_e = regularizer_lambda * (ns + nt)
        else:
            loss_e = jnp.zeros_like(loss_c)
        loss = loss_c + loss_f + loss_e
        return loss, (loss_c, loss_f, loss_e)

    def train_step(state: TrainState, directions, pose, pixels, object_ids,
                   key):
        (loss, (loss_c, loss_f, loss_e)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, directions, pose, pixels,
                                   object_ids, key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = StepMetrics(loss=loss, loss_coarse=loss_c,
                              loss_fine=loss_f, loss_embedding=loss_e,
                              psnr=mse2psnr(loss_f))
        return TrainState(params, opt_state, state.step + 1), metrics

    if use_checkify:
        from jax.experimental import checkify

        checked = jax.jit(
            checkify.checkify(train_step, errors=checkify.float_checks))

        def guarded(state, directions, pose, pixels, object_ids, key):
            err, out = checked(state, directions, pose, pixels, object_ids,
                               key)
            err.throw()
            return out

        return guarded

    return jax.jit(train_step, donate_argnums=(0,))
