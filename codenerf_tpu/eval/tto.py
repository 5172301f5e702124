"""Test-time optimization (TTO): recover latent codes AND camera pose for an
unseen object by gradient descent through the renderer.

Replaces the reference's validate() inner loop (eval.py:122-168) with one
jitted step.  Semantics kept exactly:

  * codes initialized to the mean of the learned tables (eval.py:126-127)
  * pose parametrized as spherical (theta, phi, rho), init 1.57 / 0 / 1.30
    (eval.py:129-131)
  * per-group LRs: codes @ val_lr, angles @ angle_lr, radius @ radius_lr
    (eval.py:133-138)
  * loss = mse_c + mse_f + lambda (||z_s|| + ||z_t||) (eval.py:157-163);
    note the TTO regularizer is the norm of the PER-RAY-EXPANDED codes, i.e.
    sqrt(R) * ||code||, matching eval.py:160 exactly
  * pose-error metric = ||SE3 log(inv(pose_gt) @ pose)|| (eval.py:161-162)
  * model weights frozen; gradients flow pose -> rays -> render (autodiff)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from codenerf_tpu.core.geometry import (ray_bundle, select_ray_indices,
                                        pose_spherical)
from codenerf_tpu.core.metrics import mse2psnr
from codenerf_tpu.core import lie
from codenerf_tpu.models.codes import mean_codes
from codenerf_tpu.parallel.mesh import shard_rays
from codenerf_tpu.pipeline import RenderSettings, render_rays
from codenerf_tpu.train.optim import build_tto_optimizer


class TTOState(NamedTuple):
    variables: dict        # {"z_s", "z_t", "theta", "phi", "rho"}
    opt_state: object
    step: jax.Array


class TTOMetrics(NamedTuple):
    loss: jax.Array
    loss_coarse: jax.Array
    loss_fine: jax.Array
    loss_embedding: jax.Array
    psnr: jax.Array
    pose_error: jax.Array


def init_tto_state(code_tables, opt_cfg,
                   pose_init=(1.57, 0.0, 1.30)) -> tuple[TTOState, object]:
    """Codes = table means, pose = (1.57, 0, 1.30) (eval.py:126-131).

    ``pose_init``: (theta, phi, rho) override for multi-start pose TTO
    (config ``optimizer.pose_restarts``); the default is the reference
    initialization.
    """
    z_s0, z_t0 = mean_codes(code_tables)
    theta, phi, rho = pose_init
    variables = {
        "z_s": z_s0,
        "z_t": z_t0,
        "theta": jnp.asarray([theta], jnp.float32),
        "phi": jnp.asarray([phi], jnp.float32),
        "rho": jnp.asarray([rho], jnp.float32),
    }
    optimizer = build_tto_optimizer(opt_cfg)
    return TTOState(variables, optimizer.init(variables),
                    jnp.zeros((), jnp.int32)), optimizer


def make_tto_step(settings: RenderSettings, optimizer,
                  num_random_rays: int, regularizer_lambda: float,
                  perturb: bool, mesh=None) -> Callable:
    """Build the jitted TTO step.

    Returned signature:
      tto_step(tto_state, model_params, directions, target_image, pose_gt, key)
        -> (new_tto_state, TTOMetrics)

    ``target_image``: [H, W, C]; ``pose_gt``: [4, 4] ground-truth pose for
    the pose-error metric only (no gradient).
    """

    def loss_fn(variables, model_params, directions, target_image, key):
        cam_pose = pose_spherical(variables["theta"], variables["phi"],
                                  variables["rho"])
        k_sel, k_render = jax.random.split(key)
        H, W = directions.shape[:2]
        ro, rd = ray_bundle(directions, cam_pose[None])
        ro = ro.reshape(H * W, 3)
        rd = rd.reshape(H * W, 3)
        inds = select_ray_indices(k_sel, H * W, num_random_rays, 1)[0]
        ro, rd = ro[inds], rd[inds]
        target = target_image.reshape(H * W, -1)[inds]
        ro, rd, target = shard_rays(mesh, ro, rd, target)

        R = num_random_rays
        z_s = jnp.broadcast_to(variables["z_s"], (R, variables["z_s"].shape[-1]))
        z_t = jnp.broadcast_to(variables["z_t"], (R, variables["z_t"].shape[-1]))
        out_c, out_f = render_rays(
            {"coarse": model_params["coarse"], "fine": model_params["fine"]},
            settings, ro, rd, z_s, z_t, k_render, perturb)

        loss_c = jnp.mean((out_c.rgb - target[..., :3]) ** 2)
        loss_f = jnp.mean((out_f.rgb - target[..., :3]) ** 2)
        # reference eval.py:160 regularizes the expanded [R, C] codes
        loss_e = regularizer_lambda * (jnp.linalg.norm(z_s) +
                                       jnp.linalg.norm(z_t))
        loss = loss_c + loss_f + loss_e
        return loss, (loss_c, loss_f, loss_e, cam_pose)

    def tto_step(state: TTOState, model_params, directions, target_image,
                 pose_gt, key):
        (loss, (loss_c, loss_f, loss_e, cam_pose)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.variables, model_params, directions, target_image, key))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.variables)
        variables = optax.apply_updates(state.variables, updates)
        perr = lie.pose_error(pose_gt, cam_pose)
        metrics = TTOMetrics(loss=loss, loss_coarse=loss_c, loss_fine=loss_f,
                             loss_embedding=loss_e, psnr=mse2psnr(loss_f),
                             pose_error=perr)
        return TTOState(variables, opt_state, state.step + 1), metrics

    return jax.jit(tto_step, donate_argnums=(0,))
