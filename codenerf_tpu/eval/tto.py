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


class BatchedTTOMetrics(NamedTuple):
    """Per-object [K] metric arrays from one batched TTO step."""
    loss: jax.Array
    loss_coarse: jax.Array
    loss_fine: jax.Array
    loss_embedding: jax.Array
    psnr: jax.Array
    pose_error: jax.Array


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


# ---------------------------------------------------------------------------
# Batched multi-object TTO (beyond-reference)
# ---------------------------------------------------------------------------
#
# The reference optimizes one unseen object at a time (eval.py:122-168); at
# its validation shapes (4096 rays x 192 samples) a single object leaves the
# chip badly underutilized.  Here K objects' TTO problems are solved in ONE
# jitted step: each object draws its own pixel subset from its own target
# view under its own candidate pose, the K ray batches concatenate into one
# [K*R] render (codes are per-ray inputs already, so no model change), and
# the per-object losses sum — gradients stay exactly per-object because
# object k's loss depends only on object k's variables.  K=1 reproduces
# make_tto_step bit-for-bit (same PRNG call structure; pinned by test).

def init_batched_tto_state(code_tables, opt_cfg, num_objects: int,
                           pose_init=(1.57, 0.0, 1.30)
                           ) -> tuple[TTOState, object]:
    """TTO state for K objects: variables carry a leading [K] axis.

    ``pose_init`` entries may be scalars (shared init, the reference's
    1.57/0/1.30) or [K] arrays (per-object inits for multi-start).
    """
    z_s0, z_t0 = mean_codes(code_tables)
    K = num_objects
    theta, phi, rho = (
        jnp.broadcast_to(jnp.asarray(v, jnp.float32), (K,)) for v in pose_init)
    variables = {
        "z_s": jnp.broadcast_to(z_s0, (K, z_s0.shape[-1])),
        "z_t": jnp.broadcast_to(z_t0, (K, z_t0.shape[-1])),
        "theta": theta, "phi": phi, "rho": rho,
    }
    optimizer = build_tto_optimizer(opt_cfg)
    return TTOState(variables, optimizer.init(variables),
                    jnp.zeros((), jnp.int32)), optimizer


def make_batched_tto_step(settings: RenderSettings, optimizer,
                          num_random_rays: int, regularizer_lambda: float,
                          perturb: bool, mesh=None) -> Callable:
    """Build the jitted K-object TTO step.

    Returned signature:
      step(tto_state, model_params, directions, target_images, poses_gt, key)
        -> (new_tto_state, BatchedTTOMetrics)

    ``target_images``: [K, H, W, C] (one held-out view per object);
    ``poses_gt``: [K, 4, 4], metric only.  The TTOState must come from
    ``init_batched_tto_state`` with the same K.
    """
    R = num_random_rays

    def loss_fn(variables, model_params, directions, target_images, key):
        K = target_images.shape[0]
        cam_poses = jax.vmap(pose_spherical)(
            variables["theta"], variables["phi"], variables["rho"])
        k_sel, k_render = jax.random.split(key)
        H, W = directions.shape[:2]
        ro, rd = ray_bundle(directions, cam_poses)          # [K, H, W, 3]
        ro = ro.reshape(K, H * W, 3)
        rd = rd.reshape(K, H * W, 3)
        inds = select_ray_indices(k_sel, H * W, R, K)       # [K, R]
        ro = jnp.take_along_axis(ro, inds[..., None], axis=1).reshape(K * R, 3)
        rd = jnp.take_along_axis(rd, inds[..., None], axis=1).reshape(K * R, 3)
        target = jnp.take_along_axis(
            target_images.reshape(K, H * W, -1), inds[..., None], axis=1)
        target = target.reshape(K * R, -1)
        ro, rd, target = shard_rays(mesh, ro, rd, target)

        z_s = jnp.broadcast_to(variables["z_s"][:, None, :],
                               (K, R, variables["z_s"].shape[-1]))
        z_t = jnp.broadcast_to(variables["z_t"][:, None, :],
                               (K, R, variables["z_t"].shape[-1]))
        out_c, out_f = render_rays(
            {"coarse": model_params["coarse"], "fine": model_params["fine"]},
            settings, ro, rd, z_s.reshape(K * R, -1), z_t.reshape(K * R, -1),
            k_render, perturb)

        err_c = (out_c.rgb - target[..., :3]) ** 2
        err_f = (out_f.rgb - target[..., :3]) ** 2
        loss_c = jnp.mean(err_c.reshape(K, R, 3), axis=(1, 2))     # [K]
        loss_f = jnp.mean(err_f.reshape(K, R, 3), axis=(1, 2))     # [K]
        # per-object expanded-code norm: ||broadcast [R, C]||_F = sqrt(R)||z||
        # (reference eval.py:160 semantics, object-wise)
        loss_e = regularizer_lambda * jnp.sqrt(float(R)) * (
            jnp.linalg.norm(z_s[:, 0, :], axis=-1)
            + jnp.linalg.norm(z_t[:, 0, :], axis=-1))              # [K]
        per_object = loss_c + loss_f + loss_e
        return jnp.sum(per_object), (loss_c, loss_f, loss_e, per_object,
                                     cam_poses)

    def tto_step(state: TTOState, model_params, directions, target_images,
                 poses_gt, key):
        (_, (loss_c, loss_f, loss_e, per_object, cam_poses)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.variables, model_params, directions, target_images,
                key))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.variables)
        variables = optax.apply_updates(state.variables, updates)
        perr = jax.vmap(lie.pose_error)(poses_gt, cam_poses)
        metrics = BatchedTTOMetrics(
            loss=per_object, loss_coarse=loss_c, loss_fine=loss_f,
            loss_embedding=loss_e, psnr=mse2psnr(loss_f), pose_error=perr)
        return TTOState(variables, opt_state, state.step + 1), metrics

    return jax.jit(tto_step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Multi-view TTO (beyond-reference, VERDICT round-3 item 2b)
# ---------------------------------------------------------------------------
#
# The reference's TTO recovers codes + pose from ONE target view
# (eval.py:122-168).  For near-rotationally-symmetric objects (procedural
# chairs; the paper reports the same class on symmetric SRN objects) a
# single photometric loss cannot separate the true pose basin from a
# symmetry-transformed one — both render the one target view equally well.
# Multi-view TTO poses V views of the SAME object as one optimization
# problem: codes are shared across views, each view carries its own
# spherical camera, and the loss is the mean over views.  A symmetry that
# happens to fool one view must fool all V views CONSISTENTLY to win,
# which sharpens basin separation for near-symmetries (a perfect discrete
# symmetry of the object remains irreducibly ambiguous from photometry
# alone).  Rays from all (object, view) pairs concatenate into one render
# exactly like batched TTO, so the chip stays saturated.

def init_multiview_tto_state(code_tables, opt_cfg, num_objects: int,
                             num_views: int,
                             pose_init=(1.57, 0.0, 1.30)
                             ) -> tuple[TTOState, object]:
    """TTO state for K objects x V views: codes [K, C] are per-object,
    pose parameters [K, V] are per-view.  ``pose_init`` entries may be
    scalars or [K]/[K, V] arrays."""
    z_s0, z_t0 = mean_codes(code_tables)
    K, V = num_objects, num_views
    theta, phi, rho = (
        jnp.broadcast_to(jnp.asarray(v, jnp.float32), (K, V))
        for v in pose_init)
    variables = {
        "z_s": jnp.broadcast_to(z_s0, (K, z_s0.shape[-1])),
        "z_t": jnp.broadcast_to(z_t0, (K, z_t0.shape[-1])),
        "theta": theta, "phi": phi, "rho": rho,
    }
    optimizer = build_tto_optimizer(opt_cfg)
    return TTOState(variables, optimizer.init(variables),
                    jnp.zeros((), jnp.int32)), optimizer


def make_multiview_tto_step(settings: RenderSettings, optimizer,
                            num_random_rays: int, regularizer_lambda: float,
                            perturb: bool, mesh=None) -> Callable:
    """Build the jitted K-object, V-view TTO step.

    Returned signature:
      step(tto_state, model_params, directions, target_images, poses_gt, key)
        -> (new_tto_state, BatchedTTOMetrics)

    ``target_images``: [K, V, H, W, C]; ``poses_gt``: [K, V, 4, 4] (metric
    only).  Each view draws its own ``num_random_rays`` pixel subset, so
    one step renders K*V*R rays.  Reported per-object metrics average over
    views; ``pose_error`` is the mean over views of the SE3-log metric.
    """
    R = num_random_rays

    def loss_fn(variables, model_params, directions, target_images, key):
        K, V = target_images.shape[:2]
        cam_poses = jax.vmap(jax.vmap(pose_spherical))(
            variables["theta"], variables["phi"], variables["rho"])
        k_sel, k_render = jax.random.split(key)
        H, W = directions.shape[:2]
        ro, rd = ray_bundle(directions, cam_poses.reshape(K * V, 4, 4))
        ro = ro.reshape(K * V, H * W, 3)
        rd = rd.reshape(K * V, H * W, 3)
        inds = select_ray_indices(k_sel, H * W, R, K * V)    # [K*V, R]
        ro = jnp.take_along_axis(ro, inds[..., None],
                                 axis=1).reshape(K * V * R, 3)
        rd = jnp.take_along_axis(rd, inds[..., None],
                                 axis=1).reshape(K * V * R, 3)
        target = jnp.take_along_axis(
            target_images.reshape(K * V, H * W, -1), inds[..., None], axis=1)
        target = target.reshape(K * V * R, -1)
        ro, rd, target = shard_rays(mesh, ro, rd, target)

        # codes broadcast per object over its V*R rays
        z_s = jnp.broadcast_to(variables["z_s"][:, None, :],
                               (K, V * R, variables["z_s"].shape[-1]))
        z_t = jnp.broadcast_to(variables["z_t"][:, None, :],
                               (K, V * R, variables["z_t"].shape[-1]))
        out_c, out_f = render_rays(
            {"coarse": model_params["coarse"], "fine": model_params["fine"]},
            settings, ro, rd, z_s.reshape(K * V * R, -1),
            z_t.reshape(K * V * R, -1), k_render, perturb)

        err_c = (out_c.rgb - target[..., :3]) ** 2
        err_f = (out_f.rgb - target[..., :3]) ** 2
        # mean over views and rays -> per-object [K]
        loss_c = jnp.mean(err_c.reshape(K, V * R, 3), axis=(1, 2))
        loss_f = jnp.mean(err_f.reshape(K, V * R, 3), axis=(1, 2))
        loss_e = regularizer_lambda * jnp.sqrt(float(R)) * (
            jnp.linalg.norm(variables["z_s"], axis=-1)
            + jnp.linalg.norm(variables["z_t"], axis=-1))
        per_object = loss_c + loss_f + loss_e
        return jnp.sum(per_object), (loss_c, loss_f, loss_e, per_object,
                                     cam_poses)

    def tto_step(state: TTOState, model_params, directions, target_images,
                 poses_gt, key):
        (_, (loss_c, loss_f, loss_e, per_object, cam_poses)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.variables, model_params, directions, target_images,
                key))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.variables)
        variables = optax.apply_updates(state.variables, updates)
        perr = jnp.mean(jax.vmap(jax.vmap(lie.pose_error))(poses_gt,
                                                           cam_poses),
                        axis=1)                                  # [K]
        metrics = BatchedTTOMetrics(
            loss=per_object, loss_coarse=loss_c, loss_fine=loss_f,
            loss_embedding=loss_e, psnr=mse2psnr(loss_f), pose_error=perr)
        return TTOState(variables, opt_state, state.step + 1), metrics

    return jax.jit(tto_step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# SE(3)-tangent pose refinement (beyond-reference, VERDICT round-1 item 7)
# ---------------------------------------------------------------------------
#
# The spherical (theta, phi, rho) parametrization (reference eval.py:22-38)
# spans exactly 3 of the 6 camera DOF: the camera always sits ON the sphere
# around the origin and always looks AT the origin with a fixed roll.  For
# off-sphere or rolled target cameras the spherical TTO saturates at the
# closest expressible pose.  This second stage freezes the spherical result
# as a base pose and optimizes codes plus a full 6-vector xi in the SE(3)
# tangent space:  cam_pose = se3_exp(xi) @ base_pose  (core/lie.py::se3_exp,
# xi = 0 at init = continue exactly from the spherical solution).

def init_se3_refine_state(tto_state: TTOState, opt_cfg
                          ) -> tuple[TTOState, object, jax.Array]:
    """From a finished batched TTO state: returns (refine_state, optimizer,
    base_poses [K, 4, 4]).  Codes carry over; xi starts at zero."""
    from codenerf_tpu.train.optim import build_se3_refine_optimizer

    v = tto_state.variables
    K = v["z_s"].shape[0]
    base_poses = jax.vmap(pose_spherical)(v["theta"], v["phi"], v["rho"])
    variables = {
        # copies, not aliases: the refine step donates its state, and a
        # donated buffer shared with the caller's spherical TTOState would
        # leave that state unreadable after the first refine step
        "z_s": jnp.array(v["z_s"]),
        "z_t": jnp.array(v["z_t"]),
        "xi": jnp.zeros((K, 6), jnp.float32),
    }
    optimizer = build_se3_refine_optimizer(opt_cfg)
    return (TTOState(variables, optimizer.init(variables),
                     jnp.zeros((), jnp.int32)),
            optimizer, base_poses)


def se3_refined_poses(variables: dict, base_poses: jax.Array) -> jax.Array:
    """cam_pose[k] = se3_exp(xi[k]) @ base_poses[k]."""
    return jax.vmap(lambda xi, base: lie.se3_exp(xi) @ base)(
        variables["xi"], base_poses)


def make_se3_refine_step(settings: RenderSettings, optimizer,
                         num_random_rays: int, regularizer_lambda: float,
                         perturb: bool, mesh=None) -> Callable:
    """Build the jitted K-object SE(3) refinement step.

    Returned signature:
      step(state, model_params, directions, target_images, base_poses,
           poses_gt, key) -> (new_state, BatchedTTOMetrics)

    Same ray-draw/loss structure as make_batched_tto_step; only the pose
    parametrization differs.
    """
    R = num_random_rays

    def loss_fn(variables, model_params, directions, target_images,
                base_poses, key):
        K = target_images.shape[0]
        cam_poses = se3_refined_poses(variables, base_poses)
        k_sel, k_render = jax.random.split(key)
        H, W = directions.shape[:2]
        ro, rd = ray_bundle(directions, cam_poses)
        ro = ro.reshape(K, H * W, 3)
        rd = rd.reshape(K, H * W, 3)
        inds = select_ray_indices(k_sel, H * W, R, K)
        ro = jnp.take_along_axis(ro, inds[..., None], axis=1).reshape(K * R, 3)
        rd = jnp.take_along_axis(rd, inds[..., None], axis=1).reshape(K * R, 3)
        target = jnp.take_along_axis(
            target_images.reshape(K, H * W, -1), inds[..., None], axis=1)
        target = target.reshape(K * R, -1)
        ro, rd, target = shard_rays(mesh, ro, rd, target)

        z_s = jnp.broadcast_to(variables["z_s"][:, None, :],
                               (K, R, variables["z_s"].shape[-1]))
        z_t = jnp.broadcast_to(variables["z_t"][:, None, :],
                               (K, R, variables["z_t"].shape[-1]))
        out_c, out_f = render_rays(
            {"coarse": model_params["coarse"], "fine": model_params["fine"]},
            settings, ro, rd, z_s.reshape(K * R, -1), z_t.reshape(K * R, -1),
            k_render, perturb)

        err_c = (out_c.rgb - target[..., :3]) ** 2
        err_f = (out_f.rgb - target[..., :3]) ** 2
        loss_c = jnp.mean(err_c.reshape(K, R, 3), axis=(1, 2))
        loss_f = jnp.mean(err_f.reshape(K, R, 3), axis=(1, 2))
        loss_e = regularizer_lambda * jnp.sqrt(float(R)) * (
            jnp.linalg.norm(z_s[:, 0, :], axis=-1)
            + jnp.linalg.norm(z_t[:, 0, :], axis=-1))
        per_object = loss_c + loss_f + loss_e
        return jnp.sum(per_object), (loss_c, loss_f, loss_e, per_object,
                                     cam_poses)

    def refine_step(state: TTOState, model_params, directions, target_images,
                    base_poses, poses_gt, key):
        (_, (loss_c, loss_f, loss_e, per_object, cam_poses)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.variables, model_params, directions, target_images,
                base_poses, key))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.variables)
        variables = optax.apply_updates(state.variables, updates)
        perr = jax.vmap(lie.pose_error)(poses_gt, cam_poses)
        metrics = BatchedTTOMetrics(
            loss=per_object, loss_coarse=loss_c, loss_fine=loss_f,
            loss_embedding=loss_e, psnr=mse2psnr(loss_f), pose_error=perr)
        return TTOState(variables, opt_state, state.step + 1), metrics

    return jax.jit(refine_step, donate_argnums=(0,))


def init_multiview_se3_refine_state(tto_state: TTOState, opt_cfg
                                    ) -> tuple[TTOState, object, jax.Array]:
    """Multi-view analog of ``init_se3_refine_state`` (VERDICT round-4
    item 5: SE(3) refinement and multi-view TTO previously did not
    compose — the evaluation matrix had a hole exactly where the two
    strongest beyond-reference features meet).

    From a finished multi-view TTO state (variables theta/phi/rho of
    shape [K, V]): codes stay shared per object, and the tangent update
    becomes PER-VIEW — xi [K, V, 6], one 6-DOF correction on top of each
    view's spherical result:  cam_pose[k, v] = se3_exp(xi[k, v]) @
    base_poses[k, v].  xi = 0 at init continues exactly from the
    spherical solution, as in the single-view stage.
    """
    from codenerf_tpu.train.optim import build_se3_refine_optimizer

    v = tto_state.variables
    K, V = v["theta"].shape
    base_poses = jax.vmap(jax.vmap(pose_spherical))(
        v["theta"], v["phi"], v["rho"])                     # [K, V, 4, 4]
    variables = {
        # copies, not aliases (donation hazard — cf. init_se3_refine_state)
        "z_s": jnp.array(v["z_s"]),
        "z_t": jnp.array(v["z_t"]),
        "xi": jnp.zeros((K, V, 6), jnp.float32),
    }
    optimizer = build_se3_refine_optimizer(opt_cfg)
    return (TTOState(variables, optimizer.init(variables),
                     jnp.zeros((), jnp.int32)),
            optimizer, base_poses)


def multiview_se3_refined_poses(variables: dict, base_poses: jax.Array
                                ) -> jax.Array:
    """cam_pose[k, v] = se3_exp(xi[k, v]) @ base_poses[k, v] -> [K, V, 4, 4]."""
    return jax.vmap(jax.vmap(lambda xi, base: lie.se3_exp(xi) @ base))(
        variables["xi"], base_poses)


def make_multiview_se3_refine_step(settings: RenderSettings, optimizer,
                                   num_random_rays: int,
                                   regularizer_lambda: float,
                                   perturb: bool, mesh=None) -> Callable:
    """Build the jitted K-object, V-view SE(3) refinement step.

    Returned signature:
      step(state, model_params, directions, target_images, base_poses,
           poses_gt, key) -> (new_state, BatchedTTOMetrics)

    ``target_images``: [K, V, H, W, C]; ``base_poses``/``poses_gt``:
    [K, V, 4, 4].  Same ray-draw/loss structure as the multi-view
    spherical step (``num_random_rays`` is PER VIEW, so one step renders
    K*V*R rays); only the pose parametrization differs.  Per-object
    metrics average over views; V=1 reproduces make_se3_refine_step's
    math on squeezed inputs.
    """
    R = num_random_rays

    def loss_fn(variables, model_params, directions, target_images,
                base_poses, key):
        K, V = target_images.shape[:2]
        cam_poses = multiview_se3_refined_poses(variables, base_poses)
        k_sel, k_render = jax.random.split(key)
        H, W = directions.shape[:2]
        ro, rd = ray_bundle(directions, cam_poses.reshape(K * V, 4, 4))
        ro = ro.reshape(K * V, H * W, 3)
        rd = rd.reshape(K * V, H * W, 3)
        inds = select_ray_indices(k_sel, H * W, R, K * V)    # [K*V, R]
        ro = jnp.take_along_axis(ro, inds[..., None],
                                 axis=1).reshape(K * V * R, 3)
        rd = jnp.take_along_axis(rd, inds[..., None],
                                 axis=1).reshape(K * V * R, 3)
        target = jnp.take_along_axis(
            target_images.reshape(K * V, H * W, -1), inds[..., None], axis=1)
        target = target.reshape(K * V * R, -1)
        ro, rd, target = shard_rays(mesh, ro, rd, target)

        z_s = jnp.broadcast_to(variables["z_s"][:, None, :],
                               (K, V * R, variables["z_s"].shape[-1]))
        z_t = jnp.broadcast_to(variables["z_t"][:, None, :],
                               (K, V * R, variables["z_t"].shape[-1]))
        out_c, out_f = render_rays(
            {"coarse": model_params["coarse"], "fine": model_params["fine"]},
            settings, ro, rd, z_s.reshape(K * V * R, -1),
            z_t.reshape(K * V * R, -1), k_render, perturb)

        err_c = (out_c.rgb - target[..., :3]) ** 2
        err_f = (out_f.rgb - target[..., :3]) ** 2
        loss_c = jnp.mean(err_c.reshape(K, V * R, 3), axis=(1, 2))
        loss_f = jnp.mean(err_f.reshape(K, V * R, 3), axis=(1, 2))
        loss_e = regularizer_lambda * jnp.sqrt(float(R)) * (
            jnp.linalg.norm(variables["z_s"], axis=-1)
            + jnp.linalg.norm(variables["z_t"], axis=-1))
        per_object = loss_c + loss_f + loss_e
        return jnp.sum(per_object), (loss_c, loss_f, loss_e, per_object,
                                     cam_poses)

    def refine_step(state: TTOState, model_params, directions, target_images,
                    base_poses, poses_gt, key):
        (_, (loss_c, loss_f, loss_e, per_object, cam_poses)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                state.variables, model_params, directions, target_images,
                base_poses, key))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.variables)
        variables = optax.apply_updates(state.variables, updates)
        perr = jnp.mean(jax.vmap(jax.vmap(lie.pose_error))(poses_gt,
                                                           cam_poses),
                        axis=1)                                  # [K]
        metrics = BatchedTTOMetrics(
            loss=per_object, loss_coarse=loss_c, loss_fine=loss_f,
            loss_embedding=loss_e, psnr=mse2psnr(loss_f), pose_error=perr)
        return TTOState(variables, opt_state, state.step + 1), metrics

    return jax.jit(refine_step, donate_argnums=(0,))


def select_per_object(mask: jax.Array, winner: TTOState, other: TTOState
                      ) -> TTOState:
    """Per-object merge of two batched TTO states: where ``mask[k]`` take
    ``winner``'s object k, else ``other``'s (variables AND optimizer
    moments — every leaf with a leading [K] axis is selected object-wise;
    [K]-agnostic leaves such as step counts are taken from ``winner``).

    Used by multi-start pose TTO to keep, per object, the restart whose
    probe loss is lowest.
    """
    K = mask.shape[0]

    def pick(a, b):
        if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] == K:
            m = mask.reshape((K,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)
        return a

    return jax.tree_util.tree_map(pick, winner, other)
