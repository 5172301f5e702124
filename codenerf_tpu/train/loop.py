"""The training driver loop (reference train.py:19-142, TPU-native)."""

from __future__ import annotations

import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp

from codenerf_tpu.config.schema import Config
from codenerf_tpu.harness import Harness, validate
from codenerf_tpu.train.optim import lr_at_step
from codenerf_tpu.train.state import init_train_state
from codenerf_tpu.train.step import make_train_step
from codenerf_tpu.train import checkpoint
from codenerf_tpu.utils.logging import MetricLogger, is_main_process


def run_training(cfg: Config, max_steps: Optional[int] = None,
                 harness: Optional[Harness] = None) -> dict:
    """Train per the config; returns the final metrics dict.

    ``max_steps`` overrides the config-derived step count (for smoke runs).
    """
    harness = harness or Harness.from_config(cfg)
    logger = MetricLogger(harness.logdir)

    key = jax.random.PRNGKey(
        cfg.experiment.randomseed + 1 + jax.process_index())
    key, k_init = jax.random.split(key)
    state, optimizer = init_train_state(k_init, cfg, harness.settings,
                                        harness.train_dataset.num_objects)

    ckpt_dir = harness.logdir / "checkpoints"
    if cfg.runtime.load_checkpoint:
        state = checkpoint.restore_checkpoint(cfg.runtime.load_checkpoint,
                                              state)
    elif checkpoint.latest_step(ckpt_dir) is not None:
        state = checkpoint.restore_checkpoint(ckpt_dir, state)
    if harness.mesh is not None:
        # restored arrays come back committed to one device; replicate them
        # over the mesh so the sharded train step accepts them
        from codenerf_tpu.parallel.mesh import replicated_sharding
        state = jax.device_put(state, replicated_sharding(harness.mesh))

    train_step = make_train_step(
        harness.settings, optimizer,
        num_random_rays=cfg.nerf.ray_sampler.num_random_rays,
        regularizer_lambda=cfg.experiment.regularizer_lambda,
        perturb=cfg.nerf.point_sampler.perturb,
        mesh=harness.mesh,
        use_checkify=cfg.runtime.checkify,
        ray_chunks=cfg.runtime.ray_chunks)

    # One step here consumes a full image batch (the reference's chunk loop
    # collapsed into a single SPMD program) -> the outer-iteration count is
    # the reference's dataloader count (train.py:61-62).
    total_steps = cfg.experiment.iterations // max(
        1, cfg.dataset.train_batch_size)
    if max_steps is not None:
        total_steps = min(total_steps, int(jax.device_get(state.step)) +
                          max_steps)

    # Preemption handling (SURVEY §5: the reference has none — recovery is
    # manual restart).  On SIGTERM/SIGINT we finish the current step, save a
    # checkpoint, and exit cleanly; the next launch auto-resumes from it.
    interrupted = {"flag": False}

    def _request_stop(signum, frame):
        interrupted["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except ValueError:
            pass  # not the main thread (e.g. under a test runner)

    start_step = int(jax.device_get(state.step))
    metrics_out = {}
    rays_per_step = (cfg.nerf.ray_sampler.num_random_rays
                     * cfg.dataset.train_batch_size)
    # decode the next batch on a host thread while the device steps; on a
    # single device also upload it there (overlaps the tunnel RTT of the
    # host->device transfer with the previous step)
    from codenerf_tpu.data import PrefetchIterator
    train_stream = PrefetchIterator(harness.train_iter, depth=2,
                                    to_device=harness.mesh is None)
    # steady-state profiler window (SURVEY §5: replaces the reference's
    # bare wall-clock deltas with a real trace)
    prof_start = start_step + 5 if cfg.runtime.profile_dir else -1
    prof_stop = prof_start + 5
    then = time.time()
    for step_idx in range(start_step, total_steps):
        if step_idx == prof_start:
            jax.profiler.start_trace(cfg.runtime.profile_dir)
        elif step_idx == prof_stop and prof_start >= 0:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            print(f"profiler trace written to {cfg.runtime.profile_dir}")
        batch = next(train_stream)
        key, k = jax.random.split(key)
        state, metrics = train_step(
            state, harness.directions,
            jnp.asarray(batch["pose"]), jnp.asarray(batch["color"]),
            jnp.asarray(batch["object_id"]), k)

        i = step_idx + 1
        if is_main_process() and i % cfg.experiment.print_every == 0:
            m = jax.device_get(metrics)
            dt = time.time() - then
            lr = lr_at_step(cfg.optimizer.lr, cfg.optimizer.scheduler_gamma,
                            cfg.optimizer.scheduler_step_size, i)
            line = logger.log_scalars("train", i, {
                "nerf_loss_coarse": m.loss_coarse,
                "nerf_loss_fine": m.loss_fine,
                "embedding_loss": m.loss_embedding,
                "total_loss": m.loss,
                "psnr": m.psnr,
                "rays_per_sec": rays_per_step * cfg.experiment.print_every
                / max(dt, 1e-9)}, time_taken=dt,
                learning_rate=lr)
            print(line)
            # target-image panel, as the reference logs at train.py:126
            logger.log_image("train/target_image", i,
                             batch["color"][0][..., :3])
            then = time.time()
            metrics_out = {k_: float(v) for k_, v in m._asdict().items()}

        if is_main_process() and (i % cfg.experiment.save_every == 0
                                  or i == total_steps):
            checkpoint.save_checkpoint(ckpt_dir, state)
            print("================== Saved Checkpoint =================")

        if i % cfg.experiment.validate_every == 0 and i < total_steps:
            val_m = validate(harness, state.params, logger, i)
            metrics_out.update({f"val_{k_}": v for k_, v in val_m.items()})

        if interrupted["flag"]:
            if is_main_process():
                checkpoint.save_checkpoint(ckpt_dir, state)
                print(f"=== interrupted: checkpoint saved at step {i}; "
                      "relaunch to resume ===")
            break

    for sig, handler in prev_handlers.items():
        signal.signal(sig, handler)
    logger.close()
    return metrics_out
