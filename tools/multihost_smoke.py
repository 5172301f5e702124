#!/usr/bin/env python
"""Multi-host (multi-process) training smoke test.

Launches N jax.distributed processes on the CPU platform (M virtual devices
each), forms one global mesh over N*M devices, and runs sharded train steps
with the ray axis split across every device of every process — the actual
multi-host code path (jax.distributed.initialize + global NamedSharding),
not the single-process mesh simulation.

Replaces what the reference could only exercise on a physical multi-GPU box
via mp.spawn + NCCL (SURVEY §2.2).

Usage:
  python tools/multihost_smoke.py                    # orchestrate 2 procs
  python tools/multihost_smoke.py --worker I --port P   # internal
"""

import argparse
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4


def worker(process_id: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROCESSES
    assert len(jax.devices()) == NUM_PROCESSES * DEVICES_PER_PROCESS

    import numpy as np
    import jax.numpy as jnp
    from codenerf_tpu.config import load_config
    from codenerf_tpu.core.geometry import pixel_directions, pose_spherical
    from codenerf_tpu.parallel.mesh import make_mesh
    from codenerf_tpu.pipeline import RenderSettings
    from codenerf_tpu.train.state import init_train_state
    from codenerf_tpu.train.step import make_train_step

    mesh = make_mesh()  # all 8 global devices
    cfg = load_config(
        ROOT / "configs" / "synth-smoke.yml",
        overrides=["nerf.point_sampler.num_coarse=8",
                   "nerf.point_sampler.num_fine=8",
                   "models.nerf_coarse.hidden_size=16",
                   "models.nerf_fine.hidden_size=16",
                   "models.embedding.shape_code_size=8",
                   "models.embedding.texture_code_size=8",
                   "nerf.embedder.num_encoding_fn_xyz=4",
                   "nerf.embedder.num_encoding_fn_dir=2",
                   "runtime.compute_dtype=float32"])
    settings = RenderSettings.from_config(cfg)

    # identical seeds on every process -> inputs are replicated by
    # construction (the multi-host analog of the reference's
    # broadcast_object_list, eval.py:112-115)
    state, optimizer = init_train_state(jax.random.PRNGKey(0), cfg, settings,
                                        num_objects=4)
    rays_per_image = 2 * NUM_PROCESSES * DEVICES_PER_PROCESS
    train_step = make_train_step(settings, optimizer,
                                 num_random_rays=rays_per_image,
                                 regularizer_lambda=1e-5, perturb=True,
                                 mesh=mesh)

    B, H, W = 2, 8, 8
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 10.0
    K[0, 2] = K[1, 2] = 4.0
    directions = pixel_directions(H, W, jnp.asarray(K))
    poses = jnp.stack([pose_spherical(1.57, 0.0, 1.3),
                       pose_spherical(1.8, 0.2, 1.3)])
    pixels = jnp.asarray(
        np.random.default_rng(0).uniform(size=(B, H, W, 3)), jnp.float32)
    ids = jnp.asarray([0, 1], jnp.int32)

    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = train_step(state, directions, poses, pixels, ids, k)
        losses.append(float(jax.device_get(metrics.loss)))
    assert all(np.isfinite(losses)), losses
    if jax.process_index() == 0:
        print(f"multihost_smoke: {NUM_PROCESSES} processes x "
              f"{DEVICES_PER_PROCESS} devices, 3 sharded steps OK, "
              f"losses={[round(l, 5) for l in losses]}")
    jax.distributed.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=52923)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.port)
        return

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i),
             "--port", str(args.port)],
            cwd=ROOT,
            stdout=None if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL)
        for i in range(NUM_PROCESSES)
    ]
    codes = [p.wait(timeout=300) for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print("multihost_smoke: PASS")


if __name__ == "__main__":
    main()
