#!/usr/bin/env python
"""Multi-chip scaling benchmark: rays/s vs mesh size + collective budget.

The round-1 environment has ONE physical TPU chip, so real multi-chip
throughput cannot be measured yet — this harness makes hardware-day a
measurement-day (VERDICT round-1 item 4): the same script that validates
end-to-end on a virtual N-device CPU mesh today runs unchanged on a real
pod slice (`--platform native`), with bench.py's watchdog + median-of-three
methodology.

What it measures, per mesh size N (weak scaling — per-chip ray batch held
constant, global batch grows with N):

  * full jitted train step (DP-1: rays sharded over the 'data' axis,
    params replicated, grad psum inserted by XLA — parallel/mesh.py)
  * scaling efficiency  eff(N) = rate(N) / (N * rate(1))
  * the per-step collective budget (analytic, printed for the record):
      - gradient all-reduce: sum of f32 param bytes, psum'd over 'data'
        (ring all-reduce moves ~2*(N-1)/N * bytes per chip)
      - batched-code lookup grads ride in the same psum (dense tables)
      - DP-2 full-image render: H*W*3 f32 bytes all-gathered per image

Usage (virtual mesh validation):
  python tools/bench_multichip.py --platform cpu --devices 1,2,4,8 \
      --preset tiny --steps 5
Real hardware (run on the pod host; one process per host):
  python tools/bench_multichip.py --platform native --devices 1,2,4 \
      --preset flagship --rays-per-chip 8192

Prints ONE JSON line: {"metric": "multichip_scaling", "results": [...],
"collective_budget": {...}}.
"""

import argparse
import json
import math
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _arm_watchdog(minutes: float) -> None:
    """Same rationale as bench.py: a wedged TPU tunnel hangs device ops
    forever; fail loudly instead of hanging the driver."""
    def fire():
        print(f"bench_multichip watchdog: no result after {minutes:.0f} min "
              "— device platform is likely wedged; aborting",
              file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(minutes * 60.0, fire)
    t.daemon = True
    t.start()


PRESETS = {
    # hidden, code, num_coarse, num_fine
    "tiny": (32, 16, 8, 8),
    "bench": (256, 256, 64, 64),       # bench.py headline shape
    "flagship": (256, 256, 32, 128),   # srn-cars-code.yml training shape
}


def build_step(preset: str, num_random_rays: int, batch_images: int, mesh):
    """Real train step (train/step.py) over `mesh`, synthetic camera batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codenerf_tpu.config.schema import (
        Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
        PointSamplerConfig, OptimizerConfig, RuntimeConfig)
    from codenerf_tpu.core.geometry import pixel_directions, pose_spherical
    from codenerf_tpu.pipeline import RenderSettings
    from codenerf_tpu.train.state import init_train_state
    from codenerf_tpu.train.step import make_train_step

    hidden, code, nc, nf = PRESETS[preset]
    cfg = Config(
        models=ModelsConfig(
            nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=hidden),
            nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=hidden),
            embedding=EmbeddingSpec(shape_code_size=code,
                                    texture_code_size=code)),
        optimizer=OptimizerConfig(type="AdamW", lr=1e-4, embedding_lr=1e-3),
        nerf=NerfConfig(point_sampler=PointSamplerConfig(
            num_coarse=nc, num_fine=nf, near_limit=0.8, far_limit=1.8,
            spacing_mode="lindepth", perturb=True)),
        runtime=RuntimeConfig(
            compute_dtype="float32" if preset == "tiny" else "bfloat16"),
    )
    settings = RenderSettings.from_config(cfg)
    state, optimizer = init_train_state(jax.random.PRNGKey(0), cfg, settings,
                                        num_objects=16)
    step = make_train_step(settings, optimizer,
                           num_random_rays=num_random_rays,
                           regularizer_lambda=1e-5, perturb=True, mesh=mesh)

    # synthetic camera batch large enough to draw num_random_rays pixels
    side = 1 << max(3, math.ceil(math.log2(math.sqrt(num_random_rays))))
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 1.2 * side
    K[0, 2] = K[1, 2] = side / 2.0
    directions = pixel_directions(side, side, jnp.asarray(K))
    rng = np.random.default_rng(0)
    poses = jnp.stack([pose_spherical(1.2 + 0.1 * b, 0.1 * b, 1.3)
                       for b in range(batch_images)])
    pixels = jnp.asarray(rng.uniform(size=(batch_images, side, side, 3)),
                         jnp.float32)
    ids = jnp.asarray(rng.integers(0, 16, size=(batch_images,)), jnp.int32)
    return state, step, (directions, poses, pixels, ids)


def collective_budget(state, height: int = 128, width: int = 128) -> dict:
    """Analytic per-step collective volumes (documented budget)."""
    import jax
    import numpy as np

    param_bytes = sum(np.prod(l.shape) * 4
                      for l in jax.tree.leaves(state.params))
    return {
        "grad_allreduce_bytes_per_step": int(param_bytes),
        "grad_allreduce_note": "f32 grads psum'd over the data axis; a "
                               "ring all-reduce moves ~2*(N-1)/N of this "
                               "per chip, overlapped with the backward by "
                               "XLA's latency-hiding scheduler",
        "render_allgather_bytes_per_image": int(height * width * 3 * 4),
        "render_allgather_note": f"DP-2 {height}x{width} full-image render: "
                                 "rgb tiles all-gathered once per image",
    }


def sweep(device_counts, preset: str, rays_per_chip: int, steps: int,
          windows: int = 3, batch_images: int = 2) -> list:
    """Weak-scaling sweep; returns one record per mesh size."""
    import jax
    from codenerf_tpu.parallel.mesh import make_mesh

    results = []
    base_rate = None
    for n in device_counts:
        if n > len(jax.devices()):
            results.append({"devices": n, "skipped": "not enough devices"})
            continue
        mesh = make_mesh(n)
        per_image = max(16, rays_per_chip * n // batch_images)
        state, step, args = build_step(preset, per_image, batch_images, mesh)
        key = jax.random.PRNGKey(1)
        state, metrics = step(state, *args, key)   # compile + warmup
        jax.block_until_ready(metrics.loss)

        rates = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for i in range(steps):
                key = jax.random.fold_in(key, i)
                state, metrics = step(state, *args, key)
            jax.block_until_ready(metrics.loss)
            dt = time.perf_counter() - t0
            rates.append(batch_images * per_image * steps / dt)
        rate = sorted(rates)[len(rates) // 2]
        if n == device_counts[0]:
            base_rate = rate / n
        rec = {"devices": n, "rays_per_sec": round(rate, 1),
               "rays_per_sec_per_chip": round(rate / n, 1),
               "efficiency_vs_smallest": round(rate / (n * base_rate), 4)}
        results.append(rec)
        print(f"  mesh={n}: {rate:,.0f} rays/s "
              f"({rate / n:,.0f}/chip, eff {rec['efficiency_vs_smallest']:.1%})",
              file=sys.stderr, flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma-separated mesh sizes to sweep")
    ap.add_argument("--platform", choices=["cpu", "native"], default="cpu",
                    help="cpu = virtual multi-device validation mesh; "
                         "native = whatever platform jax initialized (TPU)")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="tiny")
    ap.add_argument("--rays-per-chip", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--watchdog-minutes", type=float, default=30.0)
    a = ap.parse_args()

    counts = [int(x) for x in a.devices.split(",")]
    if a.watchdog_minutes:
        _arm_watchdog(a.watchdog_minutes)
    if a.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(counts)}"
        ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from codenerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    results = sweep(counts, a.preset, a.rays_per_chip, a.steps, a.windows)

    # budget computed on the largest completed mesh's state shapes
    from codenerf_tpu.parallel.mesh import make_mesh
    done = [r["devices"] for r in results if "rays_per_sec" in r]
    state, _, _ = build_step(a.preset, 64, 1, make_mesh(min(done)))
    print(json.dumps({
        "metric": "multichip_scaling",
        "platform": jax.default_backend(),
        "preset": a.preset,
        "rays_per_chip": a.rays_per_chip,
        "results": results,
        "collective_budget": collective_budget(state),
    }))


if __name__ == "__main__":
    main()
