#!/usr/bin/env python
"""Forward-only (serving) render benchmark.

One variant per process (PERF.md: one benchmark configuration per
process on the tunneled TPU): the default XLA bf16 path, --int8
(models/quantized.py), or --pallas (fused trunk kernel).  Extra flags:
--rays N, --profile DIR.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

from codenerf_tpu.config.schema import (
    Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
    PointSamplerConfig, RuntimeConfig,
)
from codenerf_tpu.eval.render import serving_settings
from codenerf_tpu.pipeline import RenderSettings, render_rays, init_model


def timed(name, fn, *args, steps=20):
    """In-jit chained timing: `fn` runs `steps` renders inside ONE jit
    (lax.scan with an optimization_barrier dependency between
    iterations) and the wall clock wraps a scalar device_get.  On the
    tunneled platform this is the only honest pattern for forward-only
    work: block_until_ready returns before device completion (a ~15 ms
    render 'measures' 0.08 ms whatever host-side chaining is used —
    PERF.md measurement gotchas), so the per-call tunnel RTT must be
    amortized inside a single dispatch and the sync must fetch data."""
    params, ro, rd, z = args
    float(jax.device_get(fn(params, ro, rd, z)))  # compile + warm
    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile") + 1]
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    checksum = float(jax.device_get(fn(params, ro, rd, z)))
    dt = (time.perf_counter() - t0) / steps
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {profile_dir}")
    print(f"{name:30s} {dt*1000:8.2f} ms   "
          f"{ro.shape[0]/dt:12.0f} rays/s   (checksum {checksum:.4f})")
    return dt


def main():
    R, H, C = 8192, 256, 256
    if "--rays" in sys.argv:
        R = int(sys.argv[sys.argv.index("--rays") + 1])
    cfg = Config(
        models=ModelsConfig(
            nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=H),
            nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=H),
            embedding=EmbeddingSpec(shape_code_size=C, texture_code_size=C)),
        nerf=NerfConfig(point_sampler=PointSamplerConfig(
            num_coarse=64, num_fine=64, near_limit=0.8, far_limit=1.8,
            perturb=False)),
        runtime=RuntimeConfig(compute_dtype="bfloat16"),
    )
    base = RenderSettings.from_config(cfg)
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params = {"coarse": init_model(kc, base.coarse_cfg),
              "fine": init_model(kf, base.fine_cfg)}
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    rd = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(R, C)) * 0.1, jnp.float32)

    variants = [("XLA fwd-only", False, False)]
    assert not ("--int8" in sys.argv and "--pallas" in sys.argv), \
        "pick one variant per process"
    if "--int8-encode" in sys.argv:
        variants = [("int8+encode fwd-only", False, True)]
    elif "--int8" in sys.argv:
        variants = [("int8 fwd-only", False, True)]
    elif "--pallas" in sys.argv:
        variants = [("Pallas fwd-only", True, False)]

    for name, use_pallas, int8 in variants:
        # serving_settings enables split_fc_out — the image renderer's
        # actual configuration (565k -> 825k rays/s; PERF.md session 5)
        settings = serving_settings(
            dataclasses.replace(base, use_pallas=use_pallas))
        if int8:
            from codenerf_tpu.models.quantized import quantize_for_serving
            params = quantize_for_serving(
                params, settings, ro, rd, z, z,
                encode_stream="--int8-encode" in sys.argv)

        @jax.jit
        def render(params, ro, rd, z, steps=20):
            def body(carry, _):
                ro_c, acc = carry
                _, out_f = render_rays(params, settings, ro_c, rd, z, z,
                                       None, False)
                rgb = out_f.rgb
                rgb_b, ro_n = jax.lax.optimization_barrier((rgb, ro_c))
                return (ro_n, acc + rgb_b[0, 0]), None

            (ro_f, acc), _ = jax.lax.scan(body, (ro, 0.0), None,
                                          length=steps)
            return acc

        timed(name, render, params, ro, rd, z)


if __name__ == "__main__":
    main()
