#!/usr/bin/env python
"""Benchmark: rays/s/chip, forward+backward, 64+64 samples/ray (BASELINE.json
north-star metric), on the flagship CodeNeRF model (256 hidden, 256 codes).

Prints ONE JSON line:
  {"metric": "rays_per_sec_per_chip_fwd_bwd_64+64", "value": N,
   "unit": "rays/s", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (README.md:12 disclaimer,
BASELINE.json "published": {}).  We use an estimated reference throughput of
100k rays/s for the RTX 3080-class hardware its configs name (4096-ray chunks
at ~25 steps/s fwd+bwd would be optimistic for the torch implementation at
128 samples/ray with a 9-layer 256-wide MLP).  vs_baseline = value / 100_000.
"""

import json
import os
import sys
import threading
import time

ESTIMATED_REFERENCE_RAYS_PER_SEC = 100_000.0


def _arm_watchdog(minutes: float) -> None:
    """The tunneled TPU platform can wedge after hours of heavy use (all
    device ops hang, even from fresh processes — CLAUDE.md infra hazard).
    A hung benchmark is unrecoverable from Python (the blocked device op
    never returns), so fail loudly instead of hanging the driver: print a
    diagnostic to stderr and hard-exit nonzero."""
    def fire():
        print(f"bench.py watchdog: no result after {minutes:.0f} min — "
              "TPU tunnel is likely wedged; aborting", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = threading.Timer(minutes * 60.0, fire)
    t.daemon = True
    t.start()


def run_bench(num_rays: int = 8192, hidden: int = 256, code: int = 256,
              num_coarse: int = 64, num_fine: int = 64, steps: int = 20,
              compute_dtype: str = "bfloat16", use_pallas: bool = False,
              pallas_backward: bool = False,
              pallas_hybrid: bool = False,
              pallas_layer_bwd: bool = False,
              fc_out_tail_sigma: bool = True) -> dict:
    import jax
    from codenerf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from codenerf_tpu.config.schema import (
        Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
        PointSamplerConfig, OptimizerConfig, RuntimeConfig,
    )
    from codenerf_tpu.pipeline import RenderSettings, render_rays, init_model
    from codenerf_tpu.models import init_code_tables, lookup_codes

    cfg = Config(
        models=ModelsConfig(
            nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=hidden),
            nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=hidden),
            embedding=EmbeddingSpec(shape_code_size=code,
                                    texture_code_size=code),
        ),
        optimizer=OptimizerConfig(type="AdamW", lr=1e-4, embedding_lr=1e-3),
        nerf=NerfConfig(point_sampler=PointSamplerConfig(
            num_coarse=num_coarse, num_fine=num_fine,
            near_limit=0.8, far_limit=1.8, spacing_mode="lindepth",
            perturb=True)),
        runtime=RuntimeConfig(compute_dtype=compute_dtype,
                              use_pallas=use_pallas,
                              pallas_backward=pallas_backward,
                              pallas_hybrid=pallas_hybrid,
                              pallas_layer_bwd=pallas_layer_bwd,
                              fc_out_tail_sigma=fc_out_tail_sigma),
    )
    settings = RenderSettings.from_config(cfg)

    kc, kf, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"coarse": init_model(kc, settings.coarse_cfg),
              "fine": init_model(kf, settings.fine_cfg),
              "codes": init_code_tables(kt, 2458, code, code)}
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(size=(num_rays, 3)), jnp.float32)
    rd = jnp.asarray(rng.normal(size=(num_rays, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(size=(num_rays, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 2458, size=(num_rays,)), jnp.int32)

    def loss_fn(p, key):
        z_s, z_t = lookup_codes(p["codes"], ids)
        out_c, out_f = render_rays(
            {"coarse": p["coarse"], "fine": p["fine"]}, settings,
            ro, rd, z_s, z_t, key, True)
        loss_c = jnp.mean((out_c.rgb - target) ** 2)
        loss_f = jnp.mean((out_f.rgb - target) ** 2)
        return loss_c + loss_f

    @jax.jit
    def step(p, o, key):
        k1, k2 = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, k1)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, k2

    key = jax.random.PRNGKey(1)
    # warmup + compile
    params, opt_state, loss, key = step(params, opt_state, key)
    jax.block_until_ready(loss)

    # median of five timing windows; the full band is reported so the
    # run-to-run variance is on the record (VERDICT round-1 weak item 6:
    # BENCH_r01 180.5k vs PERF.md 179.9k suggested ~0.3% tunnel noise,
    # previously unquantified)
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, loss, key = step(params, opt_state, key)
        jax.block_until_ready(loss)
        rates.append(num_rays * steps / (time.perf_counter() - t0))
    rates.sort()
    rays_per_sec = rates[len(rates) // 2]
    return {
        "metric": f"rays_per_sec_per_chip_fwd_bwd_{num_coarse}+{num_fine}",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / ESTIMATED_REFERENCE_RAYS_PER_SEC,
                             3),
        "band_min": round(rates[0], 1),
        "band_max": round(rates[-1], 1),
        "band_rel_spread": round((rates[-1] - rates[0]) / rays_per_sec, 4),
    }


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true",
                    help="fused Pallas forward trunk")
    ap.add_argument("--pallas-bwd", action="store_true",
                    help="fused Pallas fwd+bwd kernel pair")
    ap.add_argument("--pallas-hybrid", action="store_true",
                    help="XLA forward + stored-activation Pallas backward")
    ap.add_argument("--layer-bwd", action="store_true",
                    help="single-pass Pallas backward per linear+relu layer")
    ap.add_argument("--no-tail-sigma", action="store_true",
                    help="force the reference fc_out column order")
    ap.add_argument("--tail-sigma", action="store_true",
                    help="force the [feat | sigma] column permutation")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=256,
                    help="MLP hidden size (lever-menu sweeps; flagship 256)")
    ap.add_argument("--coarse", type=int, default=64,
                    help="coarse samples/ray (flagship configs use 32)")
    ap.add_argument("--fine", type=int, default=64,
                    help="fine samples/ray (flagship configs use 128)")
    ap.add_argument("--watchdog-minutes", type=float, default=25.0,
                    help="abort if no result within this long (wedged "
                         "TPU tunnel); 0 disables")
    a = ap.parse_args()
    if a.watchdog_minutes:
        _arm_watchdog(a.watchdog_minutes)
    # fc_out_tail_sigma is SHAPE-DEPENDENT (PERF.md session 8): +4.2% at the
    # flagship train shape 16384x(32+128) where it landed, but -1.4% at this
    # bench's 64+64 shape (175.4k vs 177.9k, non-overlapping bands) — it was
    # the main component of the round-2 headline drift.  Default: the
    # measured winner for the requested shape; --tail-sigma/--no-tail-sigma
    # force either.  The runtime config default stays ON because training
    # runs at the flagship shape.
    if a.no_tail_sigma:
        tail = False
    elif a.tail_sigma:
        tail = True
    else:
        tail = a.fine >= 96
    print(json.dumps(run_bench(num_rays=a.rays, hidden=a.hidden,
                               num_coarse=a.coarse, num_fine=a.fine,
                               use_pallas=a.pallas or a.pallas_bwd,
                               pallas_backward=a.pallas_bwd,
                               pallas_hybrid=a.pallas_hybrid,
                               pallas_layer_bwd=a.layer_bwd,
                               fc_out_tail_sigma=tail)))
