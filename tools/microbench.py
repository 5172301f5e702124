#!/usr/bin/env python
"""Decompose the train-step time: sampling vs MLP vs volume render vs bwd.

One process, several jits, prints per-component times at the bench shapes
(8192 rays, 64 coarse + 64 fine, CodeNeRF 256/256).
"""

import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from codenerf_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from codenerf_tpu.config.schema import (
    Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
    PointSamplerConfig, RuntimeConfig,
)
from codenerf_tpu.ops.sampling import base_z_vals, sample_stratified, sample_pdf
from codenerf_tpu.ops.volume_render import volume_render
from codenerf_tpu.pipeline import RenderSettings, render_rays, init_model, _forward
from codenerf_tpu.models import init_code_tables, lookup_codes


def timed(name, fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:40s} {dt*1000:8.2f} ms")
    return dt


def main(use_pallas=True, pallas_hybrid=False):
    R, S_C, S_F, H, C = 8192, 64, 64, 256, 256
    cfg = Config(
        models=ModelsConfig(
            nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=H),
            nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=H),
            embedding=EmbeddingSpec(shape_code_size=C, texture_code_size=C)),
        nerf=NerfConfig(point_sampler=PointSamplerConfig(
            num_coarse=S_C, num_fine=S_F, near_limit=0.8, far_limit=1.8,
            perturb=True)),
        runtime=RuntimeConfig(compute_dtype="bfloat16",
                              use_pallas=use_pallas,
                              pallas_hybrid=pallas_hybrid),
    )
    settings = RenderSettings.from_config(cfg)
    kc, kf, kt = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"coarse": init_model(kc, settings.coarse_cfg),
              "fine": init_model(kf, settings.fine_cfg)}
    codes = init_code_tables(kt, 2458, C, C)

    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    rd = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 2458, size=(R,)), jnp.int32)
    z_s, z_t = lookup_codes(codes, ids)
    key = jax.random.PRNGKey(1)
    target = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)

    print(f"use_pallas={use_pallas} pallas_hybrid={pallas_hybrid} "
          f"backend={jax.default_backend()}")

    # sampling only
    zg = base_z_vals(S_C, 0.8, 1.8, "lindepth")
    @jax.jit
    def sampling(key):
        k1, k2 = jax.random.split(key)
        pts_c, z_c = sample_stratified(k1, ro, rd, zg, True)
        w = jnp.abs(jax.random.normal(k1, (R, S_C - 2)))
        pts_f, z_f = sample_pdf(k2, ro, rd, w, z_c, S_F, True)
        return pts_f
    timed("sampling (stratified+pdf+sort)", sampling, key)

    # coarse MLP fwd only
    @jax.jit
    def mlp_coarse(key):
        k1, _ = jax.random.split(key)
        pts_c, z_c = sample_stratified(k1, ro, rd, zg, True)
        return _forward(params["coarse"], settings.coarse_cfg, settings,
                        pts_c, rd, z_s, z_t)
    timed("coarse sample+MLP fwd (64 samp)", mlp_coarse, key)

    # full fwd
    @jax.jit
    def full_fwd(key):
        out_c, out_f = render_rays(params, settings, ro, rd, z_s, z_t, key,
                                   True)
        return out_f.rgb
    timed("full render fwd (coarse+fine)", full_fwd, key)

    # volume render fwd+bwd alone (random radiance field)
    from codenerf_tpu.ops.volume_render import volume_render
    raw = jnp.asarray(rng.normal(size=(R, S_C + S_F, 4)), jnp.float32)
    zv = jnp.sort(jnp.asarray(rng.uniform(0.8, 1.8, size=(R, S_C + S_F)),
                              jnp.float32), axis=-1)

    @jax.jit
    def vr_bwd(raw):
        return jax.grad(lambda r: jnp.sum(volume_render(r, zv, rd).rgb))(raw)
    timed("volume render fwd+bwd (128 samp)", vr_bwd, raw)

    # encoding fwd+bwd alone
    from codenerf_tpu.core.encoding import positional_encoding
    pts = jnp.asarray(rng.uniform(-1, 1, size=(R, S_C + S_F, 3)), jnp.float32)

    @jax.jit
    def enc_bwd(pts):
        return jax.grad(lambda p: jnp.sum(positional_encoding(p, 10)))(pts)
    timed("posenc fwd+bwd (128 samp)", enc_bwd, pts)

    # MLP trunk fwd+bwd alone (fine-pass shape)
    from codenerf_tpu.models.ray_structured import apply_codenerf_rays
    enc = positional_encoding(pts, 10)
    de = jnp.asarray(rng.normal(size=(R, settings.coarse_cfg.dim_dir)),
                     jnp.float32)

    if pallas_hybrid:
        from codenerf_tpu.ops.fused import make_hybrid_codenerf
        hyb = make_hybrid_codenerf(settings.coarse_cfg, 10, True, True)

        @jax.jit
        def mlp_bwd(p, zs):
            def f(p, zs):
                return jnp.sum(hyb(p, pts, de, zs, zs) ** 2)
            return jax.grad(f, argnums=(0, 1))(p, zs)
    else:
        @jax.jit
        def mlp_bwd(p, zs):
            def f(p, zs):
                return jnp.sum(apply_codenerf_rays(
                    p, settings.coarse_cfg, enc, de, zs, zs) ** 2)
            return jax.grad(f, argnums=(0, 1))(p, zs)
    timed("MLP trunk fwd+bwd (128 samp)", mlp_bwd, params["coarse"], z_s)

    # full fwd+bwd (loss over params+codes)
    def loss_fn(p, cds, key):
        zs, zt = lookup_codes(cds, ids)
        out_c, out_f = render_rays(p, settings, ro, rd, zs, zt, key, True)
        return (jnp.mean((out_c.rgb - target) ** 2)
                + jnp.mean((out_f.rgb - target) ** 2))
    grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    dt = timed("full fwd+bwd", grad_fn, params, codes, key)
    print(f"{'-> rays/s (fwd+bwd only)':40s} {R/dt:10.0f}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--hybrid", action="store_true",
                    help="stored-activation Pallas backward")
    a = ap.parse_args()
    main(use_pallas=not a.no_pallas and not a.hybrid,
         pallas_hybrid=a.hybrid)
