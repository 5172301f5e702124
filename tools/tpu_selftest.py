#!/usr/bin/env python
"""Compiled-kernel self-test: every opt-in kernel family vs XLA, on device.

CI exercises the Pallas kernels in interpreter mode on CPU
(tests/test_fused.py, tests/test_layer_bwd.py), which provably misses
Mosaic-compilation bugs — e.g. the MXU default-precision encode-band
scrambling found in round 1 (PERF.md session 3) only appears in compiled
kernels on real hardware.  This script closes that gap (VERDICT.md round 1,
"next round" item 5): one process, one pass over every opt-in family,
checksum-asserted against the XLA path compiled in the same process.

Families (runtime flags they guard):
  fused_fwd    -- use_pallas: fused Pallas trunk forward
  fused_bwd    -- pallas_backward: fully fused fwd+bwd kernel pair
  hybrid       -- pallas_hybrid: XLA fwd + stored-activation Pallas bwd
  layer_bwd    -- pallas_layer_bwd: single-pass per-layer backward
  int8         -- int8_serving: s8xs8 trunk matmuls, int8 activation chain

Usage (real TPU; each family's first compile takes minutes on the tunnel):
  python tools/tpu_selftest.py                 # all families
  python tools/tpu_selftest.py --families fused_fwd,int8
  python tools/tpu_selftest.py --platform cpu  # interpreter-free CPU check

Exit code 0 iff every requested family matches XLA within tolerance.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _inputs(cfg, R, S, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(R, S, 3)), jnp.float32)
    dir_enc = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)), jnp.float32)
    z_s = jnp.asarray(rng.normal(size=(R, cfg.shape_code_size)) * 0.3,
                      jnp.float32)
    z_t = jnp.asarray(rng.normal(size=(R, cfg.texture_code_size)) * 0.3,
                      jnp.float32)
    return pts, dir_enc, z_s, z_t


# ---------------------------------------------------------------------------
# Metric: worst-leaf relative RMS against a HIGHEST-precision reference,
# budgeted against the XLA path's own low-precision noise.
#
# Round-3 postmortem (PERF.md session 8): the original metric compared the
# compiled kernel against the DEFAULT-precision XLA path with an elementwise
# max-rel and a 1e-3 denominator floor.  On TPU, default-precision f32
# matmuls run through the MXU's bf16 passes, so BOTH sides of that
# comparison carry ~7% relRMS noise on the worst gradient leaves; the round-2
# dw-as-dot_general rewrite changed the XLA side's rounding pattern,
# decorrelated the noise, and the metric exploded (9.1 "rel err") with NO
# actual bug — at highest precision the same VJPs match a pure-autodiff
# oracle to 1e-6.  The honest question is "is the compiled kernel within the
# low-precision noise the XLA path itself pays?", so each family now reports
#   err  = worst-leaf relRMS(kernel, highest-precision reference)
#   gate = max(1.5 x worst-leaf relRMS(default-precision XLA, same ref), floor)
# which is self-calibrating across shapes and jax versions.
# ---------------------------------------------------------------------------

NOISE_MULT = 1.5
FLOOR = 1e-4


def _rel_rms(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def _tree_rel_rms(got, want):
    import jax
    worst = 0.0
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        if a is None or b is None:
            continue
        worst = max(worst, _rel_rms(a, b))
    return worst


def check_fused_fwd(cfg, R, S):
    import jax
    from codenerf_tpu.models import init_codenerf
    from codenerf_tpu.ops.fused import make_fused_codenerf
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    fused = make_fused_codenerf(cfg, cfg.num_encoding_fn_xyz,
                                cfg.include_input_xyz, True, tile_rows=256)
    pts, dir_enc, z_s, z_t = _inputs(cfg, R, S)
    got = jax.jit(fused)(params, pts, dir_enc, z_s, z_t)
    xla = jax.jit(fused.xla_reference)(params, pts, dir_enc, z_s, z_t)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(fused.xla_reference)(params, pts, dir_enc, z_s, z_t)
    return _rel_rms(got, want), _rel_rms(xla, want)


def _check_grad_family(cfg, R, S, **make_kw):
    import jax
    import jax.numpy as jnp
    from codenerf_tpu.models import init_codenerf
    from codenerf_tpu.ops.fused import (make_fused_codenerf,
                                        make_hybrid_codenerf)
    params = init_codenerf(jax.random.PRNGKey(1), cfg)
    if make_kw.pop("hybrid", False):
        fn = make_hybrid_codenerf(cfg, cfg.num_encoding_fn_xyz,
                                  cfg.include_input_xyz, True, **make_kw)
    else:
        fn = make_fused_codenerf(cfg, cfg.num_encoding_fn_xyz,
                                 cfg.include_input_xyz, True, **make_kw)
    pts, dir_enc, z_s, z_t = _inputs(cfg, R, S, seed=1)
    wgt = jnp.asarray(np.random.default_rng(9).normal(size=(R, S, 4)),
                      jnp.float32)

    def loss(f):
        return lambda p, zs, zt, de, pt: jnp.sum(wgt * f(p, pt, de, zs, zt))

    got = jax.jit(jax.grad(loss(fn), argnums=(0, 1, 2, 3, 4)))(
        params, z_s, z_t, dir_enc, pts)
    xla = jax.jit(jax.grad(loss(fn.xla_reference),
                           argnums=(0, 1, 2, 3, 4)))(
        params, z_s, z_t, dir_enc, pts)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(jax.grad(loss(fn.xla_reference),
                                argnums=(0, 1, 2, 3, 4)))(
            params, z_s, z_t, dir_enc, pts)
    return _tree_rel_rms(got, want), _tree_rel_rms(xla, want)


def check_fused_bwd(cfg, R, S):
    return _check_grad_family(cfg, R, S, tile_rows=256,
                              pallas_backward=True)


def check_hybrid(cfg, R, S):
    return _check_grad_family(cfg, R, S, hybrid=True, tile_rows_bwd=256)


def check_layer_bwd(cfg, R, S):
    import jax
    import jax.numpy as jnp
    from codenerf_tpu.ops import layer_bwd as lb
    rng = np.random.default_rng(3)
    K, N = 128, 128
    x = jnp.asarray(rng.normal(size=(R, S, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(R, S, N)), jnp.float32)

    def op_pallas(x, w, b, g):
        y = jnp.maximum(x @ w + b, 0.0)
        return lb.linear_relu_bwd_pallas(x, w, b, y, g, None, tile_rows=256)

    def op_xla(x, w, b, g):
        def f(x, w, b):
            return jnp.sum(jnp.maximum(x @ w + b, 0.0) * g)
        return jax.grad(f, argnums=(0, 1, 2))(x, w, b)

    got = jax.jit(op_pallas)(x, w, b, g)
    xla = jax.jit(op_xla)(x, w, b, g)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(op_xla)(x, w, b, g)
    return _tree_rel_rms(got, want), _tree_rel_rms(xla, want)


def check_int8(cfg, R, S):
    import jax
    from codenerf_tpu.core.encoding import positional_encoding
    from codenerf_tpu.models import init_codenerf
    from codenerf_tpu.models.quantized import (apply_codenerf_rays_q,
                                               quantize_codenerf,
                                               trunk_activation_amax)
    from codenerf_tpu.models.ray_structured import apply_codenerf_rays
    params = init_codenerf(jax.random.PRNGKey(2), cfg)
    pts, dir_enc, z_s, z_t = _inputs(cfg, R, S, seed=2)
    xyz_enc = positional_encoding(pts, cfg.num_encoding_fn_xyz,
                                  cfg.include_input_xyz, True)
    amax = trunk_activation_amax(params, cfg, xyz_enc, dir_enc, z_s, z_t)
    qparams = quantize_codenerf(params, cfg, amax)
    got = np.asarray(jax.jit(
        lambda *a: apply_codenerf_rays_q(qparams, cfg, *a))(
        xyz_enc, dir_enc, z_s, z_t), np.float64)
    want = np.asarray(jax.jit(
        lambda *a: apply_codenerf_rays(params, cfg, *a))(
        xyz_enc, dir_enc, z_s, z_t), np.float64)
    # int8 is approximate by design (render-grade, not elementwise-tight):
    # judge it on relative RMS energy, which is what PSNR measures
    return float(np.linalg.norm(got - want) / np.linalg.norm(want))


# family -> (check_fn, tolerance on max relative error)
# family -> check_fn.  Grad/fwd families return (err, xla_noise) and pass
# iff err <= max(NOISE_MULT * xla_noise, FLOOR); int8 returns a single
# energy ratio judged against a fixed 0.05 (approximate by design).
FAMILIES = {
    "fused_fwd": check_fused_fwd,
    "fused_bwd": check_fused_bwd,
    "hybrid": check_hybrid,
    "layer_bwd": check_layer_bwd,
    "int8": check_int8,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--families", default=",".join(FAMILIES),
                    help="comma-separated subset of: %s" % ",".join(FAMILIES))
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu for a smoke run)")
    ap.add_argument("--rays", type=int, default=256)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from codenerf_tpu.models import CodeNeRFConfig

    print("platform:", jax.devices()[0].platform, jax.devices()[0],
          flush=True)
    if jax.devices()[0].platform != "tpu":
        # Mosaic only lowers on TPU; everywhere else run the kernels in
        # interpreter mode (the compiled-path check this script exists for
        # is then a no-op, but the harness itself stays smoke-testable).
        import jax.experimental.pallas as pl
        from codenerf_tpu.ops import fused as fused_mod
        from codenerf_tpu.ops import layer_bwd as lb_mod
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw.setdefault("interpret", True)
            return orig(*a, **kw)

        fused_mod.pl.pallas_call = interp
        lb_mod.pl.pallas_call = interp
        print("NOTE: non-TPU platform -> interpret mode (smoke only)",
              flush=True)
    # num_encoding_fn_xyz=10 exercises the high encode bands where the
    # round-1 MXU default-precision bug lived (PERF.md session 3)
    cfg = CodeNeRFConfig(hidden_size=args.hidden, shape_code_size=64,
                         texture_code_size=64, num_encoding_fn_xyz=10,
                         num_encoding_fn_dir=4)

    failures = []
    for name in [f.strip() for f in args.families.split(",") if f.strip()]:
        if name not in FAMILIES:
            print(f"unknown family {name!r}; have {list(FAMILIES)}")
            return 2
        fn = FAMILIES[name]
        t0 = time.time()
        try:
            res = fn(cfg, args.rays, args.samples)
        except Exception as e:  # compile or runtime failure is a failure
            print(f"[{name}] ERROR after {time.time()-t0:.0f}s: {e!r}",
                  flush=True)
            failures.append(name)
            continue
        if name == "int8":
            err, tol = res, 0.05
            ok = err <= tol
            print(f"[{name}] rel_rms_energy={err:.2e} tol={tol:.0e} "
                  f"{'OK' if ok else 'FAIL'} ({time.time()-t0:.0f}s)",
                  flush=True)
        else:
            err, xla_noise = res
            tol = max(NOISE_MULT * xla_noise, FLOOR)
            ok = err <= tol
            print(f"[{name}] rel_rms={err:.2e} xla_noise={xla_noise:.2e} "
                  f"gate={tol:.2e} {'OK' if ok else 'FAIL'} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if not ok:
            failures.append(name)
    if failures:
        print("SELFTEST FAIL:", ",".join(failures))
        return 1
    print("SELFTEST PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
