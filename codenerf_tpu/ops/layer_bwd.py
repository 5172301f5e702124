"""Single-pass Pallas backward for the fused linear+relu layer on TPU.

Profiling the bench train step (tools/xprof_summary.py) shows XLA's
backward for each trunk layer makes THREE passes over the [R*S, hidden]
arrays: a fusion that materializes the relu-masked cotangent ``gp`` (plus
the bias grad), the dx matmul that reads ``gp`` back, and the dw matmul
that reads it a third time — ~6 ms per fine-pass layer against a ~2.6 ms
single-pass HBM floor.  This kernel emits dx, dw and db in ONE pass:
``y``, ``g`` and ``x`` are each read exactly once, ``gp`` lives only in
VMEM, and dw/db accumulate in f32 output refs revisited across the
sequential grid.

Unlike the monolithic trunk backward (ops/fused.py) — whose ~dozen live
[rows, 256] temporaries spill Mosaic's vector registers at useful tile
sizes (PERF.md tile sweep) — the live set here is ~5 tiles and 2 matmuls.

Gradient math mirrors models/ray_structured.py::_dot_add_relu_bwd
exactly (same cast points):

    gp = where(y > 0, g, 0).astype(cd)
    dx = gp @ w.T            (cd inputs, f32 MXU accum, cast to x.dtype)
    dw = x.T @ gp            (cd inputs, f32 accum, f32 out)
    db = sum(gp.astype(f32)) over the axes b does not carry
         ([1, N] for a plain bias; per-ray [R, 1, N] rows get an MXU
          segment-sum over each ray's S samples)

The relu mask compares in f32 (Mosaic on v5e rejects bf16 vector cmpf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(M: int, S: int, target: int) -> int:
    """Largest row-tile <= target that divides M, is a multiple of 8
    (sublane legality) and of S (per-ray bias tiles hold whole rays)."""
    step = S if S > 1 else 8
    # lcm(step, 8) keeps both constraints for any S
    g = 8
    while step % g:
        g //= 2
    unit = step * (8 // g)
    t = max(unit, (min(target, M) // unit) * unit)
    while t >= unit:
        if M % t == 0:
            return t
        t -= unit
    return M  # tiny inputs / interpret mode: one tile


def linear_relu_bwd_pallas(x, w, b, y, g, cd, *, tile_rows: int = 8192,
                           vmem_limit: int | None = 100 * 1024 * 1024):
    """Backward of y = relu(x @ w + b).

    Args:
      x: [.., K] input (any leading batch dims, flattened internally).
      w: [K, N] weight (master dtype, typically f32).
      b: [N] bias or [R, 1, N] per-ray conditioning rows (x then [R, S, K]).
      y: forward output (post-relu), same leading shape as x with last N.
      g: cotangent of y.
      cd: compute dtype (None -> x.dtype).
    Returns (dx, dw, db) with dtypes (x.dtype, w.dtype, b.dtype).
    """
    ct = jnp.dtype(cd) if cd is not None else x.dtype
    per_ray = b.ndim == 3
    K, N = w.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    S = x.shape[-2] if per_ray else 1
    xf = x.reshape(M, K)
    yf = y.reshape(M, N)
    gf = g.reshape(M, N)

    T = _pick_rows(M, S, tile_rows)
    grid = M // T
    tr = T // S  # rays per tile (per-ray mode)

    def kernel(x_ref, w_ref, y_ref, g_ref, dx_ref, dw_ref, db_ref):
        gp = jnp.where(y_ref[:].astype(jnp.float32) > 0, g_ref[:], 0
                       ).astype(ct)
        wc = w_ref[:].astype(ct)
        dx_ref[:] = jax.lax.dot_general(
            gp, wc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        dw = jax.lax.dot_general(
            x_ref[:].astype(ct), gp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if per_ray:
            # db rows are per-ray sums over each ray's S samples: one
            # [tr, T] segment matrix matmul on the MXU
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, T), 0)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, T), 1)
            seg = (col_ids // S == row_ids).astype(jnp.float32)
            db_ref[:] = jnp.dot(seg, gp.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        else:
            db = jnp.sum(gp.astype(jnp.float32), axis=0, keepdims=True)

        is_first = pl.program_id(0) == 0

        @pl.when(is_first)
        def _():
            dw_ref[:] = dw
            if not per_ray:
                db_ref[:] = db

        @pl.when(jnp.logical_not(is_first))
        def _():
            dw_ref[:] = dw_ref[:] + dw
            if not per_ray:
                db_ref[:] = db_ref[:] + db

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def rows(d):
        return pl.BlockSpec((T, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    if per_ray:
        db_shape = jax.ShapeDtypeStruct((M // S, N), jnp.float32)
        db_spec = pl.BlockSpec((tr, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    else:
        db_shape = jax.ShapeDtypeStruct((1, N), jnp.float32)
        db_spec = const((1, N))

    dxf, dw, db = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[rows(K), const(w.shape), rows(N), rows(N)],
        out_specs=(rows(K), const(w.shape), db_spec),
        out_shape=(jax.ShapeDtypeStruct((M, K), x.dtype),
                   jax.ShapeDtypeStruct(w.shape, jnp.float32),
                   db_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
    )(xf, w, yf, gf)

    gb = db.reshape(b.shape) if per_ray else db[0]
    return dxf.reshape(x.shape), dw.astype(w.dtype), gb.astype(b.dtype)
