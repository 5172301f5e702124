"""Pallas fused ray-march trunk for the CodeNeRF MLP.

One kernel per ray tile computes, entirely in VMEM:

    positional encode (as matmul + sin/cos)  ->  6 per-sample linears
    with per-ray conditioning broadcast-added  ->  raw [T*S, 4]

This removes the inter-layer HBM round trips the XLA path pays (each matmul
output [R*S, hidden] otherwise travels HBM->VMEM->HBM between kernels) and
never materializes the [R*S, dim_xyz] positional encoding.

Encoding-as-matmul trick: sin(x * f_k) for all (coord, band) pairs equals
sin(pts @ E) for a fixed [3, 3F] selection matrix E with
E[c, 3k + c] = f_k — the whole Fourier feature map is one tiny MXU matmul
plus VPU sin/cos, and layer 1 becomes three matmuls whose weight rows are
permuted on the host to match (the exact reference feature order,
position_embed.py:44-53 — verified by the parity test).

The per-ray halves of every concat layer (latent-code and view-direction
conditioning) are computed OUTSIDE the kernel as [R, .] matmuls (see
models/ray_structured.py for the factoring identity) and enter the kernel as
per-ray bias rows, broadcast across the S samples in VMEM.

Gradients — two modes:

  * default: custom VJP whose backward recomputes through the XLA
    ray-structured path — functionally identical (allclose-tested) and
    rematerialized, so the Pallas kernel only needs a forward
    implementation.
  * ``pallas_backward=True``: a second Pallas kernel recomputes the whole
    forward IN VMEM and backpropagates in the same kernel, emitting input
    grads, per-ray conditioning grads (summed over the sample axis by an
    MXU segment-sum matmul), and f32 weight-grad accumulators carried
    across the sequential grid (init at tile 0, += thereafter).  The
    fwd+bwd pair never materializes an inter-layer activation in HBM —
    the lever PERF.md's roofline analysis identifies for the
    HBM-bandwidth-bound layer chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codenerf_tpu.core.encoding import frequency_bands, positional_encoding
from codenerf_tpu.models.mlp import CodeNeRFConfig
from codenerf_tpu.models.ray_structured import apply_codenerf_rays, _mm


def _encode_matrix(num_freq: int, log_sampling: bool, dtype=jnp.float32):
    """E [3, 3F] with E[c, 3k+c] = band_k (see module docstring)."""
    bands = frequency_bands(num_freq, log_sampling, dtype)          # [F]
    eye3 = jnp.eye(3, dtype=dtype)
    return (bands[None, :, None] * eye3[:, None, :]).reshape(3, 3 * num_freq)


def _split_layer1(params, cfg: CodeNeRFConfig):
    """Permute layer_xyz1 rows into (x | sin | cos) blocks matching the
    encode-matrix column order.  Reference row order is
    [x(3), sin f0(3), cos f0(3), sin f1(3), ...]."""
    w1 = params["layer_xyz1"]["w"]          # [dim_xyz, h]
    F = cfg.num_encoding_fn_xyz
    off = 3 if cfg.include_input_xyz else 0
    w1x = w1[:off] if off else None
    sin_rows = jnp.asarray([off + 6 * f + c for f in range(F)
                            for c in range(3)])
    cos_rows = sin_rows + 3
    return w1x, w1[sin_rows], w1[cos_rows], params["layer_xyz1"]["b"]


def _trunk_kernel(pts_ref, zs1p_ref, featp_ref, sigp_ref, dirp_ref,
                  zt1p_ref, b1_ref,
                  w1x_ref, w1s_ref, w1c_ref, e_ref,
                  w2_ref, wof_ref, wos_ref, wd_ref, wd2_ref, bd2_ref,
                  wr_ref, out_ref, *, S: int, compute_dtype, has_w1x: bool):
    """One ray tile: [T, S, 3] points -> [T, S, 4] raw radiance.

    All activations live in VMEM/registers; matmuls run on the MXU in
    ``compute_dtype`` with f32 accumulation.
    """
    T = pts_ref.shape[0]
    cd = compute_dtype

    def mm(x, w):
        # Mosaic requires a 32-bit accumulator; cast the result down so
        # every stored intermediate stays at half width
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32).astype(cd)

    def rep(per_ray):
        # [T, d] -> [T*S, d]: each ray's row repeated for its S samples
        return jnp.broadcast_to(per_ray[:, None, :].astype(cd),
                                (T, S, per_ray.shape[-1])
                                ).reshape(T * S, per_ray.shape[-1])

    # The encode matmul must run at HIGHEST precision: at the MXU's
    # default (bf16-truncated) input precision the high-frequency bands
    # (f up to 2^(F-1)) acquire O(f * eps_bf16) = O(1 rad) phase error
    # and sin/cos decorrelate entirely (measured: 2.8 abs error at
    # default vs 7e-5 at HIGHEST for f<=512).
    pts = pts_ref[:].reshape(T * S, 3)
    scaled = jax.lax.dot_general(
        pts, e_ref[:].astype(pts.dtype), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                     # [T*S, 3F]
    h = mm(jnp.sin(scaled), w1s_ref[:]) + mm(jnp.cos(scaled), w1c_ref[:])
    if has_w1x:
        h = h + mm(pts, w1x_ref[:])
    h = jax.nn.relu(h + rep(b1_ref[:]))

    h = jax.nn.relu(mm(h, w2_ref[:]) + rep(zs1p_ref[:]))
    feat = mm(h, wof_ref[:]) + rep(featp_ref[:])
    sigma = mm(h, wos_ref[:]).astype(jnp.float32) + rep(
        sigp_ref[:]).astype(jnp.float32)

    v = jax.nn.relu(mm(feat, wd_ref[:]) + rep(dirp_ref[:]))
    v = jax.nn.relu(mm(v, wd2_ref[:]) + bd2_ref[:].astype(cd))
    rgb = mm(v, wr_ref[:]).astype(jnp.float32) + rep(
        zt1p_ref[:]).astype(jnp.float32)

    out_ref[:] = jnp.concatenate(
        [rgb, sigma], axis=-1).astype(jnp.float32).reshape(T, S, 4)


def _trunk_pallas(pts, per_ray, weights, b1_rows, *, S: int, T: int,
                  compute_dtype, vmem_limit: int | None = None):
    """pallas_call wrapper.  pts [R, S, 3]; R must be a multiple of T."""
    R = pts.shape[0]
    has_w1x = weights["w1x"] is not None

    def ray_block(d):
        return pl.BlockSpec((T, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    names = (["w1x"] if has_w1x else []) + [
        "w1s", "w1c", "E", "w2", "wof", "wos", "wd", "wd2", "bd2", "wr"]
    weight_list = [weights[k] for k in names]

    if has_w1x:
        kern = partial(_trunk_kernel, S=S, compute_dtype=compute_dtype,
                       has_w1x=True)
    else:
        def kern(pts_ref, zs1p, featp, sigp, dirp, zt1p, b1,
                 w1s, w1c, e, w2, wof, wos, wd, wd2, bd2, wr, out_ref):
            return _trunk_kernel(pts_ref, zs1p, featp, sigp, dirp, zt1p,
                                 b1, None, w1s, w1c, e, w2, wof, wos, wd,
                                 wd2, bd2, wr, out_ref, S=S,
                                 compute_dtype=compute_dtype, has_w1x=False)

    in_specs = (
        [pl.BlockSpec((T, S, 3), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)]
        + [ray_block(per_ray[k].shape[-1])
           for k in ("zs1p", "featp", "sigp", "dirp", "zt1p")]
        + [ray_block(b1_rows.shape[-1])]
        + [full(w) for w in weight_list])

    return pl.pallas_call(
        kern,
        grid=(R // T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, S, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, S, 4), jnp.float32),
        # "arbitrary" (sequential) grid semantics let Mosaic keep the
        # constant-index weight blocks resident across grid steps instead
        # of re-fetching them per tile
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
    )(pts, per_ray["zs1p"], per_ray["featp"], per_ray["sigp"],
      per_ray["dirp"], per_ray["zt1p"], b1_rows, *weight_list)


def _trunk_bwd_impl(ins: dict, outs: dict, *, S: int, compute_dtype,
                    has_w1x: bool, stored: bool):
    """Fused backward for one ray tile — two activation sources:

    * ``stored=False``: recompute the §3.4 forward chain (reference
      nerf/__init__.py:94-134, model.py:160-194) entirely in VMEM, then
      backpropagate (zero activation HBM traffic, 1x extra forward FLOPs).
    * ``stored=True``: read the bf16 activations the XLA forward already
      stored (``h1 h2 feat v1 v2`` tile refs) and only backpropagate —
      the cotangent chain never touches HBM and no recompute is paid;
      only the cheap encode stage (sin/cos of pts) is rederived in-kernel.

    Weight gradients accumulate in f32 output refs revisited by every grid
    step (sequential "arbitrary" grid); per-ray conditioning grads are
    summed over the S samples of each ray with a single [T, T*S]
    segment-sum matmul on the MXU.
    """
    pts_ref = ins["pts"]
    zs1p_ref, featp_ref, sigp_ref = ins["zs1p"], ins["featp"], ins["sigp"]
    dirp_ref, zt1p_ref, b1_ref = ins["dirp"], ins["zt1p"], ins["b1"]
    w1x_ref = ins.get("w1x")
    w1s_ref, w1c_ref, e_ref = ins["w1s"], ins["w1c"], ins["E"]
    w2_ref, wof_ref, wos_ref = ins["w2"], ins["wof"], ins["wos"]
    wd_ref, wd2_ref, bd2_ref, wr_ref = (ins["wd"], ins["wd2"], ins["bd2"],
                                        ins["wr"])
    g_ref = ins["g"]
    gpts_ref = outs["g_pts"]
    gzs1p_ref, gfeatp_ref, gsigp_ref = (outs["gzs1p"], outs["gfeatp"],
                                        outs["gsigp"])
    gdirp_ref, gzt1p_ref, db1_ref = outs["gdirp"], outs["gzt1p"], outs["db1"]
    dw1x_ref = outs.get("dw1x")
    dw1s_ref, dw1c_ref, dw2_ref = outs["dw1s"], outs["dw1c"], outs["dw2"]
    dwof_ref, dwos_ref, dwd_ref = outs["dwof"], outs["dwos"], outs["dwd"]
    dwd2_ref, dbd2_ref, dwr_ref = outs["dwd2"], outs["dbd2"], outs["dwr"]

    T = pts_ref.shape[0]
    cd = compute_dtype
    relu = jax.nn.relu

    def mm(x, w):
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32).astype(cd)

    def mm_t(g, w):
        # g @ w^T (cotangent through y = x @ w), cd in / cd out
        return jax.lax.dot_general(
            g.astype(cd), w.astype(cd),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cd)

    def d_w(x, g):
        # x^T @ g with f32 accumulation (weight-grad contribution)
        return jax.lax.dot_general(
            x.astype(cd), g.astype(cd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def rep(per_ray):
        return jnp.broadcast_to(per_ray[:, None, :].astype(cd),
                                (T, S, per_ray.shape[-1])
                                ).reshape(T * S, per_ray.shape[-1])

    # Segment-sum matrix: seg[r, i] = 1 iff row i belongs to ray r, so
    # seg @ x == per-ray sum over the S samples — one small MXU matmul
    # instead of a 3-D reshape+reduce (friendlier to Mosaic).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T * S), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T * S), 1)
    seg_f32 = (col_ids // S == row_ids).astype(jnp.float32)
    seg_cd = seg_f32.astype(cd)

    def ray_sum_f32(x):
        return jnp.dot(seg_f32, x, preferred_element_type=jnp.float32)

    def ray_sum(x):
        return jnp.dot(seg_cd, x.astype(cd),
                       preferred_element_type=jnp.float32)

    # ---- activations: recompute in VMEM, or read the stored bf16 set ----
    # HIGHEST precision on the encode matmul: see _trunk_kernel — default
    # MXU input truncation puts O(1 rad) phase error on the high bands.
    pts = pts_ref[:].reshape(T * S, 3)
    scaled = jax.lax.dot_general(
        pts, e_ref[:].astype(pts.dtype), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    sn, cs = jnp.sin(scaled), jnp.cos(scaled)
    if stored:
        h1 = ins["h1"][:]
        h2 = ins["h2"][:]
        feat = ins["feat"][:]
        v1 = ins["v1"][:]
        v2 = ins["v2"][:]
    else:
        h1 = mm(sn, w1s_ref[:]) + mm(cs, w1c_ref[:])
        if has_w1x:
            h1 = h1 + mm(pts, w1x_ref[:])
        h1 = relu(h1 + rep(b1_ref[:]))
        h2 = relu(mm(h1, w2_ref[:]) + rep(zs1p_ref[:]))
        feat = mm(h2, wof_ref[:]) + rep(featp_ref[:])
        v1 = relu(mm(feat, wd_ref[:]) + rep(dirp_ref[:]))
        v2 = relu(mm(v1, wd2_ref[:]) + bd2_ref[:].astype(cd))

    def live(act):
        # relu mask; the compare runs in f32 — Mosaic on v5e rejects bf16
        # vector cmpf
        return act.astype(jnp.float32) > 0

    # ---- backward ----
    g = g_ref[:].reshape(T * S, 4)
    g_rgb, g_sig = g[:, :3], g[:, 3:4]                    # f32

    gzt1p_ref[:] = ray_sum_f32(g_rgb)
    gsigp_ref[:] = ray_sum_f32(g_sig)

    g_v2 = jnp.where(live(v2), mm_t(g_rgb, wr_ref[:]), 0)
    g_v1 = jnp.where(live(v1), mm_t(g_v2, wd2_ref[:]), 0)
    gdirp_ref[:] = ray_sum(g_v1)
    g_feat = mm_t(g_v1, wd_ref[:])
    gfeatp_ref[:] = ray_sum(g_feat)
    g_h2 = jnp.where(live(h2),
                     mm_t(g_feat, wof_ref[:]) + mm_t(g_sig, wos_ref[:]), 0)
    gzs1p_ref[:] = ray_sum(g_h2)
    g_h1 = jnp.where(live(h1), mm_t(g_h2, w2_ref[:]), 0)

    g_sn = mm_t(g_h1, w1s_ref[:]).astype(jnp.float32)
    g_cs = mm_t(g_h1, w1c_ref[:]).astype(jnp.float32)
    g_scaled = g_sn * cs - g_cs * sn
    # HIGHEST: the band factors (up to 2^(F-1)) amplify default-precision
    # rounding under cross-band cancellation in the pts cotangent
    g_pts = jax.lax.dot_general(
        g_scaled, e_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    if has_w1x:
        g_pts = g_pts + mm_t(g_h1, w1x_ref[:]).astype(jnp.float32)
    gpts_ref[:] = g_pts.reshape(T, S, 3)

    # ---- weight-grad accumulators (revisited across the grid) ----
    acc = [(dw1s_ref, lambda: d_w(sn, g_h1)),
           (dw1c_ref, lambda: d_w(cs, g_h1)),
           (dw2_ref, lambda: d_w(h1, g_h2)),
           (dwof_ref, lambda: d_w(h2, g_feat)),
           (dwos_ref, lambda: d_w(h2, g_sig)),
           (dwd_ref, lambda: d_w(feat, g_v1)),
           (dwd2_ref, lambda: d_w(v1, g_v2)),
           (dwr_ref, lambda: d_w(v2, g_rgb)),
           (db1_ref, lambda: jnp.sum(g_h1.astype(jnp.float32), axis=0,
                                     keepdims=True)),
           (dbd2_ref, lambda: jnp.sum(g_v2.astype(jnp.float32), axis=0,
                                      keepdims=True))]
    if has_w1x:
        acc.append((dw1x_ref, lambda: d_w(pts, g_h1)))

    is_first = pl.program_id(0) == 0
    for ref, contrib in acc:
        val = contrib()

        @pl.when(is_first)
        def _(ref=ref, val=val):
            ref[:] = val

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, val=val):
            ref[:] = ref[:] + val


def _trunk_bwd_pallas(pts, per_ray, b1, weights, g, *, S: int, T: int,
                      compute_dtype, vmem_limit: int | None = None,
                      acts: dict | None = None):
    """pallas_call wrapper for the fused backward.

    ``acts``: optional dict of stored activations ``h1 h2 feat v1 v2``
    (each [R*S, d], compute dtype) — selects the stored-activation kernel
    (no forward recompute) instead of the recompute kernel.

    Returns (g_pts, g_per_ray dict, db1, dweights dict) — f32 grads for
    everything except the nondifferentiable encode matrix E.
    """
    R = pts.shape[0]
    h = b1.shape[0]
    has_w1x = weights["w1x"] is not None
    stored = acts is not None

    def ray_block(d):
        return pl.BlockSpec((T, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                            memory_space=pltpu.VMEM)

    def const_out(shape):
        return (jax.ShapeDtypeStruct(shape, jnp.float32),
                pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                             memory_space=pltpu.VMEM))

    def tile_out(shape, block):
        nd = len(block)
        return (jax.ShapeDtypeStruct(shape, jnp.float32),
                pl.BlockSpec(block,
                             lambda i: (i,) + tuple(0 for _ in range(nd - 1)),
                             memory_space=pltpu.VMEM))

    w_names = (["w1x"] if has_w1x else []) + [
        "w1s", "w1c", "E", "w2", "wof", "wos", "wd", "wd2", "bd2", "wr"]
    weight_list = [weights[k] for k in w_names]

    s_feat = per_ray["featp"].shape[-1]
    outs = {
        "g_pts": tile_out((R, S, 3), (T, S, 3)),
        "gzs1p": tile_out((R, h), (T, h)),
        "gfeatp": tile_out((R, s_feat), (T, s_feat)),
        "gsigp": tile_out((R, 1), (T, 1)),
        "gdirp": tile_out((R, h), (T, h)),
        "gzt1p": tile_out((R, 3), (T, 3)),
        "db1": const_out((1, h)),
        "dw1s": const_out(weights["w1s"].shape),
        "dw1c": const_out(weights["w1c"].shape),
        "dw2": const_out(weights["w2"].shape),
        "dwof": const_out(weights["wof"].shape),
        "dwos": const_out(weights["wos"].shape),
        "dwd": const_out(weights["wd"].shape),
        "dwd2": const_out(weights["wd2"].shape),
        "dbd2": const_out((1, weights["bd2"].shape[-1])),
        "dwr": const_out(weights["wr"].shape),
    }
    if has_w1x:
        outs["dw1x"] = const_out(weights["w1x"].shape)
    out_order = ["g_pts", "gzs1p", "gfeatp", "gsigp", "gdirp", "gzt1p",
                 "db1"] + (["dw1x"] if has_w1x else []) + [
                 "dw1s", "dw1c", "dw2", "dwof", "dwos", "dwd", "dwd2",
                 "dbd2", "dwr"]

    in_names = (["pts", "zs1p", "featp", "sigp", "dirp", "zt1p", "b1"]
                + w_names + ["g"]
                + (["h1", "h2", "feat", "v1", "v2"] if stored else []))

    def kern(*refs):
        ins = dict(zip(in_names, refs[:len(in_names)]))
        named_outs = dict(zip(out_order, refs[len(in_names):]))
        _trunk_bwd_impl(ins, named_outs, S=S, compute_dtype=compute_dtype,
                        has_w1x=has_w1x, stored=stored)

    in_specs = (
        [pl.BlockSpec((T, S, 3), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)]
        + [ray_block(per_ray[k].shape[-1])
           for k in ("zs1p", "featp", "sigp", "dirp", "zt1p")]
        + [ray_block(h)]                  # b1 as broadcast per-ray rows
        + [full(w) for w in weight_list]
        + [pl.BlockSpec((T, S, 4), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)])
    b1_rows = jnp.broadcast_to(b1[None, :], (R, h))
    operands = [pts, per_ray["zs1p"], per_ray["featp"], per_ray["sigp"],
                per_ray["dirp"], per_ray["zt1p"], b1_rows, *weight_list,
                g.astype(jnp.float32)]
    if stored:
        # stored activations arrive flattened [R*S, d]; tiles are
        # [T*S, d] row blocks (sublane dim T*S is a multiple of 8)
        for k in ("h1", "h2", "feat", "v1", "v2"):
            a = acts[k]
            operands.append(a)
            in_specs.append(pl.BlockSpec((T * S, a.shape[-1]),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))

    results = pl.pallas_call(
        kern,
        grid=(R // T,),
        in_specs=in_specs,
        out_specs=tuple(outs[k][1] for k in out_order),
        out_shape=tuple(outs[k][0] for k in out_order),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit),
    )(*operands)

    named = dict(zip(out_order, results))
    g_per_ray = {"zs1p": named["gzs1p"], "featp": named["gfeatp"],
                 "sigp": named["gsigp"], "dirp": named["gdirp"],
                 "zt1p": named["gzt1p"]}
    dweights = {"w1s": named["dw1s"], "w1c": named["dw1c"],
                "E": jnp.zeros_like(weights["E"]),
                "w2": named["dw2"], "wof": named["dwof"],
                "wos": named["dwos"], "wd": named["dwd"],
                "wd2": named["dwd2"], "bd2": named["dbd2"][0],
                "wr": named["dwr"],
                "w1x": named["dw1x"] if has_w1x else None}
    return named["g_pts"], g_per_ray, named["db1"][0], dweights


def _pick_tile(R, S, rows):
    """Ray-tile size T: Mosaic requires the [T, d] per-ray blocks'
    sublane dim be a multiple of 8 (f32) or the full array, so prefer
    the largest multiple-of-8 divisor of R with T*S <= rows; fall back
    to the TPU-legal minimum T=8 (slightly over the rows budget), then
    to any divisor (tiny inputs / interpret mode, where T=R makes the
    block the full array)."""
    cap = max(1, rows // S)
    t = min(cap, R) // 8 * 8
    while t >= 8:
        if R % t == 0:
            return t
        t -= 8
    if R % 8 == 0:
        return 8
    t = min(cap, R)
    while R % t != 0:
        t -= 1
    return t


def _per_ray_parts(params, cfg: CodeNeRFConfig, dir_enc, z_s, z_t):
    """Per-ray conditioning rows — the [R, .] halves of every concat layer
    (see models/ray_structured.py for the factoring identity)."""
    relu = jax.nn.relu
    h = cfg.hidden_size
    ccd = cfg._cdtype
    zs1 = relu(_mm(z_s, params["shape_code_layer1"]["w"], ccd)
               + params["shape_code_layer1"]["b"])
    zs2 = relu(_mm(z_s, params["shape_code_layer2"]["w"], ccd)
               + params["shape_code_layer2"]["b"])
    zt1 = relu(_mm(z_t, params["texture_code_layer1"]["w"], ccd)
               + params["texture_code_layer1"]["b"])
    zs1p = (_mm(zs1, params["layer_xyz2"]["w"][h:], ccd)
            + params["layer_xyz2"]["b"])
    out_part = (_mm(zs2, params["fc_out"]["w"][h:], ccd)
                + params["fc_out"]["b"])
    sigp, featp = out_part[..., :1], out_part[..., 1:]
    dirp = (_mm(dir_enc, params["layer_dir1"]["w"][cfg.shape_code_size:],
                ccd) + params["layer_dir1"]["b"])
    zt1p = (_mm(zt1, params["fc_rgb"]["w"][h:], ccd)
            + params["fc_rgb"]["b"])
    return {"zs1p": zs1p, "featp": featp, "sigp": sigp, "dirp": dirp,
            "zt1p": zt1p}


def _kernel_weights(params, cfg: CodeNeRFConfig, num_freq_xyz: int,
                    log_sampling_xyz: bool, cast: bool = True):
    """Split / permuted trunk weights in kernel layout.

    ``cast`` pre-casts matrix weights to the compute dtype so per-tile
    weight DMA moves half the bytes (the in-kernel cast becomes a no-op).
    The pallas-backward paths skip the cast: weight-grad cotangents must
    stay f32 end-to-end (a bf16 primal would force bf16 grads), and the
    constant-index weight blocks are fetched once anyway."""
    cd = cfg._cdtype or jnp.float32
    h = cfg.hidden_size
    w1x, w1s, w1c, b1 = _split_layer1(params, cfg)
    if not cast:
        wc = (lambda a: a)
    else:
        wc = (lambda a: None if a is None else a.astype(cd))
    return {
        "w1x": wc(w1x), "w1s": wc(w1s), "w1c": wc(w1c), "b1": b1,
        "E": (_encode_matrix(num_freq_xyz, log_sampling_xyz).astype(cd)
              if cast else _encode_matrix(num_freq_xyz, log_sampling_xyz)),
        "w2": wc(params["layer_xyz2"]["w"][:h]),
        "wof": wc(params["fc_out"]["w"][:h][:, 1:]),
        "wos": wc(params["fc_out"]["w"][:h][:, :1]),
        "wd": wc(params["layer_dir1"]["w"][:cfg.shape_code_size]),
        "wd2": wc(params["layer_dir2"]["w"]),
        "bd2": params["layer_dir2"]["b"],
        "wr": wc(params["fc_rgb"]["w"][:h]),
    }


def make_fused_codenerf(cfg: CodeNeRFConfig, num_freq_xyz: int,
                        include_input_xyz: bool, log_sampling_xyz: bool,
                        tile_rows: int = 1024, pallas_backward: bool = False,
                        tile_rows_bwd: int | None = None,
                        vmem_limit: int | None = None):
    # tile_rows=1024 keeps the kernel's VMEM stack (~9 MB at hidden=256)
    # under the 16 MB limit for any sample count; 2048 fits at S<=64 but
    # OOMs at S=128 (measured).
    """Build the fused apply with custom VJP.

    pallas_backward selects the fully fused fwd+bwd kernel pair (module
    docstring); otherwise the backward rematerializes through XLA.

    Returned signature:
      fused(params, pts [R,S,3], dir_enc [R,dd], z_s [R,C], z_t [R,C])
        -> raw [R,S,4]
    """
    cd = cfg._cdtype or jnp.float32
    h = cfg.hidden_size
    if tile_rows_bwd is None:
        # the bwd kernel holds ~2x the fwd live set (activations + their
        # cotangents), so default to half the rows per tile
        tile_rows_bwd = max(tile_rows // 2, 128)

    pick_tile = _pick_tile

    def per_ray_parts(params, dir_enc, z_s, z_t):
        return _per_ray_parts(params, cfg, dir_enc, z_s, z_t)

    def kernel_weights(params, cast=True):
        return _kernel_weights(params, cfg, num_freq_xyz, log_sampling_xyz,
                               cast)

    def forward(params, pts, dir_enc, z_s, z_t):
        R, S = pts.shape[0], pts.shape[1]
        T = pick_tile(R, S, tile_rows)
        per_ray = per_ray_parts(params, dir_enc, z_s, z_t)
        weights = kernel_weights(params)
        b1_rows = jnp.broadcast_to(weights["b1"], (R, h))
        return _trunk_pallas(pts, per_ray, weights, b1_rows, S=S, T=T,
                             compute_dtype=cd, vmem_limit=vmem_limit)

    def xla_reference(params, pts, dir_enc, z_s, z_t):
        xyz_enc = positional_encoding(pts, num_freq_xyz, include_input_xyz,
                                      log_sampling_xyz)
        return apply_codenerf_rays(params, cfg, xyz_enc, dir_enc, z_s, z_t)

    if pallas_backward:
        # custom VJP at the kernel boundary: the pallas bwd kernel emits
        # grads for pts, the per-ray conditioning rows, b1 and the trunk
        # weights; JAX autodiff composes them through per_ray_parts /
        # kernel_weights (plain traceable slicing + matmuls) back to the
        # parameter pytree and codes.
        @jax.custom_vjp
        def trunk_op(pts, per_ray, b1, weights):
            R, S = pts.shape[0], pts.shape[1]
            T = pick_tile(R, S, tile_rows)
            b1_rows = jnp.broadcast_to(b1[None, :], (R, h))
            return _trunk_pallas(pts, per_ray, weights, b1_rows, S=S, T=T,
                                 compute_dtype=cd, vmem_limit=vmem_limit)

        def trunk_fwd(pts, per_ray, b1, weights):
            return trunk_op(pts, per_ray, b1, weights), (pts, per_ray, b1,
                                                         weights)

        def trunk_bwd(res, g):
            pts, per_ray, b1, weights = res
            R, S = pts.shape[0], pts.shape[1]
            T = pick_tile(R, S, tile_rows_bwd)
            g_pts, g_per_ray, db1, dweights = _trunk_bwd_pallas(
                pts, per_ray, b1, weights, g, S=S, T=T, compute_dtype=cd,
                vmem_limit=vmem_limit)
            dweights["b1"] = jnp.zeros_like(weights["b1"])  # unused copy
            if weights["w1x"] is None:
                dweights["w1x"] = None
            return g_pts, g_per_ray, db1, dweights

        trunk_op.defvjp(trunk_fwd, trunk_bwd)

        def fused(params, pts, dir_enc, z_s, z_t):
            per_ray = per_ray_parts(params, dir_enc, z_s, z_t)
            weights = kernel_weights(params, cast=False)
            b1 = weights["b1"]
            return trunk_op(pts, per_ray, b1, weights)

        fused.xla_reference = xla_reference
        return fused

    @jax.custom_vjp
    def fused(params, pts, dir_enc, z_s, z_t):
        return forward(params, pts, dir_enc, z_s, z_t)

    def fused_fwd(params, pts, dir_enc, z_s, z_t):
        return (forward(params, pts, dir_enc, z_s, z_t),
                (params, pts, dir_enc, z_s, z_t))

    def fused_bwd(res, g):
        params, pts, dir_enc, z_s, z_t = res
        _, vjp = jax.vjp(xla_reference, params, pts, dir_enc, z_s, z_t)
        return vjp(g)

    fused.defvjp(fused_fwd, fused_bwd)
    fused.xla_reference = xla_reference
    return fused


def make_hybrid_codenerf(cfg: CodeNeRFConfig, num_freq_xyz: int,
                         include_input_xyz: bool, log_sampling_xyz: bool,
                         tile_rows_bwd: int = 2048,
                         vmem_limit: int | None = 100 * 1024 * 1024):
    """XLA forward + stored-activation Pallas backward.

    The XLA ray-structured forward is already near its HBM roofline
    (PERF.md), but XLA's backward runs at ~50% of it: the masked cotangent
    is materialized per layer and the dx / dw matmuls each re-read their
    operands from HBM.  This hybrid keeps the fast XLA forward (which must
    write each layer's activation to HBM between matmul kernels anyway —
    those writes ARE the stored residuals, so storing is free) and runs
    the ENTIRE backward trunk in one Pallas kernel: the cotangent chain
    lives in VMEM, each stored bf16 activation is read exactly once, and
    weight grads accumulate in f32 refs across the sequential grid.
    Unlike the fused fwd+bwd pair (``pallas_backward``) there is NO
    forward recompute — only the cheap encode stage (pts @ E, sin/cos)
    is rederived in-kernel.

    Returned signature matches make_fused_codenerf:
      hybrid(params, pts [R,S,3], dir_enc [R,dd], z_s [R,C], z_t [R,C])
        -> raw [R,S,4]
    """
    cd = cfg._cdtype or jnp.float32
    h = cfg.hidden_size
    has_input = include_input_xyz

    def xla_trunk(pts, per_ray, b1, weights):
        """Forward trunk in kernel-weight layout, returning the raw output
        AND the activation set the Pallas backward consumes.  Same math as
        _trunk_kernel / apply_codenerf_rays (allclose-tested)."""
        R, S = pts.shape[0], pts.shape[1]

        def mm(x, w):
            return jnp.dot(x.astype(cd), w.astype(cd),
                           preferred_element_type=jnp.float32).astype(cd)

        def row(name):
            return per_ray[name][:, None, :].astype(cd)

        # encode-as-matmul at HIGHEST precision (see _trunk_kernel)
        scaled = jax.lax.dot_general(
            pts, weights["E"].astype(jnp.float32),
            (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # [R, S, 3F]
        relu = jax.nn.relu
        y = mm(jnp.sin(scaled), weights["w1s"]) + mm(jnp.cos(scaled),
                                                     weights["w1c"])
        if has_input:
            y = y + mm(pts, weights["w1x"])
        h1 = relu(y + b1.astype(cd))
        h2 = relu(mm(h1, weights["w2"]) + row("zs1p"))
        feat = mm(h2, weights["wof"]) + row("featp")
        sigma = (mm(h2, weights["wos"]).astype(jnp.float32)
                 + per_ray["sigp"][:, None, :].astype(jnp.float32))
        v1 = relu(mm(feat, weights["wd"]) + row("dirp"))
        v2 = relu(mm(v1, weights["wd2"]) + weights["bd2"].astype(cd))
        rgb = (mm(v2, weights["wr"]).astype(jnp.float32)
               + per_ray["zt1p"][:, None, :].astype(jnp.float32))
        out = jnp.concatenate([rgb, sigma], axis=-1)
        acts = {"h1": h1, "h2": h2, "feat": feat, "v1": v1, "v2": v2}
        return out, {k: v.reshape(-1, v.shape[-1]) for k, v in acts.items()}

    @jax.custom_vjp
    def trunk_op(pts, per_ray, b1, weights):
        return xla_trunk(pts, per_ray, b1, weights)[0]

    def trunk_fwd(pts, per_ray, b1, weights):
        out, acts = xla_trunk(pts, per_ray, b1, weights)
        return out, (pts, per_ray, b1, weights, acts)

    def trunk_bwd(res, g):
        pts, per_ray, b1, weights, acts = res
        R, S = pts.shape[0], pts.shape[1]
        T = _pick_tile(R, S, tile_rows_bwd)
        g_pts, g_per_ray, db1, dweights = _trunk_bwd_pallas(
            pts, per_ray, b1, weights, g, S=S, T=T, compute_dtype=cd,
            vmem_limit=vmem_limit, acts=acts)
        dweights["b1"] = jnp.zeros_like(weights["b1"])  # unused copy
        if weights["w1x"] is None:
            dweights["w1x"] = None
        return g_pts, g_per_ray, db1, dweights

    trunk_op.defvjp(trunk_fwd, trunk_bwd)

    def hybrid(params, pts, dir_enc, z_s, z_t):
        per_ray = _per_ray_parts(params, cfg, dir_enc, z_s, z_t)
        weights = _kernel_weights(params, cfg, num_freq_xyz,
                                  log_sampling_xyz, cast=False)
        return trunk_op(pts, per_ray, weights["b1"], weights)

    def xla_reference(params, pts, dir_enc, z_s, z_t):
        xyz_enc = positional_encoding(pts, num_freq_xyz, include_input_xyz,
                                      log_sampling_xyz)
        return apply_codenerf_rays(params, cfg, xyz_enc, dir_enc, z_s, z_t)

    hybrid.xla_reference = xla_reference
    return hybrid
