"""Ray-structured MLP application — the TPU-native fast path.

The naive (reference-shaped) CodeNeRF forward broadcasts the per-ray latent
codes and view-direction encoding to every sample and feeds concatenated
[per-sample | per-ray] rows through each linear layer
(reference nerf/__init__.py:117-130, model.py:179-192).  On TPU that wastes
both FLOPs and HBM bandwidth: for S samples/ray the per-ray half of every
concat-matmul is recomputed S times, and the broadcast code tensor
[R, S, C] must be materialized and streamed from HBM.

A concat matmul factors exactly:

    concat(a, b) @ W  ==  a @ W_top + b @ W_bottom

so every layer that consumes [per-sample | per-ray] input splits into a
per-sample matmul [R*S, .] and a per-ray matmul [R, .] whose result is
broadcast-added.  This file implements that factoring for both model
families.  It is bit-exact in exact arithmetic and allclose in floating
point — test_ray_structured.py checks equivalence against the flat
reference-shaped apply.

Inputs are kept in ray-major [R, S, .] layout; nothing of size [R, S, C]
(codes) or [R, S, dim_dir] (view encodings) ever exists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from codenerf_tpu.models.mlp import CodeNeRFConfig, FlexibleNeRFConfig


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dot_lp(x, w, cd):
    """Low-precision matmul: ``cd`` inputs, f32 MXU accumulation, ``cd``
    RESULT.

    Returning ``cd`` makes the activation chain — and therefore every
    backward cotangent — half-width end-to-end, which halves the HBM
    traffic on both sides of the step; plain autodiff would instead thread
    f32 cotangents through the backward matmuls.  Weight gradients are
    emitted in the weights' own (f32 master) dtype.
    """
    return jnp.dot(x.astype(cd), w.astype(cd),
                   preferred_element_type=jnp.float32).astype(cd)


def _dot_lp_fwd(x, w, cd):
    return _dot_lp(x, w, cd), (x, w)


def _dw_contract(x, g):
    """dw = x^T @ g with ALL leading axes contracted, as one dot_general.

    The obvious ``x.reshape(-1, K).T @ g.reshape(-1, N)`` forces a physical
    relayout when XLA's preferred layout for the [R, S, h] operands is a
    transposed tiling ({2,0,1} at the flagship shape — PERF.md session 6:
    a 4.4 ms dw matmul whose pure-FLOPs cost is ~0.9 ms).  dot_general
    contracts the leading dims natively, so the compiler picks the loop
    nest for the layout the operands already have instead of copying them.
    """
    lead = tuple(range(x.ndim - 1))
    return jax.lax.dot_general(x, g, ((lead, lead), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_lp_bwd(cd, res, g):
    x, w = res
    gc = g.astype(cd)
    # dx = g @ w^T  — [..., out] x [out, in]
    dx = jnp.dot(gc, w.astype(cd).T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dw = _dw_contract(x.astype(cd), gc).astype(w.dtype)
    return dx, dw


_dot_lp.defvjp(_dot_lp_fwd, _dot_lp_bwd)


def _mm(x, w, cd):
    if cd is not None:
        return _dot_lp(x, w, cd)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dot_add_relu(x, w, b, cd):
    """relu(x @ w + b) saving ONLY the post-relu output.

    Plain autodiff of the same expression stores BOTH the matmul/add
    result (the relu's residual) AND the relu output (the next dot's
    residual) — two [R*S, hidden] HBM tensors per layer.  Here the relu
    mask is recovered from the output (y > 0: identical a.e. — the
    gradient at exactly 0 is 0 either way), halving the stored-activation
    traffic of the backward pass on the HBM-bound MLP chain (PERF.md
    roofline).  ``b`` may be a bias [h] or a broadcast per-ray
    conditioning row [R, 1, h] (reference model.py:179-192's concat
    halves); its cotangent sums over the broadcast axes.

    Backward-pass restructurings that did NOT help (both measured
    neutral, kept out for simplicity — PERF.md session 4): splitting the
    masked cotangent into per-consumer expressions, and mask-forwarding
    (emitting dx pre-masked so the producer layer skips its mask pass) —
    XLA re-fuses to the same schedule either way.
    """
    y = _mmc(x, w, cd)
    return jax.nn.relu(y + b.astype(y.dtype))


def _mmc(x, w, cd):
    if cd is not None:
        return jnp.dot(x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32).astype(cd)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _dot_add_relu_fwd(x, w, b, cd):
    y = _dot_add_relu(x, w, b, cd)
    return y, (x, w, b, y)


def _dot_add_relu_bwd(cd, res, g):
    x, w, b, y = res
    ct = cd if cd is not None else y.dtype
    gp = jnp.where(y > 0, g, 0).astype(ct)
    dx = jnp.dot(gp, w.astype(ct).T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dw = _dw_contract(x.astype(ct), gp).astype(w.dtype)
    # un-broadcast: sum the cotangent over axes b doesn't carry
    gb = gp.astype(jnp.float32)
    lead = gb.ndim - b.ndim
    if lead:
        gb = jnp.sum(gb, axis=tuple(range(lead)))
    keep = tuple(i for i in range(b.ndim) if b.shape[i] == 1
                 and gb.shape[i] != 1)
    if keep:
        gb = jnp.sum(gb, axis=keep, keepdims=True)
    return dx, dw, gb.astype(b.dtype)


_dot_add_relu.defvjp(_dot_add_relu_fwd, _dot_add_relu_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dot_add_relu_pl(x, w, b, cd):
    """Same forward as _dot_add_relu; backward is the single-pass Pallas
    kernel (ops/layer_bwd.py) instead of XLA's three passes over the
    [R*S, hidden] arrays.  Selected by ``pallas_layer_bwd`` on the model
    config (TPU only)."""
    y = _mmc(x, w, cd)
    return jax.nn.relu(y + b.astype(y.dtype))


def _dot_add_relu_pl_fwd(x, w, b, cd):
    y = _dot_add_relu_pl(x, w, b, cd)
    return y, (x, w, b, y)


def _dot_add_relu_pl_bwd(cd, res, g):
    from codenerf_tpu.ops.layer_bwd import linear_relu_bwd_pallas
    x, w, b, y = res
    return linear_relu_bwd_pallas(x, w, b, y, g, cd)


_dot_add_relu_pl.defvjp(_dot_add_relu_pl_fwd, _dot_add_relu_pl_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fc_out_tail(x, w, b_rows, cd):
    """Fused fc_out with [feat | sigma] columns and a layout-clean backward.

    Forward: one [.., h] @ [h, h+1] matmul + per-ray rows — identical to
    the plain `_mm(x, w) + b_rows[:, None]` the fc_out_tail_sigma branch
    used before.  The difference is the BACKWARD: autodiff of the fused
    form threads a [R, S, h+1]-wide cotangent through dx/dw, and XLA
    answers the odd width with {0,2,1}<->{2,0,1} relayout fusions around
    the dw dot — profiled at ~12 ms/step at the flagship shape (session 7:
    fusion.7/.15/.34 + convolution_convert_fusion.3 + the {0,1} dw).  Here
    the cotangent is split at the lane-aligned h boundary and every
    backward op is the standard 256-wide form the other trunk layers use:

        dx = gf @ wf^T + gs * ws      (rank-1 sigma term fuses into the
                                       dx matmul's epilogue)
        dw = [x^T gf | x^T gs]        (two aligned dots, concat is tiny)
        db_rows = [sum_S gf | sum_S gs]

    No [.., h+1] tensor exists in the backward graph.
    """
    y = _mmc(x, w, cd)
    return y + b_rows[:, None, :].astype(y.dtype)


def _fc_out_tail_fwd(x, w, b_rows, cd):
    return _fc_out_tail(x, w, b_rows, cd), (x, w, b_rows)


def _fc_out_tail_bwd(cd, res, g):
    x, w, b_rows = res
    ct = cd if cd is not None else jnp.float32
    gc = g.astype(ct)
    gf, gs = gc[..., :-1], gc[..., -1:]
    wc = w.astype(ct)
    dx = (jnp.dot(gf, wc[:, :-1].T, preferred_element_type=jnp.float32)
          + gs.astype(jnp.float32) * wc[:, -1].astype(jnp.float32)
          ).astype(x.dtype)
    xc = x.astype(ct)
    dw = jnp.concatenate(
        [_dw_contract(xc, gf), _dw_contract(xc, gs)],
        axis=1).astype(w.dtype)
    db = jnp.concatenate(
        [jnp.sum(gf.astype(jnp.float32), axis=1),
         jnp.sum(gs.astype(jnp.float32), axis=1)],
        axis=-1).astype(b_rows.dtype)
    return dx, dw, db


_fc_out_tail.defvjp(_fc_out_tail_fwd, _fc_out_tail_bwd)


def _lin(params, x, cd):
    """Linear layer preserving the compute dtype (bias cast to match)."""
    y = _mm(x, params["w"], cd)
    return y + params["b"].astype(y.dtype)


def _lin_relu(params, x, cd, use_pl=False):
    """relu(linear) via the single-residual fused op."""
    if use_pl:
        return _dot_add_relu_pl(x, params["w"], params["b"], cd)
    return _dot_add_relu(x, params["w"], params["b"], cd)


def _layer_bwd_active(cfg) -> bool:
    return cfg.pallas_layer_bwd and jax.default_backend() == "tpu"


def _split_w(params, dim_top):
    """Split a concat-layer weight [top+bottom, out] into halves."""
    w = params["w"]
    return w[:dim_top], w[dim_top:]


def per_ray_conditioning(params, cfg: CodeNeRFConfig, dir_enc: jax.Array,
                         z_s: jax.Array, z_t: jax.Array):
    """The per-ray halves of every factored concat-matmul (cost
    independent of the sample count; reference model.py:149-151,174-175
    runs these once per ray, not per sample).

    Returns (zs1_part [R, h], zs2_part [R, s+1], dir_part [R, h],
    zt1_part [R, 3]).  Shared by the fp apply below and the int8 serving
    path (models/quantized.py), which quantizes only the per-sample
    halves.
    """
    cd = cfg._cdtype
    h = cfg.hidden_size
    if cd is not None:
        dir_enc = dir_enc.astype(cd)
        z_s = z_s.astype(cd)
        z_t = z_t.astype(cd)

    def bias(y, b):
        return y + b.astype(y.dtype)

    zs1 = _lin_relu(params["shape_code_layer1"], z_s, cd)
    zs2 = _lin_relu(params["shape_code_layer2"], z_s, cd)
    zt1 = _lin_relu(params["texture_code_layer1"], z_t, cd)

    # layer_xyz2 consumes concat(h, zs1): factor the zs1 half per-ray
    _, w2_bot = _split_w(params["layer_xyz2"], h)
    zs1_part = bias(_mm(zs1, w2_bot, cd), params["layer_xyz2"]["b"])
    # fc_out consumes concat(h2, zs2)
    _, wo_bot = _split_w(params["fc_out"], h)
    zs2_part = bias(_mm(zs2, wo_bot, cd), params["fc_out"]["b"])
    # layer_dir1 consumes concat(feat, dir_enc): dir half per-ray
    _, wd_bot = _split_w(params["layer_dir1"], cfg.shape_code_size)
    dir_part = bias(_mm(dir_enc, wd_bot, cd), params["layer_dir1"]["b"])
    # fc_rgb consumes concat(v, zt1)
    _, wr_bot = _split_w(params["fc_rgb"], h)
    zt1_part = bias(_mm(zt1, wr_bot, cd), params["fc_rgb"]["b"])
    return zs1_part, zs2_part, dir_part, zt1_part


def apply_codenerf_rays(params, cfg: CodeNeRFConfig, xyz_enc: jax.Array,
                        dir_enc: jax.Array, z_s: jax.Array, z_t: jax.Array
                        ) -> jax.Array:
    """CodeNeRF forward over ray-structured inputs.

    Args:
      xyz_enc: [R, S, dim_xyz] positional-encoded sample points.
      dir_enc: [R, dim_dir] positional-encoded (normalized) view directions.
      z_s, z_t: [R, C] latent codes.
    Returns: [R, S, 4] raw (rgb logits, sigma logit) — same math as
    apply_codenerf on the flattened broadcast inputs (model.py:160-194).
    """
    cd = cfg._cdtype
    h = cfg.hidden_size
    if cd is not None:
        # cast once at the boundary so the large encoding is read (and
        # its remat residual stored) at half width; per_ray_conditioning
        # casts the per-ray inputs itself
        xyz_enc = xyz_enc.astype(cd)

    # ---- per-ray precomputations (cost independent of S) ----
    zs1_part, zs2_part, dir_part, zt1_part = per_ray_conditioning(
        params, cfg, dir_enc, z_s, z_t)
    w2_top, _ = _split_w(params["layer_xyz2"], h)
    wo_top, _ = _split_w(params["fc_out"], h)
    wd_top, _ = _split_w(params["layer_dir1"], cfg.shape_code_size)
    wr_top, _ = _split_w(params["fc_rgb"], h)

    # ---- per-sample trunk (single-residual fused linear+relu ops) ----
    pl_bwd = _layer_bwd_active(cfg)

    def dar(x_, w_, b_):
        if pl_bwd:
            return _dot_add_relu_pl(x_, w_, b_, cd)
        return _dot_add_relu(x_, w_, b_, cd)

    # layer_xyz1 stays on the XLA backward even when pallas_layer_bwd:
    # its K=63 residual is a concat XLA otherwise never materializes
    # flat (profiled pad/convert glue outweighs the kernel win), and its
    # dx is dead in training (pts has no trainable ancestors) — XLA
    # DCEs it, the kernel can't.
    x = _lin_relu(params["layer_xyz1"], xyz_enc, cd)
    x = dar(x, w2_top, zs1_part[:, None, :])
    if pl_bwd or cfg.split_fc_out:
        # fc_out split into separate sigma/feat matmuls: consuming the
        # fused [.., 257] output forces a lane-misaligned slice plus
        # layout transposes around the dir-layer chain — ~40% of the
        # forward-only serving render (565k -> 825k rays/s split, see
        # CodeNeRFConfig.split_fc_out) and ~3.3 ms/step of copies ahead
        # of the dir1 backward kernel in the pallas_layer_bwd path.
        # Under grad the fused form wins (one dw matmul; the slice fuses
        # into the backward), so training keeps it.
        sigma = _mm(x, wo_top[:, :1], cd) + zs2_part[:, None, :1]
        feat = _mm(x, wo_top[:, 1:], cd) + zs2_part[:, None, 1:]
    elif cfg.fc_out_tail_sigma:
        # same fused matmul, columns permuted to [feat | sigma] so both
        # slices are lane-aligned (see CodeNeRFConfig.fc_out_tail_sigma);
        # custom VJP keeps the backward free of [.., h+1]-wide tensors
        wo_r = jnp.concatenate([wo_top[:, 1:], wo_top[:, :1]], axis=1)
        zs2_r = jnp.concatenate([zs2_part[:, 1:], zs2_part[:, :1]], axis=1)
        out = _fc_out_tail(x, wo_r, zs2_r, cd)
        feat, sigma = out[..., :-1], out[..., -1:]
    else:
        feat = _mm(x, wo_top, cd) + zs2_part[:, None, :]
        sigma, feat = feat[..., :1], feat[..., 1:]

    v = dar(feat, wd_top, dir_part[:, None, :])
    v = dar(v, params["layer_dir2"]["w"], params["layer_dir2"]["b"])
    rgb = _mm(v, wr_top, cd) + zt1_part[:, None, :]

    # volume rendering runs in f32 regardless of the compute dtype
    return jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)


def apply_flexible_rays(params, cfg: FlexibleNeRFConfig, xyz_enc: jax.Array,
                        dir_enc: jax.Array | None) -> jax.Array:
    """FlexibleNeRF forward over ray-structured inputs (model.py:51-76).

    Args:
      xyz_enc: [R, S, dim_xyz]; dir_enc: [R, dim_dir] or None.
    Returns: [R, S, 4].
    """
    cd = cfg._cdtype
    relu = jax.nn.relu
    h = cfg.hidden_size
    if cd is not None:
        xyz_enc = xyz_enc.astype(cd)
        if dir_enc is not None:
            dir_enc = dir_enc.astype(cd)

    pl_bwd = _layer_bwd_active(cfg)
    # layer1 stays on the XLA backward (see apply_codenerf_rays)
    out = _lin_relu(params["layer1"], xyz_enc, cd)
    for i, layer in enumerate(params["layers_xyz"]):
        if i in cfg.skip_connect_ids:
            # skip layer consumes concat(out, xyz_enc): both halves are
            # per-sample; factor to avoid materializing the concat
            w_top, w_bot = _split_w(layer, h)
            y = _mm(out, w_top, cd) + _mm(xyz_enc, w_bot, cd)
            out = relu(y + layer["b"].astype(y.dtype))
        else:
            out = _lin_relu(layer, out, cd, use_pl=pl_bwd)

    if cfg.use_viewdirs:
        feat = _lin_relu(params["fc_feat"], out, cd, use_pl=pl_bwd)
        sigma = _lin(params["fc_alpha"], feat, cd)
        wd_top, wd_bot = _split_w(params["layer_dir1"], h)
        dp = _mm(dir_enc, wd_bot, cd)
        dir_part = dp + params["layer_dir1"]["b"].astype(dp.dtype)
        dar = _dot_add_relu_pl if pl_bwd else _dot_add_relu
        v = dar(feat, wd_top, dir_part[:, None, :], cd)
        rgb = _lin(params["fc_rgb"], v, cd)
        return jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)
    return _lin(params["fc_out"], out, cd).astype(jnp.float32)
