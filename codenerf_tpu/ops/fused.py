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

Gradients: `make_fused_codenerf` attaches a custom VJP whose backward
recomputes through the XLA ray-structured path — functionally identical
(allclose-tested) and rematerialized, so the Pallas kernel only needs a
forward implementation.
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

    pts = pts_ref[:].reshape(T * S, 3)
    scaled = jnp.dot(pts, e_ref[:].astype(pts.dtype),
                     preferred_element_type=jnp.float32)        # [T*S, 3F]
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
                  compute_dtype):
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
            dimension_semantics=("arbitrary",)),
    )(pts, per_ray["zs1p"], per_ray["featp"], per_ray["sigp"],
      per_ray["dirp"], per_ray["zt1p"], b1_rows, *weight_list)


def make_fused_codenerf(cfg: CodeNeRFConfig, num_freq_xyz: int,
                        include_input_xyz: bool, log_sampling_xyz: bool,
                        tile_rows: int = 1024):
    # tile_rows=1024 keeps the kernel's VMEM stack (~9 MB at hidden=256)
    # under the 16 MB limit for any sample count; 2048 fits at S<=64 but
    # OOMs at S=128 (measured).
    """Build the fused apply with custom VJP.

    Returned signature:
      fused(params, pts [R,S,3], dir_enc [R,dd], z_s [R,C], z_t [R,C])
        -> raw [R,S,4]
    """
    cd = cfg._cdtype or jnp.float32
    h = cfg.hidden_size

    def per_ray_parts(params, dir_enc, z_s, z_t):
        relu = jax.nn.relu
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

    def kernel_weights(params):
        w1x, w1s, w1c, b1 = _split_layer1(params, cfg)
        # pre-cast matrix weights to the compute dtype so per-tile weight
        # DMA moves half the bytes (the in-kernel cast becomes a no-op)
        wc = (lambda a: None if a is None else a.astype(cd))
        return {
            "w1x": wc(w1x), "w1s": wc(w1s), "w1c": wc(w1c), "b1": b1,
            "E": _encode_matrix(num_freq_xyz, log_sampling_xyz).astype(cd),
            "w2": wc(params["layer_xyz2"]["w"][:h]),
            "wof": wc(params["fc_out"]["w"][:h][:, 1:]),
            "wos": wc(params["fc_out"]["w"][:h][:, :1]),
            "wd": wc(params["layer_dir1"]["w"][:cfg.shape_code_size]),
            "wd2": wc(params["layer_dir2"]["w"]),
            "bd2": params["layer_dir2"]["b"],
            "wr": wc(params["fc_rgb"]["w"][:h]),
        }

    def forward(params, pts, dir_enc, z_s, z_t):
        R, S = pts.shape[0], pts.shape[1]
        T = max(1, tile_rows // S)
        while R % T != 0:
            T -= 1
        per_ray = per_ray_parts(params, dir_enc, z_s, z_t)
        weights = kernel_weights(params)
        b1_rows = jnp.broadcast_to(weights["b1"], (R, h))
        return _trunk_pallas(pts, per_ray, weights, b1_rows, S=S, T=T,
                             compute_dtype=cd)

    def xla_reference(params, pts, dir_enc, z_s, z_t):
        xyz_enc = positional_encoding(pts, num_freq_xyz, include_input_xyz,
                                      log_sampling_xyz)
        return apply_codenerf_rays(params, cfg, xyz_enc, dir_enc, z_s, z_t)

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
