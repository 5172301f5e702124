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

import jax
import jax.numpy as jnp

from codenerf_tpu.models.mlp import CodeNeRFConfig, FlexibleNeRFConfig


def _mm(x, w, cd):
    if cd is not None:
        x = x.astype(cd)
        w = w.astype(cd)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _split_w(params, dim_top):
    """Split a concat-layer weight [top+bottom, out] into halves."""
    w = params["w"]
    return w[:dim_top], w[dim_top:]


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
    relu = jax.nn.relu
    h = cfg.hidden_size

    # ---- per-ray precomputations (cost independent of S) ----
    zs1 = relu(_mm(z_s, params["shape_code_layer1"]["w"], cd)
               + params["shape_code_layer1"]["b"])
    zs2 = relu(_mm(z_s, params["shape_code_layer2"]["w"], cd)
               + params["shape_code_layer2"]["b"])
    zt1 = relu(_mm(z_t, params["texture_code_layer1"]["w"], cd)
               + params["texture_code_layer1"]["b"])

    # layer_xyz2 consumes concat(h, zs1): factor the zs1 half per-ray
    w2_top, w2_bot = _split_w(params["layer_xyz2"], h)
    zs1_part = _mm(zs1, w2_bot, cd) + params["layer_xyz2"]["b"]      # [R, h]
    # fc_out consumes concat(h2, zs2)
    wo_top, wo_bot = _split_w(params["fc_out"], h)
    zs2_part = _mm(zs2, wo_bot, cd) + params["fc_out"]["b"]          # [R, s+1]
    # layer_dir1 consumes concat(feat, dir_enc): dir half per-ray
    wd_top, wd_bot = _split_w(params["layer_dir1"], cfg.shape_code_size)
    dir_part = _mm(dir_enc, wd_bot, cd) + params["layer_dir1"]["b"]  # [R, h]
    # fc_rgb consumes concat(v, zt1)
    wr_top, wr_bot = _split_w(params["fc_rgb"], h)
    zt1_part = _mm(zt1, wr_bot, cd) + params["fc_rgb"]["b"]          # [R, 3]

    # ---- per-sample trunk ----
    x = relu(_mm(xyz_enc, params["layer_xyz1"]["w"], cd)
             + params["layer_xyz1"]["b"])
    x = relu(_mm(x, w2_top, cd) + zs1_part[:, None, :])
    feat = _mm(x, wo_top, cd) + zs2_part[:, None, :]
    sigma, feat = feat[..., :1], feat[..., 1:]

    v = relu(_mm(feat, wd_top, cd) + dir_part[:, None, :])
    v = relu(_mm(v, params["layer_dir2"]["w"], cd)
             + params["layer_dir2"]["b"])
    rgb = _mm(v, wr_top, cd) + zt1_part[:, None, :]

    return jnp.concatenate([rgb, sigma], axis=-1)


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

    out = relu(_mm(xyz_enc, params["layer1"]["w"], cd) + params["layer1"]["b"])
    for i, layer in enumerate(params["layers_xyz"]):
        if i in cfg.skip_connect_ids:
            # skip layer consumes concat(out, xyz_enc): both halves are
            # per-sample; factor to avoid materializing the concat
            w_top, w_bot = _split_w(layer, h)
            out = relu(_mm(out, w_top, cd) + _mm(xyz_enc, w_bot, cd)
                       + layer["b"])
        else:
            out = relu(_mm(out, layer["w"], cd) + layer["b"])

    if cfg.use_viewdirs:
        feat = relu(_mm(out, params["fc_feat"]["w"], cd)
                    + params["fc_feat"]["b"])
        sigma = _mm(feat, params["fc_alpha"]["w"], cd) + params["fc_alpha"]["b"]
        wd_top, wd_bot = _split_w(params["layer_dir1"], h)
        dir_part = _mm(dir_enc, wd_bot, cd) + params["layer_dir1"]["b"]
        v = relu(_mm(feat, wd_top, cd) + dir_part[:, None, :])
        rgb = _mm(v, params["fc_rgb"]["w"], cd) + params["fc_rgb"]["b"]
        return jnp.concatenate([rgb, sigma], axis=-1)
    return _mm(out, params["fc_out"]["w"], cd) + params["fc_out"]["b"]
