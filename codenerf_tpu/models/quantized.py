"""Int8-quantized CodeNeRF serving path (weights + activations).

Forward-only rendering is HBM-bandwidth-bound on the per-sample MLP trunk
(PERF.md roofline: ~123 bf16 flops/byte at hidden=256 vs the ~240 needed to
be compute-bound on v5e).  Quantizing the trunk's [R*S, hidden] activation
chain and its weights to int8 halves the streamed bytes per layer — the
quantize (scale, round, clip, cast) is elementwise and fuses into each
matmul's epilogue, so only int8 tensors cross HBM between layers — and the
s8 x s8 -> s32 matmuls run natively on the MXU at 2x the bf16 peak.

Scheme: symmetric PER-INPUT-CHANNEL activation scales (statically
calibrated from one representative forward — dynamic per-call amax would
force an extra f32 pass over every activation and erase the win), folded
into the weight rows so they cost nothing at run time:

    x ~= xq * s_ch           (xq = round(x / s_ch), s_ch per channel)
    y  = x @ W = xq @ (diag(s_ch) W) ~= (xq @ Wq') * sw'[out]

with Wq'/sw' the per-output-column quantization of W' = diag(s_ch) @ W.
Per-channel activation ranges after relu vary by orders of magnitude; a
single per-tensor scale lets one hot channel crush the resolution of all
the others (measured −2.6 dB on a chairs model; per-channel recovers
it).  Only the per-sample trunk matmuls are quantized; the per-ray
conditioning precomputations (cost independent of the sample count;
reference model.py:149-151,174-175) stay in the bf16/f32 path.

This is a SERVING lever: quantization is not differentiable (round has a
zero gradient), so training and TTO never touch it.  The reference has no
quantized path; this is a beyond-reference capability of the TPU build.

Usage:
    qparams = quantize_for_serving(params, settings, ro, rd, z_s, z_t)
    renderer = make_image_renderer(settings, H, W)   # detects qparams
    img = renderer(qparams, directions, pose, z_s, z_t)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from codenerf_tpu.models.mlp import CodeNeRFConfig, FlexibleNeRFConfig
from codenerf_tpu.models.ray_structured import (_lin_relu, _mm, _split_w,
                                                per_ray_conditioning)

# Activations captured for calibration, in trunk order.  Every name is the
# INPUT of one or more quantized matmuls (fc_out's sigma and feat matmuls
# share x2; see apply_codenerf_rays_q).
ACT_NAMES = ("x1", "x2", "feat", "v1", "v2")


def quantize_tensor(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 quantization: round(x / scale) clipped to [-127, 127].

    ``scale`` may be a scalar or a per-last-axis-channel vector."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8: returns (wq [in, out] int8, sw [out])."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    sw = jnp.maximum(amax, 1e-12) / 127.0
    return quantize_tensor(w, sw[None, :]), sw


def _qdot(xq: jax.Array, wq: jax.Array, scale: jax.Array) -> jax.Array:
    """s8 x s8 -> s32 matmul, rescaled to f32.  `scale` is the
    per-output-column sw of the activation-folded weight (the per-input-
    channel activation scales are already inside wq's rows — see the
    module docstring); do NOT multiply s_act in again."""
    y = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * scale


# the per-ray conditioning halves are shared with the fp apply
_per_ray_parts = per_ray_conditioning


def trunk_activation_amax(params, cfg: CodeNeRFConfig, xyz_enc, dir_enc,
                          z_s, z_t) -> dict:
    """Run the (bf16/f32) trunk and capture per-tensor amax of every
    quantized-matmul input.  Same math as apply_codenerf_rays."""
    cd = cfg._cdtype
    h = cfg.hidden_size
    if cd is not None:
        xyz_enc = xyz_enc.astype(cd)
    zs1_part, zs2_part, dir_part, zt1_part = _per_ray_parts(
        params, cfg, dir_enc, z_s, z_t)
    w2_top, _ = _split_w(params["layer_xyz2"], h)
    wo_top, _ = _split_w(params["fc_out"], h)
    wd_top, _ = _split_w(params["layer_dir1"], cfg.shape_code_size)
    wr_top, _ = _split_w(params["fc_rgb"], h)

    amax = {}

    def cap(name, x):
        xf = x.astype(jnp.float32)
        amax[name] = jnp.max(jnp.abs(xf), axis=tuple(range(xf.ndim - 1)))
        return x

    cap("x0", xyz_enc)  # encode stream (used only by encode_stream=True)
    x1 = cap("x1", jax.nn.relu(_mm(xyz_enc, params["layer_xyz1"]["w"], cd)
                               + params["layer_xyz1"]["b"].astype(
                                   cd or jnp.float32)))
    x2 = cap("x2", jax.nn.relu(_mm(x1, w2_top, cd) + zs1_part[:, None, :]))
    out = _mm(x2, wo_top, cd) + zs2_part[:, None, :]
    feat = cap("feat", out[..., 1:])
    v1 = cap("v1", jax.nn.relu(_mm(feat, wd_top, cd) + dir_part[:, None, :]))
    v2 = cap("v2", jax.nn.relu(
        _mm(v1, params["layer_dir2"]["w"], cd)
        + params["layer_dir2"]["b"].astype(cd or jnp.float32)))
    del v2
    return amax


def quantize_codenerf(params, cfg: CodeNeRFConfig, amax: dict,
                      encode_stream: bool = False) -> dict:
    """Build the quantized serving pytree for one CodeNeRF model.

    Returns the original params plus a "quant" subtree holding int8
    weights for the six per-sample matmuls and the rescale vectors.
    The per-input-channel activation scales are folded into the weight
    ROWS before weight quantization (see module docstring), so the
    apply path multiplies once per output element.

    encode_stream=True additionally quantizes layer_xyz1's INPUT — the
    positional-encoding stream (PERF.md: ~0.8 ms/iter of bf16 encode
    materialization at serving shapes).  The sin/cos bands then carry
    1/254 amplitude resolution, a measured spatial-signal quality trade
    (runtime.int8_encode A/B) rather than a free win like the trunk.
    """
    h = cfg.hidden_size
    w2_top, _ = _split_w(params["layer_xyz2"], h)
    wo_top, _ = _split_w(params["fc_out"], h)
    wd_top, _ = _split_w(params["layer_dir1"], cfg.shape_code_size)
    wr_top, _ = _split_w(params["fc_rgb"], h)

    names = ACT_NAMES + (("x0",) if encode_stream else ())
    s_act = {k: jnp.maximum(amax[k].astype(jnp.float32), 1e-12) / 127.0
             for k in names}

    def q(w, act_key):
        s_ch = s_act[act_key]
        wq, sw = quantize_weight(w.astype(jnp.float32) * s_ch[:, None])
        return {"wq": wq, "scale": sw}

    quant = {
        "s_act": s_act,
        "layer_xyz2_top": q(w2_top, "x1"),
        "fc_out_sigma": q(wo_top[:, :1], "x2"),
        "fc_out_feat": q(wo_top[:, 1:], "x2"),
        "layer_dir1_top": q(wd_top, "feat"),
        "layer_dir2": q(params["layer_dir2"]["w"], "v1"),
        "fc_rgb_top": q(wr_top, "v2"),
    }
    if encode_stream:
        quant["layer_xyz1"] = q(params["layer_xyz1"]["w"], "x0")
    return {**params, "quant": quant}


def apply_codenerf_rays_q(qparams, cfg: CodeNeRFConfig, xyz_enc: jax.Array,
                          dir_enc: jax.Array, z_s: jax.Array,
                          z_t: jax.Array) -> jax.Array:
    """Int8 CodeNeRF forward over ray-structured inputs (serving only).

    Same layer graph as apply_codenerf_rays (reference model.py:160-194);
    the per-sample trunk runs s8 x s8 -> s32 on the MXU with activations
    crossing HBM as int8.  layer_xyz1 stays in the bf16 path by default:
    its input is the [.., dim_xyz] positional encoding (computed on the
    fly, narrow, lane-misaligned for int8 tiling).  When the quantized
    pytree was built with encode_stream=True (runtime.int8_encode) the
    encode stream is also quantized and layer_xyz1 runs s8 x s8 too.
    """
    cd = cfg._cdtype
    q = qparams["quant"]
    s = q["s_act"]
    if cd is not None:
        xyz_enc = xyz_enc.astype(cd)
    zs1_part, zs2_part, dir_part, zt1_part = _per_ray_parts(
        qparams, cfg, dir_enc, z_s, z_t)

    if "layer_xyz1" in q:
        x0q = quantize_tensor(xyz_enc, s["x0"])
        x1 = jax.nn.relu(_qdot(x0q, q["layer_xyz1"]["wq"],
                               q["layer_xyz1"]["scale"])
                         + qparams["layer_xyz1"]["b"].astype(jnp.float32))
    else:
        x1 = _lin_relu(qparams["layer_xyz1"], xyz_enc, cd)
    x1q = quantize_tensor(x1, s["x1"])

    x2 = jax.nn.relu(_qdot(x1q, q["layer_xyz2_top"]["wq"],
                           q["layer_xyz2_top"]["scale"])
                     + zs1_part[:, None, :].astype(jnp.float32))
    x2q = quantize_tensor(x2, s["x2"])

    zs2f = zs2_part[:, None, :].astype(jnp.float32)
    sigma = _qdot(x2q, q["fc_out_sigma"]["wq"],
                  q["fc_out_sigma"]["scale"]) + zs2f[..., :1]
    feat = _qdot(x2q, q["fc_out_feat"]["wq"],
                 q["fc_out_feat"]["scale"]) + zs2f[..., 1:]
    featq = quantize_tensor(feat, s["feat"])

    v1 = jax.nn.relu(_qdot(featq, q["layer_dir1_top"]["wq"],
                           q["layer_dir1_top"]["scale"])
                     + dir_part[:, None, :].astype(jnp.float32))
    v1q = quantize_tensor(v1, s["v1"])

    v2 = jax.nn.relu(_qdot(v1q, q["layer_dir2"]["wq"],
                           q["layer_dir2"]["scale"])
                     + qparams["layer_dir2"]["b"].astype(jnp.float32))
    v2q = quantize_tensor(v2, s["v2"])

    rgb = _qdot(v2q, q["fc_rgb_top"]["wq"], q["fc_rgb_top"]["scale"]) \
        + zt1_part[:, None, :].astype(jnp.float32)

    return jnp.concatenate([rgb, sigma], axis=-1)


# ---------------------------------------------------------------------------
# FlexibleNeRF (vanilla-NeRF) family — same scheme over the skip-concat trunk
# (reference model.py:51-76); used by the lego/fern/srn-cars configs.
# ---------------------------------------------------------------------------

def flexible_trunk_amax(params, cfg: FlexibleNeRFConfig, xyz_enc, dir_enc
                        ) -> dict:
    """Per-tensor amax of every quantized-matmul input for the vanilla
    trunk.  Keys: t0..t{n-1} (inputs of layers_xyz[i]), "last" (input of
    fc_feat / fc_out), "feat" (input of fc_alpha + layer_dir1 top), "v1"
    (input of fc_rgb)."""
    cd = cfg._cdtype
    if cd is not None:
        xyz_enc = xyz_enc.astype(cd)
        if dir_enc is not None:
            dir_enc = dir_enc.astype(cd)
    amax = {}

    def cap(name, x):
        xf = x.astype(jnp.float32)
        amax[name] = jnp.max(jnp.abs(xf), axis=tuple(range(xf.ndim - 1)))
        return x

    h = cfg.hidden_size
    out = _lin_relu(params["layer1"], xyz_enc, cd)
    for i, layer in enumerate(params["layers_xyz"]):
        cap(f"t{i}", out)
        if i in cfg.skip_connect_ids:
            w_top, w_bot = _split_w(layer, h)
            y = _mm(out, w_top, cd) + _mm(xyz_enc, w_bot, cd)
            out = jax.nn.relu(y + layer["b"].astype(y.dtype))
        else:
            out = _lin_relu(layer, out, cd)
    cap("last", out)
    if cfg.use_viewdirs:
        feat = cap("feat", _lin_relu(params["fc_feat"], out, cd))
        wd_top, wd_bot = _split_w(params["layer_dir1"], h)
        dp = _mm(dir_enc, wd_bot, cd)
        dir_part = dp + params["layer_dir1"]["b"].astype(dp.dtype)
        cap("v1", jax.nn.relu(_mm(feat, wd_top, cd) + dir_part[:, None, :]))
    return amax


def quantize_flexible(params, cfg: FlexibleNeRFConfig, amax: dict) -> dict:
    """Quantized serving pytree for one FlexibleNeRF model: int8 weights
    for the per-sample trunk matmuls (skip layers quantize only the
    hidden-state half; the xyz-encoding half stays on the bf16 path),
    with per-input-channel activation scales folded into the weight
    rows (see module docstring)."""
    h = cfg.hidden_size
    s_act = {k: jnp.maximum(v.astype(jnp.float32), 1e-12) / 127.0
             for k, v in amax.items()}

    def q(w, act_key):
        s_ch = s_act[act_key]
        wq, sw = quantize_weight(w.astype(jnp.float32) * s_ch[:, None])
        return {"wq": wq, "scale": sw}

    layers = []
    for i, layer in enumerate(params["layers_xyz"]):
        if i in cfg.skip_connect_ids:
            w_top, _ = _split_w(layer, h)
            layers.append(q(w_top, f"t{i}"))
        else:
            layers.append(q(layer["w"], f"t{i}"))
    quant = {"s_act": s_act, "layers_xyz": layers}
    if cfg.use_viewdirs:
        wd_top, _ = _split_w(params["layer_dir1"], h)
        quant["fc_feat"] = q(params["fc_feat"]["w"], "last")
        quant["fc_alpha"] = q(params["fc_alpha"]["w"], "feat")
        quant["layer_dir1_top"] = q(wd_top, "feat")
        quant["fc_rgb"] = q(params["fc_rgb"]["w"], "v1")
    else:
        quant["fc_out"] = q(params["fc_out"]["w"], "last")
    return {**params, "quant": quant}


def apply_flexible_rays_q(qparams, cfg: FlexibleNeRFConfig,
                          xyz_enc: jax.Array,
                          dir_enc: Optional[jax.Array]) -> jax.Array:
    """Int8 FlexibleNeRF forward over ray-structured inputs (serving
    only).  Same layer graph as apply_flexible_rays (model.py:51-76).
    layer1 and the skip layers' xyz-encoding halves stay bf16 (narrow,
    computed-on-the-fly inputs; see apply_codenerf_rays_q)."""
    cd = cfg._cdtype
    q = qparams["quant"]
    s = q["s_act"]
    h = cfg.hidden_size
    if cd is not None:
        xyz_enc = xyz_enc.astype(cd)
        if dir_enc is not None:
            dir_enc = dir_enc.astype(cd)

    out = _lin_relu(qparams["layer1"], xyz_enc, cd)
    for i, layer in enumerate(qparams["layers_xyz"]):
        outq = quantize_tensor(out, s[f"t{i}"])
        ql = q["layers_xyz"][i]
        y = _qdot(outq, ql["wq"], ql["scale"])
        if i in cfg.skip_connect_ids:
            _, w_bot = _split_w(layer, h)
            y = y + _mm(xyz_enc, w_bot, cd).astype(jnp.float32)
        out = jax.nn.relu(y + layer["b"].astype(jnp.float32))

    lastq = quantize_tensor(out, s["last"])
    if cfg.use_viewdirs:
        feat = jax.nn.relu(_qdot(lastq, q["fc_feat"]["wq"],
                                 q["fc_feat"]["scale"])
                           + qparams["fc_feat"]["b"].astype(jnp.float32))
        featq = quantize_tensor(feat, s["feat"])
        sigma = _qdot(featq, q["fc_alpha"]["wq"], q["fc_alpha"]["scale"]) \
            + qparams["fc_alpha"]["b"].astype(jnp.float32)
        _, wd_bot = _split_w(qparams["layer_dir1"], h)
        dp = _mm(dir_enc, wd_bot, cd)
        dir_part = dp + qparams["layer_dir1"]["b"].astype(dp.dtype)
        v1 = jax.nn.relu(_qdot(featq, q["layer_dir1_top"]["wq"],
                               q["layer_dir1_top"]["scale"])
                         + dir_part[:, None, :].astype(jnp.float32))
        v1q = quantize_tensor(v1, s["v1"])
        rgb = _qdot(v1q, q["fc_rgb"]["wq"], q["fc_rgb"]["scale"]) \
            + qparams["fc_rgb"]["b"].astype(jnp.float32)
        return jnp.concatenate([rgb, sigma], axis=-1)
    return (_qdot(lastq, q["fc_out"]["wq"], q["fc_out"]["scale"])
            + qparams["fc_out"]["b"].astype(jnp.float32))


def _trunk_amax(params, cfg, xyz_enc, dir_enc, z_s, z_t) -> dict:
    if isinstance(cfg, CodeNeRFConfig):
        return trunk_activation_amax(params, cfg, xyz_enc, dir_enc, z_s, z_t)
    return flexible_trunk_amax(params, cfg, xyz_enc, dir_enc)


def _quantize_model(params, cfg, amax: dict,
                    encode_stream: bool = False) -> dict:
    if isinstance(cfg, CodeNeRFConfig):
        return quantize_codenerf(params, cfg, amax, encode_stream)
    return quantize_flexible(params, cfg, amax)  # encode stays bf16 (skips)


@functools.lru_cache(maxsize=16)
def _get_calibrator(settings):
    """Jitted calibration forward, cached per (hashable, jit-static)
    RenderSettings — quantize_for_serving is called once per object in
    the batched/category eval loops and must not re-trace each time."""
    from codenerf_tpu.models.ray_structured import (apply_codenerf_rays,
                                                    apply_flexible_rays)
    from codenerf_tpu.ops.sampling import (base_z_vals, sample_stratified,
                                           sample_pdf)
    from codenerf_tpu.ops.volume_render import volume_render
    from codenerf_tpu.pipeline import encode_inputs

    @jax.jit
    def calibrate(params, ro, rd, z_s, z_t):
        z_grid = base_z_vals(settings.num_coarse, settings.near, settings.far,
                             settings.spacing_mode, dtype=ro.dtype)
        pts_c, z_c = sample_stratified(None, ro, rd, z_grid, False)
        xyz_c, dir_enc = encode_inputs(settings, pts_c, rd)
        amax_c = _trunk_amax(params["coarse"], settings.coarse_cfg,
                             xyz_c, dir_enc, z_s, z_t)
        if isinstance(settings.coarse_cfg, CodeNeRFConfig):
            raw_c = apply_codenerf_rays(params["coarse"], settings.coarse_cfg,
                                        xyz_c, dir_enc, z_s, z_t)
        else:
            raw_c = apply_flexible_rays(params["coarse"], settings.coarse_cfg,
                                        xyz_c, dir_enc)
        out_c = volume_render(raw_c, z_c, rd)
        pts_f, _ = sample_pdf(None, ro, rd, out_c.weights[..., 1:-1], z_c,
                              settings.num_fine, False)
        xyz_f, _ = encode_inputs(settings, pts_f, rd)
        amax_f = _trunk_amax(params["fine"], settings.fine_cfg,
                             xyz_f, dir_enc, z_s, z_t)
        return amax_c, amax_f

    return calibrate


def quantize_for_serving(params: dict, settings, ro: jax.Array,
                         rd: jax.Array, z_s: Optional[jax.Array],
                         z_t: Optional[jax.Array],
                         encode_stream: bool = False) -> dict:
    """Calibrate + quantize {"coarse", "fine"} params on a representative
    ray batch (e.g. the TTO rays of the object about to be rendered, or
    rays from the render pose).  Works for both model families (z_s/z_t
    are None for vanilla NeRF).  Deterministic sampling, mirroring the
    render pipeline so the fine model is calibrated on true
    importance-sampled points.  encode_stream also quantizes the
    positional-encoding input of layer_xyz1 (CodeNeRF only; see
    quantize_codenerf).
    """
    amax_c, amax_f = _get_calibrator(settings)(params, ro, rd, z_s, z_t)
    return {
        "coarse": _quantize_model(params["coarse"], settings.coarse_cfg,
                                  amax_c, encode_stream),
        "fine": _quantize_model(params["fine"], settings.fine_cfg, amax_f,
                                encode_stream),
    }
