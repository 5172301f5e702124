"""NeRF MLPs as pure pytrees: init(key) -> params, apply(params, ...) -> out.

Re-designs the reference's torch modules (view_synthesis/models/model.py) as
stateless functions over parameter pytrees.  Plain pytrees (not flax modules)
keep the hot path transparent to XLA/Pallas: the fused ray-march kernel can
consume the same weight dict directly.

Layer graphs are exact reproductions:
  * CodeNeRF MLP       — model.py:123-194 (two-stage shape conditioning,
    [sigma | feat] split head, texture-code-conditioned rgb branch)
  * Flexible NeRF MLP  — model.py:5-76 (skip-concat trunk + viewdir head)

Unlike the reference (whose FlexibleNeRFModel.forward takes one argument and
therefore crashes in the shipped harness — SURVEY §3.6), both models expose a
unified signature ``apply(params, x, z_s=None, z_t=None)`` so the vanilla-NeRF
configs (lego/fern/srn-cars) actually work.

Weight layout is JAX-convention [in, out] (y = x @ W + b).  Initialization
matches torch.nn.Linear defaults (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias) so training dynamics are comparable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _linear_init(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _linear(params, x, compute_dtype=None):
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


@dataclass(frozen=True)
class CodeNeRFConfig:
    """Mirror of reference CodeNeRFModel ctor args (model.py:124-134)."""
    hidden_size: int = 128
    shape_code_size: int = 128
    texture_code_size: int = 128
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    # bf16 matmuls with f32 accumulation on the MXU; None = full f32.
    compute_dtype: str | None = None
    # single-pass Pallas backward for the trunk linear+relu layers
    # (ops/layer_bwd.py); forward stays XLA.  TPU only.
    pallas_layer_bwd: bool = False
    # keep fc_out fused but permute its columns to [feat | sigma] inside
    # the apply (a one-off [h, s+1] weight shuffle, exactly differentiable)
    # so both output slices land lane-aligned: feat = out[..., :s] at
    # offset 0 and sigma = out[..., s:] at offset s (a multiple of 128 for
    # all shipped sizes) — instead of the reference column order's
    # offset-1 slice, which XLA answers with transposed {0,2,1} layouts
    # through the fine trunk at flagship shapes (PERF.md session 6).
    fc_out_tail_sigma: bool = False
    # split fc_out into separate sigma/feat matmuls.  Serving-only lever:
    # consuming the fused [.., 257] output is FASTER under grad (one dw
    # matmul, the slice fuses into the backward: 179k vs 159k rays/s
    # fwd+bwd) but forces a lane-misaligned slice + two layout transposes
    # in the forward-only render (~40% of serving time: 565k -> 825k
    # rays/s split).  The image renderer enables this automatically.
    split_fc_out: bool = False

    @property
    def dim_xyz(self) -> int:
        return (3 if self.include_input_xyz else 0) + 6 * self.num_encoding_fn_xyz

    @property
    def dim_dir(self) -> int:
        return (3 if self.include_input_dir else 0) + 6 * self.num_encoding_fn_dir

    @property
    def _cdtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None


def init_codenerf(key: jax.Array, cfg: CodeNeRFConfig, dtype=jnp.float32):
    """Parameter pytree for the CodeNeRF MLP (layer dims per model.py:145-156)."""
    h, s, t = cfg.hidden_size, cfg.shape_code_size, cfg.texture_code_size
    keys = jax.random.split(key, 9)
    return {
        "layer_xyz1": _linear_init(keys[0], cfg.dim_xyz, h, dtype),
        "layer_xyz2": _linear_init(keys[1], h + s, h, dtype),
        "fc_out": _linear_init(keys[2], h + s, s + 1, dtype),
        "shape_code_layer1": _linear_init(keys[3], s, s, dtype),
        "shape_code_layer2": _linear_init(keys[4], s, s, dtype),
        # Reference declares this layer with shape_code_size on both sides
        # (model.py:151); we use texture_code_size, identical for every
        # shipped config (they are always equal) and correct when they differ.
        "texture_code_layer1": _linear_init(keys[5], t, t, dtype),
        "layer_dir1": _linear_init(keys[6], cfg.dim_dir + s, h, dtype),
        "layer_dir2": _linear_init(keys[7], h, h, dtype),
        "fc_rgb": _linear_init(keys[8], h + t, 3, dtype),
    }


def apply_codenerf(params, cfg: CodeNeRFConfig, x: jax.Array,
                   z_s: jax.Array, z_t: jax.Array) -> jax.Array:
    """Forward pass (model.py:160-194).

    Args:
      x:   [N, dim_xyz + dim_dir] concatenated positional encodings.
      z_s: [N, shape_code_size] shape codes (already broadcast per sample).
      z_t: [N, texture_code_size] texture codes.
    Returns: [N, 4] raw (rgb logits, sigma logit).
    """
    cd = cfg._cdtype
    relu = jax.nn.relu
    xyz = x[..., : cfg.dim_xyz]
    view = x[..., cfg.dim_xyz:]

    z_s_out = relu(_linear(params["shape_code_layer1"], z_s, cd))
    z_s_out2 = relu(_linear(params["shape_code_layer2"], z_s, cd))
    z_t_out = relu(_linear(params["texture_code_layer1"], z_t, cd))

    h = relu(_linear(params["layer_xyz1"], xyz, cd))
    h = jnp.concatenate([h, z_s_out], axis=-1)
    h = relu(_linear(params["layer_xyz2"], h, cd))
    h = jnp.concatenate([h, z_s_out2], axis=-1)

    feat = _linear(params["fc_out"], h, cd)
    sigma, feat = feat[..., :1], feat[..., 1:]

    v = jnp.concatenate([feat, view.astype(feat.dtype)], axis=-1)
    v = relu(_linear(params["layer_dir1"], v, cd))
    v = relu(_linear(params["layer_dir2"], v, cd))
    v = jnp.concatenate([v, z_t_out], axis=-1)
    rgb = _linear(params["fc_rgb"], v, cd)

    return jnp.concatenate([rgb, sigma], axis=-1)


@dataclass(frozen=True)
class FlexibleNeRFConfig:
    """Mirror of reference FlexibleNeRFModel ctor args (model.py:6-16)."""
    num_layers: int = 4
    hidden_size: int = 128
    skip_connect_ids: tuple = (4,)
    num_encoding_fn_xyz: int = 6
    num_encoding_fn_dir: int = 4
    include_input_xyz: bool = True
    include_input_dir: bool = True
    use_viewdirs: bool = True
    compute_dtype: str | None = None
    # single-pass Pallas backward for the linear+relu layers (TPU only)
    pallas_layer_bwd: bool = False

    @property
    def dim_xyz(self) -> int:
        return (3 if self.include_input_xyz else 0) + 6 * self.num_encoding_fn_xyz

    @property
    def dim_dir(self) -> int:
        if not self.use_viewdirs:
            return 0
        return (3 if self.include_input_dir else 0) + 6 * self.num_encoding_fn_dir

    @property
    def _cdtype(self):
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else None


def init_flexible_nerf(key: jax.Array, cfg: FlexibleNeRFConfig, dtype=jnp.float32):
    """Parameter pytree for the vanilla-NeRF MLP (layer dims per model.py:31-47)."""
    h = cfg.hidden_size
    n_trunk = cfg.num_layers - 1
    keys = jax.random.split(key, n_trunk + 5)
    params = {"layer1": _linear_init(keys[0], cfg.dim_xyz, h, dtype)}
    trunk = []
    for i in range(n_trunk):
        fan_in = cfg.dim_xyz + h if i in cfg.skip_connect_ids else h
        trunk.append(_linear_init(keys[1 + i], fan_in, h, dtype))
    params["layers_xyz"] = trunk
    if cfg.use_viewdirs:
        params["fc_feat"] = _linear_init(keys[n_trunk + 1], h, h, dtype)
        params["layer_dir1"] = _linear_init(keys[n_trunk + 2], cfg.dim_dir + h,
                                            h // 2, dtype)
        params["fc_alpha"] = _linear_init(keys[n_trunk + 3], h, 1, dtype)
        params["fc_rgb"] = _linear_init(keys[n_trunk + 4], h // 2, 3, dtype)
    else:
        params["fc_out"] = _linear_init(keys[n_trunk + 1], h, 4, dtype)
    return params


def apply_flexible_nerf(params, cfg: FlexibleNeRFConfig, x: jax.Array,
                        z_s=None, z_t=None) -> jax.Array:
    """Forward pass (model.py:51-76).  Codes are accepted and ignored so the
    render pipeline has one uniform model call signature."""
    del z_s, z_t
    cd = cfg._cdtype
    relu = jax.nn.relu
    xyz = x[..., : cfg.dim_xyz]

    out = relu(_linear(params["layer1"], xyz, cd))
    for i, layer in enumerate(params["layers_xyz"]):
        if i in cfg.skip_connect_ids:
            out = jnp.concatenate([out, xyz.astype(out.dtype)], axis=-1)
        out = relu(_linear(layer, out, cd))

    if cfg.use_viewdirs:
        view = x[..., cfg.dim_xyz:]
        feat = relu(_linear(params["fc_feat"], out, cd))
        sigma = _linear(params["fc_alpha"], feat, cd)
        out = jnp.concatenate([feat, view.astype(feat.dtype)], axis=-1)
        out = relu(_linear(params["layer_dir1"], out, cd))
        rgb = _linear(params["fc_rgb"], out, cd)
        return jnp.concatenate([rgb, sigma], axis=-1)
    return _linear(params["fc_out"], out, cd)
