"""The NeRF render pipeline: coarse -> importance -> fine, as one pure function.

TPU-native replacement for reference view_synthesis/nerf/__init__.py:74-134
(`predict_radiance_and_render` + `forward_pass`).  Instead of a Python chunk
loop over minibatches (reference train.py:84-114), the whole pipeline is a
single traced function over a statically-shaped ray batch; XLA fuses the
encode -> MLP -> composite chain, and the ray axis is shardable over a mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from codenerf_tpu.config.schema import Config, ModelSpec, EmbedderConfig
from codenerf_tpu.core.encoding import positional_encoding
from codenerf_tpu.models.mlp import (
    CodeNeRFConfig, FlexibleNeRFConfig,
    init_codenerf, apply_codenerf,
    init_flexible_nerf, apply_flexible_nerf,
)
from codenerf_tpu.ops.sampling import base_z_vals, sample_stratified, sample_pdf
from codenerf_tpu.ops.volume_render import volume_render, RenderOutputs


def model_config_from_spec(spec: ModelSpec, embedder: EmbedderConfig,
                           shape_code_size: int, texture_code_size: int,
                           compute_dtype: Optional[str] = None,
                           pallas_layer_bwd: bool = False,
                           split_fc_out: bool = False,
                           fc_out_tail_sigma: bool = False):
    """String-keyed model registry (reference util.py:118 getattr pattern)."""
    if spec.type == "CodeNeRFModel":
        return CodeNeRFConfig(
            hidden_size=spec.hidden_size,
            shape_code_size=shape_code_size,
            texture_code_size=texture_code_size,
            num_encoding_fn_xyz=embedder.num_encoding_fn_xyz,
            num_encoding_fn_dir=embedder.num_encoding_fn_dir,
            include_input_xyz=embedder.include_input_xyz,
            include_input_dir=embedder.include_input_dir,
            compute_dtype=compute_dtype,
            pallas_layer_bwd=pallas_layer_bwd,
            split_fc_out=split_fc_out,
            fc_out_tail_sigma=fc_out_tail_sigma,
        )
    if spec.type == "FlexibleNeRFModel":
        return FlexibleNeRFConfig(
            num_layers=spec.num_layers,
            hidden_size=spec.hidden_size,
            skip_connect_ids=tuple(spec.skip_connect_ids),
            num_encoding_fn_xyz=embedder.num_encoding_fn_xyz,
            num_encoding_fn_dir=embedder.num_encoding_fn_dir,
            include_input_xyz=embedder.include_input_xyz,
            include_input_dir=embedder.include_input_dir,
            use_viewdirs=embedder.use_viewdirs,
            compute_dtype=compute_dtype,
            pallas_layer_bwd=pallas_layer_bwd,
        )
    raise ValueError(f"unknown model type: {spec.type}")


def init_model(key: jax.Array, model_cfg) -> Any:
    if isinstance(model_cfg, CodeNeRFConfig):
        return init_codenerf(key, model_cfg)
    return init_flexible_nerf(key, model_cfg)


def apply_model(params, model_cfg, x, z_s=None, z_t=None):
    if isinstance(model_cfg, CodeNeRFConfig):
        return apply_codenerf(params, model_cfg, x, z_s, z_t)
    return apply_flexible_nerf(params, model_cfg, x, z_s, z_t)


@jax.tree_util.register_static
@dataclass(frozen=True)
class RenderSettings:
    """Static render-pipeline configuration (hashable, jit-static)."""
    num_coarse: int
    num_fine: int
    near: float
    far: float
    spacing_mode: str
    num_encoding_fn_xyz: int
    include_input_xyz: bool
    log_sampling_xyz: bool
    use_viewdirs: bool
    num_encoding_fn_dir: int
    include_input_dir: bool
    log_sampling_dir: bool
    coarse_cfg: Any
    fine_cfg: Any
    white_background: bool = False
    # train-stage sigma-noise regularizer std (nerf.train.
    # radiance_field_noise_std).  The reference declares this in every
    # config (e.g. srn-cars.yml:59 = 0.05) but its application line is
    # commented out (volumetric_render.py:47); we implement the declared
    # intent because it is the standard fix for the near-plane density
    # collapse that white-background-heavy categories (chairs, 96% white
    # pixels) otherwise fall into (RESULTS.md round 3).  Applied only on
    # the training step (render_rays(..., noise_std=...)); the validation
    # stage value stays unconsumed, matching reference behavior.
    noise_std: float = 0.0
    remat: bool = False
    use_pallas: bool = False
    pallas_backward: bool = False
    pallas_hybrid: bool = False
    # NDC ray parametrization for forward-facing (LLFF) scenes:
    # (height, width, focal) in pixels, or None for world-space rays.
    # Set by Harness.from_config when the dataset is LLFF and
    # cfg.dataset.no_ndc is false (the fern.yml intent — SURVEY §3.6).
    ndc: Optional[Tuple[float, float, float]] = None

    @staticmethod
    def from_config(cfg: Config, compute_dtype: Optional[str] = None
                    ) -> "RenderSettings":
        ps, emb = cfg.nerf.point_sampler, cfg.nerf.embedder
        dt = compute_dtype if compute_dtype is not None else (
            cfg.runtime.compute_dtype or None)
        if dt == "float32":
            dt = None
        mk = partial(model_config_from_spec, embedder=emb,
                     shape_code_size=cfg.models.embedding.shape_code_size,
                     texture_code_size=cfg.models.embedding.texture_code_size,
                     compute_dtype=dt,
                     pallas_layer_bwd=cfg.runtime.pallas_layer_bwd,
                     split_fc_out=cfg.runtime.split_fc_out,
                     fc_out_tail_sigma=cfg.runtime.fc_out_tail_sigma)
        return RenderSettings(
            num_coarse=ps.num_coarse, num_fine=ps.num_fine,
            near=ps.near_limit, far=ps.far_limit,
            spacing_mode=ps.spacing_mode,
            num_encoding_fn_xyz=emb.num_encoding_fn_xyz,
            include_input_xyz=emb.include_input_xyz,
            log_sampling_xyz=emb.log_sampling_xyz,
            use_viewdirs=emb.use_viewdirs,
            num_encoding_fn_dir=emb.num_encoding_fn_dir,
            include_input_dir=emb.include_input_dir,
            log_sampling_dir=emb.log_sampling_dir,
            coarse_cfg=mk(cfg.models.nerf_coarse),
            fine_cfg=mk(cfg.models.nerf_fine),
            white_background=cfg.nerf.white_background,
            noise_std=cfg.nerf.train.radiance_field_noise_std,
            remat=cfg.runtime.remat,
            use_pallas=cfg.runtime.use_pallas,
            pallas_backward=cfg.runtime.pallas_backward,
            pallas_hybrid=cfg.runtime.pallas_hybrid,
        )


def encode_inputs(settings: RenderSettings, pts: jax.Array, rd: jax.Array):
    """Positional-encode sample points and (per-ray) view directions.

    pts: [R, S, 3]; rd: [R, 3].  Returns (xyz_enc [R, S, dim_xyz],
    dir_enc [R, dim_dir] | None) — the view encoding stays per-ray; the
    ray-structured MLP applies broadcast it inside the matmul factoring
    instead of materializing [R, S, dim_dir]
    (cf. reference nerf/__init__.py:117-130, which expands everything).
    """
    enc = positional_encoding(pts, settings.num_encoding_fn_xyz,
                              settings.include_input_xyz,
                              settings.log_sampling_xyz)
    enc_dir = None
    if settings.use_viewdirs:
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        enc_dir = positional_encoding(viewdirs, settings.num_encoding_fn_dir,
                                      settings.include_input_dir,
                                      settings.log_sampling_dir)
    return enc, enc_dir


@functools.lru_cache(maxsize=32)
def _get_fused(model_cfg, num_freq, include_input, log_sampling,
               pallas_backward=False):
    from codenerf_tpu.ops.fused import make_fused_codenerf
    if pallas_backward:
        # measured-best tiles for the fwd+bwd pair on v5e (PERF.md tile
        # sweep): 2048-row tiles with a 100 MB VMEM budget
        return make_fused_codenerf(model_cfg, num_freq, include_input,
                                   log_sampling, tile_rows=2048,
                                   pallas_backward=True, tile_rows_bwd=2048,
                                   vmem_limit=100 * 1024 * 1024)
    return make_fused_codenerf(model_cfg, num_freq, include_input,
                               log_sampling,
                               pallas_backward=pallas_backward)


@functools.lru_cache(maxsize=32)
def _get_hybrid(model_cfg, num_freq, include_input, log_sampling):
    from codenerf_tpu.ops.fused import make_hybrid_codenerf
    return make_hybrid_codenerf(model_cfg, num_freq, include_input,
                                log_sampling)


def _pallas_active(settings, model_cfg) -> bool:
    return (settings.use_pallas and isinstance(model_cfg, CodeNeRFConfig)
            and settings.use_viewdirs and jax.default_backend() == "tpu")


def _hybrid_active(settings, model_cfg) -> bool:
    return (settings.pallas_hybrid and not settings.use_pallas
            and isinstance(model_cfg, CodeNeRFConfig)
            and settings.use_viewdirs and jax.default_backend() == "tpu")


def _forward(params, model_cfg, settings, pts, rd, z_s, z_t):
    """encode -> MLP over [R, S] samples (reference forward_pass,
    nerf/__init__.py:94-134).

    CodeNeRF on TPU uses the Pallas fused trunk (encode + MLP in VMEM);
    everything else uses the XLA ray-structured fast path.
    """
    from codenerf_tpu.models.ray_structured import (
        apply_codenerf_rays, apply_flexible_rays)
    if isinstance(params, dict) and "quant" in params:
        # int8 serving params (models/quantized.py::quantize_for_serving)
        from codenerf_tpu.models.quantized import (apply_codenerf_rays_q,
                                                   apply_flexible_rays_q)
        xyz_enc, dir_enc = encode_inputs(settings, pts, rd)
        if isinstance(model_cfg, CodeNeRFConfig):
            return apply_codenerf_rays_q(params, model_cfg, xyz_enc, dir_enc,
                                         z_s, z_t)
        return apply_flexible_rays_q(params, model_cfg, xyz_enc, dir_enc)
    if _pallas_active(settings, model_cfg) or _hybrid_active(settings,
                                                             model_cfg):
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        dir_enc = positional_encoding(viewdirs, settings.num_encoding_fn_dir,
                                      settings.include_input_dir,
                                      settings.log_sampling_dir)
        if _hybrid_active(settings, model_cfg):
            fused = _get_hybrid(model_cfg, settings.num_encoding_fn_xyz,
                                settings.include_input_xyz,
                                settings.log_sampling_xyz)
        else:
            fused = _get_fused(model_cfg, settings.num_encoding_fn_xyz,
                               settings.include_input_xyz,
                               settings.log_sampling_xyz,
                               settings.pallas_backward)
        return fused(params, pts, dir_enc, z_s, z_t)
    xyz_enc, dir_enc = encode_inputs(settings, pts, rd)
    if isinstance(model_cfg, CodeNeRFConfig):
        return apply_codenerf_rays(params, model_cfg, xyz_enc, dir_enc,
                                   z_s, z_t)
    return apply_flexible_rays(params, model_cfg, xyz_enc, dir_enc)


def render_rays(params: dict, settings: RenderSettings, ro: jax.Array,
                rd: jax.Array, z_s: Optional[jax.Array],
                z_t: Optional[jax.Array], key: Optional[jax.Array],
                perturb: bool, noise_std: float = 0.0
                ) -> Tuple[RenderOutputs, RenderOutputs]:
    """Full coarse -> importance -> fine render for a ray batch.

    Reference call stack: predict_radiance_and_render
    (nerf/__init__.py:74-91).

    Args:
      params: {"coarse": pytree, "fine": pytree}.
      ro, rd: [R, 3] world-frame ray origins / directions.
      z_s, z_t: [R, C] per-ray latent codes, or None for vanilla NeRF.
      key: PRNG key (required when perturb).
      perturb: stratified jitter + random CDF inversion.
      noise_std: if > 0 (and perturb), add N(0, noise_std) to the raw sigma
        channel before activation — the reference's declared-but-dead
        ``radiance_field_noise_std`` regularizer (volumetric_render.py:47,
        srn configs set 0.05).  Train-step only; see RenderSettings.

    Returns: (coarse, fine) RenderOutputs.
    """
    noisy = noise_std > 0.0 and perturb
    if perturb:
        if noisy:
            k1, k2, kn_c, kn_f = jax.random.split(key, 4)
        else:
            k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None

    # NDC (LLFF forward-facing): sample/composite in NDC space, but encode
    # view directions from the *world-space* rays (the standard NeRF split —
    # viewdirs are computed before the NDC conversion).
    rd_view = rd
    if settings.ndc is not None:
        from codenerf_tpu.core.geometry import ndc_rays
        h, w, focal = settings.ndc
        ro, rd = ndc_rays(ro, rd, h, w, focal)

    def fwd_c(p, pts, rd_, zs_, zt_):
        return _forward(p, settings.coarse_cfg, settings, pts, rd_, zs_, zt_)

    def fwd_f(p, pts, rd_, zs_, zt_):
        return _forward(p, settings.fine_cfg, settings, pts, rd_, zs_, zt_)

    if (settings.remat and not _pallas_active(settings, settings.coarse_cfg)
            and not _hybrid_active(settings, settings.coarse_cfg)):
        # Recompute the encode->MLP chain in the backward pass instead of
        # storing ~9 x [R*S, hidden] activations in HBM (jax.checkpoint:
        # the HBM-bandwidth / capacity trade SURVEY §7 calls for).
        # Skipped when the Pallas fused trunk is active — its custom VJP
        # already rematerializes, and wrapping a custom_vjp in
        # jax.checkpoint would recompute the forward twice in the backward.
        fwd_c = jax.checkpoint(fwd_c)
        fwd_f = jax.checkpoint(fwd_f)

    z_grid = base_z_vals(settings.num_coarse, settings.near, settings.far,
                         settings.spacing_mode, dtype=ro.dtype)
    def add_sigma_noise(raw, k):
        # keep the bias add in raw.dtype: jnp promotion would silently
        # upcast a bf16 activation chain (CLAUDE.md Mosaic note)
        n = noise_std * jax.random.normal(k, raw.shape[:-1], raw.dtype)
        return jnp.concatenate([raw[..., :3], raw[..., 3:] + n[..., None]],
                               axis=-1)

    pts_c, z_c = sample_stratified(k1, ro, rd, z_grid, perturb)
    raw_c = fwd_c(params["coarse"], pts_c, rd_view, z_s, z_t)
    if noisy:
        raw_c = add_sigma_noise(raw_c, kn_c)
    out_c = volume_render(raw_c, z_c, rd,
                          white_background=settings.white_background)

    # Interior-weight slice per reference nerf/__init__.py:87.
    pts_f, z_f = sample_pdf(k2, ro, rd, out_c.weights[..., 1:-1], z_c,
                            settings.num_fine, perturb)
    raw_f = fwd_f(params["fine"], pts_f, rd_view, z_s, z_t)
    if noisy:
        raw_f = add_sigma_noise(raw_f, kn_f)
    out_f = volume_render(raw_f, z_f, rd,
                          white_background=settings.white_background)
    return out_c, out_f
