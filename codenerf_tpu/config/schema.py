"""Typed configuration system.

Replaces the reference's yacs-derived ``CfgNode`` dict-tree
(view_synthesis/cfgnode/cfg_node.py) with frozen dataclasses + a YAML loader.
Behaviors kept from the reference:

  * loads the *reference YAML configs unchanged* — including the legacy
    ``models.coarse``/``models.fine`` schema (lego/srn-cars/srn-chairs) and
    fern.yml's older flat schema (SURVEY §3.6: those configs are *broken* in
    the reference harness; here they are normalized and work)
  * dotted CLI overrides ``a.b.c=value`` with literal-eval coercion
    (cfg_node.py:208-236)
  * resolved-config dump to the experiment logdir (util.py:53-55)

The consumed key schema is SURVEY §3.5.
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field, asdict
from pathlib import Path
from typing import Optional, Tuple

import yaml


@dataclass(frozen=True)
class ExperimentConfig:
    id: str = "experiment"
    logdir: str = "logs"
    randomseed: int = 42
    iterations: int = 100000
    val_iterations: int = 300
    validate_every: int = 1000
    save_every: int = 5000
    print_every: int = 100
    val_print_every: int = 100
    regularizer_lambda: float = 0.0


@dataclass(frozen=True)
class DatasetConfig:
    type: str = "SRNDataset"
    basedir: str = ""
    image_size: int = 128
    world_scale: float = 1.0
    train_batch_size: int = 1
    val_batch_size: int = 1
    near: float = 0.8
    far: float = 1.8
    resolution_level: int = 1
    # llff-only knobs (fern.yml)
    downsample_factor: int = 8
    llffhold: int = 8
    no_ndc: bool = False


@dataclass(frozen=True)
class ModelSpec:
    type: str = "CodeNeRFModel"
    hidden_size: int = 128
    num_layers: int = 8
    skip_connect_ids: Tuple[int, ...] = (4,)


@dataclass(frozen=True)
class EmbeddingSpec:
    shape_code_size: int = 128
    texture_code_size: int = 128


@dataclass(frozen=True)
class ModelsConfig:
    nerf_coarse: ModelSpec = field(default_factory=ModelSpec)
    nerf_fine: ModelSpec = field(default_factory=ModelSpec)
    embedding: EmbeddingSpec = field(default_factory=EmbeddingSpec)


@dataclass(frozen=True)
class OptimizerConfig:
    type: str = "AdamW"
    lr: float = 1e-4
    # None -> falls back to `lr` (vanilla-NeRF configs carry no embedding_lr)
    embedding_lr: Optional[float] = None
    val_type: Optional[str] = None          # None -> `type`
    val_lr: float = 5e-3
    angle_lr: Optional[float] = None        # None -> `val_lr`
    radius_lr: Optional[float] = None       # None -> `val_lr`
    scheduler_gamma: float = 0.1
    scheduler_step_size: int = 5000000
    # Multi-start pose TTO (beyond-reference): probe this many azimuth
    # initializations for `pose_restart_steps` TTO steps each, then
    # continue the full optimization from the lowest-loss candidate.
    # 1 = reference behavior (single init at theta/phi/rho 1.57/0/1.30,
    # eval.py:129-131), which gets stuck when the target azimuth is far
    # from 0.  Restart 0 always uses the reference init.
    pose_restarts: int = 1
    pose_restart_steps: int = 50
    # elevation of the probe inits for restarts >= 1.  theta = 1.57 is the
    # POLE of the reference parametrization (camera z = rho*sin(theta),
    # eval.py:22-38 — its docstring swaps the angle names), where every
    # azimuth init collapses to nearly the same top-down camera and the
    # probes only separate as theta descends.  Probing on a mid-elevation
    # ring keeps the azimuth fan meaningful.  Restart 0 always stays at
    # the exact reference init (1.57, 0, 1.30).
    pose_restart_theta: float = 1.2
    # Post-convergence azimuth-flip rescue (beyond-reference): near
    # fore-aft-symmetric objects (cars) make the 180-degree-flipped pose
    # basin indistinguishable from the true one at probe time — early TTO
    # losses tie and multi-start selection cannot break the tie (observed:
    # pose error ~= pi on 2/8 held-out v2 cars, RESULTS.md session 10).
    # With pose_flip_steps > 0, AFTER the full TTO converges a flipped
    # candidate (phi + pi, optimized codes carried over, fresh optimizer
    # moments) is optimized for this many steps and the per-object winner
    # is selected by comparing both basins' losses on an IDENTICAL ray
    # draw — converged losses separate where probe losses tie.  0 = off.
    pose_flip_steps: int = 0
    # 6-DOF SE(3)-tangent pose refinement after spherical TTO
    # (beyond-reference): the spherical (theta, phi, rho) parametrization
    # (eval.py:22-38) cannot express off-sphere or rolled cameras; with
    # se3_refine_steps > 0, a second stage optimizes codes plus a 6-vector
    # xi with cam_pose = se3_exp(xi) @ spherical_result.  0 = off.
    se3_refine_steps: int = 0
    se3_refine_lr: float = 1e-3
    # Multi-view TTO ray budget (beyond-reference): by default each of the
    # V views draws the full num_random_rays pixel subset, so a V-view TTO
    # step renders V times the rays of the single-view protocol (measured
    # 0.6-0.8 obj/min vs 2.4 at V=3 — RESULTS.md session 13).  With
    # tto_view_ray_split=true each view draws num_random_rays // V rays
    # instead (constant TOTAL ray budget), recovering single-view
    # throughput at the cost of a noisier per-view gradient.
    tto_view_ray_split: bool = False

    @property
    def resolved_embedding_lr(self) -> float:
        return self.lr if self.embedding_lr is None else self.embedding_lr

    @property
    def resolved_val_type(self) -> str:
        return self.type if self.val_type is None else self.val_type

    @property
    def resolved_angle_lr(self) -> float:
        return self.val_lr if self.angle_lr is None else self.angle_lr

    @property
    def resolved_radius_lr(self) -> float:
        return self.val_lr if self.radius_lr is None else self.radius_lr


@dataclass(frozen=True)
class RaySamplerConfig:
    num_random_rays: int = 4096


@dataclass(frozen=True)
class PointSamplerConfig:
    num_coarse: int = 32
    num_fine: int = 128
    near_limit: float = 0.8
    far_limit: float = 1.8
    # NOTE: the reference's labels are inverted vs NeRF convention
    # (point_sampler.py:40-43); "lindepth" = linear in disparity.
    spacing_mode: str = "lindepth"
    perturb: bool = True


@dataclass(frozen=True)
class EmbedderConfig:
    num_encoding_fn_xyz: int = 10
    include_input_xyz: bool = True
    log_sampling_xyz: bool = True
    use_viewdirs: bool = True
    num_encoding_fn_dir: int = 4
    include_input_dir: bool = True
    log_sampling_dir: bool = True


@dataclass(frozen=True)
class StageConfig:
    chunksize: int = 4096
    radiance_field_noise_std: float = 0.0


@dataclass(frozen=True)
class NerfConfig:
    ray_sampler: RaySamplerConfig = field(default_factory=RaySamplerConfig)
    point_sampler: PointSamplerConfig = field(default_factory=PointSamplerConfig)
    embedder: EmbedderConfig = field(default_factory=EmbedderConfig)
    white_background: bool = False
    train: StageConfig = field(default_factory=StageConfig)
    validation: StageConfig = field(default_factory=StageConfig)


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU-native runtime knobs (no reference counterpart)."""
    load_checkpoint: str = ""
    # mesh axis sizes; data-parallel over rays.  0 = all visible devices.
    num_devices: int = 0
    # 'float32' for strict parity, 'bfloat16' for MXU speed-of-light matmuls.
    compute_dtype: str = "bfloat16"
    # use the fused Pallas ray-march trunk kernel for CodeNeRF on TPU.
    # Default off: the XLA ray-structured path measures faster fwd+bwd at
    # every size tested — hidden=256 AND hidden=512 (PERF.md session 4:
    # custom-call boundaries force layout materializations that scale
    # with the activations, so the kernels never win); all Pallas modes
    # are kept as correct, tested alternatives.
    use_pallas: bool = False
    # with use_pallas, also use the fused Pallas backward kernel (recompute
    # fwd in VMEM + backprop in one kernel, f32 weight-grad accumulators
    # carried across the sequential grid) instead of rematerializing
    # through XLA
    pallas_backward: bool = False
    # XLA forward + stored-activation Pallas backward for CodeNeRF on TPU
    # (independent of use_pallas): the whole backward trunk runs in one
    # Pallas kernel reading the bf16 activations the forward already
    # stored — no recompute, cotangent chain stays in VMEM.  See
    # ops/fused.py::make_hybrid_codenerf.
    pallas_hybrid: bool = False
    # single-pass Pallas backward PER linear+relu layer (dx, dw and db in
    # one kernel; XLA's backward makes three passes over the [R*S, hidden]
    # arrays — see ops/layer_bwd.py).  Forward stays XLA.  TPU only.
    pallas_layer_bwd: bool = False
    # rematerialize MLP activations in the backward pass.  With the bf16
    # activation chain the stored stack (~9 x [R*S, hidden] bf16) fits HBM
    # at default batch sizes and storing beats recomputing (176.5k vs
    # 143.6k rays/s measured); enable for very large ray batches / models.
    remat: bool = False
    # walk the ray batch in this many lax.map chunks inside the jitted
    # train step (TPU-native chunksize: same loss/gradient as unchunked,
    # but the render body compiles once per chunk shape — cuts compile
    # time and activation memory for very large ray batches).  1 = off.
    ray_chunks: int = 1
    # when set, capture a jax.profiler trace of a few steady-state train
    # steps into this directory (view with tensorboard / xprof)
    profile_dir: str = ""
    # wrap the train step in jax.experimental.checkify NaN/div guards
    # (debugging aid; costs performance)
    checkify: bool = False
    # split the CodeNeRF fc_out into separate sigma/feat matmuls in the
    # TRAINING step too (the image renderer always splits).  Measured
    # SLOWER under grad at every shape tested — bench (8192 rays, 64+64):
    # 179k fused vs 159k split; flagship (16384 rays, 32+128): 139.6k
    # fused vs 124.9k split — the fused form's single dw matmul beats the
    # relayout tax of its lane-misaligned [.., 257] output even where
    # that tax is profiled at ~20% of the step.  Kept as a measurement
    # lever; gradient equality pinned by tests.
    split_fc_out: bool = False
    # permute the fused fc_out's columns to [feat | sigma] inside the
    # apply so both output slices are lane-aligned (the reference order
    # puts sigma first, making the feat slice start at offset 1 — XLA
    # answers with transposed layouts at flagship shapes).  Each output
    # column's dot product is unchanged, so values are bit-identical.
    # Measured: +4.2% at the flagship shape (139.6k -> 145.5k rays/s at
    # 16384 rays, 32+128), neutral at the bench shape (179.7k vs 179.9k)
    # -> default ON.  See CodeNeRFConfig.fc_out_tail_sigma.
    fc_out_tail_sigma: bool = True
    # during validation, ALSO render each final image through the int8
    # serving path (models/quantized.py: s8xs8 MXU matmuls, int8
    # activation chain) and report its PSNR/SSIM next to the full-
    # precision render — the quality A/B for the quantized server.
    # CodeNeRF models only.
    int8_serving: bool = False
    # with int8_serving: also quantize the positional-encoding stream into
    # layer_xyz1 (s8 encode bytes across HBM + one more s8xs8 matmul) at
    # 1/254 sin/cos amplitude resolution — the measured-quality-trade
    # lever PERF.md session 6 left open.  CodeNeRF models only.
    int8_encode: bool = False


@dataclass(frozen=True)
class Config:
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    models: ModelsConfig = field(default_factory=ModelsConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    nerf: NerfConfig = field(default_factory=NerfConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # -- CfgNode immutability API (cfg_node.py:238-268) ---------------------
    # The reference mutates a shared CfgNode and relies on freeze()/defrost()
    # to police it at runtime.  Here every config is a frozen dataclass, so
    # immutability is structural, not a runtime flag: freeze() is the
    # identity, is_frozen() is always True, and "defrosting" returns a plain
    # nested dict to edit and re-validate through config_from_dict — the
    # functional equivalent of the reference's defrost -> mutate -> freeze
    # cycle, with the type/coercion checks re-applied at re-entry.
    def freeze(self) -> "Config":
        return self

    def is_frozen(self) -> bool:
        return True

    def clone(self) -> "Config":
        """Deep copy (cfg_node.py:266-268).  Frozen dataclasses are safe to
        share, but clone() keeps drop-in compatibility for reference users."""
        import copy
        return copy.deepcopy(self)

    def defrost(self) -> dict:
        """Mutable nested-dict view; re-freeze with ``config_from_dict``."""
        return asdict(self)


# ---------------------------------------------------------------------------
# dict -> dataclass with legacy-schema normalization
# ---------------------------------------------------------------------------

def _filter_fields(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def _build(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d or d[f.name] is None:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _build(f.type, v)
        kwargs[f.name] = v
    return cls(**kwargs)


def _model_spec(d: dict) -> ModelSpec:
    d = dict(d)
    if "skip_connect_ids" in d:
        d["skip_connect_ids"] = tuple(d["skip_connect_ids"])
    # fern.yml's "skip_connect_every" has no working counterpart in the
    # reference model; fall back to the FlexibleNeRFModel default (4,).
    d.pop("skip_connect_every", None)
    return ModelSpec(**_filter_fields(ModelSpec, d))


def _normalize(raw: dict) -> dict:
    """Normalize all three historical schema generations into the modern one."""
    raw = dict(raw or {})
    exp = dict(raw.get("experiment") or {})
    ds = dict(raw.get("dataset") or {})
    mdl = dict(raw.get("models") or {})
    opt = dict(raw.get("optimizer") or {})
    nerf = dict(raw.get("nerf") or {})

    # fern.yml generation: experiment.train_iters, top-level scheduler block,
    # sampler keys living under nerf.train / nerf.validation.
    if "train_iters" in exp and "iterations" not in exp:
        exp["iterations"] = exp.pop("train_iters")
    sched = dict(raw.get("scheduler") or {})
    if sched:
        # lr_decay is "decay in N thousand steps" in the old schema
        opt.setdefault("scheduler_step_size", int(sched.get("lr_decay", 250)) * 1000)
        opt.setdefault("scheduler_gamma", sched.get("lr_decay_factor", 0.1))

    train_stage = dict(nerf.get("train") or {})
    val_stage = dict(nerf.get("validation") or {})

    ray_sampler = dict(nerf.get("ray_sampler") or {})
    if "num_random_rays" not in ray_sampler and "num_random_rays" in train_stage:
        ray_sampler["num_random_rays"] = train_stage["num_random_rays"]

    point_sampler = dict(nerf.get("point_sampler") or {})
    if not point_sampler and "num_coarse" in train_stage:
        # old flat schema: lindisp False = linear in depth, which the modern
        # (inverted) labels call "lindisp" (point_sampler.py:40-43)
        point_sampler = {
            "num_coarse": train_stage.get("num_coarse", 64),
            "num_fine": train_stage.get("num_fine", 128),
            "near_limit": ds.get("near", 0.0),
            "far_limit": ds.get("far", 1.0),
            "perturb": train_stage.get("perturb", True),
            "spacing_mode": "lindepth" if train_stage.get("lindisp", False)
                            else "lindisp",
        }

    # legacy models.coarse/models.fine -> nerf_coarse/nerf_fine
    coarse = mdl.get("nerf_coarse") or mdl.get("coarse") or {}
    fine = mdl.get("nerf_fine") or mdl.get("fine") or {}

    embedder = dict(nerf.get("embedder") or {})
    if not embedder and ("num_encoding_fn_xyz" in coarse):
        embedder = {k: coarse[k] for k in (
            "num_encoding_fn_xyz", "include_input_xyz", "log_sampling_xyz",
            "use_viewdirs", "num_encoding_fn_dir", "include_input_dir",
            "log_sampling_dir") if k in coarse}

    return {
        "experiment": exp,
        "dataset": ds,
        "models": {
            "nerf_coarse": coarse,
            "nerf_fine": fine,
            "embedding": mdl.get("embedding") or {},
        },
        "optimizer": opt,
        "nerf": {
            "ray_sampler": ray_sampler,
            "point_sampler": point_sampler,
            "embedder": embedder,
            "white_background": nerf.get("white_background", False),
            "train": _filter_fields(StageConfig, train_stage),
            "validation": _filter_fields(StageConfig, val_stage),
        },
        "runtime": dict(raw.get("runtime") or {}),
    }


def config_from_dict(raw: dict) -> Config:
    n = _normalize(raw)
    return Config(
        experiment=ExperimentConfig(**_filter_fields(ExperimentConfig,
                                                     n["experiment"])),
        dataset=DatasetConfig(**_filter_fields(DatasetConfig, n["dataset"])),
        models=ModelsConfig(
            nerf_coarse=_model_spec(n["models"]["nerf_coarse"]),
            nerf_fine=_model_spec(n["models"]["nerf_fine"]),
            embedding=EmbeddingSpec(**_filter_fields(EmbeddingSpec,
                                                     n["models"]["embedding"])),
        ),
        optimizer=OptimizerConfig(**_filter_fields(OptimizerConfig,
                                                   n["optimizer"])),
        nerf=NerfConfig(
            ray_sampler=RaySamplerConfig(**_filter_fields(
                RaySamplerConfig, n["nerf"]["ray_sampler"])),
            point_sampler=PointSamplerConfig(**_filter_fields(
                PointSamplerConfig, n["nerf"]["point_sampler"])),
            embedder=EmbedderConfig(**_filter_fields(
                EmbedderConfig, n["nerf"]["embedder"])),
            white_background=bool(n["nerf"]["white_background"]),
            train=StageConfig(**n["nerf"]["train"]),
            validation=StageConfig(**n["nerf"]["validation"]),
        ),
        runtime=RuntimeConfig(**_filter_fields(RuntimeConfig, n["runtime"])),
    )


# -- deprecated / renamed key registries (cfg_node.py:270-319) --------------
# The reference's CfgNode lets experiments register keys that no longer
# exist: deprecated keys are warned-and-ignored at merge time, renamed keys
# raise with the new spelling.  YAML files from earlier schema generations
# are auto-migrated by _normalize above; these registries give the same
# guard rails to DOTTED OVERRIDES, where no normalization runs.  Seeded
# with the spellings the historical reference schemas actually used.
DEPRECATED_KEYS: set = {
    # fern.yml declares it; no working counterpart in the reference model
    # (model.py falls back to its default skip schedule) — see _model_spec.
    "models.nerf_coarse.skip_connect_every",
    "models.nerf_fine.skip_connect_every",
}
# Values are either the new dotted key, or a (new_key, message) tuple when
# the rename is not a pure respelling — the reference's registry supports
# exactly this form (cfg_node.py:282-296) for renames that need a caveat.
RENAMED_KEYS: dict = {
    "experiment.train_iters": "experiment.iterations",
    "models.coarse": "models.nerf_coarse",
    "models.fine": "models.nerf_fine",
    "nerf.train.num_random_rays": "nerf.ray_sampler.num_random_rays",
    # the old key counted in THOUSANDS of steps; _normalize multiplies
    # yaml values by 1000, but a dotted override of the new key is in raw
    # steps — a user following a bare rename hint would set a value 1000x
    # too small (ADVICE round 3)
    "scheduler.lr_decay": ("optimizer.scheduler_step_size",
                           "note the unit change: the old key counted "
                           "thousands of steps, the new key counts steps "
                           "(multiply your value by 1000)"),
    "scheduler.lr_decay_factor": "optimizer.scheduler_gamma",
}


def register_deprecated_key(key: str) -> None:
    """cfg_node.py:270-279: overrides of this key warn and are ignored."""
    if key in DEPRECATED_KEYS:
        raise ValueError(f"key {key} is already registered as deprecated")
    DEPRECATED_KEYS.add(key)


def register_renamed_key(old: str, new: str) -> None:
    """cfg_node.py:282-296: overrides of ``old`` raise, pointing at ``new``."""
    if old in RENAMED_KEYS:
        raise ValueError(f"key {old} is already registered as renamed")
    RENAMED_KEYS[old] = new


def key_is_deprecated(full_key: str) -> bool:
    return full_key in DEPRECATED_KEYS


def key_is_renamed(full_key: str) -> bool:
    return full_key in RENAMED_KEYS


def _apply_override(cfg: Config, dotted: str, value) -> Config:
    """Apply one `a.b.c=value` override immutably (cfg_node.py:208-236),
    honoring the deprecated/renamed registries like the reference's
    merge_from_list."""
    if key_is_deprecated(dotted):
        import warnings
        warnings.warn(f"deprecated config key (ignoring): {dotted}")
        return cfg
    if key_is_renamed(dotted):
        target = RENAMED_KEYS[dotted]
        note = ""
        if isinstance(target, tuple):
            target, note = target[0], f" ({target[1]})"
        raise KeyError(f"key {dotted} was renamed to {target}; "
                       f"please update your override{note}")
    path = dotted.split(".")
    def rec(node, keys):
        if not dataclasses.is_dataclass(node):
            raise KeyError(f"cannot descend into non-config node at {keys}")
        name = keys[0]
        if name not in {f.name for f in dataclasses.fields(node)}:
            raise KeyError(f"unknown config key: {dotted}")
        if len(keys) == 1:
            old = getattr(node, name)
            new = value
            if isinstance(old, tuple) and isinstance(new, list):
                new = tuple(new)
            return dataclasses.replace(node, **{name: new})
        return dataclasses.replace(
            node, **{name: rec(getattr(node, name), keys[1:])})
    return rec(cfg, path)


def _load_py_config(path: Path) -> dict:
    """Python-source config: a module exporting a ``cfg`` dict attribute
    (reference cfg_node.py:370-384)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("codenerf_config_source",
                                                  path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if not hasattr(module, "cfg"):
        raise ValueError(f"python config {path} must export a 'cfg' dict")
    if not isinstance(module.cfg, dict):
        raise ValueError(f"'cfg' in {path} must be a dict, "
                         f"got {type(module.cfg)}")
    return module.cfg


def load_config(path: str | Path, overrides: Optional[list] = None) -> Config:
    """Load a YAML or python-source config (any schema generation) +
    dotted overrides.

    Overrides are strings like ``optimizer.lr=3e-4``; values go through
    ``ast.literal_eval`` with string fallback, as in the reference
    (cfg_node.py:386-414).
    """
    path = Path(path)
    if path.suffix == ".py":
        raw = _load_py_config(path)
    else:
        with open(path) as f:
            raw = yaml.safe_load(f)
    cfg = config_from_dict(raw)
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        try:
            value = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            value = val
        cfg = _apply_override(cfg, key.strip(), value)
    return cfg


def dump_config(cfg: Config, path: str | Path) -> None:
    """Write the fully-resolved config as YAML for provenance
    (reference util.py:53-55)."""
    d = asdict(cfg)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
