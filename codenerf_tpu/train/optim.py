"""Optimizer construction with the reference's parameter-group semantics.

Reference (util.py:147-172): one torch optimizer with three param groups —
coarse MLP @ lr, fine MLP @ lr, embedding tables @ embedding_lr — under a
LambdaLR continuous exponential decay ``gamma ** (step / step_size)`` applied
multiplicatively to every group.  Here: optax.multi_transform with two
schedules (model lr, embedding lr), both decayed by the same continuous
exponential.  Optimizer type is a string registry like the reference's
``getattr(torch.optim, type)`` (util.py:159).
"""

from __future__ import annotations

from typing import Callable

import optax


def _continuous_exponential(base_lr: float, gamma: float, step_size: int
                            ) -> Callable:
    """lr(step) = base_lr * gamma ** (step / step_size) — the reference's
    LambdaLR closure (util.py:166-170), continuous in step."""
    def schedule(step):
        return base_lr * gamma ** (step / step_size)
    return schedule


def lr_at_step(base_lr: float, gamma: float, step_size: int, step: int) -> float:
    return base_lr * gamma ** (step / step_size)


# The full torch.optim menagerie resolvable by name — the reference's
# contract is ``getattr(torch.optim, cfg.optimizer.type)`` (util.py:159),
# so any torch optimizer name a user puts in a config must resolve here.
# Defaults follow torch's where they differ from optax's (e.g. RMSprop's
# smoothing alpha is 0.99 in torch vs optax's 0.9 decay default).
_OPTIMIZERS = {
    # torch.optim.AdamW default weight_decay is 1e-2
    "AdamW": lambda lr: optax.adamw(lr, weight_decay=1e-2),
    "Adam": optax.adam,
    "Adamax": optax.adamax,
    "NAdam": optax.nadam,
    "RAdam": optax.radam,
    "Adagrad": optax.adagrad,
    "Adadelta": optax.adadelta,
    "SGD": optax.sgd,
    # torch ASGD's averaging has no optax analog; plain averaged-free SGD
    # is the closest semantics for the step itself
    "ASGD": optax.sgd,
    "RMSprop": lambda lr: optax.rmsprop(lr, decay=0.99, eps=1e-8),
    # Rprop maintains per-parameter adaptive step sizes seeded from a
    # scalar; a decay schedule does not apply (evaluated at step 0)
    "Rprop": lambda lr: optax.rprop(lr(0) if callable(lr) else lr),
    # SparseAdam is Adam over sparse grads; TPU grads are dense
    "SparseAdam": optax.adam,
}

# torch names with no sensible GradientTransformation mapping (LBFGS needs
# a line search driven by value_and_grad closures)
_UNSUPPORTED = {"LBFGS": "use a first-order optimizer on TPU"}


def make_single_optimizer(opt_type: str, schedule) -> optax.GradientTransformation:
    if opt_type in _UNSUPPORTED:
        raise ValueError(f"optimizer type {opt_type} is not supported: "
                         f"{_UNSUPPORTED[opt_type]}")
    if opt_type not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer type: {opt_type} "
                         f"(available: {sorted(_OPTIMIZERS)})")
    return _OPTIMIZERS[opt_type](schedule)


def build_optimizer(opt_cfg, has_codes: bool = True
                    ) -> optax.GradientTransformation:
    """Optimizer over the full params pytree {coarse, fine, codes?}.

    coarse/fine use ``lr``, codes use ``embedding_lr`` (falling back to lr),
    both under the continuous exponential decay.
    """
    gamma = opt_cfg.scheduler_gamma
    step_size = opt_cfg.scheduler_step_size
    model_sched = _continuous_exponential(opt_cfg.lr, gamma, step_size)
    if not has_codes:
        return make_single_optimizer(opt_cfg.type, model_sched)

    emb_sched = _continuous_exponential(opt_cfg.resolved_embedding_lr,
                                        gamma, step_size)
    labels = {"coarse": "model", "fine": "model", "codes": "embedding"}

    def label_fn(params):
        return {k: labels.get(k, "model") for k in params}

    return optax.multi_transform(
        {"model": make_single_optimizer(opt_cfg.type, model_sched),
         "embedding": make_single_optimizer(opt_cfg.type, emb_sched)},
        label_fn)


def build_tto_optimizer(opt_cfg) -> optax.GradientTransformation:
    """Test-time-optimization optimizer (reference eval.py:133-138): codes @
    val_lr, (theta, phi) @ angle_lr, rho @ radius_lr; no decay schedule."""
    groups = {
        "codes": make_single_optimizer(opt_cfg.resolved_val_type,
                                       opt_cfg.val_lr),
        "angles": make_single_optimizer(opt_cfg.resolved_val_type,
                                        opt_cfg.resolved_angle_lr),
        "radius": make_single_optimizer(opt_cfg.resolved_val_type,
                                        opt_cfg.resolved_radius_lr),
    }

    def label_fn(params):
        return {"z_s": "codes", "z_t": "codes",
                "theta": "angles", "phi": "angles", "rho": "radius"}

    return optax.multi_transform(groups, label_fn)


def build_se3_refine_optimizer(opt_cfg) -> optax.GradientTransformation:
    """Second-stage TTO optimizer (beyond-reference): codes @ val_lr,
    SE(3)-tangent pose update xi @ se3_refine_lr; no decay schedule."""
    groups = {
        "codes": make_single_optimizer(opt_cfg.resolved_val_type,
                                       opt_cfg.val_lr),
        "xi": make_single_optimizer(opt_cfg.resolved_val_type,
                                    opt_cfg.se3_refine_lr),
    }

    def label_fn(params):
        return {"z_s": "codes", "z_t": "codes", "xi": "xi"}

    return optax.multi_transform(groups, label_fn)
