"""Training state pytree and initialization."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from codenerf_tpu.config.schema import Config
from codenerf_tpu.models.codes import init_code_tables
from codenerf_tpu.pipeline import RenderSettings, init_model
from codenerf_tpu.train.optim import build_optimizer


class TrainState(NamedTuple):
    """All mutable training state as one donatable pytree.

    ``step`` rides in the state so the LR-schedule position survives
    checkpoint/resume (fixing the reference's scheduler-state loss on resume,
    SURVEY §5 checkpoint note).
    """
    params: Any            # {"coarse": .., "fine": .., "codes": ..?}
    opt_state: Any
    step: jax.Array        # int32 scalar


def init_train_state(key: jax.Array, cfg: Config, settings: RenderSettings,
                     num_objects: int) -> tuple[TrainState, Any]:
    """Initialize params + optimizer.  Returns (state, optax optimizer)."""
    kc, kf, ke = jax.random.split(key, 3)
    has_codes = settings.coarse_cfg.__class__.__name__ == "CodeNeRFConfig"
    params = {
        "coarse": init_model(kc, settings.coarse_cfg),
        "fine": init_model(kf, settings.fine_cfg),
    }
    if has_codes:
        params["codes"] = init_code_tables(
            ke, num_objects,
            cfg.models.embedding.shape_code_size,
            cfg.models.embedding.texture_code_size)
    optimizer = build_optimizer(cfg.optimizer, has_codes=has_codes)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32)), optimizer
