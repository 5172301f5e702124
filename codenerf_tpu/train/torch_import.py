"""Import reference torch checkpoints into this framework.

The reference saves ``torch.save({"iter", "model_nerf_coarse_state_dict",
"model_nerf_fine_state_dict", "model_embedding_state_dict",
"optimizer_state_dict"})`` (reference train.py:129-138).  This module maps
those state dicts onto our parameter pytrees so a user of the reference can
bring an already-trained model across:

  * torch ``Linear.weight`` is [out, in]; our convention is w = weight.T
    ([in, out], y = x @ w + b).
  * DDP checkpoints carry a ``module.`` prefix on every key — stripped,
    matching reference util.py:204-210.
  * CodeNeRFModel layer names map 1:1 (model.py:145-156).
    FlexibleNeRFModel's ``layers_dir.0`` maps to our ``layer_dir1``
    (model.py:41-42); ``layers_xyz.{i}`` to ``layers_xyz[i]``.
  * ShapeTextureEmbedding's two nn.Embedding tables (model.py:99-100) map
    to the ``codes`` {"shape", "texture"} arrays.

Adam moment tensors are NOT imported: the reference's torch.optim state is
keyed by parameter id and its hyperparameters live in the config; resuming
cross-framework restarts the optimizer (the step counter — and therefore
the LR-schedule position — IS imported).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def _strip_ddp_prefix(sd: Mapping[str, Any]) -> dict:
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def _linear(sd: Mapping[str, Any], name: str) -> dict:
    return {"w": jnp.asarray(_np(sd[f"{name}.weight"]).T),
            "b": jnp.asarray(_np(sd[f"{name}.bias"]))}


def codenerf_params_from_torch(state_dict: Mapping[str, Any]) -> dict:
    """CodeNeRFModel state dict -> our param pytree (model.py:145-156)."""
    sd = _strip_ddp_prefix(state_dict)
    names = ["layer_xyz1", "layer_xyz2", "fc_out", "shape_code_layer1",
             "shape_code_layer2", "texture_code_layer1", "layer_dir1",
             "layer_dir2", "fc_rgb"]
    return {name: _linear(sd, name) for name in names}


def flexible_params_from_torch(state_dict: Mapping[str, Any]) -> dict:
    """FlexibleNeRFModel state dict -> our param pytree (model.py:31-47)."""
    sd = _strip_ddp_prefix(state_dict)
    params = {"layer1": _linear(sd, "layer1")}
    trunk = []
    i = 0
    while f"layers_xyz.{i}.weight" in sd:
        trunk.append(_linear(sd, f"layers_xyz.{i}"))
        i += 1
    params["layers_xyz"] = trunk
    if "fc_feat.weight" in sd:          # use_viewdirs branch
        params["fc_feat"] = _linear(sd, "fc_feat")
        params["layer_dir1"] = _linear(sd, "layers_dir.0")
        params["fc_alpha"] = _linear(sd, "fc_alpha")
        params["fc_rgb"] = _linear(sd, "fc_rgb")
    else:
        params["fc_out"] = _linear(sd, "fc_out")
    return params


def codes_from_torch(state_dict: Mapping[str, Any]) -> dict:
    """ShapeTextureEmbedding state dict -> codes tables (model.py:99-100)."""
    sd = _strip_ddp_prefix(state_dict)
    return {"shape": jnp.asarray(_np(sd["shape_embedding.weight"])),
            "texture": jnp.asarray(_np(sd["texture_embedding.weight"]))}


def params_from_torch_checkpoint(ckpt: Mapping[str, Any],
                                 model_type: str = "CodeNeRFModel") -> tuple:
    """Reference checkpoint dict -> (params pytree, step).

    ``ckpt`` is the dict torch.save'd at reference train.py:130-136 (load
    with ``torch.load(path, map_location="cpu")``).
    """
    convert = (codenerf_params_from_torch if model_type == "CodeNeRFModel"
               else flexible_params_from_torch)
    params = {
        "coarse": convert(ckpt["model_nerf_coarse_state_dict"]),
        "fine": convert(ckpt["model_nerf_fine_state_dict"]),
    }
    if model_type == "CodeNeRFModel":
        params["codes"] = codes_from_torch(ckpt["model_embedding_state_dict"])
    return params, int(ckpt.get("iter", 0))


def import_torch_checkpoint(ckpt_path: str, cfg, settings,
                            out_dir: str) -> int:
    """Convert a reference .ckpt file into an Orbax checkpoint directory.

    Builds a fresh TrainState for ``cfg`` (fresh optimizer state), replaces
    its parameters with the imported ones and its step with the reference's
    ``iter``, and saves with the standard checkpoint writer so ``train.py
    --load-checkpoint``/``eval.py`` consume it directly.  Returns the step.
    """
    import torch
    import jax

    from codenerf_tpu.train.checkpoint import save_checkpoint
    from codenerf_tpu.train.state import TrainState, init_train_state

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model_type = cfg.models.nerf_coarse.type
    params, step = params_from_torch_checkpoint(ckpt, model_type)

    num_objects = (params["codes"]["shape"].shape[0]
                   if "codes" in params else 1)
    state, _ = init_train_state(jax.random.PRNGKey(0), cfg, settings,
                                num_objects)
    # template-shape check: imported leaves must match the config's shapes
    for path, (a, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            zip(jax.tree.leaves(state.params), jax.tree.leaves(params))):
        if a.shape != b.shape:
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path[0])}: "
                f"config says {a.shape}, checkpoint has {b.shape}")
    state = TrainState(params=params, opt_state=state.opt_state,
                       step=jnp.asarray(step, jnp.int32))
    save_checkpoint(out_dir, state)
    return step
