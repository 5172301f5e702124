"""Orbax checkpointing.

Replaces torch.save/load of model+optimizer state dicts
(reference train.py:129-138, util.py:175-213).  Improvements over the
reference, per SURVEY §5:

  * the step (and therefore the LR-schedule position) is part of the state —
    the reference resets LR decay on resume (train.py:130-136)
  * restore is process-uniform by construction (no map_location / "module."
    prefix games)

Layout: <logdir>/<id>/checkpoints/<step>/ managed by
orbax CheckpointManager (keeps the latest few, async-safe).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from codenerf_tpu.train.state import TrainState


def _manager(directory: str | Path, max_to_keep: int = 3
             ) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(directory: str | Path, state: TrainState,
                    max_to_keep: int = 3) -> None:
    mgr = _manager(directory, max_to_keep)
    step = int(jax.device_get(state.step))
    mgr.save(step, args=ocp.args.StandardSave(
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step}))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str | Path) -> Optional[int]:
    d = Path(directory)
    if not d.exists():
        return None
    mgr = _manager(d)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str | Path, state: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Restore into the structure of ``state`` (shapes/dtypes as template)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])
