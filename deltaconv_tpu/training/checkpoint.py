"""Checkpointing with orbax.

Upgrades the reference's bare ``torch.save(model.state_dict())``
(train_modelnet.py:79-82, no optimizer state, no mid-run resume) to
full-state checkpoints: parameters, BatchNorm statistics, optimizer
state, and step counter, so training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "restore_any", "latest_step"]


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Saves a TrainState under ``ckpt_dir/step_<N>``."""
    step = int(state.step) if step is None else int(step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    """The largest saved step number, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_any(path: str, target_state, params_only: bool = False):
    """Restores either an orbax checkpoint dir/step or a PyTorch
    ``.pt`` state_dict (via the weight importer) into a TrainState.

    ``params_only``: restore parameters + BatchNorm statistics only,
    keeping the target's optimizer state — eval-only consumers must
    not depend on the TRAINING run's optimizer/schedule tree (a
    checkpoint written under a cosine schedule has schedule state an
    eval-time constant-lr state lacks).
    """
    if path.endswith(".pt") or path.endswith(".pth"):
        from ..utils.torch_import import import_torch_checkpoint

        params, batch_stats = import_torch_checkpoint(path)
        return target_state.replace(params=params, batch_stats=batch_stats)
    return restore_checkpoint(path, target_state,
                              params_only=params_only)


def restore_checkpoint(ckpt_dir: str, target_state,
                       step: Optional[int] = None,
                       params_only: bool = False):
    """Restores a TrainState saved by :func:`save_checkpoint`.

    Args:
      ckpt_dir: checkpoint root.
      target_state: a template TrainState with matching structure
        (``params_only=True`` relaxes this to the params/batch_stats
        subtrees — the optimizer tree may differ).
      step: specific step; defaults to the latest.
    """
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    if params_only:
        # Structure-free read, then graft the two weight subtrees:
        # restoring into a full TrainState template would require the
        # SAVING run's exact optimizer/schedule state classes.
        raw = _checkpointer().restore(path)
        return target_state.replace(params=raw["params"],
                                    batch_stats=raw["batch_stats"])
    restored = _checkpointer().restore(path, item=jax.device_get(target_state))
    return restored
