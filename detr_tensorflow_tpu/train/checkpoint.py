"""Orbax checkpointing with resume.

The reference can only *load* its published weights and never saves
anything during training (SURVEY.md §5: zero ``save_weights`` calls,
``global_step`` restarts at 0). Here the full train state — parameters,
frozen BN statistics, all three Adam moments, accumulation buffers, and
the step counter — round-trips through Orbax, and ``restore_latest``
resumes mid-run.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .engine import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(state: TrainState, ckpt_dir: str, step: Optional[int] = None) -> str:
    """Write the complete train state under ``ckpt_dir/<step>``."""
    if step is None:
        step = int(jax.device_get(state.step))
    path = os.path.join(_abs(ckpt_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    ckpt_dir = _abs(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(template: TrainState, ckpt_dir: str, step: int) -> TrainState:
    """Restore into the structure of ``template`` (an initialized state)."""
    path = os.path.join(_abs(ckpt_dir), str(step))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.device_get(template))


def restore_latest(template: TrainState, ckpt_dir: str) -> Optional[TrainState]:
    step = latest_step(ckpt_dir)
    if step is None:
        return None
    return restore_checkpoint(template, ckpt_dir, step)
