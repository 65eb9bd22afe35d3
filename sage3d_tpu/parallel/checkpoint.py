"""Checkpoint/restore for scene-optimization training (orbax-backed).

The reference has no model checkpointing at all — its resume story is
file-existence checks per pipeline stage (SURVEY.md 5.4). The TPU framework's
training loops (parallel/train.py) get real checkpointing: sharded TrainState
save/restore via orbax, preserving the FSDP parameter shardings on restore.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax


def _manager(ckpt_dir, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    path = Path(ckpt_dir).absolute()
    path.mkdir(parents=True, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(path, options=options)


def save_train_state(ckpt_dir, state, step: Optional[int] = None,
                     max_to_keep: int = 3) -> int:
    """Save a TrainState (any pytree). Returns the step written."""
    import orbax.checkpoint as ocp
    if step is None:
        step = int(state.step)
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return step


def restore_train_state(ckpt_dir, template, step: Optional[int] = None):
    """Restore into ``template``'s structure/shardings (None if no ckpt)."""
    import orbax.checkpoint as ocp
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def latest_step(ckpt_dir) -> Optional[int]:
    import orbax.checkpoint as ocp
    path = Path(ckpt_dir).absolute()
    if not path.exists():
        return None
    mgr = _manager(path)
    step = mgr.latest_step()
    mgr.close()
    return step
