"""Atomic full-state checkpointing via orbax.

The reference saves weights only and mis-restores the warm-up counter
(``train.py:133-135``; optimizer moments and RNG are lost on resume, SURVEY
§5).  Here the whole :class:`TrainState` pytree — params, BN stats, spectral
vectors, Adamax moments, step, RNG key — round-trips atomically, with
auto-resume from the latest step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir))


def save_checkpoint(ckpt_dir: str, step: int, state) -> None:
    with _manager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


class AsyncCheckpointWriter:
    """Persistent checkpoint manager with asynchronous (overlapped) saves.

    ``save`` snapshots the state to host memory synchronously (so later
    donation/mutation of the live train state cannot corrupt the write) and
    serializes to disk in a background thread — the train loop keeps
    stepping while the previous checkpoint is still being written, which
    matters when the state is hundreds of MB and the step is milliseconds.
    ``wait`` (or closing) blocks until every pending save is durable.

    A save for a step <= the latest saved step is skipped (orbax's default
    save policy), which makes the trainer's final save idempotent with the
    last periodic one.
    """

    def __init__(self, ckpt_dir: str):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(
                enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore into the structure of ``state_template`` (a concrete state)."""
    with _manager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        if step not in mgr.all_steps():
            # Explicit: orbax's own error for a missing step directory is a
            # cryptic Composite-args complaint (seen live via POST /reload).
            raise FileNotFoundError(
                f"no checkpoint at step {step} under {ckpt_dir} "
                f"(available: {sorted(mgr.all_steps())})"
            )
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
