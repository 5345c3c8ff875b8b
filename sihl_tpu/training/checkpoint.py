"""Orbax checkpointing of the full train state (SURVEY.md §5.4).

The reference relies on Lightning's default checkpointing of
``state_dict`` (including registered calibration buffers); here the whole
``{model state, optimizer state, step}`` — model state carries BatchNorm
stats and head calibration buffers — round-trips through orbax.
"""

import os

import jax
import orbax.checkpoint as ocp


def save_checkpoint(trainer, path: str) -> None:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, trainer.state_dict(), force=True)


def restore_checkpoint(trainer, path: str) -> None:
    path = os.path.abspath(path)
    item = trainer.state_dict()
    # take shardings from the live train state so orbax does not fall
    # back to reading the sharding file (slower, and unsafe across
    # topology changes).  ONLY the sharding is pinned — dtype and shape
    # stay None so arrays restore as saved (load_state_dict documents
    # tolerance to dtype/shape drift and resets the scan runner for it)
    restore_args = jax.tree_util.tree_map(
        lambda v: ocp.ArrayRestoreArgs(sharding=v.sharding)
        if isinstance(v, jax.Array)
        else ocp.RestoreArgs(),
        item,
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=item, restore_args=restore_args)
    trainer.load_state_dict(restored)
