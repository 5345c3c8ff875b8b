"""Orbax checkpointing of the full train state (SURVEY.md §5.4).

The reference relies on Lightning's default checkpointing of
``state_dict`` (including registered calibration buffers); here the whole
``{model state, optimizer state, step}`` — model state carries BatchNorm
stats and head calibration buffers — round-trips through orbax.
"""

import os

import orbax.checkpoint as ocp


def save_checkpoint(trainer, path: str) -> None:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, trainer.state_dict(), force=True)


def restore_checkpoint(trainer, path: str) -> None:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=trainer.state_dict())
    trainer.load_state_dict(restored)
