"""Orbax checkpointing of params/opt_state/step (TPU-native counterpart of
the reference's torch.save dicts, train.py:180-196)."""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


def save_checkpoint(directory: str, step: int, params, opt_state=None,
                    extra: dict | None = None):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params, "step": step}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if extra:
        payload["extra"] = extra
    ckptr.save(os.path.join(directory, f"step_{step:08d}"), payload, force=True)


def restore_checkpoint(path: str):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
