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
    """Restore a checkpoint. `path` may be a specific step_XXXXXXXX dir or
    a run directory containing several — the latest step is restored."""
    path = os.path.abspath(path)
    if os.path.isdir(path):
        steps = sorted(
            d for d in os.listdir(path)
            if d.startswith("step_")
            and os.path.isdir(os.path.join(path, d))
        )
        if steps:
            path = os.path.join(path, steps[-1])
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)
