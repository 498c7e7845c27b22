"""Mesh layer: data-parallel training and scene-sharded evaluation.

The reference has no distributed path at all (no torch.distributed/NCCL
anywhere; single pinned GPU — SURVEY.md §2.3). The TPU-native equivalents:

  * training: batch windows sharded over a 1-D `Mesh("batch")` with
    `NamedSharding`; parameters replicated. Gradients are averaged by XLA's
    sharding propagation (an all-reduce over ICI) — no hand-written
    collectives needed.
  * evaluation: independent scenes round-robined across devices by the host
    (each VO loop is sequential per scene).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch: Any, axis: str = "batch"):
    """Place a pytree with a leading per-sample dim onto the mesh, sharded
    along its first axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def make_train_step(
    fwd: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh | None = None,
    axis: str = "batch",
    structure_only: bool = False,
):
    """Build the jitted DP train step.

    fwd(params, events, images, poses, disps, intrinsics, mask, rng) -> (loss, metrics)
    batch: dict of arrays with leading batch dim B (B % n_devices == 0).
    """

    def loss_fn(params, batch, rngs):
        def one(ev, im, po, di, K, mk, r):
            return fwd(params, ev, im, po, di, K, mk, r,
                       structure_only=structure_only)

        losses, metrics = jax.vmap(one)(
            batch["events"], batch["images"], batch["poses"], batch["disps"],
            batch["intrinsics"], batch["mask"], rngs,
        )
        return losses.mean(), jax.tree_util.tree_map(jnp.mean, metrics)

    def train_step(params, opt_state, batch, rng):
        B = batch["events"].shape[0]
        rngs = jax.random.split(rng, B)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rngs
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    batch_sh = {
        "events": data, "images": data, "poses": data, "disps": data,
        "intrinsics": data, "mask": data,
    }
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, batch_sh, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1),
    )


def eval_shard_scenes(scenes: list, n_workers: int) -> list[list]:
    """Round-robin scene assignment for the eval fleet (host-side)."""
    return [scenes[i::n_workers] for i in range(n_workers)]
