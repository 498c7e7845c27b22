"""Decompose the MultiScale encoder's TPU cost: per-scale pixel-LSTMs,
super-state folds, and the two BasicEncoder4 heads."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models.encoders import (
    LSTMEncoder,
    MultiScaleBasicEncoder4,
    MultiScaleEncoder,
)

H, W = 480, 640


def timeit(fn, fetch, n_it=10):
    out = fn()
    fetch(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n_it)
    return best * 1e3


def main():
    rng = np.random.RandomState(0)
    events = jnp.asarray(rng.rand(5, H, W, 5), jnp.bfloat16)
    images = jnp.asarray(rng.rand(1, H, W, 3), jnp.bfloat16)
    mask = jnp.asarray([False, False, False, False, True])

    enc = MultiScaleEncoder()
    state = MultiScaleEncoder.init_state(H, W)
    params = enc.init(
        jax.random.PRNGKey(0), events.astype(jnp.float32),
        images.astype(jnp.float32), mask, None, 1,
    )
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    s16 = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), state)

    full = jax.jit(
        lambda p, ev, im, mk, st: enc.apply(p, ev, im, mk, st, 1)
    )
    t_full = timeit(
        lambda: full(p16, events, images, mask, s16),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
    )
    print(f"encoder full  : {t_full:6.2f} ms")

    # per-scale LSTM encoders alone
    for si, scale in enumerate((1, 2, 4)):
        sub = LSTMEncoder(5, scale, 16 * scale)
        sp = {"params": params["params"][f"ev_encoders_{si}"]}
        sp16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32
            else x, sp,
        )
        f = jax.jit(lambda p, ev: sub.apply(p, ev))
        t = timeit(
            lambda: f(sp16, events),
            lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
        )
        print(f"ev lstm s{scale}    : {t:6.2f} ms")


if __name__ == "__main__":
    main()
