"""A/B the MultiScale encoder implementations in ONE process at 480x640,
T=1, bf16 (the inference configuration): flax (current default) vs
fused-XLA (models/encoders_fused.py) vs channel-major Pallas
(ops/encoder_pallas.py).

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/ab_encoder.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder

H, W = 480, 640


def timeit(fn, fetch, n_it=20):
    out = fn()
    fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = fn()
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n_it)
    return best * 1e3


def main():
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    enc = MultiScaleEncoder()
    ep = {"params": params["params"]["patchify"]["encoder"]}
    to16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    ep16 = to16(ep)

    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.bfloat16)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.bfloat16)
    mask = jnp.asarray([True])
    st = to16(MultiScaleEncoder.init_state(H, W))

    fetch = lambda o: float(jnp.sum(o[0].astype(jnp.float32)))

    flax_fn = jax.jit(lambda p, e, i, m, s: enc.apply(p, e, i, m, s, 1))
    t_flax = timeit(lambda: flax_fn(ep16, ev, im, mask, st), fetch)
    print(f"flax:   {t_flax:6.2f} ms", flush=True)

    from rampvo_tpu.ops.encoder_pallas import pallas_multiscale_encode

    pall_fn = jax.jit(
        lambda p, e, i, m, s: pallas_multiscale_encode(p["params"], e, i,
                                                       m, s)
    )
    t_pal = timeit(lambda: pall_fn(ep16, ev, im, mask, st), fetch)
    print(f"pallas: {t_pal:6.2f} ms", flush=True)

    from rampvo_tpu.models.encoders_fused import fused_multiscale_encode

    fus_fn = jax.jit(
        lambda p, e, i, m, s: fused_multiscale_encode(p["params"], e, i,
                                                      m, s)
    )
    t_fus = timeit(lambda: fus_fn(ep16, ev, im, mask, st), fetch)
    print(f"fused:  {t_fus:6.2f} ms", flush=True)

    print(f"\npallas vs flax: {t_pal - t_flax:+.2f} ms")


if __name__ == "__main__":
    main()
