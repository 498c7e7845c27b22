"""On-chip split of the PRODUCTION (Pallas channel-major) MultiScale
encoder at 480x640, T=1, bf16: full encode vs the LSTM+fold chain vs the
two pyramid CNN heads — and the heads again at batch=8 (the chunk-scan
batched-heads candidate: the chain is recurrent per frame, the heads are
not, so a K-frame chunk can run them batched).

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/probe_encoder_pallas.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleBasicEncoder4
from rampvo_tpu.ops.encoder_pallas import (
    multiscale_init_state_cm,
    pallas_multiscale_encode,
)

H, W = 480, 640


def timeit(fn, fetch, n_it=20):
    fetch(fn())
    best = float("inf")
    for _ in range(2):
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
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    enc_p = params["params"]["patchify"]["encoder"]
    enc_p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        enc_p,
    )

    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.bfloat16)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.bfloat16)
    mask = jnp.asarray([True])
    st = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), multiscale_init_state_cm(H, W)
    )

    full = jax.jit(
        lambda p, e, i, m, s: pallas_multiscale_encode(p, e, i, m, s)
    )
    t_full = timeit(
        lambda: full(enc_p16, ev, im, mask, st),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
    )

    # chain only (heads dead -> DCE'd)
    chain = jax.jit(
        lambda p, e, i, m, s: pallas_multiscale_encode(p, e, i, m, s)[2]
    )
    t_chain = timeit(
        lambda: chain(enc_p16, ev, im, mask, st),
        lambda o: float(jnp.sum(o["ss"][0].astype(jnp.float32))),
    )

    # heads only, batch 1 and batch 8, on dummy super-states with the
    # per-scale ss NHWC shapes derived from the state layout
    shapes = []
    for si, s in enumerate((1, 2, 4)):
        hdim, hw = st["ss"][si].shape
        Hs = H if s == 1 else (H + 2 - (s + 1)) // s + 1
        Ws = W if s == 1 else (W + 2 - (s + 1)) // s + 1
        assert Hs * Ws == hw, (Hs, Ws, hw)
        shapes.append((Hs, Ws, hdim))

    def heads(p, s0, s1, s2):
        f = MultiScaleBasicEncoder4(128, "instance", 16).apply(
            {"params": p["fmap_encoder"]}, s0, s1, s2
        )
        i = MultiScaleBasicEncoder4(384, "none", 16).apply(
            {"params": p["imap_encoder"]}, s0, s1, s2
        )
        return f, i

    hj = jax.jit(heads)
    for B in (1, 8):
        sss = [
            jnp.asarray(rng.rand(B, *sh), jnp.bfloat16) for sh in shapes
        ]
        t_h = timeit(
            lambda sss=sss: hj(enc_p16, *sss),
            lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
        )
        print(f"heads x2 (batch {B}): {t_h:6.2f} ms "
              f"({t_h / B:5.2f} ms/frame)")

    print(f"encode full (pallas): {t_full:6.2f} ms")
    print(f"  chain only        : {t_chain:6.2f} ms")
    print(f"  full - chain      : {t_full - t_chain:6.2f} ms (heads+glue)")


if __name__ == "__main__":
    main()
