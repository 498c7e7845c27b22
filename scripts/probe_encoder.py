"""TPU timing breakdown of the MultiScale encoder at 480x640, T=1, bf16:
full encode vs LSTM banks vs superstate folds vs the two CNN heads.

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/probe_encoder.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder

H, W = 480, 640


def timeit(fn, fetch, n_it=20):
    fn()
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
    enc = MultiScaleEncoder()
    ep = {"params": params["params"]["encoder"]}
    ep16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, ep
    )

    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.bfloat16)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.bfloat16)
    mask = jnp.asarray([True])
    st = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), MultiScaleEncoder.init_state(H, W)
    )

    # full encode
    full = jax.jit(lambda p, e, i, m, s: enc.apply(p, e, i, m, s, 1))
    t_full = timeit(
        lambda: full(ep16, ev, im, mask, st),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
    )

    # LSTM banks only (all scales, both modalities)
    from rampvo_tpu.models.encoders import LSTMEncoder

    def lstms(p, e, i):
        outs = []
        for si, scale in enumerate((1, 2, 4)):
            hid = 16 * scale
            oev, _ = LSTMEncoder(5, scale, hid).apply(
                {"params": p["params"][f"ev_encoders_{si}"]}, e
            )
            oim, _ = LSTMEncoder(3, scale, hid).apply(
                {"params": p["params"][f"im_encoders_{si}"]}, i
            )
            outs.append((oev, oim))
        return outs

    lj = jax.jit(lstms)
    t_lstm = timeit(
        lambda: lj(ep16, ev, im),
        lambda o: float(jnp.sum(o[0][0].astype(jnp.float32))),
    )

    # heads only (on dummy super-states of the right shapes)
    from rampvo_tpu.models.encoders import MultiScaleBasicEncoder4

    sss = [
        jnp.asarray(rng.rand(1, *st["ss"][si].shape), jnp.bfloat16)
        for si in range(3)
    ]

    def heads(p, s0, s1, s2):
        f = MultiScaleBasicEncoder4(128, "instance", 16).apply(
            {"params": p["params"]["fmap_encoder"]}, s0, s1, s2
        )
        i = MultiScaleBasicEncoder4(384, "none", 16).apply(
            {"params": p["params"]["imap_encoder"]}, s0, s1, s2
        )
        return f, i

    hj = jax.jit(heads)
    t_heads = timeit(
        lambda: hj(ep16, *sss),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
    )

    print(f"encode full : {t_full:6.2f} ms")
    print(f"  lstm banks: {t_lstm:6.2f} ms")
    print(f"  heads x2  : {t_heads:6.2f} ms")
    print(f"  rest      : {t_full - t_lstm - t_heads:6.2f} ms (folds/gather)")


if __name__ == "__main__":
    main()
