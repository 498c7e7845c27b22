"""TPU timing breakdown of _keyframe: cell-mean flow gate vs lattice remap
vs map shifts. Run alone: PYTHONPATH=.:/root/.axon_site python scripts/probe_keyframe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import _keyframe, make_vo_frame
from rampvo_tpu.vo.state import host_of_row, init_state

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
    cfg = VOConfig(
        BUFFER_SIZE=512, MAX_FRAMES=512, MIXED_PRECISION=True,
        PROBE_THRESH=-1.0,
    )
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    state = init_state(cfg, MultiScaleEncoder.init_state(H, W), H, W)
    vo_frame = make_vo_frame(cfg, vonet)
    rng = np.random.RandomState(0)
    intr = jnp.asarray([320.0, 320.0, W / 2, H / 2], jnp.float32)
    mask = jnp.asarray([True])
    for _ in range(30):
        ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
        im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        state = vo_frame(params, state, ev, im, mask, intr)
    float(jnp.sum(state.poses[:8]))
    print(f"warmed: n={int(state.n)}")

    NI, T, M = cfg.NI, cfg.T, cfg.M

    # full keyframe
    kf = jax.jit(lambda st: _keyframe(cfg, st))
    t_full = timeit(lambda: kf(state), lambda s: float(jnp.sum(s.poses[:8])))

    # remap of net/lw/cell_valid only (the unconditional lattice gather)
    def remap_only(st, evict):
        n = st.n
        r = cfg.PATCH_LIFETIME
        k = n - cfg.KEYFRAME_INDEX
        n_new = n - evict.astype(jnp.int32)
        i_row = jnp.arange(NI, dtype=jnp.int32)[:, None]
        tt = jnp.arange(T, dtype=jnp.int32)[None, :]
        sh = evict.astype(jnp.int32)
        i_new = host_of_row(i_row, n_new, NI) + 0 * tt
        j_new = i_new + tt - (r - 1)
        i_old = i_new + sh * (i_new >= k).astype(jnp.int32)
        j_old = j_new + sh * (j_new >= k).astype(jnp.int32)
        t_old = j_old - i_old + (r - 1)
        okc = (
            (t_old >= 0) & (t_old < T) & (i_old >= 0)
            & (~evict | ((i_old != k) & (j_old != k)))
        )
        src = jnp.mod(i_old, NI) * T + jnp.clip(t_old, 0, T - 1)
        cell_valid = (st.cell_valid.reshape(NI * T)[src] & okc).reshape(NI, T)
        net = st.net.reshape(NI * T, M, -1)[src].reshape(st.net.shape)
        lw = st.last_weight.reshape(NI * T, M, 2)[src].reshape(
            st.last_weight.shape
        )
        return cell_valid, net, lw

    rm = jax.jit(remap_only)
    t_remap = timeit(
        lambda: rm(state, jnp.asarray(True)),
        lambda o: float(jnp.sum(o[1][:1].astype(jnp.float32))),
    )
    # net-only gather
    def net_only(st):
        src = jnp.flip(jnp.arange(NI * T, dtype=jnp.int32))
        return st.net.reshape(NI * T, M, -1)[src]
    t_net = timeit(
        lambda: jax.jit(net_only)(state),
        lambda o: float(jnp.sum(o[:1].astype(jnp.float32))),
    )
    # lw-only gather
    def lw_only(st):
        src = jnp.flip(jnp.arange(NI * T, dtype=jnp.int32))
        return st.last_weight.reshape(NI * T, M, 2)[src]
    t_lw = timeit(
        lambda: jax.jit(lw_only)(state),
        lambda o: float(jnp.sum(o[:1].astype(jnp.float32))),
    )

    print(f"keyframe full : {t_full:6.2f} ms")
    print(f"  remap (all) : {t_remap:6.2f} ms")
    print(f"    net gather: {t_net:6.2f} ms")
    print(f"    lw  gather: {t_lw:6.2f} ms")
    print(f"  rest        : {t_full - t_remap:6.2f} ms (flow gate + maps)")


if __name__ == "__main__":
    main()
