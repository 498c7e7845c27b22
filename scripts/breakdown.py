"""Per-stage TPU timing breakdown of the VO frame at production size.

Builds a warmed-up SLAM state (same shapes as bench.py), then times each
jitted stage separately: encoder, corr, update net, BA, keyframe, and the
composed vo_frame. Ends every timing with a genuine value fetch (the axon
backend's block_until_ready does not fence remote execution).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import (
    _edge_corr_ctx_lattice,
    _keyframe,
    _update,
    make_vo_frame,
)
from rampvo_tpu.vo.state import edge_table, init_state

H, W = 480, 640


def timeit(fn, fetch, n_it=10):
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

    frames = [
        (jnp.asarray(rng.rand(1, H, W, 5), jnp.float32),
         jnp.asarray(rng.rand(1, H, W, 3), jnp.float32))
        for _ in range(30)
    ]
    for ev, im in frames:
        state = vo_frame(params, state, ev, im, mask, intr)
    float(jnp.sum(state.poses[:8]))
    print(f"warmed state: n={int(state.n)} counter={int(state.counter)}")

    # composed frame
    st = state

    def full():
        nonlocal st
        ev, im = frames[0]
        st = vo_frame(params, st, ev, im, mask, intr)
        return st

    t_full = timeit(full, lambda s: float(jnp.sum(s.poses[:8])))
    state = st

    # encoder alone
    def enc_fn(params, events, images, mask, enc_state):
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )
        e16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), enc_state
        )
        return vonet.apply(
            p16, events.astype(jnp.bfloat16), images.astype(jnp.bfloat16),
            mask, e16, 1, method=VONet.encode,
        )

    enc_j = jax.jit(enc_fn)
    ev, im = frames[0]
    t_enc = timeit(
        lambda: enc_j(params, ev, im, mask, state.enc),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32))),
    )

    # corr + ctx alone
    def corr_fn(st):
        ii, jj, kk, valid = edge_table(cfg, st.n, st.cell_valid)
        return _edge_corr_ctx_lattice(cfg, st, ii, jj, kk)

    corr_j = jax.jit(corr_fn)
    t_corr = timeit(
        lambda: corr_j(state),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32)[:64])),
    )

    # full update (corr + net + BA)
    def mk_update_fn():
        def update_fn(p, net, ctx, corr_in, ii, jj, kk, valid, lattice=None):
            p16 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, p,
            )
            net2, (d, w) = vonet.apply(
                p16, net.astype(jnp.bfloat16), ctx.astype(jnp.bfloat16),
                corr_in.astype(jnp.bfloat16), ii, jj, kk, valid, lattice,
                method=VONet.update_op,
            )
            return net2.astype(jnp.float32), (
                d.astype(jnp.float32), w.astype(jnp.float32))
        return update_fn

    upd_j = jax.jit(
        lambda p, st: _update(cfg, mk_update_fn(), p, st)
    )
    t_upd = timeit(
        lambda: upd_j(params, state),
        lambda s: float(jnp.sum(s.poses[:8])),
    )

    # update-net alone (on fixed inputs)
    ii, jj, kk, valid = jax.jit(lambda s: edge_table(cfg, s.n, s.cell_valid))(state)
    coords, corr_in, ctx = corr_j(state)
    net_flat = state.net.reshape(-1, 384)
    ufn = jax.jit(mk_update_fn(), static_argnames=("lattice",))
    t_net = timeit(
        lambda: ufn(params, net_flat, ctx, corr_in, ii, jj, kk, valid,
                    lattice=(cfg.NI, cfg.T, cfg.M)),
        lambda o: float(jnp.sum(o[0].astype(jnp.float32)[:64])),
    )

    # keyframe alone
    kf_j = jax.jit(lambda st: _keyframe(cfg, st))
    t_kf = timeit(
        lambda: kf_j(state),
        lambda s: float(jnp.sum(s.poses[:8])),
    )

    t_ba = t_upd - t_corr - t_net
    t_rest = t_full - t_enc - t_upd - t_kf
    print(f"full frame : {t_full:7.1f} ms  ({1000/t_full:.1f} FPS)")
    print(f"  encoder  : {t_enc:7.1f} ms")
    print(f"  update() : {t_upd:7.1f} ms")
    print(f"    corr   : {t_corr:7.1f} ms")
    print(f"    net    : {t_net:7.1f} ms")
    print(f"    ba(+)  : {t_ba:7.1f} ms   (update minus corr minus net)")
    print(f"  keyframe : {t_kf:7.1f} ms")
    print(f"  rest     : {t_rest:7.1f} ms   (patchify/commit/probe/dispatch)")


if __name__ == "__main__":
    main()
