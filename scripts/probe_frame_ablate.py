"""TRUE in-frame stage costs by ablation: time the full jitted vo_frame
with individual stages removed and diff against the full frame. Per-call
dispatch on the axon backend is ~3 ms, so separately-jitted stage timings
(scripts/breakdown.py) overstate every stage by that floor; ablation diffs
cancel it.

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/probe_frame_ablate.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import (
    _append_edges,
    _commit,
    _edge_corr_ctx_lattice,
    _fold_corr_fc1,
    _keyframe,
    _update,
    make_vo_frame,
)
from rampvo_tpu.vo.state import edge_table, init_state

H, W = 480, 640


def timeit(fn, fetch, n_it=15):
    fn()
    best = float("inf")
    for _ in range(3):
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
        KEYFRAME_THRESH=0.0,  # never evict: measure FULL steady-state
        # windows (random-net motionmag would otherwise pin n ~ 8 and leave
        # the lattice ~4x empty — see bench.py)
    )
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    from rampvo_tpu.vo.runtime import make_enc_state

    # PRODUCTION encoder carry layout (channel-major when the Pallas
    # encoder is on): with the flax NHWC carry this probe measured the
    # flax encode path (+NHWC<->CM transposes) and overstated the
    # production encoder by ~3.5 ms (r05 session 1)
    state0 = init_state(cfg, make_enc_state(cfg, "MultiScale", H, W), H, W)
    vo_frame = make_vo_frame(cfg, vonet)

    rng = np.random.RandomState(0)
    intr = jnp.asarray([320.0, 320.0, W / 2, H / 2], jnp.float32)
    mask = jnp.asarray([True])
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)

    state = state0
    for _ in range(40):
        state = vo_frame(params, state, ev, im, mask, intr)
    float(jnp.sum(state.poses[:8]))
    print(f"warmed: n={int(state.n)} counter={int(state.counter)}")

    def encode_fn(params, events, images, m, enc_state):
        # match the production default (Pallas channel-major chain when
        # enabled, bf16 mixed precision — mirrors runtime.make_vo_frame)
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )
        e16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), enc_state
        )
        ev16 = events.astype(jnp.bfloat16)
        im16 = images.astype(jnp.bfloat16)
        if cfg.pallas_encoder_on():
            from rampvo_tpu.ops.encoder_pallas import (
                pallas_multiscale_encode,
            )

            fmap, imap, enc2 = pallas_multiscale_encode(
                p16["params"]["patchify"]["encoder"], ev16, im16, m, e16,
                interpret=jax.default_backend() != "tpu",
            )
            fmap = fmap / 4.0
            imap = imap / 4.0
        else:
            fmap, imap, enc2 = vonet.apply(
                p16, ev16, im16, m, e16, 1, method=VONet.encode,
            )
        return fmap, imap, jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), enc2
        )

    def update_fn(p, net, ctx, corr_in, ii, jj, kk, valid, lattice=None):
        if lattice is not None:
            p = _fold_corr_fc1(p, layout="paired")
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            p,
        )
        net2, (d, w) = vonet.apply(
            p16, net.astype(jnp.bfloat16), ctx.astype(jnp.bfloat16),
            corr_in.astype(jnp.bfloat16), ii, jj, kk, valid, lattice,
            lattice_contig=True, method=VONet.update_op,
        )
        return net2.astype(jnp.float32), (
            d.astype(jnp.float32), w.astype(jnp.float32))

    from rampvo_tpu.models.vonet import (
        extract_patches,
        select_coords_event_bias,
    )

    def update_zero_corr(p, net, ctx, corr_in, ii, jj, kk, valid,
                         lattice=None):
        # zeros_like carries no value dependency -> XLA DCEs the corr
        # kernel while the update net still runs: splits corr vs net
        return update_fn(p, net, ctx, jnp.zeros_like(corr_in),
                         ii, jj, kk, valid, lattice)

    def frame(params, st, events, images, m, intrinsics,
              do_enc=True, do_update=True, do_kf=True, oracle=None,
              ufn=None, cfg=cfg):
        events = events.astype(jnp.float32)
        images = images.astype(jnp.float32)
        if do_enc:
            fmap, imap, enc2 = encode_fn(params, events, images, m, st.enc)
            st = st.replace(enc=enc2)
        else:
            h4, w4 = st.hw4
            fmap = jnp.zeros((1, h4, w4, 128), jnp.bfloat16)
            imap = jnp.zeros((1, h4, w4, 384), jnp.bfloat16)
        coords = select_coords_event_bias(events[:1], cfg.M, nms_rad=11)
        disps = jnp.ones((1, fmap.shape[1], fmap.shape[2]), jnp.float32)
        gmap, ictx, patches_new, clr = extract_patches(
            fmap.astype(jnp.float32), imap.astype(jnp.float32),
            images[:1], disps, coords, P=3
        )
        st = _commit(cfg, st, fmap, gmap, ictx, patches_new, clr, intrinsics)
        st = st.replace(n=st.n + 1)
        st = _append_edges(cfg, st)
        if do_update:
            st = _update(cfg, ufn or update_fn, params, st, oracle)
        if do_kf:
            st = _keyframe(cfg, st)
        return st

    def mk(name, **kw):
        f = jax.jit(
            lambda p, s, e, i, m, K: frame(p, s, e, i, m, K, **kw)
        )
        t = timeit(
            lambda: f(params, state, ev, im, mask, intr),
            lambda s: float(jnp.sum(s.poses[:8])),
        )
        return t

    def oracle(st, ii, jj, kk, coords):
        d = jnp.zeros((ii.shape[0], 2), jnp.float32)
        return d, jnp.ones_like(d)

    import dataclasses

    t_all = mk("all")
    t_nokf = mk("no_kf", do_kf=False)
    t_noupd = mk("no_update", do_update=False)
    t_oracle = mk("oracle_update (BA only)", oracle=oracle)
    t_zcorr = mk("zero_corr (net, no kernel)", ufn=update_zero_corr)
    t_noenc = mk("no_encoder", do_enc=False)
    # BA sub-stages: per-GN-iteration cost (oracle @ 1 iter vs 2) and the
    # reproject-only floor (oracle @ 0 iters keeps reproject + state writes)
    t_ba1 = mk("oracle_ba1", oracle=oracle,
               cfg=dataclasses.replace(cfg, BA_ITERS=1))
    t_ba0 = mk("oracle_ba0", oracle=oracle,
               cfg=dataclasses.replace(cfg, BA_ITERS=0))

    print(f"frame all        : {t_all:6.2f} ms")
    print(f"  keyframe       : {t_all - t_nokf:6.2f} ms (all - no_kf)")
    print(f"  update total   : {t_all - t_noupd:6.2f} ms (all - no_update)")
    print(f"    corr+net     : {t_all - t_oracle:6.2f} ms (all - oracle)")
    print(f"      corr kernel: {t_all - t_zcorr:6.2f} ms (all - zero_corr)")
    print(f"      update net : {t_zcorr - t_oracle:6.2f} ms")
    print(f"    BA+misc      : {t_oracle - t_noupd:6.2f} ms")
    print(f"      GN iter    : {t_oracle - t_ba1:6.2f} ms (2it - 1it)")
    print(f"      reproject+ : {t_ba0 - t_noupd:6.2f} ms (0it - no_update)")
    print(f"  encoder        : {t_all - t_noenc:6.2f} ms (all - no_encoder)")
    print(f"  commit/select  : {t_noupd - (t_all - t_nokf) - (t_all - t_noenc):6.2f} ms (residual)")


if __name__ == "__main__":
    main()
