"""Decompose the frame's commit/select residual (in-frame ablation diffs,
same method as probe_frame_ablate): patch-coordinate selection (top-k +
NMS on the event map), patch/context extraction, and the commit writes
(incl. the strip rebuild).

Measured r05: select 0.55 + extract 0.94 + commit-writes 2.90 ms.
CAVEAT: this probe's jit does NOT donate the state, so every ring
.at[].set copy-on-writes the full buffer (~1.4 GB rings+strips) — the
2.9 ms commit number is an upper bound; the production chunk scan
carries the state (in-place updates) and its whole frame is ~7.6 ms
cheaper than this probe's.

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/probe_commit_ablate.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.models import VONet
from rampvo_tpu.models.vonet import (
    extract_patches,
    select_coords_event_bias,
)
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import (
    _append_edges,
    _commit,
    _keyframe,
    _update,
    make_enc_state,
    make_vo_frame,
)
from rampvo_tpu.vo.state import init_state

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
        PROBE_THRESH=-1.0, KEYFRAME_THRESH=0.0,
    )
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
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
    print(f"warmed: n={int(state.n)}", flush=True)

    from rampvo_tpu.ops.corr_pallas import make_strips  # noqa: F401
    import rampvo_tpu.vo.runtime as rt

    def encode_fn(p, e, i, m, s):
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)
        from rampvo_tpu.ops.encoder_pallas import pallas_multiscale_encode

        f, im_, s2 = pallas_multiscale_encode(
            p16["params"]["patchify"]["encoder"],
            e.astype(jnp.bfloat16), i.astype(jnp.bfloat16), m, s,
            interpret=jax.default_backend() != "tpu")
        return f / 4.0, im_ / 4.0, s2

    def update_fn(p, net, ctx, corr_in, ii, jj, kk, valid, lattice=None):
        if lattice is not None:
            p = rt._fold_corr_fc1(p, layout="paired")
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)
        net2, (d, w) = vonet.apply(
            p16, net.astype(jnp.bfloat16), ctx.astype(jnp.bfloat16),
            corr_in.astype(jnp.bfloat16), ii, jj, kk, valid, lattice,
            lattice_contig=True, method=VONet.update_op)
        return net2.astype(jnp.float32), (
            d.astype(jnp.float32), w.astype(jnp.float32))

    def frame(p, st, e, i, m, K, sel=True, extract=True, commit=True):
        e = e.astype(jnp.float32)
        i = i.astype(jnp.float32)
        fmap, imap, enc2 = encode_fn(p, e, i, m, st.enc)
        st = st.replace(enc=enc2)
        if sel:
            coords = select_coords_event_bias(e[:1], cfg.M, nms_rad=11)
        else:
            g = jnp.arange(cfg.M, dtype=jnp.float32)
            coords = jnp.stack(
                [4.0 + (g % 12) * 12.0, 4.0 + (g // 12) * 12.0], -1
            )[None]
        disps = jnp.ones((1, fmap.shape[1], fmap.shape[2]), jnp.float32)
        if extract:
            gmap, ictx, patches_new, clr = extract_patches(
                fmap.astype(jnp.float32), imap.astype(jnp.float32),
                i[:1], disps, coords, P=3)
        else:
            M, P = cfg.M, 3
            z = coords.sum() * 0.0
            gmap = jnp.zeros((1, M, P, P, 128), jnp.float32) + z
            ictx = jnp.zeros((1, M, 384), jnp.float32) + z
            patches_new = jnp.zeros((1, M, 3, P, P), jnp.float32) + z
            clr = jnp.zeros((1, M, 3), jnp.float32)
        if commit:
            st = _commit(cfg, st, fmap, gmap, ictx, patches_new, clr, K)
        st = st.replace(n=st.n + 1)
        st = _append_edges(cfg, st)
        st = _update(cfg, update_fn, params, st, None)
        st = _keyframe(cfg, st)
        return st

    def mk(**kw):
        f = jax.jit(lambda p, s, e, i, m, K: frame(p, s, e, i, m, K, **kw))
        return timeit(lambda: f(params, state, ev, im, mask, intr),
                      lambda s: float(jnp.sum(s.poses[:8])))

    t_all = mk()
    t_nosel = mk(sel=False)
    t_noext = mk(sel=False, extract=False)
    t_nocommit = mk(sel=False, extract=False, commit=False)
    print(f"frame all       : {t_all:6.2f} ms")
    print(f"  select (topk+NMS): {t_all - t_nosel:6.2f} ms")
    print(f"  extract_patches : {t_nosel - t_noext:6.2f} ms")
    print(f"  commit writes   : {t_noext - t_nocommit:6.2f} ms "
          f"(incl. strips rebuild)")


if __name__ == "__main__":
    main()
