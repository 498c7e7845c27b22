"""In-frame ablation WITHIN the update step: corr vs update-net vs BA.

Variants of the full jitted frame (diffs cancel the ~3 ms dispatch floor):
  all          : corr -> net -> BA
  oracle+corr  : corr computed but DISCARDED, oracle targets -> BA
                 (all - this = update-net cost)
  oracle       : no corr, oracle targets -> BA (oracle+corr - this = corr)
  no_ba        : corr -> net, BA skipped (all - this = BA+filter)

Run alone: PYTHONPATH=.:/root/.axon_site python scripts/probe_update_ablate.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.ba import ba_infer
from rampvo_tpu.models import VONet
from rampvo_tpu.models.encoders import MultiScaleEncoder
from rampvo_tpu.models.vonet import (
    extract_patches,
    filter_features,
    select_coords_event_bias,
)
from rampvo_tpu.vo import VOConfig
from rampvo_tpu.vo.runtime import (
    _append_edges,
    _commit,
    _edge_corr_ctx_lattice,
    _fold_corr_fc1,
    _reproject_edges,
    make_vo_frame,
)
from rampvo_tpu.vo.state import edge_table, host_of_row, init_state

H, W = 480, 640
DIM = 384


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
    ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
    im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    for _ in range(30):
        state = vo_frame(params, state, ev, im, mask, intr)
    float(jnp.sum(state.poses[:8]))
    print(f"warmed: n={int(state.n)}")

    def update_fn(p, net, ctx, corr_in, ii, jj, kk, valid, lattice=None):
        if lattice is not None:
            p = _fold_corr_fc1(p)
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

    def update(st, do_corr=True, do_net=True, do_ba=True):
        M, PW = cfg.M, cfg.POSE_WINDOW
        P = 3
        F = st.poses.shape[0]
        L = st.l2g.shape[0]
        n = st.n
        hw4 = st.hw4

        ii, jj, kk, valid = edge_table(cfg, n, st.cell_valid)
        net_flat = st.net.reshape(-1, DIM)

        if do_corr:
            coords, corr_in, ctx = _edge_corr_ctx_lattice(cfg, st, ii, jj, kk)
        else:
            coords = _reproject_edges(cfg, st, ii, jj, kk)
        if do_net and do_corr:
            net_flat, (delta, weight) = update_fn(
                params, net_flat, ctx, corr_in, ii, jj, kk, valid,
                (cfg.NI, cfg.T, cfg.M)
            )
        else:
            delta = 0.0 * coords[:, 1, 1, :]
            weight = jnp.ones_like(delta)
            if do_corr:
                # consume corr so XLA cannot DCE the kernel: fold a scalar in
                delta = delta + 1e-12 * jnp.sum(
                    corr_in.astype(jnp.float32)
                ) * 0 + 1e-12 * corr_in[:, :2].astype(jnp.float32)

        target = coords[:, 1, 1, :] + delta
        weight = filter_features(weight, target, hw4)
        weight = jnp.where(valid[:, None], weight, 0.0)

        if do_ba:
            base = jnp.maximum(n - PW, 0)
            win_log = base + jnp.arange(PW)
            win_ok = win_log < n
            win_g = st.l2g[jnp.clip(win_log, 0, L - 1)]
            posew = st.poses[jnp.clip(jnp.where(win_ok, win_g, 0), 0, F - 1)]
            q = jnp.arange(PW * M, dtype=jnp.int32)
            prow_log = base * M + q
            prow_ok = prow_log < n * M
            host = prow_log // M
            g = st.l2g[jnp.clip(host, 0, L - 1)]
            prow_g = g * M + prow_log % M
            win_gc = jnp.clip(jnp.where(win_ok, win_g, 0), 0, F - 1)
            cwin = jnp.stack(
                [st.pat_cx[win_gc], st.pat_cy[win_gc], st.pat_d[win_gc]],
                axis=-1,
            ).reshape(PW * M, 3)
            t0_ = jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1)
            ba_lat = (cfg.NI, cfg.T, M)
            wf = base + jnp.arange(PW, dtype=jnp.int32)
            wrow = jnp.mod(wf, cfg.NI)
            held = host_of_row(wrow, n, cfg.NI) == wf
            win_rows = jnp.where(held & (wf < n), wrow, -1)
            posew2, dwin2 = ba_infer(
                posew, cwin, st.intrinsics, target, weight,
                jnp.float32(1e-4),
                ii - base, jj - base, kk - base * M,
                t0_ - base, n - base,
                N=cfg.OPTIMIZATION_WINDOW, M=PW * M, iterations=2,
                valid=valid, lattice=ba_lat, win_rows=win_rows,
            )
            poses = st.poses.at[jnp.where(win_ok, win_g, F)].set(
                posew2, mode="drop"
            )
            pat_d = st.pat_d.at[jnp.where(win_ok, win_g, F)].set(
                dwin2.reshape(PW, M), mode="drop"
            )
            st = st.replace(poses=poses, pat_d=pat_d)

        return st.replace(
            net=net_flat.reshape(st.net.shape),
            last_weight=weight.reshape(st.last_weight.shape),
        )

    def mk(**kw):
        f = jax.jit(lambda s: update(s, **kw))
        return timeit(
            lambda: f(state), lambda s: float(jnp.sum(s.poses[:8]))
        )

    t_all = mk()
    t_oc = mk(do_net=False)               # corr computed, net skipped
    t_o = mk(do_corr=False, do_net=False)  # oracle only
    t_noba = mk(do_ba=False)

    print(f"update all        : {t_all:6.2f} ms")
    print(f"  net             : {t_all - t_oc:6.2f} ms (all - oracle+corr)")
    print(f"  corr            : {t_oc - t_o:6.2f} ms (oracle+corr - oracle)")
    print(f"  BA              : {t_all - t_noba:6.2f} ms (all - no_ba)")
    print(f"  repro+filter+ov : {t_o:6.2f} ms (oracle floor, incl dispatch)")


if __name__ == "__main__":
    main()
