"""The unrolled training forward (ref: ramp/net.py:252-378).

TPU-native reformulation: the reference grows python edge lists inside an
18-step loop; here the edge *schedule* is precomputed statically (frame
insertion at steps >= 8 is deterministic, net.py:306-340), so the whole
forward is ONE `lax.scan` over steps with a fixed-capacity edge table and a
validity-mask carry. Random edge dropout (net.py:332-337) and the corr
gradient subsampling (altcorr/correlation.py:35-40) are in-graph via
jax.random / custom_vjp.

Truncated BPTT matches the reference: poses/patches are stop_gradient-ed at
each step start (net.py:300-301); the hidden edge state `net` carries
gradients across steps.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ba import ba_train
from ..lie import SE3, ops as lops
from ..models import VONet
from ..models.vonet import (
    extract_patches,
    select_coords_event_bias,
    select_coords_gradient_bias,
    select_coords_random,
)
from ..ops.corr import avg_pool2d, corr as corr_op, corr_stack, corr_train
from .loss import pose_loss_terms

DIM = 384


# ---------------------------------------------------------------------------
# corr gradient subsampling (ref: altcorr/correlation.py:30-40)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def corr_grad_dropout(x, rng, p: float):
    """Identity; backward keeps each edge's gradient with prob `p`."""
    return x


def _cgd_fwd(x, rng, p):
    return x, (rng, x.shape[0])


def _cgd_bwd(p, res, g):
    rng, E = res
    keep = jax.random.uniform(rng, (E,)) < p
    shape = (E,) + (1,) * (g.ndim - 1)
    return (g * keep.reshape(shape).astype(g.dtype), None)


corr_grad_dropout.defvjp(_cgd_fwd, _cgd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def corr_grad_dropout_paired(x, rng_a, rng_b, p: float):
    """`corr_grad_dropout` for the PAIRED corr layout [E, PP*128]: the two
    pyramid levels interleave on 64-lane halves, each keeps its per-edge
    gradient independently (matching the two per-level dropout calls of the
    XLA path / altcorr/correlation.py:35-40)."""
    return x


def _cgdp_fwd(x, rng_a, rng_b, p):
    return x, (rng_a, rng_b, x.shape)


def _cgdp_bwd(p, res, g):
    rng_a, rng_b, shape = res
    E = shape[0]
    keep_a = jax.random.uniform(rng_a, (E, 1)) < p
    keep_b = jax.random.uniform(rng_b, (E, 1)) < p
    lvl = (jnp.arange(shape[1]) // 64) % 2
    keep = jnp.where(lvl[None, :] == 0, keep_a, keep_b)
    return (g * keep.astype(g.dtype), None, None)


corr_grad_dropout_paired.defvjp(_cgdp_fwd, _cgdp_bwd)


def corr_chunked(gmap, fmap, coords, kk, jj, radius, n_chunks=8):
    """Training correlation in edge chunks, each rematerialized.

    The gather intermediate is ~[E, P, P, (2R+2)^2, C] floats; storing it for
    the backward pass (x2 for its cotangent, x2 levels, x18 unrolled steps)
    explodes HBM. Chunked jax.checkpoint bounds the transient to one chunk.
    """
    E = coords.shape[0]
    assert E % n_chunks == 0
    c = E // n_chunks

    ck = jax.checkpoint(
        lambda gm, fm, co, k, j: corr_op(gm, fm, co, k, j, radius),
        static_argnums=(),
    )
    outs = [
        ck(gmap, fmap, coords[i * c:(i + 1) * c], kk[i * c:(i + 1) * c],
           jj[i * c:(i + 1) * c])
        for i in range(n_chunks)
    ]
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# static edge schedule
# ---------------------------------------------------------------------------

class EdgeSchedule(NamedTuple):
    ii: np.ndarray           # [E_cap]
    jj: np.ndarray           # [E_cap]
    kk: np.ndarray           # [E_cap]
    created_at: np.ndarray   # [E_cap] step index when the edge appears
    n_pre: np.ndarray        # [STEPS] frame count before insertion
    n_post: np.ndarray       # [STEPS] frame count after insertion
    insert: np.ndarray       # [STEPS] bool: a frame is inserted this step


def edge_schedule(n_frames: int, M: int, steps: int) -> EdgeSchedule:
    """Reproduce net.py:281,306-340's edge growth as static arrays."""
    ii, jj, kk, created = [], [], [], []

    def add(i, j, q, s):
        ii.append(i), jj.append(j), kk.append(q), created.append(s)

    # initial block: patches of frames < 8 x target frames 0..7 (net.py:281)
    for q in range(8 * M):
        for j in range(8):
            add(q // M, j, q, 0)

    n = 8
    n_pre, n_post, insert = [], [], []
    for s in range(steps):
        n_pre.append(n)
        ins = s >= 8 and n < n_frames
        insert.append(ins)
        if ins:
            for q in range(n * M):           # kk1 x {n}
                add(q // M, n, q, s)
            for q in range(n * M, (n + 1) * M):  # kk2 x 0..n
                for j in range(n + 1):
                    add(q // M, j, q, s)
            n += 1
        n_post.append(n)

    return EdgeSchedule(
        np.asarray(ii, np.int32), np.asarray(jj, np.int32),
        np.asarray(kk, np.int32), np.asarray(created, np.int32),
        np.asarray(n_pre, np.int32), np.asarray(n_post, np.int32),
        np.asarray(insert, bool),
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

class TrainForward:
    """Builds the jittable unrolled forward.

    __call__(params, batch, rng, structure_only) ->
      (loss, metrics dict with e/ro/tr like train.py:170-175)
    batch: events [T,H,W,Ce], images [N,H,W,3], poses [N,7] (world-to-camera,
    i.e. SE3(poses).inv() already applied as in train.py:154), disps [N,H,W],
    intrinsics [N,4], mask [T] bool (n_frames true entries).
    """

    def __init__(self, vonet: VONet, n_frames: int, M: int = 80,
                 steps: int = 18, flow_weight: float = 0.1,
                 pose_weight: float = 10.0, event_bias: bool = True, P: int = 3,
                 ablate: frozenset = frozenset(), corr_impl: str = "auto",
                 gradient_bias: bool = False, save_corr: bool = True):
        self.vonet = vonet
        self.n_frames = n_frames
        self.M = M
        self.steps = steps
        self.P = P
        self.flow_weight = flow_weight
        self.pose_weight = pose_weight
        self.event_bias = event_bias
        self.gradient_bias = gradient_bias
        # perf-probe ablations (scripts/probe_train_ablate.py):
        # "corr" -> zeros for corr_in, "encoder" -> zero feature maps,
        # "ba" -> skip the differentiable BA, "update" -> skip the GRU net
        self.ablate = frozenset(ablate)
        # "fused": Pallas two-level kernel + custom VJP (TPU);
        # "fused_interpret": same in interpret mode (CPU tests);
        # "xla": exact gather path; "auto" = fused on TPU else xla
        self.corr_impl = corr_impl
        # save the per-step corr features across the remat boundary
        # (checkpoint_name + save_only_these_names): the backward then
        # skips the fused corr kernel's recompute pass — the largest
        # single term of the 2.39 s step (probe_train_ablate r05: corr
        # ~1.0 s of fwd+bwd+remat). Costs steps x E x PP*128 bf16 of
        # HBM (~0.3 GB at the reference recipe).
        self.save_corr = save_corr
        self.sched = edge_schedule(n_frames, M, steps)

        # static sort-by-target tables for the fused training corr kernel
        from ..ops.corr_pallas import make_corr_train_sched

        self.corr_sched = make_corr_train_sched(
            self.sched.jj, n_frames, E_BLK=64
        )

        # static-schedule precomputations: the edge lists are compile-time
        # constants, so the update operator's neighbour sort and SoftAgg
        # id compaction can happen here instead of in-graph (3 E-element
        # sorts per step, forward AND backward)
        from ..ops.neighbors import neighbors_static_order

        order, track_start = neighbors_static_order(self.sched.kk, self.sched.jj)
        kk_r = np.unique(self.sched.kk, return_inverse=True)[1]
        ij = self.sched.ii.astype(np.int64) * 12345 + self.sched.jj
        ij_r = np.unique(ij, return_inverse=True)[1]
        self.static_sched = {
            "order": order,
            "track_start": track_start,
            "jx_kk": jnp.asarray(kk_r, jnp.int32),
            "jx_ij": jnp.asarray(ij_r, jnp.int32),
        }

    def __call__(self, params, events, images, poses, disps, intrinsics,
                 mask, rng, structure_only: bool = False):
        cfgM, P, NF = self.M, self.P, self.n_frames
        sched = self.sched
        E = sched.ii.shape[0]
        ii = jnp.asarray(sched.ii)
        jj = jnp.asarray(sched.jj)
        kk = jnp.asarray(sched.kk)
        created = jnp.asarray(sched.created_at)

        intr4 = intrinsics[0] / 4.0  # shared pinhole at 1/4 res
        intr_frames = jnp.broadcast_to(intr4, (NF, 4))

        # ---- encode whole window once (reinit hidden, net.py:263-268).
        # rematerialized: the encoder's intermediate maps (dozens of
        # [T, H/2, W/2, 32] activations, 4-8x lane-padded) dominate HBM if
        # stored for the backward pass ----
        def _encode(p, ev, im, mk):
            f, i, _ = self.vonet.apply(
                p, ev, im, mk, None, NF, method=VONet.encode
            )
            return f, i

        if "encoder" in self.ablate:
            H4, W4 = events.shape[1] // 4, events.shape[2] // 4
            fmap = jnp.zeros((NF, H4, W4, 128), jnp.float32)
            imap_full = jnp.zeros((NF, H4, W4, DIM), jnp.float32)
        else:
            # (saving the tagged "enc_ss" super-states across this
            # boundary measured NO step-time change at the reference
            # recipe — r05; the tag remains for future remat probes)
            fmap, imap_full = jax.checkpoint(_encode)(
                params, events, images, mask
            )
            fmap = fmap.astype(jnp.float32)
            imap_full = imap_full.astype(jnp.float32)

        # ---- patch selection + extraction ----
        rng, k_sel = jax.random.split(rng)
        T = events.shape[0]
        (sup_idx,) = jnp.nonzero(mask, size=NF, fill_value=T - 1)
        if self.event_bias:
            coords = select_coords_event_bias(events[sup_idx], cfgM, nms_rad=11)
        elif self.gradient_bias:
            # three-way priority event > gradient > random (net.py:164-188)
            coords = select_coords_gradient_bias(k_sel, images, cfgM)
        else:
            coords = select_coords_random(
                k_sel, NF, cfgM, fmap.shape[1], fmap.shape[2]
            )

        disps4 = disps[:, 1::4, 1::4]
        gmap, imap, patches0, _clr = extract_patches(
            fmap, imap_full, images, disps4, coords, P=P
        )
        gmap_flat = gmap.reshape(NF * cfgM, P, P, 128)
        imap_flat = imap.reshape(NF * cfgM, DIM)

        # training pyramid over per-frame fmaps (net.py:206-229)
        pyr1 = fmap
        pyr2 = avg_pool2d(fmap, 4)
        h4, w4 = fmap.shape[1], fmap.shape[2]
        bounds = (-64.0, -64.0, w4 + 64.0, h4 + 64.0)

        patches_gt = patches0.reshape(NF * cfgM, 3, P, P)
        rng, k_d = jax.random.split(rng)
        patches_init = patches_gt.at[:, 2].set(
            jax.random.uniform(k_d, (NF * cfgM,))[:, None, None]
            * jnp.ones((1, P, P))
        )

        Gs0 = jnp.zeros((NF, 7), jnp.float32).at[:, 6].set(1.0)
        if structure_only:
            Gs0 = poses

        host_of_patch = jnp.arange(NF * cfgM) // cfgM

        impl = self.corr_impl
        if impl == "auto":
            impl = "fused" if jax.default_backend() == "tpu" else "xla"
        fused_corr = impl in ("fused", "fused_interpret")
        if fused_corr:
            # the Pallas kernel emits the PAIRED 128-lane layout; fold the
            # layout permutation into corr_fc1 ONCE per step (linear -> the
            # gradient lands back on the canonical checkpoint layout)
            from ..models.vonet import fold_corr_fc1

            params_u = fold_corr_fc1(params, "paired")
        else:
            params_u = params

        def _transform(G, ptc, intr, e_ii, e_jj, e_kk):
            from ..geometry.projective import transform_edges

            pi = G[e_ii]
            pj = G[e_jj]
            pk = ptc[e_kk]
            return transform_edges(pi, pj, pk, intr)

        def step(carry, xs):
            Gs, patches, net, valid, rng = carry
            s_idx, n_pre, n_post, do_insert = xs

            Gs = jax.lax.stop_gradient(Gs)
            patches = jax.lax.stop_gradient(patches)

            # --- frame insertion (net.py:306-340) ---
            def inserted(args):
                Gs, patches, valid, rng = args
                # motion bootstrap for the new frame n_pre
                P1 = Gs[n_pre - 1]
                P2 = Gs[n_pre - 2]
                xi = 0.5 * lops.se3_log(
                    lops.se3_mul(P1[None], lops.se3_inv(P2[None]))
                )[0]
                boot = lops.se3_mul(lops.se3_exp(xi[None]), P1[None])[0]
                if not structure_only:
                    Gs2 = Gs.at[n_pre].set(boot)
                else:
                    Gs2 = Gs
                valid = valid | (created == s_idx)
                # random dropout of edges touching frame n_pre - 4
                rng, k1, k2 = jax.random.split(rng, 3)
                do_drop = jax.random.uniform(k1) < 0.1
                dropped = (ii == (n_pre - 4)) | (jj == (n_pre - 4))
                valid = jnp.where(do_drop, valid & ~dropped, valid)
                # new frame's patch depths = median of the previous 2 frames
                sel = (host_of_patch == n_pre - 1) | (host_of_patch == n_pre - 2)
                dvals = jnp.where(
                    sel[:, None, None], patches[:, 2], jnp.nan
                )
                med = jnp.nanmedian(dvals)
                newp = host_of_patch == n_pre
                d = jnp.where(newp[:, None, None], med, patches[:, 2])
                patches2 = patches.at[:, 2].set(d)
                return Gs2, patches2, valid, rng

            Gs, patches, valid, rng = jax.lax.cond(
                do_insert, inserted, lambda a: a, (Gs, patches, valid, rng)
            )

            # --- reproject + corr + update (net.py:342-346) ---
            coords_e = _transform(Gs, patches, intr4, ii, jj, kk)  # [E,P,P,2]
            if "corr" in self.ablate:
                d = 2 * 3 + 1
                width = P * P * 128 if fused_corr else 2 * P * P * d * d
                corr_in = jnp.zeros((E, width), jnp.float32)
                corr_in = corr_in + 0.0 * coords_e.sum()  # keep coords live
            elif fused_corr:
                from ..ops.corr_pallas import corr_train_fused

                corr_in = corr_train_fused(
                    gmap_flat, pyr1, pyr2, coords_e, kk, jj,
                    (self.corr_sched["src"], self.corr_sched["inv"]),
                    self.corr_sched["tabs"], 3, self.corr_sched["E_BLK"],
                    impl == "fused_interpret",
                )
                rng, k_c1, k_c2 = jax.random.split(rng, 3)
                corr_in = corr_grad_dropout_paired(
                    corr_in, k_c1, k_c2, 0.2
                ).astype(jnp.float32)
                if self.save_corr:
                    from jax.ad_checkpoint import checkpoint_name

                    corr_in = checkpoint_name(corr_in, "corr_out")
            else:
                c1 = corr_train(gmap_flat, pyr1, coords_e, kk, jj, 3)
                c2 = corr_train(gmap_flat, pyr2, coords_e / 4.0, kk, jj, 3)
                rng, k_c1, k_c2 = jax.random.split(rng, 3)
                c1 = corr_grad_dropout(c1, k_c1, 0.2)
                c2 = corr_grad_dropout(c2, k_c2, 0.2)
                corr_in = corr_stack(c1, c2)

            if "update" in self.ablate:
                delta = 0.0 * corr_in[:, :2]
                weight = jnp.ones_like(delta)
            else:
                net, (delta, weight) = self.vonet.apply(
                    params_u, net, imap_flat[kk], corr_in, ii, jj, kk, valid,
                    None, self.static_sched,
                    method=VONet.update_op,
                )

            target = coords_e[:, P // 2, P // 2, :] + delta
            wgt = weight * valid[:, None].astype(weight.dtype)

            # --- 2 x differentiable BA (net.py:352-367) ---
            GsW = SE3(Gs[None])
            ptcB = patches[None]
            for _ in range(2 if "ba" not in self.ablate else 0):
                GsW, ptcB = ba_train(
                    GsW, ptcB, intr_frames[None], target[None], wgt[None],
                    jnp.float32(1e-4), ii, jj, kk, bounds, ep=10.0,
                    fixedp=1, structure_only=structure_only, valid=valid,
                )
            Gs = GsW.data[0]
            patches = ptcB[0]

            # --- per-step loss terms (net.py:369-377 + train.py:29-65) ---
            dij = jnp.abs(ii - jj)
            lmask = valid & (dij > 0) & (dij <= 2)

            coords_p = _transform(Gs, patches, intr4, ii, jj, kk)
            coords_g = _transform(poses, patches_gt, intr4, ii, jj, kk)
            # GT validity: Z > 0.2 in the GT geometry (net.py:372-375)
            Zg = _depth_of(poses, patches_gt, intr4, ii, jj, kk)
            vg = (Zg > 0.2) & lmask

            from .loss import masked_norm

            diff = coords_p - coords_g  # [E,P,P,2]
            e_pp = masked_norm(
                diff, jnp.broadcast_to(vg[:, None, None], diff.shape[:-1])
            )
            e_min = e_pp.reshape(E, P * P).min(axis=-1)
            wv = vg.astype(e_pp.dtype)
            flow_e = jnp.sum(e_min * wv) / jnp.maximum(wv.sum(), 1.0)

            tr, ro = pose_loss_terms(Gs, poses, n_post)
            use_pose = jnp.asarray(
                (not structure_only), jnp.float32
            ) * (s_idx >= 2).astype(jnp.float32)
            step_loss = self.flow_weight * flow_e + (
                self.pose_weight * use_pose * (tr + ro)
            )

            out = (step_loss, flow_e, tr, ro, e_min, wv)
            return (Gs, patches, net, valid, rng), out

        def _depth_of(G, ptc, intr, e_ii, e_jj, e_kk):
            pi = G[e_ii]
            pj = G[e_jj]
            pk = ptc[e_kk]
            fx, fy, cx, cy = intr
            x = pk[:, 0, P // 2, P // 2]
            y = pk[:, 1, P // 2, P // 2]
            d = pk[:, 2, P // 2, P // 2]
            X0 = jnp.stack(
                [(x - cx) / fx, (y - cy) / fy, jnp.ones_like(d), d], -1
            )
            Gij = lops.se3_mul(pj, lops.se3_inv(pi))
            X1 = lops.se3_act4(Gij, X0)
            return X1[..., 2]

        valid0 = created == 0
        net0 = jnp.zeros((E, DIM), jnp.float32)
        xs = (
            jnp.arange(self.steps),
            jnp.asarray(sched.n_pre),
            jnp.asarray(sched.n_post),
            jnp.asarray(sched.insert),
        )
        carry0 = (Gs0, patches_init, net0, valid0, rng)
        # rematerialize each unrolled step in the backward pass: the corr
        # gather intermediate alone is ~5GB/step at full resolution — storing
        # it for 18 steps (95GB) cannot fit HBM; recompute trades ~2x step
        # FLOPs for O(carry) memory. The corr OUTPUT ([E, PP*128] bf16,
        # tagged "corr_out") is small enough to save, sparing the backward
        # the fused corr kernel's recompute pass.
        policy = (
            jax.checkpoint_policies.save_only_these_names("corr_out")
            if self.save_corr else None
        )
        step_ckpt = jax.checkpoint(step, prevent_cse=False, policy=policy)
        (Gs, patches, net, valid, rng), outs = jax.lax.scan(
            step_ckpt, carry0, xs
        )

        step_loss, flow_e, tr, ro, e_min, wv = outs
        loss = step_loss.sum()
        # last-step metrics (train.py:170-175)
        last_e, last_w = e_min[-1], wv[-1]
        px1 = jnp.sum((last_e < 0.25) * last_w) / jnp.maximum(last_w.sum(), 1.0)
        metrics = {
            "loss": loss,
            "px1": px1,
            "flow_e": flow_e[-1],
            "ro": ro[-1],
            "tr": tr[-1],
        }
        return loss, metrics
