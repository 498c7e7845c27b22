"""Gauss-Newton bundle adjustment over the patch graph.

TPU-native reformulation of the reference's two BA backends:

  * `ba_train`  — differentiable Schur-complement GN mirroring the pure-torch
    trainer BA (ref: ramp/ba.py:86-182): residual gate ||r|| < 250 px, bounds
    gate, damping ``A_kk += ep + lm*A_kk`` with ep=100, depth clamp
    [1e-3, 10].
  * `ba_infer`  — the fused inference GN mirroring cuda_ba
    (ref: ramp/fastba/ba_cuda.cu:232-376,533-565): gates ||r|| < 128 px,
    Z > 0.2, center in (-64, 2c+64); damping ``S_kk += 1e-4*S_kk + 1``;
    depth retraction with reset d>20 -> 1.0 and floor 1e-4
    (ba_cuda.cu:218-222); poses t0..t1 free, first poses held fixed.

Design notes (TPU-first):
  - No `torch.unique` / dynamic edge lists. The caller passes a *fixed
    capacity* edge set with a validity mask; patch indices `kk` are already
    rebased into a dense window of static size M. Hessian blocks are
    assembled with `jax.ops.segment_sum` (static segment counts), the Schur
    complement is one dense [6N, M] x [M, 6N] matmul on the MXU, and the
    damped solve is a tiny dense Cholesky. Everything jits with static
    shapes; per-step windows are selected by the VO runtime with
    `dynamic_slice`.
  - Only patch *centers* enter the normal equations (the reference also uses
    only `coords[..., p//2, p//2, :]`), so linearization here is center-only:
    ~9x less work than transforming full 3x3 patches.
  - Cholesky failure is handled branchlessly: on a non-finite factor the
    update is zeroed (reference catches the exception and skips,
    ramp/Ramp_vo.py:302-306; trainer returns zeros, ramp/ba.py:17-21).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import ops as lops


def _center_jacobians(X1, tij, fx, fy):
    """Analytic Jacobians at a transformed homogeneous point.

    X1: [E, 4] point in frame j; tij: [E, 3] relative translation.
    Returns Jj [E,2,6] (pose-j retraction), Jz [E,2] (inverse depth), and the
    projected coords [E,2]. Matches ba_cuda.cu:316-338 / projective_ops.py:68-96.
    """
    X, Y, Z, W = X1[..., 0], X1[..., 1], X1[..., 2], X1[..., 3]
    o = jnp.zeros_like(Z)

    Zc = jnp.maximum(Z, 0.1)
    d = 1.0 / Zc
    d2 = d * d

    x1 = fx * (X * d) + 0.0  # cx added by caller
    y1 = fy * (Y * d) + 0.0

    Jj = jnp.stack(
        [
            fx * W * d, o, -fx * X * W * d2, -fx * X * Y * d2, fx * (1 + X * X * d2), -fx * Y * d,
            o, fy * W * d, -fy * Y * W * d2, -fy * (1 + Y * Y * d2), fy * X * Y * d2, fy * X * d,
        ],
        axis=-1,
    ).reshape(Z.shape + (2, 6))

    Jz = jnp.stack(
        [
            fx * (tij[..., 0] * d - tij[..., 2] * X * d2),
            fy * (tij[..., 1] * d - tij[..., 2] * Y * d2),
        ],
        axis=-1,
    )
    return Jj, Jz, jnp.stack([x1, y1], axis=-1)


def linearize_center(poses, centers, intr_i, intr_j, ii, jj):
    """Linearize the reprojection of patch centers.

    poses:   [Np, 7] SE3 data (world-to-camera)
    centers: [E, 3]  (x, y, inverse depth) in frame ii pixels
    intr_i/intr_j: [E, 4] (fx, fy, cx, cy)
    Returns coords [E,2], Z [E], Ji [E,2,6], Jj [E,2,6], Jz [E,2].
    """
    # mode="clip": out-of-range indices (inert zero-weight edges) must not
    # produce NaN fills — 0 * NaN poisons the assembled Hessian
    Gi = jnp.take(poses, ii, axis=0, mode="clip")
    Gj = jnp.take(poses, jj, axis=0, mode="clip")
    Gij = lops.se3_mul(Gj, lops.se3_inv(Gi))

    fx_i, fy_i, cx_i, cy_i = jnp.moveaxis(intr_i, -1, 0)
    fx_j, fy_j, cx_j, cy_j = jnp.moveaxis(intr_j, -1, 0)

    X0 = jnp.stack(
        [
            (centers[..., 0] - cx_i) / fx_i,
            (centers[..., 1] - cy_i) / fy_i,
            jnp.ones_like(centers[..., 2]),
            centers[..., 2],
        ],
        axis=-1,
    )
    X1 = lops.se3_act4(Gij, X0)

    Jj, Jz, xy = _center_jacobians(X1, Gij[..., :3], fx_j, fy_j)
    coords = xy + jnp.stack([cx_j, cy_j], axis=-1)

    # Ji = -Adj^T_{Gij} Jj  (ref: projective_ops.py:94; adjSE3 in ba_cuda.cu)
    Ji = -lops.se3_adjT(Gij[:, None, :], Jj)
    return coords, X1[..., 2], Ji, Jj, Jz


def linearize_center_cells(poses, centers, intrinsics, ii_c, jj_c, Mp):
    """`linearize_center` for LATTICE-ordered edges with one shared camera.

    All edges of a lattice cell share the frame pair, so the relative pose
    and its adjoint are computed per CELL (E/Mp rows) and applied per edge
    via a broadcast act4 + one batched [Mp*2, 6] x [6, 6] matmul — the
    per-edge quaternion chains (se3_mul/se3_inv/se3_adjT over [E]) were a
    large share of ba_infer's runtime (small-minor-dim elementwise chains).

    poses [Np, 7]; centers [E, 3]; intrinsics [4]; ii_c/jj_c [NC] cell frame
    indices. Returns coords [E,2], Z [E], Ji [E,2,6], Jj [E,2,6], Jz [E,2].
    """
    from ..lie.quaternion import quat_to_matrix

    E = centers.shape[0]
    NC = E // Mp
    Gi = jnp.take(poses, ii_c, axis=0, mode="clip")
    Gj = jnp.take(poses, jj_c, axis=0, mode="clip")
    Gij = lops.se3_mul(Gj, lops.se3_inv(Gi))        # [NC, 7]

    fx, fy, cx, cy = intrinsics
    X0 = jnp.stack(
        [
            (centers[..., 0] - cx) / fx,
            (centers[..., 1] - cy) / fy,
            jnp.ones_like(centers[..., 2]),
            centers[..., 2],
        ],
        axis=-1,
    )
    X1 = lops.se3_act4(Gij[:, None, :], X0.reshape(NC, Mp, 4)).reshape(E, 4)

    tij = jnp.broadcast_to(Gij[:, None, :3], (NC, Mp, 3)).reshape(E, 3)
    Jj, Jz, xy = _center_jacobians(X1, tij, fx, fy)
    coords = xy + jnp.stack([cx, cy])[None]

    # Ji = -AdjT(Gij) @ Jj-rows, with the 6x6 adjoint built once per cell:
    # AdjT = [[R^T, 0], [-R^T [t]x, R^T]]  (see se3_adjT)
    R = quat_to_matrix(Gij[..., 3:7])               # [NC, 3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    tx = lops.hat_so3(Gij[..., :3])                 # [NC, 3, 3]
    Z3 = jnp.zeros_like(Rt)
    adjT = jnp.concatenate(
        [
            jnp.concatenate([Rt, Z3], axis=-1),
            jnp.concatenate([-(Rt @ tx), Rt], axis=-1),
        ],
        axis=-2,
    )  # [NC, 6, 6]
    Ji = -jnp.einsum(
        "cab,cmb->cma", adjT, Jj.reshape(NC, Mp * 2, 6)
    ).reshape(E, 2, 6)
    return coords, X1[..., 2], Ji, Jj, Jz


def _solve_schur(B, E, C, v, u, lmbda, ep, lm, structure_only, n_dyn):
    """Damped Schur-complement solve.

    Dense inputs: B [6N,6N], E [6N,M], C [M], v [6N], u [M].
    n_dyn: traced number of genuinely free poses (slots >= n_dyn inert).
    Returns dX [N,6], dZ [M].
    """
    M = E.shape[1]
    N = E.shape[0] // 6
    Q = 1.0 / (C + lmbda)  # [M]

    dZ_struct = Q * u

    if structure_only or N == 0:
        return jnp.zeros((N, 6), dtype=u.dtype), dZ_struct

    Bd, Ed, vd = B, E, v  # already dense [6N,6N], [6N,M], [6N]

    EQ = Ed * Q[None, :]
    S = Bd - EQ @ Ed.T
    y = vd - EQ @ u

    # damping: S_kk += lm * S_kk + ep   (ba.py:73 / ba_cuda.cu:556)
    diag = jnp.diag_indices(6 * N)
    S = S.at[diag].add(lm * S[diag] + ep)

    # inert slots (beyond the live window) get identity rows/cols so the
    # factorization stays PD; their dX is forced to 0 below.
    slot = jnp.arange(N)
    live = slot < n_dyn
    live6 = jnp.repeat(live, 6)
    mask2d = live6[:, None] & live6[None, :]
    S = jnp.where(mask2d, S, jnp.where(jnp.eye(6 * N, dtype=bool), 1.0, 0.0))
    y = jnp.where(live6, y, 0.0)

    L = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(L))
    # single factorization: on failure substitute an identity factor so the
    # solve stays finite, then zero the update (reference skips it,
    # Ramp_vo.py:302-306)
    L_safe = jnp.where(ok, L, jnp.eye(6 * N, dtype=S.dtype))
    dX = jax.scipy.linalg.cho_solve((L_safe, True), y)
    dX = jnp.where(ok, dX, 0.0)

    # on failure the reference skips the whole update; match that
    dZ = jnp.where(ok, Q * (u - Ed.T @ dX), 0.0)
    return dX.reshape(N, 6), dZ


def _assemble(r, w, Ji, Jj, Jz, i_slot, j_slot, k_slot, N, M):
    """Assemble the dense normal equations.

    r [E,2] residual, w [E,2] gated weights, Ji/Jj [E,2,6], Jz [E,2].
    i_slot/j_slot in [0,N) or out of range (fixed/inert), k_slot in [0,M).

    TPU formulation: instead of scattering 6x6 blocks (4 segment_sums with
    TPU-hostile scatter patterns), each edge's Jacobians are expanded onto
    the pose-slot axis with one-hots (out-of-window slots land in a dump
    column) and the whole Hessian becomes ONE MXU matmul
    B = (wU)^T U over [2E, 6(N+1)] — ~3x faster at E≈60k. (Lattice-ordered
    edge sets use `_assemble_cellwise` instead, which avoids the expansion.)

    Returns dense B [6N,6N], E [6N,M], C [M], v [6N], u [M], touched [M].
    """
    E_ = r.shape[0]
    Np1 = N + 1  # slot N = dump for fixed / out-of-window poses

    si = jnp.where((i_slot >= 0) & (i_slot < N), i_slot, N)
    sj = jnp.where((j_slot >= 0) & (j_slot < N), j_slot, N)
    oh_i = jax.nn.one_hot(si, Np1, dtype=r.dtype)  # [E, N+1]
    oh_j = jax.nn.one_hot(sj, Np1, dtype=r.dtype)

    # U[e, r, 6a:6a+6] = Ji at slot i, Jj at slot j
    U = (
        jnp.einsum("ea,erx->erax", oh_i, Ji)
        + jnp.einsum("ea,erx->erax", oh_j, Jj)
    ).reshape(E_, 2, Np1 * 6)
    Uw = U * w[..., None]

    U2 = U.reshape(E_ * 2, Np1 * 6)
    Uw2 = Uw.reshape(E_ * 2, Np1 * 6)
    B_full = Uw2.T @ U2                       # [6(N+1), 6(N+1)]
    v_full = Uw2.T @ r.reshape(E_ * 2)        # [6(N+1)]

    # E, C, u, touched share the kk index: one reduction of stacked features
    Erow = jnp.einsum("erm,er->em", Uw, Jz)   # [E, 6(N+1)]
    Ck = jnp.einsum("er,er->e", w * Jz, Jz)
    uk = jnp.einsum("er,er->e", w * Jz, r)
    feats = jnp.concatenate(
        [Erow, Ck[:, None], uk[:, None], w.sum(-1, keepdims=True)], axis=-1
    )
    vk_ok = (k_slot >= 0) & (k_slot < M)
    feats = jnp.where(vk_ok[:, None], feats, 0.0)
    agg = jax.ops.segment_sum(
        feats, jnp.where(vk_ok, k_slot, M), num_segments=M + 1
    )[:M]
    Emat = agg[:, : Np1 * 6].T[: 6 * N]       # [6N, M]
    C, u, touched = agg[:, -3], agg[:, -2], agg[:, -1] > 0

    return (
        B_full[: 6 * N, : 6 * N], Emat, C, v_full[: 6 * N], u, touched
    )


def _assemble_cellwise(r, w, Ji, Jj, Jz, i_slot, j_slot, N, M,
                       lattice, win_rows):
    """Lattice-cell-batched assembly of the normal equations.

    All edges of a lattice cell share the pose pair (si, sj), so the pose
    Hessian is a batched [12, 2Mp] x [2Mp, 12] matmul per cell plus a tiny
    pose-pair placement einsum — no [E, 2, 6(N+1)] one-hot expansion. The
    expansion's three ~32MB small-minor-dim intermediates made the flat
    `_assemble` XLA-layout-bound (7.3 ms at E=60k; this path ~1-2 ms).

    Same contract as `_assemble`.
    """
    NI, T, Mp = lattice
    NC = NI * T
    Np1 = N + 1
    W = win_rows.shape[0]
    assert M == W * Mp

    Jcat = jnp.concatenate([Ji, Jj], axis=-1)          # [E, 2, 12]
    Jc = Jcat.reshape(NC, Mp * 2, 12)
    wc = w.reshape(NC, Mp * 2, 1)
    rc = r.reshape(NC, Mp * 2)

    # pose-pair block per cell: Bc = (w J)^T J,  vc = (w r)^T J
    wJ = wc * Jc
    Bc = jax.lax.dot_general(
        wJ, Jc, (((1,), (1,)), ((0,), (0,)))
    )  # [NC, 12, 12]
    vc = jax.lax.dot_general(
        (wc[..., 0] * rc)[:, None, :], Jc, (((2,), (1,)), ((0,), (0,)))
    )[:, 0, :]  # [NC, 12]

    # placement: one-hot over pose slots (dump slot N for fixed/inert)
    si = i_slot.reshape(NC, Mp)[:, 0]
    sj = j_slot.reshape(NC, Mp)[:, 0]
    oh_i = jax.nn.one_hot(
        jnp.where((si >= 0) & (si < N), si, N), Np1, dtype=r.dtype
    )
    oh_j = jax.nn.one_hot(
        jnp.where((sj >= 0) & (sj < N), sj, N), Np1, dtype=r.dtype
    )
    ohP = jnp.stack([oh_i, oh_j], axis=1)              # [NC, 2, Np1]
    Bc4 = Bc.reshape(NC, 2, 6, 2, 6)
    B_full = jnp.einsum(
        "cup,cuxvy,cvq->pxqy", ohP, Bc4, ohP
    ).reshape(Np1 * 6, Np1 * 6)
    v_full = jnp.einsum(
        "cup,cux->px", ohP, vc.reshape(NC, 2, 6)
    ).reshape(Np1 * 6)

    # per-patch quantities: dense t-axis sums + window-frame row gather
    wJz = w * Jz                                       # [E, 2]
    Ck = (wJz * Jz).sum(-1).reshape(NI, T, Mp).sum(1)  # [NI, Mp]
    uk = (wJz * r).sum(-1).reshape(NI, T, Mp).sum(1)
    tk = w.sum(-1).reshape(NI, T, Mp).sum(1)

    Erow = (wJ * Jz.reshape(NC, Mp * 2, 1)).reshape(
        NI, T, Mp, 2, 12
    ).sum(3)                                           # [NI, T, Mp, 12]
    Ei_row = Erow[..., :6].sum(1)                      # [NI, Mp, 6]
    # j-part: per cell placed at sj; contract t with the cell one-hot
    Ejp = jnp.einsum(
        "rtmx,rtp->prmx", Erow[..., 6:], oh_j.reshape(NI, T, Np1)
    )  # [Np1, NI, Mp, 6]
    # the row's host slot is t-constant, but individual cells may be
    # sanitized-invalid (si = -t0 < any live slot): max over t recovers the
    # true slot; all-invalid rows stay negative -> dump
    si_row = jnp.max(si.reshape(NI, T), axis=1)
    oh_si = jax.nn.one_hot(
        jnp.where((si_row >= 0) & (si_row < N), si_row, N), Np1,
        dtype=r.dtype,
    )
    Efull = Ejp + jnp.einsum("rmx,rp->prmx", Ei_row, oh_si)

    ok = win_rows >= 0
    rows = jnp.clip(win_rows, 0, NI - 1)

    # Efull [Np1, NI, Mp, 6] -> window frames -> [Np1, 6, W, Mp] -> 2D
    Emat4 = jnp.where(ok[None, :, None, None], Efull[:, rows], 0.0)
    Emat = jnp.transpose(Emat4, (0, 3, 1, 2)).reshape(Np1 * 6, M)[: 6 * N]
    C = jnp.where(ok[:, None], Ck[rows], 0.0).reshape(M)
    u = jnp.where(ok[:, None], uk[rows], 0.0).reshape(M)
    touched = jnp.where(ok[:, None], tk[rows], 0.0).reshape(M) > 0

    return B_full[: 6 * N, : 6 * N], Emat, C, v_full[: 6 * N], u, touched


def ba_train(
    poses,  # SE3 wrapper [B, Nf]
    patches,  # [B, Npatch, 3, P, P]
    intrinsics,  # [B, Nf, 4]
    targets,  # [B, E, 2]
    weights,  # [B, E, 2]
    lmbda,
    ii,
    jj,
    kk,
    bounds,  # (x0, y0, x1, y1)
    ep: float = 100.0,
    fixedp: int = 1,
    structure_only: bool = False,
    valid=None,  # [E] optional edge mask
):
    """Differentiable BA step (one GN iteration), ref: ramp/ba.py:86-182.

    `Nf` (frames) and `Npatch` are static; poses [fixedp, Nf) are free.
    Returns (poses', patches').
    """
    from ..lie import SE3

    B_, Nf = poses.shape
    Npatch = patches.shape[1]
    P = patches.shape[-1]
    N = Nf - fixedp

    def one(poses7, patches1, intr, tgt, wgt):
        centers = patches1[kk, :, P // 2, P // 2]  # [E,3]
        coords, Z, Ji, Jj, Jz = linearize_center(
            poses7, centers, jnp.take(intr, ii, axis=0), jnp.take(intr, jj, axis=0), ii, jj
        )
        r = tgt - coords  # [E,2]

        v_gate = (jnp.linalg.norm(r, axis=-1) < 250.0) & (Z > 0.2)
        in_bounds = (
            (coords[..., 0] > bounds[0])
            & (coords[..., 1] > bounds[1])
            & (coords[..., 0] < bounds[2])
            & (coords[..., 1] < bounds[3])
        )
        gate = v_gate & in_bounds
        if valid is not None:
            gate = gate & valid
        w = jnp.where(gate[:, None], wgt, 0.0)
        r = jnp.where(gate[:, None], r, 0.0)

        Bm, Em, C, v, u, _ = _assemble(
            r, w, Ji, Jj, Jz, ii - fixedp, jj - fixedp, kk, N, Npatch
        )
        dX, dZ = _solve_schur(
            Bm, Em, C, v, u, lmbda, ep, 1e-4, structure_only, jnp.asarray(N)
        )

        if not structure_only and N > 0:
            idx = fixedp + jnp.arange(N)
            cur = poses7[idx]
            poses7 = poses7.at[idx].set(lops.se3_retr(cur, dX))
        d = jnp.clip(patches1[:, 2] + dZ[:, None, None], 1e-3, 10.0)
        patches1 = patches1.at[:, 2].set(d)
        return poses7, patches1

    new_poses, new_patches = jax.vmap(one)(
        poses.data, patches, intrinsics, targets, weights
    )
    return SE3(new_poses), new_patches


@partial(
    jax.jit,
    static_argnames=(
        "N", "M", "iterations", "structure_only", "lattice", "cell_linearize"
    ),
)
def ba_infer(
    poses,  # [Np, 7] full pose buffer (SE3 data)
    cwin,  # [M, 3] patch-center window (x, y, inverse depth); kk in [0, M)
    intrinsics,  # [4] shared fx fy cx cy (ref kernel reads intrinsics[0])
    targets,  # [E, 2]
    weights,  # [E, 2]
    lmbda,  # scalar
    ii,  # [E] frame indices (absolute)
    jj,  # [E]
    kk,  # [E] patch slots in [0, M)
    t0,  # traced int: first free pose
    t1,  # traced int: one past last free pose
    *,
    N: int,  # static pose-window capacity (>= t1 - t0)
    M: int,  # static patch-window capacity
    iterations: int = 2,
    valid=None,  # [E] bool edge mask
    structure_only: bool = False,
    lattice=None,   # (NI, T, Mp) static: edges are the full edge lattice
    win_rows=None,  # [M // Mp] lattice row holding each window frame (-1)
    cell_linearize: bool = True,  # per-cell pose chains in linearization
):
    """Inference GN BA, ref: ramp/fastba/ba_cuda.cu:232-376,430-576.

    The patch window enters as CENTERS ([M, 3]) — BA only ever reads the
    center pixel + the per-patch inverse depth and only writes depth
    (ba_cuda.cu:316-338,218-222), so the interleaved [M, 3, P, P] window
    (whose (3, 3) minor dims XLA pads ~170x) never needs to exist.
    Returns (poses', d' [M] updated inverse depths).
    """
    fx, fy, cx, cy = intrinsics
    intr_e = jnp.broadcast_to(intrinsics, (ii.shape[0], 4))
    n_dyn = t1 - t0

    cell_linearize = cell_linearize and lattice is not None
    if cell_linearize:
        Mp_l = lattice[2]
        ii_c = ii.reshape(-1, Mp_l)[:, 0]
        jj_c = jj.reshape(-1, Mp_l)[:, 0]

    def body(_, carry):
        poses7, cw = carry
        centers = cw[kk]
        if cell_linearize:
            coords, Z, Ji, Jj, Jz = linearize_center_cells(
                poses7, centers, intrinsics, ii_c, jj_c, Mp_l
            )
        else:
            coords, Z, Ji, Jj, Jz = linearize_center(
                poses7, centers, intr_e, intr_e, ii, jj
            )
        r = targets - coords

        # robust gates (ba_cuda.cu:296-308)
        gate = (
            (jnp.linalg.norm(r, axis=-1) < 128.0)
            & (Z > 0.2)
            & (coords[..., 0] > -64.0)
            & (coords[..., 1] > -64.0)
            & (coords[..., 0] < 2 * cx + 64.0)
            & (coords[..., 1] < 2 * cy + 64.0)
        )
        if valid is not None:
            gate = gate & valid
        w = jnp.where(gate[:, None], weights, 0.0)
        rg = jnp.where(gate[:, None], r, 0.0)

        i_slot = ii - t0
        j_slot = jj - t0
        if lattice is not None:
            Bm, Em, C, v, u, touched = _assemble_cellwise(
                rg, w, Ji, Jj, Jz, i_slot, j_slot, N, M, lattice, win_rows
            )
        else:
            Bm, Em, C, v, u, touched = _assemble(
                rg, w, Ji, Jj, Jz, i_slot, j_slot, kk, N, M
            )
        dX, dZ = _solve_schur(Bm, Em, C, v, u, lmbda, 1.0, 1e-4, structure_only, n_dyn)

        # pose retraction on slots [0, t1-t0)
        idx = t0 + jnp.arange(N)
        slot_ok = jnp.arange(N) < n_dyn
        cur = poses7[jnp.clip(idx, 0, poses7.shape[0] - 1)]
        upd = lops.se3_retr(cur, dX)
        upd = jnp.where(slot_ok[:, None], upd, cur)
        poses7 = poses7.at[idx].set(upd, mode="drop")

        # depth retraction with reset (ba_cuda.cu:218-222), touched slots only
        d = cw[:, 2] + dZ
        d = jnp.where(d > 20.0, 1.0, d)
        d = jnp.maximum(d, 1e-4)
        d = jnp.where(touched, d, cw[:, 2])
        cw = cw.at[:, 2].set(d)
        return poses7, cw

    poses_out, cw_out = jax.lax.fori_loop(
        0, iterations, body, (poses, cwin)
    )
    return poses_out, cw_out[:, 2]
