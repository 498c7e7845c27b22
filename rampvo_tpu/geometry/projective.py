"""Projective geometry for the patch graph.

Functional equivalents of the reference's ramp/projective_ops.py (pinhole
inverse-projection of [x, y, inv-depth] patches, relative-pose transform,
projection with Z-clamp, analytic 2x6 pose / 2x1 depth Jacobians, point cloud,
flow magnitude). Everything is batched jnp; `poses` is an SE3 wrapper.

Conventions (match the reference so checkpoints/targets are interchangeable):
  patches     [B, Np, 3, P, P]  channels (x, y, inverse depth) at full BA res
  intrinsics  [B, N, 4]         (fx, fy, cx, cy)
  poses       SE3 [B, N]        world-to-camera
  ii, jj, kk  [E] int32         source frame / target frame / patch index
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lie import SE3

MIN_DEPTH = 0.2


def extract_intrinsics(intrinsics: jnp.ndarray):
    """[..., 4] -> four [..., 1, 1] arrays (fx, fy, cx, cy)."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    return fx, fy, cx, cy


def iproj(patches: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Inverse projection: patches [B,E,3,P,P] -> homogeneous X [B,E,P,P,4].

    (ref semantics: projective_ops.py:16-26)
    """
    x = patches[..., 0, :, :]
    y = patches[..., 1, :, :]
    d = patches[..., 2, :, :]
    fx, fy, cx, cy = extract_intrinsics(intrinsics)
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X: jnp.ndarray, intrinsics: jnp.ndarray, depth: bool = False) -> jnp.ndarray:
    """Pinhole projection with Z clamped at 0.1 (ref: projective_ops.py:29-47)."""
    Xx, Xy, Xz = X[..., 0], X[..., 1], X[..., 2]
    fx, fy, cx, cy = extract_intrinsics(intrinsics)
    d = 1.0 / jnp.maximum(Xz, 0.1)
    x = fx * (d * Xx) + cx
    y = fy * (d * Xy) + cy
    if depth:
        return jnp.stack([x, y, d], axis=-1)
    return jnp.stack([x, y], axis=-1)


def relative_poses(poses: SE3, ii: jnp.ndarray, jj: jnp.ndarray, tonly: bool = False) -> SE3:
    """Gij = Tj ∘ Ti⁻¹ per edge."""
    Gij = poses[:, jj] * poses[:, ii].inv()
    if tonly:
        data = Gij.data
        ident_rot = jnp.zeros_like(data[..., 3:7]).at[..., 3].set(1.0)
        Gij = SE3(jnp.concatenate([data[..., :3], ident_rot], axis=-1))
    return Gij


def transform(
    poses: SE3,
    patches: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    kk: jnp.ndarray,
    depth: bool = False,
    valid: bool = False,
    jacobian: bool = False,
    tonly: bool = False,
):
    """Reproject patch kk from frame ii into frame jj.

    Returns coords [B,E,P,P,2] (and optionally validity / analytic Jacobians
    at the patch centre, matching projective_ops.py:50-101).
    """
    X0 = iproj(patches[:, kk], intrinsics[:, ii])
    Gij = relative_poses(poses, ii, jj, tonly=tonly)
    X1 = Gij[:, :, None, None] * X0  # act4 on [B,E,P,P,4]
    x1 = proj(X1, intrinsics[:, jj], depth=depth)

    if jacobian:
        p = X1.shape[2]
        center = X1[..., p // 2, p // 2, :]
        X, Y, Z, H = jnp.moveaxis(center, -1, 0)
        o = jnp.zeros_like(H)

        fx, fy, _, _ = jnp.moveaxis(intrinsics[:, jj], -1, 0)

        d = jnp.where(jnp.abs(Z) > 0.2, 1.0 / jnp.where(jnp.abs(Z) > 0.2, Z, 1.0), 0.0)

        # d(X1)/d(xi_j) for left retraction at pose j: [H·I | -hat(X1)]
        Ja = jnp.stack(
            [
                H, o, o, o, Z, -Y,
                o, H, o, -Z, o, X,
                o, o, H, Y, -X, o,
                o, o, o, o, o, o,
            ],
            axis=-1,
        ).reshape(X.shape + (4, 6))

        # d(proj)/d(X1)
        Jp = jnp.stack(
            [
                fx * d, o, -fx * X * d * d, o,
                o, fy * d, -fy * Y * d * d, o,
            ],
            axis=-1,
        ).reshape(X.shape + (2, 4))

        Jj = Jp @ Ja  # [B,E,2,6]
        Ji = -Gij[:, :, None].adjT(Jj)
        Jz = Jp @ Gij.matrix()[..., :, 3:]  # [B,E,2,1]

        return x1, (Z > 0.2).astype(x1.dtype), (Ji, Jj, Jz)

    if valid:
        return x1, (X1[..., 2] > 0.2).astype(x1.dtype)

    return x1


def point_cloud(poses: SE3, patches: jnp.ndarray, intrinsics: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Back-project patches to world points (ref: projective_ops.py:103-105)."""
    return poses[:, ix, None, None].inv() * iproj(patches, intrinsics[:, ix])


def flow_mag(
    poses: SE3,
    patches: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    kk: jnp.ndarray,
    beta: float = 0.3,
) -> jnp.ndarray:
    """Blend of full and translation-only flow magnitude (ref :108-118)."""
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1 = transform(poses, patches, intrinsics, ii, jj, kk)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)

    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1 - beta) * flow2


def coords_grid_with_index(d: jnp.ndarray):
    """Pixel grid stacked with inverse depth: d [B,N,H,W] -> [B,N,3,H,W]
    (ref: ramp/utils.py:54-69)."""
    b, n, h, w = d.shape
    x = jnp.arange(w, dtype=d.dtype)
    y = jnp.arange(h, dtype=d.dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    xx = jnp.broadcast_to(xx, (b, n, h, w))
    yy = jnp.broadcast_to(yy, (b, n, h, w))
    coords = jnp.stack([xx, yy, d], axis=2)
    index = jnp.broadcast_to(
        jnp.arange(n, dtype=d.dtype)[None, :, None, None, None], (b, n, 1, h, w)
    )
    return coords, index


def set_depth(patches: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the inverse-depth channel (ref: ramp/utils.py:99-101)."""
    return patches.at[..., 2, :, :].set(depth[..., None, None])


def transform_edges(
    poses_i: jnp.ndarray,   # [E, 7] SE3 data (world-to-camera) of source frames
    poses_j: jnp.ndarray,   # [E, 7] of target frames
    patches: jnp.ndarray,   # [E, 3, P, P]
    intrinsics: jnp.ndarray,  # [4] shared pinhole
) -> jnp.ndarray:
    """Edge-wise patch reprojection with explicit pre-gathered poses.

    The VO runtime gathers poses/patches through its logical->global maps and
    calls this; semantics match `transform` (ref: projective_ops.py:50-65)
    for a single shared camera. Returns coords [E, P, P, 2].
    """
    from ..lie import ops as lops

    fx, fy, cx, cy = intrinsics
    x = patches[:, 0]
    y = patches[:, 1]
    d = patches[:, 2]
    X0 = jnp.stack(
        [(x - cx) / fx, (y - cy) / fy, jnp.ones_like(d), d], axis=-1
    )  # [E, P, P, 4]

    Gij = lops.se3_mul(poses_j, lops.se3_inv(poses_i))
    X1 = lops.se3_act4(Gij[:, None, None, :], X0)

    Z = jnp.maximum(X1[..., 2], 0.1)
    u = fx * (X1[..., 0] / Z) + cx
    v = fy * (X1[..., 1] / Z) + cy
    return jnp.stack([u, v], axis=-1)


def flow_mag_edges(
    poses_i, poses_j, patches, intrinsics, beta: float = 0.5
) -> jnp.ndarray:
    """Edge-wise blend of full and translation-only flow magnitude
    (ref: projective_ops.py:108-118). Returns [E, P, P]."""
    ident_rot = jnp.zeros_like(poses_j[..., 3:7]).at[..., 3].set(1.0)

    coords0 = transform_edges(poses_i, poses_i, patches, intrinsics)
    coords1 = transform_edges(poses_i, poses_j, patches, intrinsics)

    # translation-only relative pose: zero out rotation of Gij by building
    # Gj' = [R_i | t_j'] s.t. Gj' Gi^-1 has identity rotation and the same
    # translation as Gij
    from ..lie import ops as lops

    Gij = lops.se3_mul(poses_j, lops.se3_inv(poses_i))
    Gij_t = jnp.concatenate([Gij[..., :3], ident_rot], axis=-1)
    Gj_t = lops.se3_mul(Gij_t, poses_i)
    coords2 = transform_edges(poses_i, Gj_t, patches, intrinsics)

    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1 - beta) * flow2
