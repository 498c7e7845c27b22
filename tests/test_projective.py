"""Projective-ops tests: geometric invariants + analytic-vs-autodiff Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np

from rampvo_tpu.geometry import iproj, proj, transform, point_cloud, flow_mag
from rampvo_tpu.lie import SE3
import pytest


def make_scene(key, n_frames=4, n_patches=12, P=3):
    k1, k2, k3 = jax.random.split(key, 3)
    # small random camera motions
    xi = 0.05 * jax.random.normal(k1, (n_frames, 6))
    poses = SE3.exp(xi)[None]  # [1, N]
    intr = jnp.tile(jnp.asarray([[120.0, 120.0, 80.0, 60.0]]), (n_frames, 1))[None]
    # patches: pixel coords in-bounds, positive inverse depth
    xy = jax.random.uniform(k2, (1, n_frames * n_patches, 2, 1, 1), minval=20, maxval=140)
    xy = jnp.tile(xy, (1, 1, 1, P, P))
    offs = jnp.stack(jnp.meshgrid(jnp.arange(P) - 1, jnp.arange(P) - 1, indexing="xy"), 0)
    xy = xy + offs[None, None].astype(xy.dtype)
    d = jax.random.uniform(k3, (1, n_frames * n_patches, 1, P, P), minval=0.5, maxval=2.0)
    patches = jnp.concatenate([xy, d], axis=2)
    ix = jnp.repeat(jnp.arange(n_frames), n_patches)
    return poses, patches, intr, ix


def test_identity_transform_roundtrip():
    """Reprojecting into the same frame returns the patch coordinates."""
    poses, patches, intr, ix = make_scene(jax.random.PRNGKey(0))
    kk = jnp.arange(patches.shape[1])
    coords = transform(poses, patches, intr, ix[kk], ix[kk], kk)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(coords), -1, 2),
        np.asarray(patches[:, :, :2]),
        atol=1e-3,
    )


def test_iproj_proj_inverse():
    poses, patches, intr, ix = make_scene(jax.random.PRNGKey(1))
    X = iproj(patches[:, :8], intr[:, ix[:8]])
    # proj expects X with Z=1 scaled arbitrarily; check x = proj(iproj(x))
    x = proj(X, intr[:, ix[:8]])
    np.testing.assert_allclose(
        np.asarray(x)[..., 0], np.asarray(patches[:, :8, 0]), atol=1e-3
    )


@pytest.mark.slow
def test_jacobians_match_autodiff():
    """Analytic pose/depth Jacobians == autodiff of the projection chain."""
    poses, patches, intr, ix = make_scene(jax.random.PRNGKey(2))
    E = 16
    kk = jnp.arange(E)
    ii = ix[kk]
    jj = (ii + 1) % 4

    coords, valid, (Ji, Jj, Jz) = transform(
        poses, patches, intr, ii, jj, kk, jacobian=True
    )
    assert np.all(np.asarray(valid) > 0)

    p = patches.shape[-1]

    def center_proj_wrt_pose_j(xi_e, e):
        # left-retract pose jj[e] by xi and reproject edge e's centre pixel
        new_poses = SE3(
            poses.data.at[0, jj[e]].set(SE3.exp(xi_e).mul(poses[0, jj[e]]).data)
        )
        c = transform(new_poses, patches, intr, ii[e : e + 1], jj[e : e + 1], kk[e : e + 1])
        return c[0, 0, p // 2, p // 2]

    def center_proj_wrt_pose_i(xi_e, e):
        new_poses = SE3(
            poses.data.at[0, ii[e]].set(SE3.exp(xi_e).mul(poses[0, ii[e]]).data)
        )
        c = transform(new_poses, patches, intr, ii[e : e + 1], jj[e : e + 1], kk[e : e + 1])
        return c[0, 0, p // 2, p // 2]

    def center_proj_wrt_depth(dz, e):
        new_patches = patches.at[0, kk[e], 2].add(dz)
        c = transform(poses, new_patches, intr, ii[e : e + 1], jj[e : e + 1], kk[e : e + 1])
        return c[0, 0, p // 2, p // 2]

    for e in [0, 3, 7, 11]:
        J_num = jax.jacfwd(center_proj_wrt_pose_j)(jnp.zeros(6), e)
        np.testing.assert_allclose(np.asarray(Jj[0, e]), np.asarray(J_num), atol=2e-2, rtol=2e-3)

        J_num_i = jax.jacfwd(center_proj_wrt_pose_i)(jnp.zeros(6), e)
        np.testing.assert_allclose(np.asarray(Ji[0, e]), np.asarray(J_num_i), atol=2e-2, rtol=2e-3)

        J_num_z = jax.jacfwd(center_proj_wrt_depth)(jnp.asarray(0.0), e)
        np.testing.assert_allclose(
            np.asarray(Jz[0, e, :, 0]), np.asarray(J_num_z), atol=2e-2, rtol=2e-3
        )


def test_point_cloud_consistency():
    """point_cloud then re-projecting through the same pose gives pixels back."""
    poses, patches, intr, ix = make_scene(jax.random.PRNGKey(3))
    pts = point_cloud(poses, patches, intr, ix)  # [1, Np, P, P, 4] world homog
    # transform world point into its own camera: T_i * X_world == iproj result
    Xc = poses[:, ix, None, None] * pts
    x = proj(Xc, intr[:, ix])
    np.testing.assert_allclose(
        np.asarray(x)[..., 0], np.asarray(patches[:, :, 0]), atol=1e-2
    )


def test_flow_mag_zero_for_identity():
    poses, patches, intr, ix = make_scene(jax.random.PRNGKey(4))
    ident = SE3.Identity(1, 4)
    kk = jnp.arange(patches.shape[1])
    fm = flow_mag(ident, patches, intr, ix, ix, kk, beta=0.5)
    np.testing.assert_allclose(np.asarray(fm), 0.0, atol=1e-3)
