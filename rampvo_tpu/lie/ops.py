"""Functional Lie-group operations on raw arrays.

Data layouts (trailing dim), matching the reference checkpoint/pose formats
(ramp/lietorch/include/{so3,se3,rxso3,sim3}.h):

  SO3   : [qx, qy, qz, qw]                  N=4, tangent K=3 (phi)
  SE3   : [tx, ty, tz, qx, qy, qz, qw]      N=7, tangent K=6 (tau, phi)
  RxSO3 : [qx, qy, qz, qw, s]               N=5, tangent K=4 (phi, sigma)
  Sim3  : [tx, ty, tz, qx, qy, qz, qw, s]   N=8, tangent K=7 (tau, phi, sigma)

All functions broadcast over leading dimensions and are differentiable
(small-angle Taylor branches are selected with `where` on NaN-free inputs).
These are new derivations of textbook formulas — not ports of the Eigen
templates in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import (
    _safe_sqrt,
    quat_act,
    quat_exp,
    quat_inv,
    quat_log,
    quat_mul,
    quat_normalize,
    quat_to_matrix,
)

__all__ = [
    "so3_exp", "so3_log", "so3_inv", "so3_mul", "so3_act",
    "se3_exp", "se3_log", "se3_inv", "se3_mul", "se3_act", "se3_act4",
    "se3_adj", "se3_adjT", "se3_matrix", "se3_retr", "se3_identity",
    "rxso3_exp", "rxso3_log", "rxso3_inv", "rxso3_mul", "rxso3_act",
    "sim3_exp", "sim3_log", "sim3_inv", "sim3_mul", "sim3_act",
    "hat_so3",
]


def hat_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(phi, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

so3_exp = quat_exp
so3_log = quat_log
so3_inv = quat_inv
so3_mul = quat_mul
so3_act = quat_act


def _so3_left_jacobian_terms(phi: jnp.ndarray):
    """Coefficients (a, b) of V = I + a φ^ + b φ^² (the SO3 left Jacobian).

    Unsafe denominators are masked to 1 in the small branch BEFORE the
    division so that neither primal nor cotangent produces NaN (the
    "double-where" rule).
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    th_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(th_sq)
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / th_sq)
    b = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / (th_sq * theta),
    )
    return a, b


def _so3_left_jacobian_inv_terms(phi: jnp.ndarray):
    """Coefficients of V⁻¹ = I - 1/2 φ^ + c φ^²."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    th_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(th_sq)
    c_exact = (1.0 / th_sq) - (1.0 + jnp.cos(theta)) / (
        2.0 * theta * jnp.sin(theta)
    )
    c_taylor = 1.0 / 12.0 + theta_sq / 720.0
    return jnp.where(small, c_taylor, c_exact)


def _apply_V(phi: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """V(phi) @ tau without materialising the 3x3."""
    a, b = _so3_left_jacobian_terms(phi)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    return tau + a * c1 + b * c2


def _apply_V_inv(phi: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    c = _so3_left_jacobian_inv_terms(phi)
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    return t - 0.5 * c1 + c * c2


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    base = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [tau, phi] -> SE3 [t, q]."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = quat_exp(phi)
    t = _apply_V(phi, tau)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    phi = quat_log(q)
    tau = _apply_V_inv(phi, t)
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    qi = quat_inv(q)
    return jnp.concatenate([-quat_act(qi, t), qi], axis=-1)


def se3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ta, qa = a[..., :3], a[..., 3:7]
    tb, qb = b[..., :3], b[..., 3:7]
    return jnp.concatenate([quat_act(qa, tb) + ta, quat_mul(qa, qb)], axis=-1)


def se3_act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply to 3-points: R p + t."""
    return quat_act(g[..., 3:7], p) + g[..., :3]


def se3_act4(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply to homogeneous 4-points: [R p + w t, w].

    This is the form the projective pipeline uses (patches carry inverse
    depth in the w slot; see geometry/projective.py).
    """
    xyz = quat_act(g[..., 3:7], p[..., :3]) + p[..., 3:4] * g[..., :3]
    return jnp.concatenate([xyz, p[..., 3:4]], axis=-1)


def se3_adj(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Adjoint action on tangent vector x = [v, w]: [Rv + t×(Rw), Rw]."""
    t, q = g[..., :3], g[..., 3:7]
    v, w = x[..., :3], x[..., 3:6]
    Rw = quat_act(q, w)
    return jnp.concatenate([quat_act(q, v) + jnp.cross(t, Rw), Rw], axis=-1)


def se3_adjT(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Transposed adjoint: Adj_gᵀ x = [Rᵀv, Rᵀ(w + t×... )].

    Derived as the transpose of se3_adj's 6x6 matrix:
      Adj = [[R, t^ R], [0, R]]  =>  AdjT = [[Rᵀ, 0], [Rᵀ t^ᵀ, Rᵀ]]
      AdjT [v, w] = [Rᵀ v, Rᵀ(w - t×v)]
    """
    t, q = g[..., :3], g[..., 3:7]
    v, w = x[..., :3], x[..., 3:6]
    qi = quat_inv(q)
    return jnp.concatenate(
        [quat_act(qi, v), quat_act(qi, w - jnp.cross(t, v))], axis=-1
    )


def se3_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix."""
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=g.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left retraction exp(xi) ∘ g (reference: retrSE3, ba_cuda.cu:156-174)."""
    return se3_mul(se3_exp(xi), g)


def se3_normalize(g: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([g[..., :3], quat_normalize(g[..., 3:7])], axis=-1)


# ---------------------------------------------------------------------------
# RxSO3 (rotation + scale)
# ---------------------------------------------------------------------------

def rxso3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [phi, sigma] -> [q, s]."""
    phi, sigma = xi[..., :3], xi[..., 3:4]
    return jnp.concatenate([quat_exp(phi), jnp.exp(sigma)], axis=-1)


def rxso3_log(g: jnp.ndarray) -> jnp.ndarray:
    q, s = g[..., :4], g[..., 4:5]
    return jnp.concatenate([quat_log(q), jnp.log(s)], axis=-1)


def rxso3_inv(g: jnp.ndarray) -> jnp.ndarray:
    q, s = g[..., :4], g[..., 4:5]
    return jnp.concatenate([quat_inv(q), 1.0 / s], axis=-1)


def rxso3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [quat_mul(a[..., :4], b[..., :4]), a[..., 4:5] * b[..., 4:5]], axis=-1
    )


def rxso3_act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return g[..., 4:5] * quat_act(g[..., :4], p)


# ---------------------------------------------------------------------------
# Sim3 (similarity transform)
# ---------------------------------------------------------------------------

def _sim3_W_terms(phi: jnp.ndarray, sigma: jnp.ndarray):
    """Coefficients (A, B, C) of W = C I + A φ^ + B φ^² for Sim3 exp.

    Standard closed forms with the full 4-way case table (σ→0, θ→0, both,
    neither); all branches are NaN-free under autodiff because denominators
    are masked to 1 before `where` selects.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = _safe_sqrt(theta_sq)
    s = jnp.exp(sigma)

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta_sq < 1e-8

    sig = jnp.where(small_sigma, 1.0, sigma)          # safe sigma
    th = jnp.where(small_theta, 1.0, theta)           # safe theta
    th_sq = jnp.where(small_theta, 1.0, theta_sq)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    c = th_sq + sig * sig

    # C = (s - 1) / σ  (Taylor: 1 + σ/2 + σ²/6)
    C = jnp.where(
        small_sigma, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig
    )

    # A: coefficient of φ^
    a_both_small = 0.5
    a_small_sigma = (1.0 - cos_t) / th_sq
    a_small_theta = ((sig - 1.0) * s + 1.0) / (sig * sig)
    a_general = (s * sin_t * sig + (1.0 - s * cos_t) * th) / (th * c)
    A = jnp.where(
        small_sigma,
        jnp.where(small_theta, a_both_small, a_small_sigma),
        jnp.where(small_theta, a_small_theta, a_general),
    )

    # B: coefficient of φ^²
    b_both_small = 1.0 / 6.0
    b_small_sigma = (theta - sin_t) / (th_sq * th)
    b_small_theta = (s * (0.5 * sig * sig + 1.0) - 1.0 - sig * s) / (
        sig * sig * sig
    )
    b_general = (C - ((s * cos_t - 1.0) * sig + s * sin_t * th) / c) / th_sq
    B = jnp.where(
        small_sigma,
        jnp.where(small_theta, b_both_small, b_small_sigma),
        jnp.where(small_theta, b_small_theta, b_general),
    )
    return A, B, C


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [tau, phi, sigma] -> [t, q, s]."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = quat_exp(phi)
    A, B, C = _sim3_W_terms(phi, sigma)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = C * tau + A * c1 + B * c2
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def _sim3_apply_W_inv(phi, sigma, t):
    """Invert W numerically-stably by solving the 3x3 (tiny, batched)."""
    A, B, C = _sim3_W_terms(phi, sigma)
    eye = jnp.eye(3, dtype=t.dtype)
    P = hat_so3(phi)
    W = C[..., None] * eye + A[..., None] * P + B[..., None] * (P @ P)
    return jnp.linalg.solve(W, t[..., None])[..., 0]


def sim3_log(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    phi = quat_log(q)
    sigma = jnp.log(s)
    tau = _sim3_apply_W_inv(phi, sigma, t)
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ta, qa, sa = a[..., :3], a[..., 3:7], a[..., 7:8]
    tb, qb, sb = b[..., :3], b[..., 3:7], b[..., 7:8]
    return jnp.concatenate(
        [sa * quat_act(qa, tb) + ta, quat_mul(qa, qb), sa * sb], axis=-1
    )


def sim3_inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qi = quat_inv(q)
    return jnp.concatenate([-quat_act(qi, t) / s, qi, 1.0 / s], axis=-1)


def sim3_act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    return s * quat_act(q, p) + t
