"""Quaternion primitives (xyzw layout, Hamilton convention).

Pure-jnp closed forms; everything broadcasts over leading dims. These are the
building blocks for the SO3/SE3/RxSO3/Sim3 groups (reference semantics:
ramp/lietorch/include/so3.h and the device math in ramp/fastba/ba_cuda.cu:36-110,
re-derived here rather than ported).
"""

from __future__ import annotations

import jax.numpy as jnp

# Tolerance below which Taylor expansions replace trig closed forms.
_SMALL = 1e-8


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b for xyzw quaternions."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by unit quaternion q.

    Uses the 2-cross-product form (matches actSO3 in the reference CUDA,
    ba_cuda.cu:36-46, which is the standard identity — not a port).
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a zero-safe gradient (clamps the primal away from 0)."""
    return jnp.sqrt(jnp.maximum(x, jnp.asarray(1e-24, x.dtype)))


def quat_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """SO3 exponential: rotation vector phi (3,) -> unit quaternion.

    Small-angle branch uses the Taylor series of sin(θ/2)/θ and cos(θ/2),
    selected with `where` so both branches are NaN-free under autodiff.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    theta_p4 = theta_sq * theta_sq
    imag_taylor = 0.5 - theta_sq / 48.0 + theta_p4 / 3840.0
    real_taylor = 1.0 - theta_sq / 8.0 + theta_p4 / 384.0
    imag_exact = jnp.sin(0.5 * theta) / theta
    real_exact = jnp.cos(0.5 * theta)
    imag = jnp.where(small, imag_taylor, imag_exact)
    real = jnp.where(small, real_taylor, real_exact)
    return jnp.concatenate([imag * phi, real], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """SO3 logarithm: unit quaternion -> rotation vector (3,)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # Map to the positive-real hemisphere so the log is the principal one.
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    norm_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = norm_sq < 1e-12
    norm = jnp.sqrt(jnp.where(small, 1.0, norm_sq))
    # atan2(|qv|, qw) = θ/2 ;  phi = 2 * atan2(|qv|, qw) * qv / |qv|
    scale_exact = 2.0 * jnp.arctan2(norm, qw) / norm
    # Taylor of 2*atan2(n, w)/n around n=0: 2/w * (1 - n²/(3w²))
    scale_taylor = 2.0 / qw * (1.0 - norm_sq / (3.0 * qw * qw))
    scale = jnp.where(small, scale_taylor, scale_exact)
    return scale * qv


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / _safe_sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
