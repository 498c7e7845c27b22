"""Flow + pose losses (ref: train.py:29-65, ramp/utils.py:389-399)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lie import ops as lops


def kabsch_umeyama_scale(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Umeyama scale factor c such that c * R @ B ≈ A
    (ref: ramp/utils.py:389-399). A, B: [N, 3]."""
    EA = A.mean(axis=0)
    EB = B.mean(axis=0)
    varA = jnp.mean(jnp.sum((A - EA) ** 2, axis=-1))
    H = (A - EA).T @ (B - EB) / A.shape[0]
    D = jnp.linalg.svd(H, compute_uv=False)
    return varA / jnp.maximum(jnp.sum(D), 1e-12)


def pose_loss_terms(Gs: jnp.ndarray, Ps: jnp.ndarray, n_valid) -> tuple:
    """Relative-pose translation/rotation errors over all frame pairs after
    Umeyama scale correction (ref: train.py:36-62).

    Gs, Ps: [N, 7] world-to-camera (predicted / GT). n_valid: traced count of
    live frames (pairs outside are masked). Returns (tr_mean, ro_mean).
    """
    N = Gs.shape[0]
    P1 = lops.se3_inv(Gs)  # camera-to-world
    P2 = lops.se3_inv(Ps)

    t1 = P1[:, :3]
    t2 = P2[:, :3]
    fmask = (jnp.arange(N) < n_valid).astype(t1.dtype)[:, None]
    # masked Umeyama: zero out dead rows and correct the mean by count
    cnt = jnp.maximum(jnp.sum(fmask), 1.0)

    def masked_scale(A, B):
        EA = jnp.sum(A * fmask, 0) / cnt
        EB = jnp.sum(B * fmask, 0) / cnt
        Ac = (A - EA) * fmask
        Bc = (B - EB) * fmask
        varA = jnp.sum(Ac**2) / cnt
        H = Ac.T @ Bc / cnt
        D = jnp.linalg.svd(H, compute_uv=False)
        return varA / jnp.maximum(jnp.sum(D), 1e-12)

    s = jnp.clip(jax.lax.stop_gradient(masked_scale(t2, t1)), None, 10.0)
    P1 = jnp.concatenate([P1[:, :3] * s, P1[:, 3:]], axis=-1)

    ii, jj = jnp.meshgrid(jnp.arange(N), jnp.arange(N), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    pmask = (ii != jj) & (ii < n_valid) & (jj < n_valid)

    dP = lops.se3_mul(lops.se3_inv(P1[ii]), P1[jj])
    dG = lops.se3_mul(lops.se3_inv(P2[ii]), P2[jj])
    e1 = lops.se3_log(lops.se3_mul(dP, lops.se3_inv(dG)))

    w = pmask.astype(e1.dtype)
    wsum = jnp.maximum(w.sum(), 1.0)
    tr = jnp.sum(masked_norm(e1[:, 0:3], pmask) * w) / wsum
    ro = jnp.sum(masked_norm(e1[:, 3:6], pmask) * w) / wsum
    return tr, ro


def masked_norm(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """L2 norm over the last axis that is NaN-safe under masking.

    d||x||/dx is NaN at x = 0 (identity pose pairs, self-edges), and
    `NaN * 0` poisons the whole backward pass — the reference avoids this by
    boolean-indexing the pairs out before the norm (train.py:41-43), which
    needs dynamic shapes. Double-where keeps shapes static and gradients
    clean."""
    mask_e = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
    safe = jnp.where(mask_e, x, 1.0)
    return jnp.where(mask, jnp.linalg.norm(safe, axis=-1), 0.0)
