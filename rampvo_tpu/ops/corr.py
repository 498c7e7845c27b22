"""Patch correlation + patch extraction (XLA reference implementations).

These replace the reference's `cuda_corr` extension (ramp/altcorr/
correlation_kernel.cu). Semantics are matched exactly — including the
D = 2R+2 gather followed by a 2x2 bilinear blend down to (2R+1)² — but the
layout is TPU-native: feature maps are channels-last [N, H, W, C] so the
128-wide feature dim sits on the lane dimension and the inner dot products
hit the MXU. A Pallas kernel with VMEM-resident feature maps provides the
fast path (ops/corr_pallas.py) behind the same API.

Out-of-bounds window taps contribute 0, matching the CUDA `within_bounds`
guard (correlation_kernel.cu:11-14,42,122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(fmap: jnp.ndarray, n_idx: jnp.ndarray, y_idx: jnp.ndarray, x_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather fmap[n, y, x, :] with zero padding for out-of-bounds (y, x).

    fmap: [N, H, W, C]; index arrays share a common shape S.
    Returns [*S, C].
    """
    N, H, W, C = fmap.shape
    in_bounds = (y_idx >= 0) & (y_idx < H) & (x_idx >= 0) & (x_idx < W)
    y_c = jnp.clip(y_idx, 0, H - 1)
    x_c = jnp.clip(x_idx, 0, W - 1)
    flat = fmap.reshape(N * H * W, C)
    lin = (n_idx * H + y_c) * W + x_c
    vals = jnp.take(flat, lin, axis=0)
    return jnp.where(in_bounds[..., None], vals, 0.0)


def patchify(net: jnp.ndarray, coords: jnp.ndarray, radius: int, mode: str = "bilinear") -> jnp.ndarray:
    """Extract (2R+1)² (bilinear) or (2R+2)² (raw) windows at float coords.

    net:    [N, H, W, C]
    coords: [N, M, 2] float (x, y)
    returns [N, M, 2R+1, 2R+1, C] (bilinear) or [N, M, D, D, C]

    (ref: altcorr/correlation.py:51-68 + patchify_forward_kernel)
    """
    N, M, _ = coords.shape
    R = radius
    D = 2 * R + 2

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)

    dy = jnp.arange(D, dtype=jnp.int32) - R
    dx = jnp.arange(D, dtype=jnp.int32) - R
    yy = y0[:, :, None, None] + dy[None, None, :, None]  # [N, M, D, 1]
    xx = x0[:, :, None, None] + dx[None, None, None, :]  # [N, M, 1, D]
    yy = jnp.broadcast_to(yy, (N, M, D, D))
    xx = jnp.broadcast_to(xx, (N, M, D, D))
    nn = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None, None, None], (N, M, D, D))

    patches = _gather_2d(net, nn, yy, xx)  # [N, M, D, D, C]

    if mode != "bilinear":
        return patches

    fx = (x - x0.astype(x.dtype))[..., None, None, None]
    fy = (y - y0.astype(y.dtype))[..., None, None, None]
    d = 2 * R + 1
    p00 = patches[:, :, :d, :d]
    p01 = patches[:, :, :d, 1:]
    p10 = patches[:, :, 1:, :d]
    p11 = patches[:, :, 1:, 1:]
    return (
        (1 - fy) * (1 - fx) * p00
        + (1 - fy) * fx * p01
        + fy * (1 - fx) * p10
        + fy * fx * p11
    )


def corr(
    gmap: jnp.ndarray,
    fmap: jnp.ndarray,
    coords: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    radius: int = 3,
) -> jnp.ndarray:
    """Local correlation volume.

    gmap:   [Mg, P, P, C]   stored patch features ("fmap1" in the reference)
    fmap:   [Nf, H, W, C]   target feature maps (one pyramid level)
    coords: [E, P, P, 2]    reprojected patch-pixel coords in fmap resolution
    ii:     [E]             index into gmap
    jj:     [E]             index into fmap
    returns [E, P, P, (2R+1)²]

    Equivalent to corr_cuda_forward (correlation_kernel.cu:83-136,221-232):
    dot the C-dim patch feature against a (2R+2)² window gathered at
    floor(coords), then bilinearly blend the 4 integer shifts into (2R+1)².

    TPU formulation: the maps are zero-padded once and each (edge, patch-px)
    window is fetched as ONE contiguous (D, D, C) `dynamic_slice`-style
    gather — XLA lowers 34.6M scalar window taps to 0.5M tile gathers, which
    is what makes this fast on TPU (out-of-bounds taps read the zero pad,
    matching the CUDA `within_bounds` guard).
    """
    E, P, _, _ = coords.shape
    Nf, H, W, C = fmap.shape
    R = radius
    D = 2 * R + 2
    pad = 2 * D  # covers clamp range [-D, H+D] below

    f1 = jnp.take(gmap, ii, axis=0)  # [E, P, P, C]

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)

    fpad = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    # fully-out-of-bounds windows clamp into the zero pad
    y0c = jnp.clip(y0, -D, H + D)
    x0c = jnp.clip(x0, -D, W + D)
    sy = (y0c - R + pad).reshape(-1)
    sx = (x0c - R + pad).reshape(-1)
    nn = jnp.broadcast_to(jj[:, None, None], (E, P, P)).reshape(-1)

    def one(n, a, b):
        return jax.lax.dynamic_slice(fpad, (n, a, b, 0), (1, D, D, C))[0]

    f2 = jax.vmap(one)(nn, sy, sx).reshape(E, P, P, D, D, C)

    # dot over channels on the MXU
    vol = jnp.einsum(
        "epqc,epqyxc->epqyx", f1, f2, preferred_element_type=jnp.float32
    )

    # bilinear blend of the 4 integer shifts (D×D -> d×d)
    fx = (x - x0.astype(jnp.float32))[..., None, None]
    fy = (y - y0.astype(jnp.float32))[..., None, None]
    d = 2 * R + 1
    v00 = vol[..., :d, :d]
    v01 = vol[..., :d, 1:]
    v10 = vol[..., 1:, :d]
    v11 = vol[..., 1:, 1:]
    out = (
        (1 - fy) * (1 - fx) * v00
        + (1 - fy) * fx * v01
        + fy * (1 - fx) * v10
        + fy * fx * v11
    )
    # [E, P, P, d(y), d(x)] -> transpose window dims to match the reference's
    # final permute (correlation_kernel.cu:232) -> [E, P, P, d(x), d(y)]
    out = jnp.swapaxes(out[..., None], -2, -3)[..., 0]
    return out.reshape(E, P, P, d * d)


def avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping average pool on NHWC (stride == kernel)."""
    if k == 1:
        return x
    n, h, w, c = x.shape
    x = x[:, : h - h % k, : w - w % k]
    x = x.reshape(n, h // k, k, w // k, k, c)
    return x.mean(axis=(2, 4))


def pyramidify(fmap: jnp.ndarray, lvls=(1, 4)):
    """Feature pyramid by average pooling (ref: ramp/utils.py:81-90). NHWC."""
    return [avg_pool2d(fmap, lvl) for lvl in lvls]


def corr_stack(c1: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """Stack 2 pyramid-level correlation volumes into the Update operator's
    input layout: level is the FASTEST-varying axis, matching the
    reference's `torch.stack([corr1, corr2], -1).view(1, E, -1)`
    (ramp/Ramp_vo.py:182, ramp/net.py:229) — the pretrained corr-MLP weights
    depend on this ordering.

    c1, c2: [E, P, P, (2R+1)²] -> [E, 2*(2R+1)²*P*P]
    """
    return jnp.stack([c1, c2], axis=-1).reshape(c1.shape[0], -1)
