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

import functools

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


def _region_window_mats(x, y, bx0, by0, radius, S):
    """Separable window-extraction × bilinear-blend matrices.

    For output row u the raw-tap blend reads rows floor(y)-R+u and +1 with
    weights (1-fy, fy) (the 2x2 blend of corr_cuda_forward,
    correlation_kernel.cu:221-232, is separable in y and x). Expressed
    against a region of S rows starting at by0 this is a [d, S] matrix with
    two nonzeros per row; taps falling outside the region get zero weight.

    x, y: [E, P, P] float coords; bx0, by0: [E] int region bases.
    Returns (Wy, Wx): [E, P, P, d, S] float32.
    """
    R = radius
    d = 2 * R + 1
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    ry0 = y0.astype(jnp.int32) - R - by0[:, None, None]   # [E, P, P]
    rx0 = x0.astype(jnp.int32) - R - bx0[:, None, None]
    u = jnp.arange(d, dtype=jnp.int32)
    s = jnp.arange(S, dtype=jnp.int32)

    def mats(r0, f):
        base = r0[..., None] + u                          # [E, P, P, d]
        hit0 = (s == base[..., None]).astype(jnp.float32)  # [E, P, P, d, S]
        hit1 = (s == base[..., None] + 1).astype(jnp.float32)
        return (1.0 - f)[..., None, None] * hit0 + f[..., None, None] * hit1

    return mats(ry0, fy), mats(rx0, fx)


def corr_region(
    gmap: jnp.ndarray,
    fmap: jnp.ndarray,
    coords: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    radius: int = 3,
    region: int = 16,
    chunks: int = 0,
) -> jnp.ndarray:
    """Local correlation volume, region-dots formulation (fast TPU path).

    Same contract as `corr`, restructured for the TPU memory system: instead
    of gathering one (D, D, C) window per patch PIXEL (E·P² gather
    descriptors), gather ONE (S, S, C) region per EDGE around the patch
    center (9x fewer descriptors), compute every patch pixel's dot products
    against the whole region in a single batched MXU einsum, then apply the
    window extraction + 2x2 bilinear blend as two small separable matrices
    (`_region_window_mats`) — exact 0/1-and-fraction weights, so the result
    is bit-comparable to `corr` wherever the taps lie inside the region.

    Deviation (shared with the Pallas kernel, documented in README): a patch
    pixel whose tap window leaves the region — i.e. lands more than
    S/2 - 2R - 1 px (4 px for S=16, R=3) from the patch-center pixel — has
    those taps zeroed. BA's robust gates discard such geometry anyway.

    chunks > 1 processes edges in that many sequential chunks to bound the
    [E, S, S, C] region buffer (used by the full-scale VO config).
    """
    E, P, _, _ = coords.shape
    Nf, H, W, C = fmap.shape
    R = radius
    d = 2 * R + 1
    S = region

    f1 = jnp.take(gmap, ii, axis=0)                       # [E, P, P, C]
    x = coords[..., 0]
    y = coords[..., 1]

    # per-edge region base from the center pixel, clamped into the pad
    cy0 = jnp.floor(y[:, P // 2, P // 2]).astype(jnp.int32)
    cx0 = jnp.floor(x[:, P // 2, P // 2]).astype(jnp.int32)
    by0 = jnp.clip(cy0 - (S // 2 - 1), -S, H)
    bx0 = jnp.clip(cx0 - (S // 2 - 1), -S, W)

    pad = S
    fpad = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    Wy, Wx = _region_window_mats(x, y, bx0, by0, radius, S)

    def block(f1_b, jj_b, by_b, bx_b, Wy_b, Wx_b):
        def one(n, a, b):
            return jax.lax.dynamic_slice(fpad, (n, a, b, 0), (1, S, S, C))[0]

        reg = jax.vmap(one)(jj_b, by_b + pad, bx_b + pad)  # [e, S, S, C]
        dots = jnp.einsum(
            "epqc,eyxc->epqyx", f1_b, reg,
            preferred_element_type=jnp.float32,
        )
        # contract region rows/cols with the blend matrices -> [e,P,P,d,d]
        return jnp.einsum("epquy,epqyx,epqvx->epquv", Wy_b, dots, Wx_b)

    if chunks > 1 and E % chunks == 0:
        e = E // chunks
        shaped = lambda a: a.reshape(chunks, e, *a.shape[1:])
        out = jax.lax.map(
            lambda t: block(*t),
            (shaped(f1), shaped(jj), shaped(by0), shaped(bx0),
             shaped(Wy), shaped(Wx)),
        ).reshape(E, P, P, d, d)
    else:
        out = block(f1, jj, by0, bx0, Wy, Wx)

    # window-dim permute to (x, y), matching corr (correlation_kernel.cu:232)
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


def _unblend(grad_out, x, y, R):
    """Backward of the bilinear 2x2 blend + window transpose: distribute the
    (2R+1)^2 output gradient onto the (2R+2)^2 raw taps."""
    E, P, _, dd = grad_out.shape
    d = 2 * R + 1
    D = 2 * R + 2
    g = grad_out.reshape(E, P, P, d, d)
    g = jnp.swapaxes(g[..., None], -2, -3)[..., 0]  # undo (x,y) permute

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None, None]
    fy = (y - y0)[..., None, None]

    gv = jnp.zeros((E, P, P, D, D), grad_out.dtype)
    gv = gv.at[..., :d, :d].add((1 - fy) * (1 - fx) * g)
    gv = gv.at[..., :d, 1:].add((1 - fy) * fx * g)
    gv = gv.at[..., 1:, :d].add(fy * (1 - fx) * g)
    gv = gv.at[..., 1:, 1:].add(fy * fx * g)
    return gv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def corr_train(gmap, fmap, coords, ii, jj, radius=3):
    """Differentiable correlation with a hand-written, memory-bounded VJP.

    Forward identical to `corr`. Backward matches the reference's CUDA
    backward (altcorr/correlation.py:32-45): gradients flow to gmap and
    fmap only — the coords gradient is dropped, exactly as the reference
    returns None for it. The taps are REGATHERED in the backward instead of
    saved, so the multi-GB gather intermediate never outlives one chunk
    (jax autodiff through `corr` stores it per unrolled training step).
    """
    return corr(gmap, fmap, coords, ii, jj, radius)


def _corr_train_fwd(gmap, fmap, coords, ii, jj, radius):
    return corr(gmap, fmap, coords, ii, jj, radius), (gmap, fmap, coords,
                                                      ii, jj)


def corr_bwd_from_gv(gv, gmap, fmap, coords, ii, jj, radius):
    """Shared tail of the correlation backward: given the RAW-TAP gradient
    `gv` [E, P, P, D, D] (already unblended), regather the taps and produce
    (grad_gmap, grad_fmap). Used by both `corr_train`'s VJP (reference
    window layout) and the Pallas paired-layout VJP
    (corr_pallas.corr_train_fused)."""
    E, P, _, _ = coords.shape
    Nf, H, W, C = fmap.shape
    R = radius
    D = 2 * R + 2
    pad = 2 * D

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    sy = (jnp.clip(y0, -D, H + D) - R + pad).reshape(-1)
    sx = (jnp.clip(x0, -D, W + D) - R + pad).reshape(-1)
    nn = jnp.broadcast_to(jj[:, None, None], (E, P, P)).reshape(-1)
    fpad = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad

    f1 = jnp.take(gmap, ii, axis=0)  # [E, P, P, C]

    n_chunks = 8 if E % 8 == 0 else (4 if E % 4 == 0 else 1)
    c = (E * P * P) // n_chunks
    cE = E // n_chunks

    def tap_gather(nn_c, sy_c, sx_c):
        def one(n, a, b):
            return jax.lax.dynamic_slice(fpad, (n, a, b, 0), (1, D, D, C))[0]

        return jax.vmap(one)(nn_c, sy_c, sx_c)  # [c, D, D, C]

    grad_f1 = []
    grad_fpad = jnp.zeros_like(fpad)
    for i in range(n_chunks):
        slpp = slice(i * c, (i + 1) * c)
        slE = slice(i * cE, (i + 1) * cE)
        f2 = tap_gather(nn[slpp], sy[slpp], sx[slpp]).reshape(
            cE, P, P, D, D, C
        )
        gv_c = gv[slE]
        # d out / d gmap: sum over taps of gv * f2
        grad_f1.append(
            jnp.einsum("epqyx,epqyxc->epqc", gv_c,
                       f2.astype(jnp.float32))
        )
        # d out / d fmap: scatter gv * f1 back onto the tap positions
        contrib = jnp.einsum(
            "epqyx,epqc->epqyxc", gv_c, f1[slE].astype(jnp.float32)
        )
        dy = jnp.arange(D)
        lin_n = nn[slpp].reshape(cE, P, P, 1, 1)
        lin_y = sy[slpp].reshape(cE, P, P, 1, 1) + dy[None, None, None, :, None]
        lin_x = sx[slpp].reshape(cE, P, P, 1, 1) + dy[None, None, None, None, :]
        flat_idx = (lin_n * Hp + lin_y) * Wp + lin_x
        grad_fpad = grad_fpad.reshape(-1, C).at[
            flat_idx.reshape(-1)
        ].add(contrib.reshape(-1, C)).reshape(Nf, Hp, Wp, C)

    grad_gmap = jax.ops.segment_sum(
        jnp.concatenate(grad_f1, axis=0), ii, num_segments=gmap.shape[0]
    ).astype(gmap.dtype)
    grad_fmap = grad_fpad[:, pad:pad + H, pad:pad + W, :].astype(fmap.dtype)
    return grad_gmap, grad_fmap


def _corr_train_bwd(radius, res, grad_out):
    gmap, fmap, coords, ii, jj = res
    R = radius
    x = coords[..., 0]
    y = coords[..., 1]
    gv = _unblend(grad_out.astype(jnp.float32), x, y, R)  # [E,P,P,D,D]
    grad_gmap, grad_fmap = corr_bwd_from_gv(
        gv, gmap, fmap, coords, ii, jj, radius
    )
    import numpy as _np

    ct_int = lambda a: _np.zeros(a.shape, jax.dtypes.float0)
    return (grad_gmap, grad_fmap, jnp.zeros_like(coords),
            ct_int(ii), ct_int(jj))


corr_train.defvjp(_corr_train_fwd, _corr_train_bwd)
