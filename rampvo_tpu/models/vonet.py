"""VONet: encoder + patch extraction + update operator (ref: ramp/net.py:93-249).

The Patchifier module only runs the RAMP encoder (it owns parameters); patch
*coordinate selection* and patch *gathering* are parameter-free pure
functions (`select_coords_*`, `extract_patches`) so the VO runtime can jit
them with its own static shapes.

Layouts: feature maps channels-last [n, h, w, C]; patches channels-first
[n, M, 3, P, P] matching `geometry.projective`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.corr import avg_pool2d, patchify as gather_patches
from .encoders import MultiScaleEncoder, SingleScaleEncoder
from .update import Update

DIM = 384


class Patchifier(nn.Module):
    """Encoder wrapper; returns (fmap/4, imap/4, new_state)
    (ref: net.py:128-157)."""

    input_mode: str = "MultiScale"
    evs_ch: int = 5
    img_ch: int = 3
    patch_size: int = 3

    @nn.compact
    def __call__(self, events, images, mask=None, state=None, n_out: int = 1):
        if self.input_mode == "SingleScale":
            fmap, imap, new_state = SingleScaleEncoder(
                self.evs_ch, self.img_ch, name="encoder"
            )(events, images, state)
        elif self.input_mode == "MultiScale":
            fmap, imap, new_state = MultiScaleEncoder(
                self.evs_ch, self.img_ch, name="encoder"
            )(events, images, mask, state, n_out)
        else:
            raise ValueError(f"Invalid input mode: {self.input_mode}")
        return fmap / 4.0, imap / 4.0, new_state


class VONet(nn.Module):
    """Container binding the Patchifier and Update operator under the same
    parameter-tree names as the reference's VONet (net.py:232-249) so .pth
    checkpoints map 1:1."""

    input_mode: str = "MultiScale"
    evs_ch: int = 5
    img_ch: int = 3
    P: int = 3

    def setup(self):
        self.patchify = Patchifier(
            self.input_mode, self.evs_ch, self.img_ch, self.P, name="patchify"
        )
        self.update = Update(self.P, name="update")

    def __call__(self, events, images, mask=None, state=None, n_out: int = 1):
        """Init-time convenience: runs the encoder then one update on a
        dummy edge set, materializing every parameter."""
        fmap, imap, new_state = self.patchify(events, images, mask, state, n_out)
        E = 8
        net = jnp.zeros((E, DIM), fmap.dtype)
        corr_dim = 2 * 49 * self.P * self.P
        dummy_corr = jnp.zeros((E, corr_dim), fmap.dtype)
        dummy_inp = jnp.zeros((E, DIM), fmap.dtype)
        idx = jnp.arange(E, dtype=jnp.int32)
        net, _ = self.update(net, dummy_inp, dummy_corr, idx, idx, idx)
        return fmap, imap, new_state

    def encode(self, events, images, mask=None, state=None, n_out: int = 1):
        return self.patchify(events, images, mask, state, n_out)

    def update_op(self, net, inp, corr, ii, jj, kk, valid=None, lattice=None,
                  static_sched=None, lattice_contig: bool = False):
        return self.update(net, inp, corr, ii, jj, kk, valid, lattice,
                           static_sched, lattice_contig)


# ---------------------------------------------------------------------------
# patch coordinate selection (pure, parameter-free)
# ---------------------------------------------------------------------------

def nms_2d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Keep values equal to their local max (ref: ramp/utils.py:157-182).
    x [..., H, W]."""
    pad = (kernel_size - 1) // 2
    ndim = x.ndim
    window = (1,) * (ndim - 2) + (kernel_size, kernel_size)
    strides = (1,) * ndim
    padding = [(0, 0)] * (ndim - 2) + [(pad, pad), (pad, pad)]
    mx = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides, padding)
    return x * (mx == x).astype(x.dtype)


def select_coords_event_bias(
    events: jnp.ndarray, M: int, nms_rad: int = 11, border: int = 0
) -> jnp.ndarray:
    """Top-M event-density locations at 1/4 resolution
    (ref: ramp/utils.py:186-226; implements the intended integer row/col
    split — the reference has a float-division slip at utils.py:212).

    events [n, T?, H, W, C] or [n, H, W, C] -> coords [n, M, 2] float (x, y).
    """
    if events.ndim == 5:
        ev = jnp.abs(events).mean(axis=1)
    else:
        ev = jnp.abs(events)
    ev = avg_pool2d(ev, 4)  # [n, h, w, C]
    ev_mean = ev.mean(axis=-1)  # [n, h, w]

    if border:
        n, h, w = ev_mean.shape
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        keep = (
            (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
        )
        ev_mean = jnp.where(keep, ev_mean, 0.0)

    if nms_rad:
        ev_mean = nms_2d(ev_mean, nms_rad)

    n, h, w = ev_mean.shape
    flat = ev_mean.reshape(n, h * w)
    _, idx = jax.lax.top_k(flat, M)
    y = (idx // w).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1)


def select_coords_random(rng, n: int, M: int, h: int, w: int) -> jnp.ndarray:
    """Uniform random interior coords (ref: net.py:186-188)."""
    kx, ky = jax.random.split(rng)
    x = jax.random.randint(kx, (n, M), 1, w - 1).astype(jnp.float32)
    y = jax.random.randint(ky, (n, M), 1, h - 1).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1)


def select_coords_gradient_bias(rng, images: jnp.ndarray, M: int) -> jnp.ndarray:
    """Random candidates ranked by image gradient magnitude
    (ref: net.py:172-183, utils.py:110-119). images [n, H, W, 3] in
    normalized [-0.5, 1.5] range."""
    n, H, W, _ = images.shape
    gray = ((images + 0.5) * (255.0 / 2)).sum(axis=-1)
    dx = gray[:, :-1, 1:] - gray[:, :-1, :-1]
    dy = gray[:, 1:, :-1] - gray[:, :-1, :-1]
    g = jnp.sqrt(dx**2 + dy**2)
    g = avg_pool2d(g[..., None], 4)[..., 0]  # [n, h, w]
    h, w = g.shape[1], g.shape[2]

    kx, ky = jax.random.split(rng)
    x = jax.random.randint(kx, (n, 3 * M), 1, w - 1)
    y = jax.random.randint(ky, (n, 3 * M), 1, h - 1)
    vals = g[jnp.arange(n)[:, None], y, x]
    _, top = jax.lax.top_k(vals, M)
    xs = jnp.take_along_axis(x, top, axis=1).astype(jnp.float32)
    ys = jnp.take_along_axis(y, top, axis=1).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1)


# ---------------------------------------------------------------------------
# patch gathering (pure)
# ---------------------------------------------------------------------------

def extract_patches(
    fmap: jnp.ndarray,      # [n, h, w, 128]   (1/4 res)
    imap: jnp.ndarray,      # [n, h, w, DIM]
    images: jnp.ndarray,    # [n, H, W, 3]     (full res, normalized)
    disps: jnp.ndarray,     # [n, h, w]        inverse depth at 1/4 res
    coords: jnp.ndarray,    # [n, M, 2]        float (x, y) at 1/4 res
    P: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather per-patch tensors (ref: net.py:190-203).

    Returns gmap [n, M, P, P, 128], imap_vec [n, M, DIM],
    patches [n, M, 3, P, P] (x, y, inv-depth), clr [n, M, 3].
    """
    n, h, w, _ = fmap.shape
    gmap = gather_patches(fmap, coords, 1)           # [n, M, P, P, 128]
    imap_vec = gather_patches(imap, coords, 0)[:, :, 0, 0, :]  # [n, M, DIM]

    xg = jnp.arange(w, dtype=fmap.dtype)
    yg = jnp.arange(h, dtype=fmap.dtype)
    yy, xx = jnp.meshgrid(yg, xg, indexing="ij")
    grid = jnp.stack(
        [jnp.broadcast_to(xx, (n, h, w)), jnp.broadcast_to(yy, (n, h, w)), disps],
        axis=-1,
    )  # [n, h, w, 3]
    patches = gather_patches(grid, coords, P // 2)   # [n, M, P, P, 3]
    patches = jnp.transpose(patches, (0, 1, 4, 2, 3))   # [n, M, 3, P, P]

    clr = gather_patches(images, 4.0 * (coords + 0.5), 0)[:, :, 0, 0, :]
    return gmap, imap_vec, patches, clr


def filter_features(confidences, target, data_shape):
    """Zero confidence for targets outside the image
    (ref: ramp/utils.py:557-570). confidences/target [..., 2]."""
    ht, wd = data_shape
    ok = (
        (target[..., 0] >= 0)
        & (target[..., 0] <= wd)
        & (target[..., 1] >= 0)
        & (target[..., 1] <= ht)
    )
    # where, not multiply: 0 * NaN confidence (garbage edges) must not leak
    return jnp.where(ok[..., None], confidences, 0.0)


class CorrBlock:
    """Training-time 2-level correlation closure (ref: net.py:206-229).

    fmap [N, h, w, C] per-frame features, gmap [N*M, P, P, C] patch
    features; __call__(kk, jj, coords) -> [E, 2*49*P*P] stacked volume.
    """

    def __init__(self, fmap, gmap, radius: int = 3, levels=(1, 4)):
        from ..ops.corr import corr_stack, pyramidify
        from ..ops.corr import corr as _corr

        self.radius = radius
        self.levels = levels
        self.gmap = gmap
        self.pyramid = pyramidify(fmap, lvls=levels)
        self._corr = _corr
        self._stack = corr_stack

    def __call__(self, kk, jj, coords):
        vols = [
            self._corr(self.gmap, self.pyramid[i], coords / lvl, kk, jj,
                       self.radius)
            for i, lvl in enumerate(self.levels)
        ]
        return self._stack(*vols)


def fold_corr_fc1(params, layout: str = "folded"):
    """Permute the update net's corr_fc1 kernel rows so it consumes a
    kernel-native corr layout — the window transpose / level interleave /
    window padding become a tiny weight gather instead of an [E, 882+]-wide
    activation relayout every update.

    layout "folded": corr_lattice2_stacked(folded=True) columns
    (ops.corr_pallas.folded_corr_perm). layout "paired": the 128-lane
    paired layout of corr_lattice_fused2 (paired_corr_perm;
    garbage lanes get zero weight rows). The fold is linear, so autodiff
    through it routes gradients back to the canonical checkpoint layout —
    the training path folds once per step outside the scan."""
    from ..ops.corr_pallas import folded_corr_perm, paired_corr_perm

    p = dict(params)
    pp = dict(p["params"])
    up = dict(pp["update"])
    fc = dict(up["corr_fc1"])
    if layout == "paired":
        idx = jnp.asarray(paired_corr_perm(3, 3))
        W = fc["kernel"]
        fc["kernel"] = jnp.where(
            (idx >= 0)[:, None], W[jnp.clip(idx, 0, W.shape[0] - 1)], 0.0
        )
    else:
        inv = jnp.asarray(folded_corr_perm(3, 3))
        fc["kernel"] = fc["kernel"][inv]
    up["corr_fc1"] = fc
    pp["update"] = up
    p["params"] = pp
    return p
