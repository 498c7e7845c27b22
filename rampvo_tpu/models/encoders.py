"""RAMP encoders: pixel-wise LSTMs + super-state scene memory + CNN heads.

Re-design of ramp/extractor.py for TPU:
  - channels-last (T, H, W, C) layouts; the reference's (B*H*W, T, C)
    `nn.LSTM` over pixel sequences becomes a `lax.scan` over T whose body is
    one fused [H*W, hidden] x [hidden, 4*hidden] matmul on the MXU.
  - recurrent state (LSTM carries, super-states) is explicit functional
    state passed in/out, replacing module-held mutable attributes
    (extractor.py:223,494).
  - the super-state fold (extractor.py:431-463) is a masked `lax.scan`:
    event embeddings are always folded; image embeddings fold where the
    supervision mask is true.

Everything is unbatched (the reference hard-asserts batch == 1,
ramp/utils.py:238-241); vmap if batching is ever needed.

Gate order of the LSTM matches torch (i, f, g, o) so published checkpoints
import directly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

DIM = 32  # extractor.py:4


# ---------------------------------------------------------------------------
# norms / inits
# ---------------------------------------------------------------------------

def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d(affine=False) on [..., H, W, C]."""
    mean = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _kaiming_out():
    # torch kaiming_normal_(mode=fan_out, relu) (extractor.py:97)
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _lstm_uniform(hidden):
    k = 1.0 / np.sqrt(hidden)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


def _make_norm(norm_fn: str, planes: int, name: str):
    if norm_fn == "group":
        gn = nn.GroupNorm(num_groups=planes // 8, name=name)
        return gn
    if norm_fn == "instance":
        return instance_norm
    if norm_fn == "none":
        return lambda x: x
    raise NotImplementedError(f"norm_fn={norm_fn!r} (batch not used by shipped models)")


# ---------------------------------------------------------------------------
# CNN heads (RAFT-style residual encoder)
# ---------------------------------------------------------------------------

class ResidualBlock(nn.Module):
    """Two 3x3 convs with norm + relu and a strided shortcut
    (ref: extractor.py:8-57)."""

    planes: int
    norm_fn: str = "group"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        conv = lambda name, s: nn.Conv(
            self.planes, (3, 3), strides=(s, s), padding=1,
            kernel_init=_kaiming_out(), name=name,
        )
        y = conv("conv1", self.stride)(x)
        y = nn.relu(_make_norm(self.norm_fn, self.planes, "norm1")(y))
        y = conv("conv2", 1)(y)
        y = nn.relu(_make_norm(self.norm_fn, self.planes, "norm2")(y))

        if self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                kernel_init=_kaiming_out(), name="downsample",
            )(x)
            x = _make_norm(self.norm_fn, self.planes, "norm3")(x)
        return nn.relu(x + y)


class BasicEncoder4(nn.Module):
    """1/4-resolution encoder: conv7 s2 -> 2 res stages -> 1x1 head
    (ref: extractor.py:60-130). Input [N, H, W, C]."""

    output_dim: int = 128
    norm_fn: str = "instance"
    channel_dim: int = 5

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(DIM, (7, 7), strides=(2, 2), padding=3,
                    kernel_init=_kaiming_out(), name="conv1")(x)
        x = nn.relu(_make_norm(self.norm_fn, DIM, "norm1")(x))
        x = ResidualBlock(DIM, self.norm_fn, 1, name="layer1_0")(x)
        x = ResidualBlock(DIM, self.norm_fn, 1, name="layer1_1")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 2, name="layer2_0")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1, name="layer2_1")(x)
        return nn.Conv(self.output_dim, (1, 1),
                       kernel_init=_kaiming_out(), name="conv2")(x)


class MultiScaleBasicEncoder4(nn.Module):
    """Pyramid-fusing head: injects scale-2 and scale-4 super-states after
    each strided stage (ref: extractor.py:274-311)."""

    output_dim: int = 128
    norm_fn: str = "instance"
    channel_dim: int = 16

    @nn.compact
    def __call__(self, x, x_down2, x_down4):
        x = nn.Conv(DIM, (7, 7), strides=(2, 2), padding=3,
                    kernel_init=_kaiming_out(), name="conv1")(x)
        x = nn.relu(_make_norm(self.norm_fn, DIM, "norm1")(x))
        x = ResidualBlock(DIM, self.norm_fn, 1, name="layer1_0")(x)
        x = ResidualBlock(DIM, self.norm_fn, 1, name="layer1_1")(x)   # 1/2 res
        x = jnp.concatenate([x, x_down2], axis=-1)
        x = ResidualBlock(2 * DIM, self.norm_fn, 2, name="layer3_0")(x)
        x = ResidualBlock(2 * DIM, self.norm_fn, 1, name="layer3_1")(x)  # 1/4
        x = jnp.concatenate([x, x_down4], axis=-1)
        return nn.Conv(self.output_dim, (1, 1),
                       kernel_init=_kaiming_out(), name="conv3")(x)


# ---------------------------------------------------------------------------
# pixel-wise LSTM
# ---------------------------------------------------------------------------

class PixelLSTM(nn.Module):
    """LSTM applied independently to every pixel, scanned over time.

    x [T, H, W, C] -> out [T, H, W, hidden], carry ((h, c) each [H, W, hidden]).
    Semantics (incl. the two separate biases and i,f,g,o gate order) match
    torch nn.LSTM so .pth checkpoints map directly
    (ref: extractor.py:211-212,239-243,351-355).
    """

    hidden: int

    @nn.compact
    def __call__(self, x, carry=None):
        T, H, W, C = x.shape
        init = _lstm_uniform(self.hidden)
        w_ih = self.param("weight_ih", init, (C, 4 * self.hidden))
        w_hh = self.param("weight_hh", init, (self.hidden, 4 * self.hidden))
        b_ih = self.param("bias_ih", init, (4 * self.hidden,))
        b_hh = self.param("bias_hh", init, (4 * self.hidden,))

        bias = b_ih + b_hh

        if carry is None and T == 1:
            # zero-carry single-step fast path (MultiScale inference: the
            # per-call LSTMs start fresh every frame, extractor.py:366-385):
            # h0 = c0 = 0 makes the h @ w_hh matmul and the forget-gate
            # term exactly zero — one [H*W, C] x [C, 4h] matmul + pointwise
            gates = x[0] @ w_ih + bias
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return h[None], (h, c)

        if carry is None:
            carry = self.initial_carry(H, W, self.hidden, x.dtype)

        def step(hc, x_t):
            # the input projection lives INSIDE the step (still one
            # [H*W, C] x [C, 4h] MXU matmul per step): precomputing the
            # gates for all T materializes [T, H, W, 4h] — gigabytes at
            # training window sizes
            h, c = hc
            gates = x_t @ w_ih + bias + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        step = jax.checkpoint(step)  # backward recomputes gates per step
        carry, out = jax.lax.scan(step, carry, x)
        return out, carry

    @staticmethod
    def initial_carry(H, W, hidden, dtype=jnp.float32):
        # two distinct buffers: donated jit arguments may not alias
        return (jnp.zeros((H, W, hidden), dtype),
                jnp.zeros((H, W, hidden), dtype))


class LSTMEncoder(nn.Module):
    """Downsampling conv + pixel LSTM (ref: extractor.py:314-390).

    downsample_scale 0/1 -> 1x1 conv stride 1; s -> (s+1)-kernel stride-s.
    Shipped configs use normalization_type=None, so no output norm.
    """

    in_channels: int
    downsample_scale: int = 0
    out_channels: int = 15

    @nn.compact
    def __call__(self, x, carry=None):
        s = self.downsample_scale
        if s <= 1:
            k, stride, pad = 1, 1, 0
        else:
            k, stride, pad = s + 1, s, 1
        x = nn.Conv(self.in_channels, (k, k), strides=(stride, stride),
                    padding=pad, name="conv_1")(x)
        return PixelLSTM(self.out_channels, name="convlstm")(x, carry)


# ---------------------------------------------------------------------------
# super-state scene memory
# ---------------------------------------------------------------------------

def _ss_params(module: nn.Module, name: str, out_channels: int, kernel_size: int = 1):
    """Create super-state fold-conv params (concat(ss, data) -> ss) on
    `module`'s scope. Returned params feed `superstate_fold`, a plain
    function safe inside `lax.scan` bodies."""
    k = kernel_size
    w = module.param(
        f"{name}_kernel",
        nn.initializers.lecun_normal(),
        (k, k, 2 * out_channels, out_channels),
    )
    b = module.param(f"{name}_bias", nn.initializers.zeros_init(), (out_channels,))
    return (w, b)


def superstate_fold(params, ss, data):
    """Fold `data` into super-state `ss` (each [H, W, C]) via the conv on
    their channel concat (ref: extractor.py:406-412)."""
    w, b = params
    x = jnp.concatenate([ss, data], axis=-1)[None]
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + b)[0]


class SuperStateEncoder(nn.Module):
    """Standalone module form of the fold (ref: extractor.py:393-412)."""

    out_channels: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, ss, data):
        params = _ss_params(self, "encoder", self.out_channels, self.kernel_size)
        return superstate_fold(params, ss, data)


# ---------------------------------------------------------------------------
# mergers
# ---------------------------------------------------------------------------

class SingleScaleEncoder(nn.Module):
    """MergerLSTMsceneEncoder (ref: extractor.py:187-269).

    Pixel LSTMs over event bins and image channels with carried hidden state,
    presence-gated super-state folds (a modality that is all-zero is skipped,
    extractor.py:253-258), then two BasicEncoder4 heads at 1/4 resolution.

    events [T, H, W, Ce], images [T, H, W, Ci] (same T; the reference zips
    them), state from `init_state` or None.
    Returns fmap [T, H/4, W/4, 128], imap [T, H/4, W/4, DIM_i], new_state.
    """

    evs_ch: int = 5
    img_ch: int = 3
    lstm_dim: int = 15
    output_dim_f: int = 128
    output_dim_i: int = 384

    @nn.compact
    def __call__(self, events, images, state=None):
        T, H, W, _ = events.shape
        if state is None:
            state = self.init_state(H, W, self.lstm_dim)

        out_ev, ev_carry = PixelLSTM(self.lstm_dim, name="events_convlstm")(
            events, state["ev"]
        )
        out_im, im_carry = PixelLSTM(self.lstm_dim, name="image_convlstm")(
            images, state["im"]
        )

        ss_params = _ss_params(self, "superstate_encoder", self.lstm_dim)

        def step(ss, inp):
            oev, oim, ev_raw, im_raw = inp
            ev_present = jnp.any(ev_raw != 0)
            im_present = jnp.any(im_raw != 0)
            ss = jnp.where(ev_present, superstate_fold(ss_params, ss, oev), ss)
            ss = jnp.where(im_present, superstate_fold(ss_params, ss, oim), ss)
            return ss, ss

        ss_final, super_states = jax.lax.scan(
            step, state["ss"], (out_ev, out_im, events, images)
        )

        fmap = BasicEncoder4(self.output_dim_f, "instance", self.lstm_dim,
                             name="fmap_encoder")(super_states)
        imap = BasicEncoder4(self.output_dim_i, "none", self.lstm_dim,
                             name="imap_encoder")(super_states)

        new_state = {"ev": ev_carry, "im": im_carry, "ss": ss_final}
        return fmap, imap, new_state

    @staticmethod
    def init_state(H, W, lstm_dim=15, dtype=jnp.float32):
        return {
            "ev": PixelLSTM.initial_carry(H, W, lstm_dim, dtype),
            "im": PixelLSTM.initial_carry(H, W, lstm_dim, dtype),
            "ss": jnp.zeros((H, W, lstm_dim), dtype),
        }


class MultiScaleEncoder(nn.Module):
    """MultiScaleMergerDoubleNet (ref: extractor.py:468-566).

    Three scales (1, 2, 4); per-scale event/image LSTM encoders (hidden
    16*scale, *not* carried across calls — matching the reference, whose
    LSTMEncoder.forward_lstm never passes hx) and mask-gated super-state
    folds (events always folded; image k folded at the k-th supervised
    step); per-scale super-states persist across calls. Two
    MultiScaleBasicEncoder4 heads fuse the 3 scales.

    events [T, H, W, Ce], images [Ti, H, W, Ci], mask [T] bool with
    exactly `n_out` true entries (n_out static; Ti >= n_out).
    Returns fmap [n_out, H/4, W/4, 128], imap [n_out, ...], new_state.
    """

    evs_ch: int = 5
    img_ch: int = 3
    lstm_dim: int = 16
    output_dim_f: int = 128
    output_dim_i: int = 384
    scales: Sequence[int] = (1, 2, 4)

    @nn.compact
    def __call__(self, events, images, mask, state=None, n_out: int = 1):
        T = events.shape[0]
        H, W = events.shape[1], events.shape[2]
        if state is None:
            state = self.init_state(H, W, self.lstm_dim, self.scales)

        mask = mask.astype(bool)
        img_slot = jnp.clip(jnp.cumsum(mask.astype(jnp.int32)) - 1, 0, images.shape[0] - 1)

        new_ss = []
        sstates = []
        for si, scale in enumerate(self.scales):
            hid = self.lstm_dim * scale
            out_ev, _ = LSTMEncoder(self.evs_ch, scale, hid,
                                    name=f"ev_encoders_{si}")(events)
            out_im, _ = LSTMEncoder(self.img_ch, scale, hid,
                                    name=f"im_encoders_{si}")(images)

            ev_params = _ss_params(self, f"super_state_ev_encoder_{si}", hid)
            im_params = _ss_params(self, f"super_state_im_encoders_{si}", hid)

            def step(ss, inp, ev_params=ev_params, im_params=im_params, out_im=out_im):
                oev, m_t, slot = inp
                ss = superstate_fold(ev_params, ss, oev)
                oim = out_im[slot]
                ss_img = superstate_fold(im_params, ss, oim)
                ss = jnp.where(m_t, ss_img, ss)
                return ss, ss

            ss_final, ss_all = jax.lax.scan(
                step, state["ss"][si], (out_ev, mask, img_slot)
            )
            new_ss.append(ss_final)

            # gather the super-states at supervised steps (static count).
            # Tagged for remat policies (train/forward.py saves "enc_ss"
            # so the backward pass skips re-running the LSTM+fold chain;
            # a no-op identity outside jax.checkpoint)
            from jax.ad_checkpoint import checkpoint_name

            (sup_idx,) = jnp.nonzero(mask, size=n_out, fill_value=T - 1)
            sstates.append(checkpoint_name(ss_all[sup_idx], "enc_ss"))

        dims = [self.lstm_dim * s for s in self.scales]
        fmap = MultiScaleBasicEncoder4(self.output_dim_f, "instance",
                                       dims[0], name="fmap_encoder")(*sstates)
        imap = MultiScaleBasicEncoder4(self.output_dim_i, "none",
                                       dims[0], name="imap_encoder")(*sstates)
        return fmap, imap, {"ss": new_ss}

    @staticmethod
    def init_state(H, W, lstm_dim=16, scales=(1, 2, 4), dtype=jnp.float32):
        ss = []
        for s in scales:
            Hs = (H + 2 - (s + 1)) // s + 1 if s > 1 else H
            Ws = (W + 2 - (s + 1)) // s + 1 if s > 1 else W
            ss.append(jnp.zeros((Hs, Ws, lstm_dim * s), dtype))
        return {"ss": ss}


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell (ref: extractor.py:133-184 — present in the
    reference as an unused alternative to the pixel-wise LSTM; provided for
    API parity and experimentation). x [H, W, Cin], state ((h, c)) each
    [H, W, hidden]."""

    hidden: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, state=None):
        H, W, _ = x.shape
        if state is None:
            z = jnp.zeros((H, W, self.hidden), x.dtype)
            state = (z, z)
        h, c = state
        gates = nn.Conv(
            4 * self.hidden,
            (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2,
            name="Gates",
        )(jnp.concatenate([x, h], axis=-1))
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)
