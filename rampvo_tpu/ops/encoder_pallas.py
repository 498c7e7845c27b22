"""Channel-major Pallas kernel for the per-frame pixel-LSTM + super-state
fold chain of the RAMP encoders (inference, T == 1).

Why: the flax path keeps every intermediate in NHWC with 5..32 channels.
TPU HBM tiles the minor dimension to 128 lanes, so each [H, W, C<=32]
pass reads/writes 4-25x more bytes than the tensor holds — the measured
~8 ms MultiScale encoder is mostly this lane-padding tax, not compute
(STATUS round-2/3; a pure-XLA single-step refactor (removed r04)
measured SLOWER because it adds relayouts without changing the layout).

This kernel runs the whole chain CHANNEL-MAJOR ([C, H*W]: minor dim = HW,
no padding): one fused pass per scale computes both modality LSTMs (gate
matmul on the zero-carry single step — the recurrent term vanishes
exactly, ref extractor.py:366-385) and the two composed super-state folds
(ref extractor.py:431-463), reading x [8, HW] + ss [h, HW] and writing
ss' [h, HW]. Weight composition (conv_1 folding, gate interleave, fold
composition) composes the flax weights algebraically and is parity-tested
in tests/test_models.py.

Semantics mirrored from the reference MultiScaleMergerDoubleNet
(/root/reference/ramp/extractor.py:431-463,468-566).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALES = (1, 2, 4)


def _conv(x, kernel, bias, stride=1, pad=0, groups=1):
    """x [H, W, C] channels-last; kernel [kh, kw, Cin/groups, Cout]."""
    y = jax.lax.conv_general_dilated(
        x[None], kernel, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )[0]
    return y + bias


def _lstm_fold_kernel(x_ref, ss_ref, wg_ref, bg_ref, wf_ref, bf_ref, o_ref,
                      *, h):
    """One [*, hwb] block: gates -> i/g/o pointwise -> composed fold.

    x [Cp, hwb]; ss [h, hwb]; wg [Cp, 8h] gate-interleaved (columns
    [g*2h, g*2h+h) = event gate g, [g*2h+h, (g+1)*2h) = image gate g);
    bg [8h, 1]; wf [3h, h] composed fold (rows [ss | ev_h | im_h]);
    bf [h, 1]. Writes ss' [h, hwb].
    """
    gates = jax.lax.dot_general(
        wg_ref[...], x_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...]                       # [8h, hwb]
    i = gates[0 * h:2 * h]
    g = gates[4 * h:6 * h]
    o = gates[6 * h:8 * h]
    # zero carry: c = sigma(i) * tanh(g); forget-gate term vanishes
    c = jax.nn.sigmoid(i) * jnp.tanh(g)
    hcat = jax.nn.sigmoid(o) * jnp.tanh(c)             # [2h, hwb] [ev | im]
    cat3 = jnp.concatenate(
        [ss_ref[...].astype(jnp.float32), hcat], axis=0
    )                                                  # [3h, hwb]
    ss_new = jax.lax.dot_general(
        wf_ref[...], cat3,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bf_ref[...]
    o_ref[...] = ss_new.astype(o_ref.dtype)


def lstm_fold_cm(x_cm, ss_cm, wg, bg, wf, bf, *, hwb: int = 2048,
                 interpret: bool = False):
    """Channel-major fused LSTM + fold step.

    x_cm [Cp, HW] (Cp a multiple of 8), ss_cm [h, HW], wg [Cp, 8h],
    bg [8h], wf [3h, h], bf [h]. Returns ss' [h, HW] (same dtype as ss).
    HW is padded to a multiple of `hwb` internally.
    """
    Cp, HW = x_cm.shape
    h = ss_cm.shape[0]
    assert wg.shape == (Cp, 8 * h), (wg.shape, Cp, h)
    assert wf.shape == (3 * h, h)
    pad = (-HW) % hwb
    if pad:
        x_cm = jnp.pad(x_cm, ((0, 0), (0, pad)))
        ss_cm = jnp.pad(ss_cm, ((0, 0), (0, pad)))
    HWp = HW + pad

    # keep XLA from fusing the channel-major transpose into the custom
    # call's operand copy (see corr_pallas operand-barrier note)
    x_cm, ss_cm = jax.lax.optimization_barrier((x_cm, ss_cm))

    out = pl.pallas_call(
        functools.partial(_lstm_fold_kernel, h=h),
        grid=(HWp // hwb,),
        in_specs=[
            pl.BlockSpec((Cp, hwb), lambda b: (0, b)),
            pl.BlockSpec((h, hwb), lambda b: (0, b)),
            pl.BlockSpec((Cp, 8 * h), lambda b: (0, 0)),
            pl.BlockSpec((8 * h, 1), lambda b: (0, 0)),
            pl.BlockSpec((3 * h, h), lambda b: (0, 0)),
            pl.BlockSpec((h, 1), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((h, hwb), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((h, HWp), ss_cm.dtype),
        interpret=interpret,
    )(x_cm, ss_cm, wg, bg.reshape(-1, 1), wf, bf.reshape(-1, 1))
    return out[:, :HW]


# ---------------------------------------------------------------------------
# weight composition (algebraic refactor of the flax encoder math)
# ---------------------------------------------------------------------------

def _gate_weights(pe, pi):
    """Gate-interleaved block-diagonal LSTM input weights
    (the single-step LSTM gate algebra without the convs)."""
    we = pe["convlstm"]["weight_ih"]          # [Ce, 4h]
    wi = pi["convlstm"]["weight_ih"]
    be = pe["convlstm"]["bias_ih"] + pe["convlstm"]["bias_hh"]
    bi = pi["convlstm"]["bias_ih"] + pi["convlstm"]["bias_hh"]
    Ce, Ci = we.shape[0], wi.shape[0]
    h = we.shape[1] // 4
    we4 = we.reshape(Ce, 4, h)
    wi4 = wi.reshape(Ci, 4, h)
    top = jnp.concatenate([we4, jnp.zeros((Ce, 4, h), we.dtype)], axis=-1)
    bot = jnp.concatenate([jnp.zeros((Ci, 4, h), wi.dtype), wi4], axis=-1)
    Wg = jnp.concatenate([top, bot], axis=0).reshape(Ce + Ci, 8 * h)
    bg = jnp.concatenate(
        [be.reshape(4, h), bi.reshape(4, h)], axis=-1
    ).reshape(8 * h)
    return Wg, bg, h


def gate_weights_scale1(pe, pi):
    """Scale-1 gate weights with the 1x1 conv_1 folded in:
    gates = [ev|im] @ (blockdiag(Kev, Kim) @ Wg) + (concat(bce, bci) @ Wg
    + bg). Returns (Wg' [Ce+Ci, 8h], bg' [8h], h)."""
    Wg, bg, h = _gate_weights(pe, pi)
    Ke = pe["conv_1"]["kernel"][0, 0]          # [Ce, Ce]
    Ki = pi["conv_1"]["kernel"][0, 0]
    bce = pe["conv_1"]["bias"]
    bci = pi["conv_1"]["bias"]
    Ce, Ci = Ke.shape[0], Ki.shape[0]
    K = jnp.zeros((Ce + Ci, Ce + Ci), Wg.dtype)
    K = K.at[:Ce, :Ce].set(Ke).at[Ce:, Ce:].set(Ki)
    Wg2 = K @ Wg
    bg2 = jnp.concatenate([bce, bci]) @ Wg + bg
    return Wg2, bg2, h


def fold_weights(enc, si, m):
    """Composed super-state fold weights (one matmul per scale):
    Weff [3h, h] over rows [ss | ev_h | im_h], beff [h]; `m` traced bool."""
    We = enc[f"super_state_ev_encoder_{si}_kernel"][0, 0]   # [2h, h]
    be = enc[f"super_state_ev_encoder_{si}_bias"]
    Wi = enc[f"super_state_im_encoders_{si}_kernel"][0, 0]
    bi = enc[f"super_state_im_encoders_{si}_bias"]
    h = We.shape[-1]
    We1, We2 = We[:h], We[h:]
    Wi1, Wi2 = Wi[:h], Wi[h:]
    z = jnp.zeros_like(Wi2)
    W_nm = jnp.concatenate([We1, We2, z], axis=0)
    W_m = jnp.concatenate([We1 @ Wi1, We2 @ Wi1, Wi2], axis=0)
    Weff = jnp.where(m, W_m, W_nm)
    beff = jnp.where(m, be @ Wi1 + bi, be)
    return Weff, beff


def _cm(x):
    """[H, W, C] -> [C, H*W] channel-major."""
    H, W, C = x.shape
    return x.reshape(H * W, C).T


# ---------------------------------------------------------------------------
# SingleScale: carried LSTM step + shared presence-gated folds
# (ref: extractor.py:187-269 — MergerLSTMsceneEncoder)
# ---------------------------------------------------------------------------

def _lstm_carry_fold_kernel(x_ref, hc_ref, ss_ref, wg_ref, wh_ref, bg_ref,
                            wf_ref, bf_ref, pres_ref, oss_ref, ohc_ref,
                            *, hp):
    """One [*, hwb] block of the carried SingleScale step.

    x [Cp, hwb]; hc [4hp, hwb] rows [h_ev | h_im | c_ev | c_im];
    ss [hp, hwb]; wg [Cp, 8hp] gate-interleaved; wh [2hp, 8hp] recurrent
    (rows [h_ev | h_im]); bg [8hp, 1]; wf [2hp, hp] shared fold (rows
    [ss | data]); bf [hp, 1]; pres [1, 2] SMEM presence flags.
    Writes ss' [hp, hwb] and hc' [4hp, hwb]."""
    hcat = hc_ref[0:2 * hp]
    ccat = hc_ref[2 * hp:4 * hp].astype(jnp.float32)
    gates = jax.lax.dot_general(
        wg_ref[...], x_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        wh_ref[...], hcat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...]
    i = gates[0:2 * hp]
    f = gates[2 * hp:4 * hp]
    g = gates[4 * hp:6 * hp]
    o = gates[6 * hp:8 * hp]
    c_new = jax.nn.sigmoid(f) * ccat + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

    ss = ss_ref[...].astype(jnp.float32)
    p_ev = pres_ref[0, 0]
    p_im = pres_ref[0, 1]

    def fold(ss_cur, data):
        cat = jnp.concatenate([ss_cur, data], axis=0)      # [2hp, hwb]
        return jax.lax.dot_general(
            wf_ref[...], cat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bf_ref[...]

    ss1 = jnp.where(p_ev > 0, fold(ss, h_new[0:hp]), ss)
    ss2 = jnp.where(p_im > 0, fold(ss1, h_new[hp:2 * hp]), ss1)
    oss_ref[...] = ss2.astype(oss_ref.dtype)
    ohc_ref[...] = jnp.concatenate([h_new, c_new], axis=0).astype(
        ohc_ref.dtype
    )


def lstm_carry_fold_cm(x_cm, hc_cm, ss_cm, wg, wh, bg, wf, bf, pres, *,
                       hwb: int = 2048, interpret: bool = False):
    """Channel-major carried LSTM + shared-fold step (SingleScale, T=1).

    x_cm [Cp, HW]; hc_cm [4hp, HW]; ss_cm [hp, HW]; wg [Cp, 8hp];
    wh [2hp, 8hp]; bg [8hp]; wf [2hp, hp]; bf [hp]; pres [2] int32.
    Returns (ss' [hp, HW], hc' [4hp, HW])."""
    Cp, HW = x_cm.shape
    hp = ss_cm.shape[0]
    assert wg.shape == (Cp, 8 * hp) and wh.shape == (2 * hp, 8 * hp)
    assert wf.shape == (2 * hp, hp)
    pad = (-HW) % hwb
    if pad:
        x_cm = jnp.pad(x_cm, ((0, 0), (0, pad)))
        hc_cm = jnp.pad(hc_cm, ((0, 0), (0, pad)))
        ss_cm = jnp.pad(ss_cm, ((0, 0), (0, pad)))
    HWp = HW + pad

    # keep XLA from fusing the channel-major transpose into the custom
    # call's operand copy (see corr_pallas operand-barrier note)
    x_cm, hc_cm, ss_cm = jax.lax.optimization_barrier(
        (x_cm, hc_cm, ss_cm))

    oss, ohc = pl.pallas_call(
        functools.partial(_lstm_carry_fold_kernel, hp=hp),
        grid=(HWp // hwb,),
        in_specs=[
            pl.BlockSpec((Cp, hwb), lambda b: (0, b)),
            pl.BlockSpec((4 * hp, hwb), lambda b: (0, b)),
            pl.BlockSpec((hp, hwb), lambda b: (0, b)),
            pl.BlockSpec((Cp, 8 * hp), lambda b: (0, 0)),
            pl.BlockSpec((2 * hp, 8 * hp), lambda b: (0, 0)),
            pl.BlockSpec((8 * hp, 1), lambda b: (0, 0)),
            pl.BlockSpec((2 * hp, hp), lambda b: (0, 0)),
            pl.BlockSpec((hp, 1), lambda b: (0, 0)),
            pl.BlockSpec((1, 2), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((hp, hwb), lambda b: (0, b)),
            pl.BlockSpec((4 * hp, hwb), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, HWp), ss_cm.dtype),
            jax.ShapeDtypeStruct((4 * hp, HWp), hc_cm.dtype),
        ],
        interpret=interpret,
    )(x_cm, hc_cm, ss_cm, wg, wh, bg.reshape(-1, 1), wf,
      bf.reshape(-1, 1), pres.reshape(1, 2).astype(jnp.int32))
    return oss[:, :HW], ohc[:, :HW]


def _pad_gates(w4, hp):
    """[..., 4, h] -> [..., 4, hp] zero-padded per gate."""
    h = w4.shape[-1]
    return jnp.pad(w4, [(0, 0)] * (w4.ndim - 1) + [(0, hp - h)])


def singlescale_gate_weights(pe, pi, hp):
    """Interleaved+padded gate weights for the carried kernel.

    pe/pi: events_convlstm / image_convlstm param subtrees (torch gate
    order i,f,g,o — encoders.py:PixelLSTM). Returns wg [Ce+Ci, 8hp],
    wh [2hp, 8hp], bg [8hp]: gate g occupies columns [g*2hp, (g+1)*2hp)
    with the event half first."""
    we, wi = pe["weight_ih"], pi["weight_ih"]
    Ce, Ci = we.shape[0], wi.shape[0]
    h = we.shape[1] // 4
    we4 = _pad_gates(we.reshape(Ce, 4, h), hp)
    wi4 = _pad_gates(wi.reshape(Ci, 4, h), hp)
    z = jnp.zeros_like
    wg = jnp.concatenate([
        jnp.concatenate([we4, z(we4)], axis=-1),
        jnp.concatenate([z(wi4), wi4], axis=-1),
    ], axis=0).reshape(Ce + Ci, 8 * hp)

    def pad_hh(w):
        w4 = _pad_gates(w.reshape(h, 4, h), hp)        # [h, 4, hp]
        return jnp.pad(w4, [(0, hp - h), (0, 0), (0, 0)])

    he4, hi4 = pad_hh(pe["weight_hh"]), pad_hh(pi["weight_hh"])
    wh = jnp.concatenate([
        jnp.concatenate([he4, z(he4)], axis=-1),
        jnp.concatenate([z(hi4), hi4], axis=-1),
    ], axis=0).reshape(2 * hp, 8 * hp)

    be = _pad_gates(
        (pe["bias_ih"] + pe["bias_hh"]).reshape(4, h), hp
    )
    bi = _pad_gates(
        (pi["bias_ih"] + pi["bias_hh"]).reshape(4, h), hp
    )
    bg = jnp.concatenate([be, bi], axis=-1).reshape(8 * hp)
    return wg, wh, bg


def singlescale_fold_weights(enc, hp):
    """Shared super-state fold (concat(ss, data) @ W + b) padded to hp
    per half: wf [2hp, hp], bf [hp]."""
    W = enc["superstate_encoder_kernel"][0, 0]          # [2h, h]
    b = enc["superstate_encoder_bias"]
    h = W.shape[-1]
    Wc = jnp.pad(W, ((0, 0), (0, hp - h)))
    wf = jnp.concatenate([
        jnp.pad(Wc[:h], ((0, hp - h), (0, 0))),
        jnp.pad(Wc[h:], ((0, hp - h), (0, 0))),
    ], axis=0)
    return wf, jnp.pad(b, (0, hp - h))


def singlescale_init_state_cm(H, W, lstm_dim=15, dtype=jnp.float32):
    """Channel-major persistent state for `pallas_singlescale_encode`."""
    hp = lstm_dim + (-lstm_dim) % 8
    return {
        "hc": jnp.zeros((4 * hp, H * W), dtype),
        "ss": jnp.zeros((hp, H * W), dtype),
    }


def singlescale_state_to_cm(state, lstm_dim=15):
    """NHWC SingleScaleEncoder state -> channel-major (tests/migration)."""
    hp = lstm_dim + (-lstm_dim) % 8
    p = lambda x: jnp.pad(_cm(x), ((0, hp - x.shape[-1]), (0, 0)))
    return {
        "hc": jnp.concatenate(
            [p(state["ev"][0]), p(state["im"][0]),
             p(state["ev"][1]), p(state["im"][1])], axis=0
        ),
        "ss": p(state["ss"]),
    }


def pallas_singlescale_encode(enc_params, events, images, state_cm,
                              interpret: bool = False):
    """SingleScaleEncoder single-step forward (T == 1) with the carried
    channel-major kernel; BasicEncoder4 heads stay flax.

    enc_params: the encoder param subtree; events [1, H, W, Ce];
    images [1, H, W, Ci]; state_cm from `singlescale_init_state_cm`.
    Returns (fmap [1, H/4, W/4, 128], imap [1, ..., 384], new state_cm).

    Semantics: ref extractor.py:187-269 (carried pixel LSTMs, shared
    presence-gated fold — a modality that is all-zero is skipped)."""
    from ..models.encoders import BasicEncoder4

    ev = events[0]
    im = images[0]
    H, W = ev.shape[0], ev.shape[1]
    h = enc_params["events_convlstm"]["weight_ih"].shape[1] // 4
    hp = h + (-h) % 8

    wg, wh, bg = singlescale_gate_weights(
        enc_params["events_convlstm"], enc_params["image_convlstm"], hp
    )
    wf, bf = singlescale_fold_weights(enc_params, hp)
    pres = jnp.stack(
        [jnp.any(ev != 0), jnp.any(im != 0)]
    ).astype(jnp.int32)

    x = jnp.concatenate([ev, im], axis=-1)
    ss, hc = lstm_carry_fold_cm(
        _cm(x), state_cm["hc"], state_cm["ss"], wg, wh, bg, wf, bf, pres,
        interpret=interpret,
    )

    ss_nhwc = ss[:h].T.reshape(1, H, W, h)
    fmap = BasicEncoder4(128, "instance", h).apply(
        {"params": enc_params["fmap_encoder"]}, ss_nhwc
    )
    imap = BasicEncoder4(384, "none", h).apply(
        {"params": enc_params["imap_encoder"]}, ss_nhwc
    )
    return fmap, imap, {"hc": hc, "ss": ss}


def pallas_multiscale_chain(enc_params, events, images, mask, state,
                            interpret: bool = False):
    """The recurrent part of `pallas_multiscale_encode` only: per-scale
    LSTM+fold chains. Returns (new_ss_nhwc list, new state). The heads are
    NOT recurrent given the super-states, so a K-frame chunk can scan this
    and run `multiscale_heads` batched over K (better MXU utilization on
    the C<=64 convs than K separate batch-1 head passes)."""
    ev = events[0]
    im = images[0]
    m = mask.reshape(-1)[0]

    new_ss = []
    new_ss_nhwc = []
    cm_state = state["ss"][0].ndim == 2
    for si, s in enumerate(SCALES):
        pe = enc_params[f"ev_encoders_{si}"]
        pi = enc_params[f"im_encoders_{si}"]
        if s <= 1:
            Wg, bg, h = gate_weights_scale1(pe, pi)
            x = jnp.concatenate([ev, im], axis=-1)
        else:
            ce = _conv(ev, pe["conv_1"]["kernel"], pe["conv_1"]["bias"],
                       s, 1)
            ci = _conv(im, pi["conv_1"]["kernel"], pi["conv_1"]["bias"],
                       s, 1)
            x = jnp.concatenate([ce, ci], axis=-1)
            Wg, bg, h = _gate_weights(pe, pi)
        Weff, beff = fold_weights(enc_params, si, m)

        Hs, Ws, Cx = x.shape
        ss0 = state["ss"][si]
        ss0_cm = ss0 if cm_state else _cm(ss0)
        ss_cm = lstm_fold_cm(
            _cm(x), ss0_cm, Wg, bg, Weff, beff, interpret=interpret
        )
        new_ss.append(ss_cm if cm_state else ss_cm.T.reshape(Hs, Ws, h))
        new_ss_nhwc.append(ss_cm.T.reshape(Hs, Ws, h))
    return new_ss_nhwc, {"ss": new_ss}


def multiscale_heads(enc_params, ss_nhwc):
    """The two pyramid CNN heads on super-states [..., Hs, Ws, h] (any
    leading batch dims; flax convs map over them). Replicates
    models.encoders.MultiScaleBasicEncoder4 exactly (checkpoint-parity
    tested)."""
    from ..models.encoders import MultiScaleBasicEncoder4

    dims0 = ss_nhwc[0].shape[-1]
    fmap = MultiScaleBasicEncoder4(128, "instance", dims0).apply(
        {"params": enc_params["fmap_encoder"]}, *ss_nhwc
    )
    imap = MultiScaleBasicEncoder4(384, "none", dims0).apply(
        {"params": enc_params["imap_encoder"]}, *ss_nhwc
    )
    return fmap, imap


def pallas_multiscale_encode(enc_params, events, images, mask, state,
                             interpret: bool = False):
    """MultiScaleEncoder single-step forward with the channel-major kernel
    for every scale's LSTM+fold chain; the two pyramid heads stay on the
    standard flax path (the grouped-conv head variant measured slower).

    `state["ss"]` entries may be NHWC [H, W, h] (standard) or
    channel-major [h, H*W] (as returned by this function with
    `cm_state=True`); the returned state matches the input form.
    """
    new_ss_nhwc, new_state = pallas_multiscale_chain(
        enc_params, events, images, mask, state, interpret=interpret
    )
    fmap, imap = multiscale_heads(enc_params, new_ss_nhwc)
    return fmap[None], imap[None], new_state


def multiscale_init_state_cm(H, W, lstm_dim=16, scales=(1, 2, 4),
                             dtype=jnp.float32):
    """Channel-major persistent ss state for `pallas_multiscale_encode`."""
    ss = []
    for s in scales:
        Hs = (H + 2 - (s + 1)) // s + 1 if s > 1 else H
        Ws = (W + 2 - (s + 1)) // s + 1 if s > 1 else W
        ss.append(jnp.zeros((lstm_dim * s, Hs * Ws), dtype))
    return {"ss": ss}
