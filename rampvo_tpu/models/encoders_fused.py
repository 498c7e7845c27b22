"""Fused single-step MultiScale encoder for the inference hot path.

Mathematically EXACT reformulation of `MultiScaleEncoder` (encoders.py) for
the per-frame inference case (T == 1, per-call LSTMs start from zero carry —
ref: extractor.py:366-385 never passes hx):

  * per scale, the event/image pixel-LSTM input projections fuse into ONE
    [H*W, Cin_ev+Cin_im] x [Cin, 8h] matmul (gate-interleaved columns) and
    one shared elementwise chain at 2h lanes — the zero carry removes the
    h @ w_hh matmul and the forget-gate term exactly;
  * the two sequential super-state folds (events always, image when the
    supervision mask is true — extractor.py:431-463) compose into ONE
    [H*W, 3h] x [3h, h] matmul whose weights are selected by the mask;
  * the two CNN heads (fmap/imap MultiScaleBasicEncoder4, extractor.py:
    274-311) run as ONE grouped-conv network (feature_group_count=2),
    sharing every pass over the 1/2- and 1/4-res feature maps; the fmap
    group's InstanceNorm applies to its channel half only.

Consumes the STANDARD parameter tree (models/encoders.py names) — the
canonical checkpoint layout is untouched; weights are re-arranged on the
fly inside jit (tiny concats). Parity-tested against MultiScaleEncoder in
tests/test_models.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALES = (1, 2, 4)
LSTM_DIM = 16


def _conv(x, kernel, bias, stride=1, pad=0, groups=1):
    """x [H, W, C] channels-last; kernel [kh, kw, Cin/groups, Cout]."""
    y = jax.lax.conv_general_dilated(
        x[None], kernel, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )[0]
    return y + bias


def _half_instance(y, c0, eps=1e-5):
    """InstanceNorm on channels [0, c0) (the fmap group), identity on the
    rest (the imap head was built with norm_fn='none')."""
    m = y.mean(axis=(-3, -2), keepdims=True)
    v = y.var(axis=(-3, -2), keepdims=True)
    yn = (y - m) * jax.lax.rsqrt(v + eps)
    ch = jnp.arange(y.shape[-1]) < c0
    return jnp.where(ch, yn, y)


def _lstm_single_step(pe, pi, events, images, s):
    """Fused event+image LSTMEncoder single step at one scale.

    pe/pi: ev_encoders_si / im_encoders_si param subtrees.
    events [H, W, Ce], images [H, W, Ci]. Returns h [H', W', 2h] with lanes
    [ev_h | im_h]."""
    if s <= 1:
        k, stride, pad = 1, 1, 0
    else:
        k, stride, pad = s + 1, s, 1
    ce = _conv(events, pe["conv_1"]["kernel"], pe["conv_1"]["bias"],
               stride, pad)
    ci = _conv(images, pi["conv_1"]["kernel"], pi["conv_1"]["bias"],
               stride, pad)

    we = pe["convlstm"]["weight_ih"]          # [Ce, 4h]
    wi = pi["convlstm"]["weight_ih"]
    be = pe["convlstm"]["bias_ih"] + pe["convlstm"]["bias_hh"]
    bi = pi["convlstm"]["bias_ih"] + pi["convlstm"]["bias_hh"]
    Ce, Ci = we.shape[0], wi.shape[0]
    h = we.shape[1] // 4

    # gate-interleaved block-diagonal: columns [g*2h, g*2h+h) = ev gate g,
    # [g*2h+h, (g+1)*2h) = im gate g
    we4 = we.reshape(Ce, 4, h)
    wi4 = wi.reshape(Ci, 4, h)
    top = jnp.concatenate([we4, jnp.zeros((Ce, 4, h), we.dtype)], axis=-1)
    bot = jnp.concatenate([jnp.zeros((Ci, 4, h), wi.dtype), wi4], axis=-1)
    Wg = jnp.concatenate([top, bot], axis=0).reshape(Ce + Ci, 8 * h)
    bg = jnp.concatenate(
        [be.reshape(4, h), bi.reshape(4, h)], axis=-1
    ).reshape(8 * h)

    x = jnp.concatenate([ce, ci], axis=-1)
    gates = (x @ Wg + bg).reshape(x.shape[:-1] + (4, 2 * h))
    i, f, g, o = (gates[..., 0, :], gates[..., 1, :],
                  gates[..., 2, :], gates[..., 3, :])
    del f  # zero carry: the forget-gate term vanishes
    c = jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c)


def _fused_fold(enc, si, ss0, hcat, m):
    """Composed super-state fold: ss -> fold_ev -> (fold_im if m).

    enc: encoder param subtree; hcat [H', W', 2h] = [ev_h | im_h];
    m: scalar bool. Returns ss_new [H', W', h]."""
    We = enc[f"super_state_ev_encoder_{si}_kernel"][0, 0]   # [2h, h]
    be = enc[f"super_state_ev_encoder_{si}_bias"]
    Wi = enc[f"super_state_im_encoders_{si}_kernel"][0, 0]
    bi = enc[f"super_state_im_encoders_{si}_bias"]
    h = We.shape[-1]
    We1, We2 = We[:h], We[h:]
    Wi1, Wi2 = Wi[:h], Wi[h:]

    z = jnp.zeros_like(Wi2)
    W_nm = jnp.concatenate([We1, We2, z], axis=0)            # no image fold
    W_m = jnp.concatenate([We1 @ Wi1, We2 @ Wi1, Wi2], axis=0)
    Weff = jnp.where(m, W_m, W_nm)
    beff = jnp.where(m, be @ Wi1 + bi, be)

    cat3 = jnp.concatenate([ss0, hcat], axis=-1)             # [H', W', 3h]
    return cat3 @ Weff + beff


def _resblock_grouped(x, pf, pi, stride):
    """Two parallel ResidualBlocks (encoders.py:73-98) as grouped convs.
    x [H, W, 2c_in] with lanes [f | i]; pf/pi: per-head param subtrees."""
    def gk(name):
        return (
            jnp.concatenate(
                [pf[name]["kernel"], pi[name]["kernel"]], axis=-1
            ),
            jnp.concatenate([pf[name]["bias"], pi[name]["bias"]], axis=-1),
        )

    k1, b1 = gk("conv1")
    cout = k1.shape[-1]
    y = _conv(x, k1, b1, stride, 1, groups=2)
    y = jax.nn.relu(_half_instance(y, cout // 2))
    k2, b2 = gk("conv2")
    y = _conv(y, k2, b2, 1, 1, groups=2)
    y = jax.nn.relu(_half_instance(y, cout // 2))

    if stride != 1:
        kd, bd = gk("downsample")
        x = _conv(x, kd, bd, stride, 0, groups=2)
        x = _half_instance(x, cout // 2)
    return jax.nn.relu(x + y)


def _regroup(y, ss):
    """[f | i] channel-paired with an injected super-state per group:
    [f, ss, i, ss] (the grouped layer3 input, extractor.py:302-306)."""
    c = y.shape[-1] // 2
    return jnp.concatenate([y[..., :c], ss, y[..., c:], ss], axis=-1)


def _fused_heads(enc, ss1, ss2, ss4):
    """fmap_encoder + imap_encoder (MultiScaleBasicEncoder4 x2) as one
    grouped network. Returns (fmap [H/4, W/4, 128], imap [H/4, W/4, 384])."""
    pf = enc["fmap_encoder"]
    pi = enc["imap_encoder"]

    k1 = jnp.concatenate(
        [pf["conv1"]["kernel"], pi["conv1"]["kernel"]], axis=-1
    )
    b1 = jnp.concatenate([pf["conv1"]["bias"], pi["conv1"]["bias"]], axis=-1)
    y = _conv(ss1, k1, b1, 2, 3)                    # [H/2, W/2, 64]
    y = jax.nn.relu(_half_instance(y, k1.shape[-1] // 2))

    y = _resblock_grouped(y, pf["layer1_0"], pi["layer1_0"], 1)
    y = _resblock_grouped(y, pf["layer1_1"], pi["layer1_1"], 1)

    y = _regroup(y, ss2)
    y = _resblock_grouped(y, pf["layer3_0"], pi["layer3_0"], 2)
    y = _resblock_grouped(y, pf["layer3_1"], pi["layer3_1"], 1)

    y = _regroup(y, ss4)                            # [H/4, W/4, 256]
    c = y.shape[-1] // 2
    fmap = _conv(y[..., :c], pf["conv3"]["kernel"], pf["conv3"]["bias"])
    imap = _conv(y[..., c:], pi["conv3"]["kernel"], pi["conv3"]["bias"])
    return fmap, imap


def fused_multiscale_encode(enc_params, events, images, mask, state):
    """Single-step MultiScaleEncoder forward (see module docstring).

    enc_params: params["params"]["patchify"]["encoder"] subtree (standard
    layout); events [1, H, W, Ce]; images [1, H, W, Ci]; mask [1] bool;
    state {"ss": [per-scale super-states]}. Returns (fmap [1, H/4, W/4,
    128], imap [1, ..., 384], {"ss": new_ss}) — NOT divided by the
    Patchifier's /4 (the caller applies it, models/vonet.py:48).
    """
    ev = events[0]
    im = images[0]
    m = mask.reshape(-1)[0]

    new_ss = []
    for si, s in enumerate(SCALES):
        hcat = _lstm_single_step(
            enc_params[f"ev_encoders_{si}"],
            enc_params[f"im_encoders_{si}"], ev, im, s,
        )
        ss_new = _fused_fold(enc_params, si, state["ss"][si], hcat, m)
        new_ss.append(ss_new)

    fmap, imap = _fused_heads(enc_params, *new_ss)
    return fmap[None], imap[None], {"ss": new_ss}
