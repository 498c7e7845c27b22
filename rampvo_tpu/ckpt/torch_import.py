"""Import the reference's PyTorch checkpoints into flax params.

Handles the published `RAMPVO_MultiScale.pth` / `RAMPVO_SingleScale.pth`
(README.md:62-72) and any train.py checkpoint dict ({model_state_dict, ...},
train.py:180-196). Mirrors the reference loader's key hygiene: accepts raw
state_dicts or wrapped dicts, strips "module." prefixes and drops
"update.lmbda" (ramp/Ramp_vo.py:103-118).

Layout conversions:
  conv   [O, I, kh, kw] -> HWIO [kh, kw, I, O]
  linear [O, I]         -> [I, O]
  lstm   weight_ih_l0 [4h, C] -> weight_ih [C, 4h] (gate order i,f,g,o kept)
  layernorm weight -> scale

Keys the reference model owns but never executes are skipped: the
MultiScaleBasicEncoder4 creates (but does not use) layer2.* and conv2.*
(ref: extractor.py:274-311 forward uses conv1, layer1, layer3, conv3).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w)


# per-module kinds: how each torch leaf maps to a flax leaf
# conv:   weight->kernel (HWIO), bias->bias
# linear: weight->kernel (T),    bias->bias
# ln:     weight->scale,         bias->bias
# lstm:   weight_ih_l0->weight_ih (T), weight_hh_l0->weight_hh (T),
#         bias_ih_l0->bias_ih, bias_hh_l0->bias_hh
# ssconv: super-state fold conv stored as flat scope params:
#         weight-><tgt>_kernel (HWIO), bias-><tgt>_bias
_LEAF = {
    "conv": {"weight": ("kernel", _conv), "bias": ("bias", None)},
    "linear": {"weight": ("kernel", _lin), "bias": ("bias", None)},
    "ln": {"weight": ("scale", None), "bias": ("bias", None)},
    "lstm": {
        "weight_ih_l0": ("weight_ih", _lin),
        "weight_hh_l0": ("weight_hh", _lin),
        "bias_ih_l0": ("bias_ih", None),
        "bias_hh_l0": ("bias_hh", None),
    },
}


def _head_rules(prefix: str, tgt_prefix: str, head: str, multiscale: bool):
    layers = ["layer1", "layer3"] if multiscale else ["layer1", "layer2"]
    out_conv = "conv3" if multiscale else "conv2"
    rules = {
        f"{prefix}.{head}.conv1": (f"{tgt_prefix}/{head}/conv1", "conv"),
        f"{prefix}.{head}.{out_conv}": (f"{tgt_prefix}/{head}/{out_conv}", "conv"),
    }
    for lyr in layers:
        for b in (0, 1):
            base = f"{prefix}.{head}.{lyr}.{b}"
            t = f"{tgt_prefix}/{head}/{lyr}_{b}"
            rules[f"{base}.conv1"] = (f"{t}/conv1", "conv")
            rules[f"{base}.conv2"] = (f"{t}/conv2", "conv")
            rules[f"{base}.downsample.0"] = (f"{t}/downsample", "conv")
    return rules


def _encoder_rules(input_mode: str) -> Dict:
    p, t = "patchify.encoder", "patchify/encoder"
    rules = {}
    if input_mode == "SingleScale":
        rules[f"{p}.events_convlstm"] = (f"{t}/events_convlstm", "lstm")
        rules[f"{p}.image_convlstm"] = (f"{t}/image_convlstm", "lstm")
        rules[f"{p}.superstate_encoder"] = (f"{t}/superstate_encoder", "ssconv")
        rules.update(_head_rules(p, t, "fmap_encoder", False))
        rules.update(_head_rules(p, t, "imap_encoder", False))
    elif input_mode == "MultiScale":
        for i in range(3):
            rules[f"{p}.ev_encoders.{i}.conv_1"] = (
                f"{t}/ev_encoders_{i}/conv_1", "conv")
            rules[f"{p}.im_encoders.{i}.conv_1"] = (
                f"{t}/im_encoders_{i}/conv_1", "conv")
            rules[f"{p}.ev_encoders.{i}.convlstm"] = (
                f"{t}/ev_encoders_{i}/convlstm", "lstm")
            rules[f"{p}.im_encoders.{i}.convlstm"] = (
                f"{t}/im_encoders_{i}/convlstm", "lstm")
            rules[f"{p}.super_state_ev_encoder.{i}.encoder"] = (
                f"{t}/super_state_ev_encoder_{i}", "ssconv")
            rules[f"{p}.super_state_im_encoders.{i}.encoder"] = (
                f"{t}/super_state_im_encoders_{i}", "ssconv")
        rules.update(_head_rules(p, t, "fmap_encoder", True))
        rules.update(_head_rules(p, t, "imap_encoder", True))
    else:
        raise ValueError(input_mode)
    return rules


def _update_rules() -> Dict:
    u, t = "update", "update"
    rules = {
        f"{u}.c1.0": (f"{t}/c1_fc1", "linear"),
        f"{u}.c1.2": (f"{t}/c1_fc2", "linear"),
        f"{u}.c2.0": (f"{t}/c2_fc1", "linear"),
        f"{u}.c2.2": (f"{t}/c2_fc2", "linear"),
        f"{u}.norm": (f"{t}/norm", "ln"),
        f"{u}.corr.0": (f"{t}/corr_fc1", "linear"),
        f"{u}.corr.2": (f"{t}/corr_fc2", "linear"),
        f"{u}.corr.3": (f"{t}/corr_ln", "ln"),
        f"{u}.corr.5": (f"{t}/corr_fc3", "linear"),
        f"{u}.gru.0": (f"{t}/gru_ln1", "ln"),
        f"{u}.gru.2": (f"{t}/gru_ln2", "ln"),
        f"{u}.d.1": (f"{t}/d_fc", "linear"),
        f"{u}.w.1": (f"{t}/w_fc", "linear"),
    }
    for seq_idx, name in ((1, "gru_res1"), (3, "gru_res2")):
        rules[f"{u}.gru.{seq_idx}.gate.0"] = (f"{t}/{name}/gate_fc", "linear")
        rules[f"{u}.gru.{seq_idx}.res.0"] = (f"{t}/{name}/res_fc1", "linear")
        rules[f"{u}.gru.{seq_idx}.res.2"] = (f"{t}/{name}/res_fc2", "linear")
    for agg in ("agg_kk", "agg_ij"):
        for fgh in "fgh":
            rules[f"{u}.{agg}.{fgh}"] = (f"{t}/{agg}/{fgh}", "linear")
    return rules


# modules created by the reference but never used in its forward
_UNUSED = re.compile(
    r"patchify\.encoder\.(fmap|imap)_encoder\.(layer2\.|conv2\.)"
)


def map_state_dict(state_dict: Dict[str, np.ndarray], input_mode: str):
    """torch state_dict (numpy values) -> flax variables {'params': ...}.

    Returns (variables, skipped_keys). Raises on unmapped, non-skippable keys.
    """
    multiscale = input_mode == "MultiScale"
    rules = {**_encoder_rules(input_mode), **_update_rules()}

    out: Dict = {}

    def insert(path: str, value):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    skipped = []
    for key, val in state_dict.items():
        key = key.replace("module.", "")
        if key == "update.lmbda":
            skipped.append(key)
            continue
        if multiscale and _UNUSED.match(key):
            skipped.append(key)
            continue

        matched = None
        for base, (tgt, kind) in rules.items():
            if key.startswith(base + "."):
                leaf = key[len(base) + 1:]
                matched = (tgt, kind, leaf)
                break
        if matched is None:
            raise KeyError(f"unmapped checkpoint key: {key}")

        tgt, kind, leaf = matched
        val = np.asarray(val, np.float32)
        if kind == "ssconv":
            if leaf == "weight":
                insert(f"{tgt}_kernel", _conv(val))
            elif leaf == "bias":
                insert(f"{tgt}_bias", val)
            else:
                raise KeyError(f"unexpected ssconv leaf {key}")
        else:
            if leaf not in _LEAF[kind]:
                raise KeyError(f"unexpected {kind} leaf {key}")
            name, fn = _LEAF[kind][leaf]
            insert(f"{tgt}/{name}", fn(val) if fn else val)
    return {"params": out}, skipped


def import_pth(path_or_dict, input_mode: str):
    """Load a reference .pth (file path or loaded state dict) into flax
    variables for `rampvo_tpu.models.VONet`."""
    if isinstance(path_or_dict, (str, bytes)):
        import torch

        ckpt = torch.load(path_or_dict, map_location="cpu", weights_only=False)
    else:
        ckpt = path_or_dict
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    sd = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in ckpt.items()
    }
    return map_state_dict(sd, input_mode)
