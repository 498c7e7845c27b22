"""Checkpoint import + activation-level parity against the reference encoders.

The reference's extractor.py is pure torch (no CUDA extensions) so we can
instantiate it directly, export a random-init state_dict, import it through
`rampvo_tpu.ckpt`, and require the flax encoders to reproduce the torch
activations — the SURVEY.md §7 "hard part #1" harness.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.ckpt import map_state_dict
from rampvo_tpu.models import VONet

REF = "/root/reference/ramp/extractor.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_extractor():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_extractor", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


H, W = 32, 48


def _fake_update_state_dict():
    """Update-operator state dict with the reference's exact shapes
    (ramp/net.py:34-67)."""
    rng = np.random.RandomState(0)
    D = 384
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32) * 0.02

    def ln(name):
        sd[f"{name}.weight"] = np.ones(D, np.float32)
        sd[f"{name}.bias"] = np.zeros(D, np.float32)

    lin("update.c1.0", D, D), lin("update.c1.2", D, D)
    lin("update.c2.0", D, D), lin("update.c2.2", D, D)
    ln("update.norm")
    for agg in ("agg_kk", "agg_ij"):
        for f in "fgh":
            lin(f"update.{agg}.{f}", D, D)
    ln("update.gru.0"), ln("update.gru.2")
    for i, _ in ((1, None), (3, None)):
        lin(f"update.gru.{i}.gate.0", D, D)
        lin(f"update.gru.{i}.res.0", D, D)
        lin(f"update.gru.{i}.res.2", D, D)
    lin("update.corr.0", 2 * 49 * 9, D)
    lin("update.corr.2", D, D)
    sd["update.corr.3.weight"] = np.ones(D, np.float32)
    sd["update.corr.3.bias"] = np.zeros(D, np.float32)
    lin("update.corr.5", D, D)
    lin("update.d.1", D, 2)
    lin("update.w.1", D, 2)
    return sd


class TestMappingCompleteness:
    @pytest.mark.parametrize("mode,cls,kw", [
        ("MultiScale", "MultiScaleMergerDoubleNet",
         dict(evs_ch_dim=5, img_ch_dim=3, lstm_dim=16,
              output_dim_f=128, output_dim_i=384)),
        ("SingleScale", "MergerLSTMsceneEncoder",
         dict(evs_ch_dim=5, img_ch_dim=3, output_lstm_dim=15,
              output_dim_f=128, output_dim_i=384)),
    ])
    @pytest.mark.slow
    def test_tree_matches_flax_init(self, ref_extractor, mode, cls, kw):
        enc = getattr(ref_extractor, cls)(**kw)
        sd = {
            f"patchify.encoder.{k}": v.detach().numpy()
            for k, v in enc.state_dict().items()
        }
        sd.update(_fake_update_state_dict())
        variables, skipped = map_state_dict(sd, mode)

        # every skipped key must be a known-dead module (importer policy:
        # update.lmbda + the MultiScale heads' unused layer2/conv2,
        # ckpt/torch_import.py::_UNUSED); anything else raising/skipping
        # would silently drop real weights
        import re

        allowed = re.compile(
            r"update\.lmbda$"
            r"|patchify\.encoder\.(fmap|imap)_encoder\.(layer2|conv2)\."
        )
        unexpected = [k for k in skipped if not allowed.match(k)]
        assert not unexpected, unexpected

        net = VONet(input_mode=mode)
        ref_init = net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
            jnp.asarray([True]),
        )
        want = _tree_shapes(ref_init["params"])
        got = _tree_shapes(variables["params"])
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5]
        )
        for k in want:
            assert got[k] == want[k], (k, got[k], want[k])


class TestActivationParity:
    def test_multiscale_encoder_parity(self, ref_extractor):
        import torch

        torch.manual_seed(0)
        enc = ref_extractor.MultiScaleMergerDoubleNet(
            evs_ch_dim=5, img_ch_dim=3, lstm_dim=16,
            output_dim_f=32, output_dim_i=48,
        ).eval()

        rng = np.random.RandomState(0)
        T = 2
        events = rng.randn(1, T, 5, H, W).astype(np.float32)
        images = rng.randn(1, T, 3, H, W).astype(np.float32)
        mask = np.array([True, True])

        with torch.no_grad():
            fmap_t, imap_t = enc(
                torch.from_numpy(events), torch.from_numpy(images),
                torch.from_numpy(mask),
            )
        fmap_t = fmap_t.numpy()[0].transpose(0, 2, 3, 1)  # [T, h, w, C]

        sd = {
            f"patchify.encoder.{k}": v.detach().numpy()
            for k, v in enc.state_dict().items()
        }
        variables, _ = map_state_dict(sd, "MultiScale")

        from rampvo_tpu.models import MultiScaleEncoder

        jenc = MultiScaleEncoder(5, 3, lstm_dim=16, output_dim_f=32,
                                 output_dim_i=48)
        fmap_j, imap_j, _ = jenc.apply(
            {"params": variables["params"]["patchify"]["encoder"]},
            jnp.asarray(events[0].transpose(0, 2, 3, 1)),
            jnp.asarray(images[0].transpose(0, 2, 3, 1)),
            jnp.asarray(mask), None, T,
        )
        np.testing.assert_allclose(
            np.asarray(fmap_j), fmap_t, atol=2e-4, rtol=1e-3
        )

    def test_singlescale_encoder_parity(self, ref_extractor):
        import torch

        torch.manual_seed(1)
        enc = ref_extractor.MergerLSTMsceneEncoder(
            evs_ch_dim=5, img_ch_dim=3, output_lstm_dim=15,
            output_dim_f=32, output_dim_i=48,
        ).eval()

        rng = np.random.RandomState(1)
        T = 2
        events = rng.randn(1, T, 5, H, W).astype(np.float32)
        images = rng.randn(1, T, 3, H, W).astype(np.float32)

        with torch.no_grad():
            fmap_t, imap_t, _ = enc(
                torch.from_numpy(events), torch.from_numpy(images),
                reinit_hidden=True,
            )
        fmap_t = fmap_t.numpy()[0].transpose(0, 2, 3, 1)
        imap_t = imap_t.numpy()[0].transpose(0, 2, 3, 1)

        sd = {
            f"patchify.encoder.{k}": v.detach().numpy()
            for k, v in enc.state_dict().items()
        }
        variables, _ = map_state_dict(sd, "SingleScale")

        from rampvo_tpu.models import SingleScaleEncoder

        jenc = SingleScaleEncoder(5, 3, lstm_dim=15, output_dim_f=32,
                                  output_dim_i=48)
        fmap_j, imap_j, _ = jenc.apply(
            {"params": variables["params"]["patchify"]["encoder"]},
            jnp.asarray(events[0].transpose(0, 2, 3, 1)),
            jnp.asarray(images[0].transpose(0, 2, 3, 1)),
            None,
        )
        np.testing.assert_allclose(
            np.asarray(fmap_j), fmap_t, atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(imap_j), imap_t, atol=2e-4, rtol=1e-3
        )
