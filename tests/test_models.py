"""Model tests: torch-parity for primitives, shape/state contracts for the
encoders, masking invariances for the update operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.models import (
    BasicEncoder4,
    MultiScaleEncoder,
    PixelLSTM,
    SingleScaleEncoder,
    Update,
    VONet,
)
from rampvo_tpu.models.encoders import instance_norm
from rampvo_tpu.models.vonet import (
    extract_patches,
    filter_features,
    select_coords_event_bias,
    select_coords_random,
)

H, W = 32, 48


class TestPixelLSTMTorchParity:
    def test_matches_torch_lstm(self):
        torch = pytest.importorskip("torch")
        T, C, hid = 4, 5, 7
        rng = np.random.RandomState(0)
        x = rng.randn(T, 6, 8, C).astype(np.float32)

        model = PixelLSTM(hid)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out, (h, c) = model.apply(params, jnp.asarray(x))

        tl = torch.nn.LSTM(input_size=C, hidden_size=hid, batch_first=True)
        p = params["params"]
        with torch.no_grad():
            tl.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["weight_ih"]).T))
            tl.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["weight_hh"]).T))
            tl.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["bias_ih"])))
            tl.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["bias_hh"])))

        # torch layout: (B*H*W, T, C) pixel sequences (extractor.py:239-243)
        xt = torch.from_numpy(x.transpose(1, 2, 0, 3).reshape(6 * 8, T, C))
        with torch.no_grad():
            yt, (ht, ct) = tl(xt)
        yt = yt.numpy().reshape(6, 8, T, hid).transpose(2, 0, 1, 3)

        np.testing.assert_allclose(np.asarray(out), yt, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(h), ht.numpy().reshape(6, 8, hid), atol=1e-5
        )

    def test_carry_continues_sequence(self):
        T, C, hid = 6, 3, 5
        x = jnp.asarray(np.random.RandomState(1).randn(T, 4, 4, C), jnp.float32)
        model = PixelLSTM(hid)
        params = model.init(jax.random.PRNGKey(0), x)

        full, _ = model.apply(params, x)
        first, carry = model.apply(params, x[:3])
        second, _ = model.apply(params, x[3:], carry)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(jnp.concatenate([first, second])), atol=1e-6
        )


class TestInstanceNorm:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(0).randn(2, 8, 6, 4).astype(np.float32)
        got = instance_norm(jnp.asarray(x))
        want = torch.nn.functional.instance_norm(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestEncoders:
    def test_basic_encoder4_shape(self):
        x = jnp.ones((2, H, W, 15))
        m = BasicEncoder4(output_dim=128, norm_fn="instance", channel_dim=15)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, H // 4, W // 4, 128)

    def test_single_scale_shapes_and_state(self):
        T = 2
        ev = jnp.asarray(np.random.RandomState(0).rand(T, H, W, 5), jnp.float32)
        im = jnp.asarray(np.random.RandomState(1).rand(T, H, W, 3), jnp.float32)
        m = SingleScaleEncoder(5, 3, lstm_dim=15, output_dim_f=32, output_dim_i=48)
        params = m.init(jax.random.PRNGKey(0), ev, im)
        fmap, imap, state = m.apply(params, ev, im)
        assert fmap.shape == (T, H // 4, W // 4, 32)
        assert imap.shape == (T, H // 4, W // 4, 48)

        # recurrent state must change the second call's output
        fmap2, _, _ = m.apply(params, ev, im, state)
        assert not np.allclose(np.asarray(fmap), np.asarray(fmap2))

    def test_single_scale_absent_modality_skips_fold(self):
        # zero events must not alter the super-state (presence gate)
        T = 1
        ev0 = jnp.zeros((T, H, W, 5))
        im = jnp.asarray(np.random.RandomState(1).rand(T, H, W, 3), jnp.float32)
        m = SingleScaleEncoder(5, 3, lstm_dim=15, output_dim_f=16, output_dim_i=16)
        params = m.init(jax.random.PRNGKey(0), ev0, im)
        _, _, st_a = m.apply(params, ev0, im)

        # folding events then images vs images only from scratch: with zero
        # events the ss after the call must equal the images-only fold
        _, _, st_b = m.apply(params, ev0, im)
        np.testing.assert_allclose(
            np.asarray(st_a["ss"]), np.asarray(st_b["ss"]), atol=0
        )
        assert float(jnp.abs(st_a["ss"]).max()) > 0  # image did fold

    @pytest.mark.slow
    def test_multi_scale_shapes_and_gather(self):
        T, Ti = 3, 2
        ev = jnp.asarray(np.random.RandomState(0).rand(T, H, W, 5), jnp.float32)
        im = jnp.asarray(np.random.RandomState(1).rand(Ti, H, W, 3), jnp.float32)
        mask = jnp.asarray([True, False, True])
        m = MultiScaleEncoder(5, 3, lstm_dim=8, output_dim_f=32, output_dim_i=48)
        params = m.init(jax.random.PRNGKey(0), ev, im, mask, None, 2)
        fmap, imap, state = m.apply(params, ev, im, mask, None, 2)
        assert fmap.shape == (2, H // 4, W // 4, 32)
        assert imap.shape == (2, H // 4, W // 4, 48)
        assert len(state["ss"]) == 3
        assert state["ss"][0].shape == (H, W, 8)
        assert state["ss"][1].shape == (H // 2, W // 2, 16)
        assert state["ss"][2].shape == (H // 4, W // 4, 32)

    @pytest.mark.parametrize("mval", [True, False])
    def test_pallas_encode_matches_multiscale(self, mval):
        """The channel-major Pallas LSTM+fold path
        (ops/encoder_pallas.py, interpret mode on CPU) must reproduce
        MultiScaleEncoder at T=1."""
        from rampvo_tpu.ops.encoder_pallas import pallas_multiscale_encode

        ev = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 5),
                         jnp.float32)
        im = jnp.asarray(np.random.RandomState(1).rand(1, H, W, 3),
                         jnp.float32)
        st = MultiScaleEncoder.init_state(H, W)
        st = jax.tree_util.tree_map(lambda x: x + 0.1, st)
        m = MultiScaleEncoder()
        params = m.init(jax.random.PRNGKey(0), ev, im, jnp.asarray([True]),
                        st, 1)
        mask = jnp.asarray([mval])
        f1, i1, s1 = m.apply(params, ev, im, mask, st, 1)
        f2, i2, s2 = pallas_multiscale_encode(
            params["params"], ev, im, mask, st, interpret=True
        )
        assert f2.shape == f1.shape and i2.shape == i1.shape
        assert float(jnp.abs(f1 - f2).max()) < 1e-4
        assert float(jnp.abs(i1 - i2).max()) < 1e-4
        for a, b in zip(s1["ss"], s2["ss"]):
            assert float(jnp.abs(a - b).max()) < 1e-5

    @pytest.mark.parametrize("zero_ev", [False, True])
    def test_pallas_singlescale_matches_flax(self, zero_ev):
        """The carried channel-major kernel (interpret mode) must
        reproduce SingleScaleEncoder at T=1, including the presence gate
        and the carry evolution over two steps."""
        from rampvo_tpu.models.encoders import SingleScaleEncoder
        from rampvo_tpu.ops.encoder_pallas import (
            pallas_singlescale_encode,
            singlescale_state_to_cm,
        )

        rng = np.random.RandomState(0)
        ev = jnp.asarray(rng.rand(1, H, W, 5), jnp.float32)
        if zero_ev:
            ev = jnp.zeros_like(ev)
        im = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
        m = SingleScaleEncoder()
        params = m.init(jax.random.PRNGKey(0), ev, im)
        st = SingleScaleEncoder.init_state(H, W)
        st_cm = singlescale_state_to_cm(st)

        for step in range(2):
            f1, i1, st = m.apply(params, ev, im, st)
            f2, i2, st_cm = pallas_singlescale_encode(
                params["params"], ev, im, st_cm, interpret=True
            )
            assert float(jnp.abs(f1 - f2).max()) < 1e-4, step
            assert float(jnp.abs(i1 - i2).max()) < 1e-4, step
            from rampvo_tpu.ops.encoder_pallas import (
                singlescale_state_to_cm as to_cm,
            )
            ref_cm = to_cm(st)
            for k in ("hc", "ss"):
                assert float(
                    jnp.abs(ref_cm[k] - st_cm[k]).max()
                ) < 1e-4, (step, k)


class TestUpdate:
    def _setup(self, E=24, Ecap=None):
        rng = np.random.RandomState(0)
        net = rng.randn(E, 384).astype(np.float32)
        inp = rng.randn(E, 384).astype(np.float32)
        corr = rng.randn(E, 2 * 49 * 9).astype(np.float32)
        ii = rng.randint(0, 4, E).astype(np.int32)
        jj = rng.randint(0, 4, E).astype(np.int32)
        kk = rng.randint(0, 8, E).astype(np.int32)
        return map(jnp.asarray, (net, inp, corr, ii, jj, kk))

    def test_shapes(self):
        net, inp, corr, ii, jj, kk = self._setup()
        m = Update(3)
        params = m.init(jax.random.PRNGKey(0), net, inp, corr, ii, jj, kk)
        net2, (delta, weight) = m.apply(params, net, inp, corr, ii, jj, kk)
        assert net2.shape == net.shape
        assert delta.shape == (24, 2)
        assert weight.shape == (24, 2)
        assert float(weight.min()) >= 0 and float(weight.max()) <= 1

    def test_padding_invariance(self):
        """Appending invalid edges must not change valid edges' outputs."""
        net, inp, corr, ii, jj, kk = self._setup()
        E = net.shape[0]
        m = Update(3)
        params = m.init(jax.random.PRNGKey(0), net, inp, corr, ii, jj, kk)
        out_a, (d_a, w_a) = m.apply(
            params, net, inp, corr, ii, jj, kk, jnp.ones(E, bool)
        )

        pad = 9
        rng = np.random.RandomState(7)
        netp = jnp.concatenate([net, jnp.asarray(rng.randn(pad, 384), jnp.float32)])
        inpp = jnp.concatenate([inp, jnp.asarray(rng.randn(pad, 384), jnp.float32)])
        corrp = jnp.concatenate(
            [corr, jnp.asarray(rng.randn(pad, 2 * 49 * 9), jnp.float32)]
        )
        iip = jnp.concatenate([ii, jnp.zeros(pad, jnp.int32)])
        jjp = jnp.concatenate([jj, jnp.zeros(pad, jnp.int32)])
        kkp = jnp.concatenate([kk, kk[:pad]])  # collide with real groups
        valid = jnp.concatenate([jnp.ones(E, bool), jnp.zeros(pad, bool)])

        out_b, (d_b, w_b) = m.apply(params, netp, inpp, corrp, iip, jjp, kkp, valid)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b[:E]), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b[:E]), atol=1e-5)

    def test_lattice_matches_flat(self):
        """The dense lattice path (analytic neighbours + axis-reduction
        SoftAgg) must reproduce the flat sort/segment path exactly on a
        lattice-shaped edge set."""
        NI, T, M = 4, 7, 6
        r = (T + 1) // 2
        n = 9
        E = NI * T * M
        rng = np.random.RandomState(3)

        # lattice-consistent ii/jj/kk + validity with interior gaps
        i_row = np.arange(NI)[:, None]
        tt = np.arange(T)[None, :]
        i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
        j = i + tt - (r - 1)
        cellv = (i >= 0) & (j >= 0) & (j <= n - 1) & (rng.rand(NI, T) < 0.75)
        ii = np.broadcast_to(i[:, :, None], (NI, T, M))
        jj = np.broadcast_to(j[:, :, None], (NI, T, M))
        m_ = np.broadcast_to(np.arange(M)[None, None, :], (NI, T, M))
        kk = ii * M + m_
        valid = np.broadcast_to(cellv[:, :, None], (NI, T, M))
        iif = jnp.asarray(np.where(valid, ii, 0).reshape(E), jnp.int32)
        jjf = jnp.asarray(np.where(valid, jj, 0).reshape(E), jnp.int32)
        kkf = jnp.asarray(np.where(valid, kk, 0).reshape(E), jnp.int32)
        vf = jnp.asarray(valid.reshape(E))

        net = jnp.asarray(rng.randn(E, 384), jnp.float32)
        inp = jnp.asarray(rng.randn(E, 384), jnp.float32)
        corr = jnp.asarray(rng.randn(E, 2 * 49 * 9), jnp.float32)

        m = Update(3)
        params = m.init(jax.random.PRNGKey(0), net, inp, corr, iif, jjf, kkf)
        out_f, (d_f, w_f) = m.apply(params, net, inp, corr, iif, jjf, kkf, vf)
        out_l, (d_l, w_l) = m.apply(
            params, net, inp, corr, iif, jjf, kkf, vf, (NI, T, M)
        )
        vmask = np.asarray(vf)
        np.testing.assert_allclose(
            np.asarray(out_f)[vmask], np.asarray(out_l)[vmask], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(d_f)[vmask], np.asarray(d_l)[vmask], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(w_f)[vmask], np.asarray(w_l)[vmask], atol=1e-4
        )

    def test_lattice_contig_matches_gather(self):
        """With t-CONTIGUOUS row validity (the VO runtime's invariant), the
        shift-based neighbour path (lattice_contig=True) must equal the
        gather-based lattice path exactly."""
        NI, T, M = 4, 7, 6
        r = (T + 1) // 2
        n = 9
        E = NI * T * M
        rng = np.random.RandomState(5)

        i_row = np.arange(NI)[:, None]
        tt = np.arange(T)[None, :]
        i = n - 1 - np.mod(n - 1 - i_row, NI) + 0 * tt
        j = i + tt - (r - 1)
        # contiguous t-range per row: [lo, hi] random within bounds
        cellv = (i >= 0) & (j >= 0) & (j <= n - 1)
        for row in range(NI):
            ts = np.nonzero(cellv[row])[0]
            if len(ts) < 2:
                continue
            lo = rng.randint(0, len(ts))
            hi = rng.randint(lo, len(ts))
            keep = np.zeros(T, bool)
            keep[ts[lo]:ts[hi] + 1] = True
            cellv[row] &= keep
        ii = np.broadcast_to(i[:, :, None], (NI, T, M))
        jj = np.broadcast_to(j[:, :, None], (NI, T, M))
        m_ = np.broadcast_to(np.arange(M)[None, None, :], (NI, T, M))
        kk = ii * M + m_
        valid = np.broadcast_to(cellv[:, :, None], (NI, T, M))
        iif = jnp.asarray(np.where(valid, ii, 0).reshape(E), jnp.int32)
        jjf = jnp.asarray(np.where(valid, jj, 0).reshape(E), jnp.int32)
        kkf = jnp.asarray(np.where(valid, kk, 0).reshape(E), jnp.int32)
        vf = jnp.asarray(valid.reshape(E))

        net = jnp.asarray(rng.randn(E, 384), jnp.float32)
        inp = jnp.asarray(rng.randn(E, 384), jnp.float32)
        corr = jnp.asarray(rng.randn(E, 2 * 49 * 9), jnp.float32)

        m = Update(3)
        params = m.init(jax.random.PRNGKey(0), net, inp, corr, iif, jjf, kkf)
        out_g, (d_g, w_g) = m.apply(
            params, net, inp, corr, iif, jjf, kkf, vf, (NI, T, M)
        )
        out_s, (d_s, w_s) = m.apply(
            params, net, inp, corr, iif, jjf, kkf, vf, (NI, T, M),
            lattice_contig=True,
        )
        vmask = np.asarray(vf)
        np.testing.assert_allclose(
            np.asarray(out_g)[vmask], np.asarray(out_s)[vmask], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d_g)[vmask], np.asarray(d_s)[vmask], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(w_g)[vmask], np.asarray(w_s)[vmask], atol=1e-6
        )


class TestSelectionAndExtraction:
    def test_event_bias_finds_spike(self):
        ev = np.zeros((1, H, W, 5), np.float32)
        ev[0, 20:24, 36:40, :] = 5.0  # 4x4 block -> one cell at 1/4 res
        coords = select_coords_event_bias(jnp.asarray(ev), M=1, nms_rad=3)
        x, y = np.asarray(coords[0, 0])
        assert (x, y) == (9, 5), (x, y)

    def test_random_coords_in_bounds(self):
        c = select_coords_random(jax.random.PRNGKey(0), 2, 50, H // 4, W // 4)
        assert c.shape == (2, 50, 2)
        assert c.min() >= 1
        assert np.asarray(c[..., 0]).max() < W // 4 - 1

    def test_gradient_bias_ranks_candidates(self):
        # gradient magnitude increases with x (intensity ~ x^2), so the
        # top-M of 3M random candidates must cluster at large x
        # (ref: net.py:172-183)
        from rampvo_tpu.models.vonet import select_coords_gradient_bias

        xs = np.arange(W, dtype=np.float32)
        img = np.broadcast_to(
            ((xs / W) ** 2)[None, :, None], (H, W, 3)
        )[None].copy()
        M = 12
        c = select_coords_gradient_bias(
            jax.random.PRNGKey(3), jnp.asarray(img), M
        )
        assert c.shape == (1, M, 2)
        w4 = W // 4
        assert c.min() >= 1 and np.asarray(c[..., 0]).max() < w4 - 1
        assert np.asarray(c[0, :, 0]).min() > 0.4 * w4
        # stochastic across keys (per-trial re-roll, net.py:175-176)
        c2 = select_coords_gradient_bias(
            jax.random.PRNGKey(4), jnp.asarray(img), M
        )
        assert not np.allclose(np.asarray(c), np.asarray(c2))

    def test_extract_patches_centers(self):
        n, M = 1, 4
        h, w = H // 4, W // 4
        fmap = jnp.asarray(np.random.RandomState(0).rand(n, h, w, 16), jnp.float32)
        imap = jnp.asarray(np.random.RandomState(1).rand(n, h, w, 8), jnp.float32)
        images = jnp.zeros((n, H, W, 3))
        disps = jnp.full((n, h, w), 0.7)
        coords = jnp.asarray([[[3.0, 2.0], [5.0, 5.0], [1.0, 6.0], [7.0, 3.0]]])

        gmap, imap_vec, patches, clr = extract_patches(
            fmap, imap, images, disps, coords, P=3
        )
        assert gmap.shape == (n, M, 3, 3, 16)
        assert imap_vec.shape == (n, M, 8)
        assert patches.shape == (n, M, 3, 3, 3)
        # patch center carries the selected pixel coords and its disparity
        np.testing.assert_allclose(np.asarray(patches[0, :, 0, 1, 1]), [3, 5, 1, 7])
        np.testing.assert_allclose(np.asarray(patches[0, :, 1, 1, 1]), [2, 5, 6, 3])
        np.testing.assert_allclose(np.asarray(patches[0, :, 2, 1, 1]), [0.7] * 4)
        # imap gathered at the exact cell
        np.testing.assert_allclose(
            np.asarray(imap_vec[0, 0]), np.asarray(imap[0, 2, 3]), atol=1e-6
        )

    def test_filter_features(self):
        conf = jnp.ones((1, 3, 2))
        target = jnp.asarray([[[5.0, 5.0], [-1.0, 3.0], [2.0, 100.0]]])
        out = filter_features(conf, target, (20, 30))
        np.testing.assert_allclose(np.asarray(out[0, :, 0]), [1, 0, 0])


class TestVONet:
    def test_init_and_both_paths(self):
        ev = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 5), jnp.float32)
        im = jnp.asarray(np.random.RandomState(1).rand(1, H, W, 3), jnp.float32)
        mask = jnp.asarray([True])

        for mode in ("SingleScale", "MultiScale"):
            net = VONet(input_mode=mode)
            params = net.init(jax.random.PRNGKey(0), ev, im, mask)
            fmap, imap, state = net.apply(
                params, ev, im, mask, method=VONet.encode
            )
            assert fmap.shape == (1, H // 4, W // 4, 128)
            assert imap.shape == (1, H // 4, W // 4, 384)
