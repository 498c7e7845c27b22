"""Training forward tests: edge schedule parity, loss finiteness, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.models import VONet
from rampvo_tpu.train import TrainForward, edge_schedule
from rampvo_tpu.train.loss import kabsch_umeyama_scale, pose_loss_terms
from rampvo_tpu.lie import ops as lops

H, W = 32, 48
NF, M, STEPS = 10, 4, 12


class TestEdgeSchedule:
    def test_matches_reference_growth(self):
        s = edge_schedule(NF, M, STEPS)
        # initial: 8M patches x 8 frames
        assert (s.created_at == 0).sum() == 8 * M * 8
        # insertions at steps 8..9 (n goes 8->10)
        assert list(s.n_pre[:11]) == [8] * 9 + [9, 10]
        assert s.insert[8] and s.insert[9] and not s.insert[10]
        # step 8 adds kk1 (8M) + kk2 (M*(8+1)) edges
        assert (s.created_at == 8).sum() == 8 * M + M * 9
        # hosts consistent
        np.testing.assert_array_equal(s.ii, s.kk // M)

    def test_full_size_schedule(self):
        s = edge_schedule(15, 80, 18)
        assert s.n_post[-1] == 15
        assert (s.jj < 15).all() and (s.kk < 15 * 80).all()


class TestLoss:
    def test_kabsch_scale(self):
        rng = np.random.RandomState(0)
        B = rng.randn(20, 3).astype(np.float32)
        from scipy.spatial.transform import Rotation as R

        Rm = R.from_euler("xyz", [0.1, 0.2, 0.3]).as_matrix().astype(np.float32)
        A = 2.5 * (Rm @ B.T).T
        s = kabsch_umeyama_scale(jnp.asarray(A), jnp.asarray(B))
        assert abs(float(s) - 2.5) < 1e-3

    def test_pose_loss_zero_for_equal(self):
        rng = np.random.RandomState(1)
        G = lops.se3_exp(jnp.asarray(0.1 * rng.randn(6, 6), jnp.float32))
        tr, ro = pose_loss_terms(G, G, jnp.int32(6))
        assert float(tr) < 1e-5 and float(ro) < 1e-5

    def test_pose_loss_positive_for_different(self):
        rng = np.random.RandomState(2)
        G = lops.se3_exp(jnp.asarray(0.1 * rng.randn(6, 6), jnp.float32))
        P = lops.se3_exp(jnp.asarray(0.1 * rng.randn(6, 6), jnp.float32))
        tr, ro = pose_loss_terms(G, P, jnp.int32(6))
        assert float(tr) > 1e-3 or float(ro) > 1e-3


@pytest.fixture(scope="module")
def fwd_setup():
    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)),
        jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    fwd = TrainForward(vonet, n_frames=NF, M=M, steps=STEPS)
    rng = np.random.RandomState(0)
    batch = dict(
        events=jnp.asarray(rng.rand(NF, H, W, 5), jnp.float32),
        images=jnp.asarray(rng.rand(NF, H, W, 3), jnp.float32),
        poses=lops.se3_exp(jnp.asarray(0.05 * rng.randn(NF, 6), jnp.float32)),
        disps=jnp.asarray(0.5 + 0.1 * rng.rand(NF, H, W), jnp.float32),
        intrinsics=jnp.broadcast_to(
            jnp.asarray([40.0, 40.0, W / 2, H / 2]), (NF, 4)
        ),
        mask=jnp.ones((NF,), bool),
    )
    return vonet, params, fwd, batch


@pytest.mark.slow
class TestTrainForward:
    def test_forward_finite(self, fwd_setup):
        vonet, params, fwd, b = fwd_setup
        loss, metrics = jax.jit(
            lambda p, rng: fwd(p, b["events"], b["images"], b["poses"],
                               b["disps"], b["intrinsics"], b["mask"], rng)
        )(params, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), float(loss)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))

    def test_grads_flow(self, fwd_setup):
        vonet, params, fwd, b = fwd_setup

        def loss_fn(p):
            loss, _ = fwd(p, b["events"], b["images"], b["poses"],
                          b["disps"], b["intrinsics"], b["mask"],
                          jax.random.PRNGKey(2))
            return loss

        g = jax.jit(jax.grad(loss_fn))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0

    def test_fused_corr_matches_xla(self, fwd_setup):
        """The Pallas training corr (fused kernel + custom VJP, the TPU
        default) must reproduce the exact-XLA path: loss and per-leaf grads
        agree within the kernel's bf16/SPREAD tolerance."""
        vonet, params, _, b = fwd_setup

        def loss_of(impl):
            # 6 unroll steps (not STEPS): interpret-mode Pallas in the VJP
            # is slow on CPU; 6 steps exercise insertion + both corr paths
            fwd = TrainForward(vonet, n_frames=NF, M=M, steps=6,
                               corr_impl=impl)

            def loss_fn(p):
                loss, _ = fwd(p, b["events"], b["images"], b["poses"],
                              b["disps"], b["intrinsics"], b["mask"],
                              jax.random.PRNGKey(3))
                return loss

            loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
            return float(loss), g

        lx, gx = loss_of("xla")
        lf, gf = loss_of("fused_interpret")
        assert abs(lf - lx) / max(abs(lx), 1e-6) < 2e-2, (lf, lx)
        fx = jax.tree_util.tree_leaves(gx)
        ff = jax.tree_util.tree_leaves(gf)
        # grads: compare overall magnitude leaf-by-leaf (the corr layouts
        # route identical gradients through different permutations; bf16
        # kernel accumulation gives ~1e-2 relative)
        num = sum(float(jnp.abs(a - b_).sum()) for a, b_ in zip(fx, ff))
        den = sum(float(jnp.abs(a).sum()) for a in fx) + 1e-6
        assert num / den < 3e-2, num / den
