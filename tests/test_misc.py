"""Misc components: EventSequence, pose interpolation, checkpointing,
mesh train step, logger."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rampvo_tpu.data import Events, EventSequence
from rampvo_tpu.utils import interpolate_poses, seed_everything
from rampvo_tpu.ckpt import save_checkpoint, restore_checkpoint
from rampvo_tpu.parallel import eval_shard_scenes, make_mesh, make_train_step, shard_batch


class TestEventSequence:
    def test_sort_and_relative(self):
        feats = np.array([[30.0, 1, 2, 1], [10.0, 3, 4, -1], [20.0, 5, 6, 1]])
        seq = EventSequence(features=feats,
                            params={"height": 10, "width": 10},
                            convert_to_relative=True)
        assert seq.is_sorted()
        np.testing.assert_allclose(seq.features[:, 0], [0, 10, 20])

    def test_add_and_roundtrip(self):
        ev = Events(x=np.array([1, 2]), y=np.array([3, 4]),
                    t=np.array([5, 6]), p=np.array([1, 0]),
                    width=8, height=8)
        seq = EventSequence.from_events(ev)
        both = seq + seq
        assert len(both) == 4
        back = seq.to_events()
        np.testing.assert_array_equal(back.x, ev.x)
        np.testing.assert_array_equal(back.p, ev.p)


class TestInterpolation:
    def test_midpoint(self):
        poses = np.array([[0, 0, 0, 0, 0, 0, 1], [2, 0, 0, 0, 0, 0, 1]], float)
        out = interpolate_poses(poses, [0.5], [0.0, 1.0])
        np.testing.assert_allclose(out[0, :3], [1, 0, 0])
        np.testing.assert_allclose(np.linalg.norm(out[0, 3:]), 1.0)

    def test_edges_clamp(self):
        poses = np.array([[0, 0, 0, 0, 0, 0, 1], [2, 0, 0, 0, 0, 0, 1]], float)
        out = interpolate_poses(poses, [-1.0, 5.0], [0.0, 1.0])
        np.testing.assert_allclose(out[0], poses[0])
        np.testing.assert_allclose(out[1], poses[1])


class TestCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        params = {"params": {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}}
        save_checkpoint(str(tmp_path / "ck"), 42, params)
        restored = restore_checkpoint(str(tmp_path / "ck" / "step_00000042"))
        assert int(restored["step"]) == 42
        np.testing.assert_allclose(
            np.asarray(restored["params"]["params"]["w"]), np.ones((3, 3))
        )


class TestParallel:
    def test_mesh_train_step_8dev(self):
        """DP mechanics on the virtual 8-device mesh with a stub model."""
        assert len(jax.devices()) == 8
        mesh = make_mesh()

        def fwd(params, events, images, poses, disps, intrinsics, mask, rng,
                structure_only=False):
            loss = jnp.sum((events @ params["w"] - images) ** 2)
            return loss, {"loss": loss}

        params = {"w": jnp.ones((4, 4))}
        opt = optax.sgd(0.1)
        opt_state = opt.init(params)
        step = make_train_step(fwd, opt, mesh=mesh)

        B = 8
        batch = {
            "events": jnp.ones((B, 4, 4)),
            "images": jnp.zeros((B, 4, 4)),
            "poses": jnp.zeros((B, 1)),
            "disps": jnp.zeros((B, 1)),
            "intrinsics": jnp.zeros((B, 1)),
            "mask": jnp.ones((B, 1), bool),
        }
        batch = shard_batch(mesh, batch)
        p2, _, loss, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # gradient actually applied (replicated result)
        assert not np.allclose(np.asarray(p2["w"]), 1.0)

    @pytest.mark.slow
    def test_mesh_train_step_real_model_matches_single_device(self):
        """DP correctness of the ACTUAL model: TrainForward sharded over the
        8-device mesh must produce the same loss and updated params as an
        unsharded single-device run of the same batch (VONet + differentiable
        BA under vmap + psum-by-sharding; ref training loop train.py:150-170)."""
        from rampvo_tpu.lie import ops as lops
        from rampvo_tpu.models import VONet
        from rampvo_tpu.train import TrainForward

        assert len(jax.devices()) == 8
        mesh = make_mesh()

        H, W, NF, M, STEPS = 24, 32, 10, 2, 9
        vonet = VONet(input_mode="MultiScale")
        params = vonet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 5)),
            jnp.zeros((1, H, W, 3)),
            jnp.asarray([True]),
        )
        fwd = TrainForward(vonet, n_frames=NF, M=M, steps=STEPS)
        opt = optax.chain(
            optax.clip_by_global_norm(0.1), optax.adamw(1e-4)
        )
        opt_state = opt.init(params)

        B = 8
        rng = np.random.RandomState(0)
        batch = {
            "events": jnp.asarray(rng.rand(B, NF, H, W, 5), jnp.float32),
            "images": jnp.asarray(rng.rand(B, NF, H, W, 3), jnp.float32),
            "poses": jnp.asarray(
                np.asarray(
                    lops.se3_exp(
                        jnp.asarray(0.05 * rng.randn(B * NF, 6), jnp.float32)
                    )
                ).reshape(B, NF, 7)
            ),
            "disps": jnp.asarray(
                0.5 + 0.1 * rng.rand(B, NF, H, W), jnp.float32
            ),
            "intrinsics": jnp.broadcast_to(
                jnp.asarray([40.0, 40.0, W / 2, H / 2]), (B, NF, 4)
            ),
            "mask": jnp.ones((B, NF), bool),
        }

        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

        step_mesh = make_train_step(fwd, opt, mesh=mesh)
        p_m, _, loss_m, _ = step_mesh(
            copy(params), copy(opt_state), shard_batch(mesh, batch),
            jax.random.PRNGKey(1)
        )
        loss_m = float(loss_m)

        step_one = make_train_step(fwd, opt, mesh=None)
        p_1, _, loss_1, _ = step_one(
            copy(params), copy(opt_state), batch, jax.random.PRNGKey(1)
        )
        loss_1 = float(loss_1)

        assert np.isfinite(loss_m)
        assert abs(loss_m - loss_1) < 1e-4 * max(1.0, abs(loss_1)), (
            loss_m, loss_1
        )
        flat_m = jax.tree_util.tree_leaves(p_m)
        flat_1 = jax.tree_util.tree_leaves(p_1)
        worst = max(
            float(jnp.max(jnp.abs(a - b))) for a, b in zip(flat_m, flat_1)
        )
        # post-AdamW params: reduction-order noise is amplified by m/sqrt(v)
        # where grads ~ 0, so the bound is looser than the loss check above
        assert worst < 1e-3, worst

    def test_eval_shard_scenes(self):
        shards = eval_shard_scenes(list(range(10)), 3)
        assert sorted(sum(shards, [])) == list(range(10))
        assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_seed_everything():
    key = seed_everything(7)
    a = np.random.rand()
    seed_everything(7)
    b = np.random.rand()
    assert a == b
