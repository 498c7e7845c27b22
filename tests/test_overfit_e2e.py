"""Learned-weights end-to-end test (slow): overfit the tiny model on the
synthetic scene, then run the full eval CLI with the learned weights and
assert the ATE beats the random-init baseline decisively.

Proves the train -> checkpoint-params -> eval loop with GRADIENTS (the
reference's de-facto integration test is evo APE against published
checkpoints, evaluate.py:294-307, unavailable in-container — this closes
that gap with weights learned in-session).
"""

import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import synthetic
from rampvo_tpu.cli.evaluate import evaluate
from rampvo_tpu.data.tartan import TartanEventDataset
from rampvo_tpu.lie import ops as lops
from rampvo_tpu.models import VONet
from rampvo_tpu.train import TrainForward
from rampvo_tpu.vo import VOConfig

H, W = 60, 80


@pytest.mark.slow
def test_overfit_beats_random_init_ate():
    root = tempfile.mkdtemp() + "/scene"
    synthetic.write_scene(root, n_frames=40, H=H, W=W, motion="curve")

    cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    cfg["data_loader"]["train"]["args"]["n_frames"] = 8
    ds = TartanEventDataset(cfg, root, fmin=0.001, fmax=1000.0)
    assert len(ds) > 1

    vonet = VONet(input_mode="MultiScale")
    params = vonet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 5)), jnp.zeros((1, H, W, 3)),
        jnp.asarray([True]),
    )
    params0 = params

    fwd = TrainForward(vonet, n_frames=8, M=16, steps=10)
    opt = optax.chain(optax.clip_by_global_norm(0.1), optax.adamw(1e-4))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            return fwd(p, batch["events"], batch["images"], batch["poses"],
                       batch["disps"], batch["intrinsics"], batch["mask"],
                       rng)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    rng = jax.random.PRNGKey(1)
    steps = 40
    first_loss = last_loss = None
    for step in range(steps):
        item = ds[1 + step % max(len(ds) - 1, 1)]
        w2c = np.asarray(lops.se3_inv(jnp.asarray(item["poses"])))
        batch = {
            "events": jnp.asarray(item["events"]),
            "images": jnp.asarray(item["images"]),
            "poses": jnp.asarray(w2c),
            "disps": jnp.asarray(item["disps"]),
            "intrinsics": jnp.asarray(item["intrinsics"]),
            "mask": jnp.asarray(item["mask"]),
        }
        rng, k = jax.random.split(rng)
        params, opt_state, loss, _ = train_step(params, opt_state, batch, k)
        if step == 0:
            first_loss = float(loss)
        last_loss = float(loss)
    assert np.isfinite(last_loss)
    assert last_loss < first_loss, (first_loss, last_loss)

    eval_cfg = json.loads(json.dumps(synthetic.EVAL_CFG))
    eval_cfg["data_loader"]["test"] = {
        "test_split": [root], "dataset_name": "Synthetic",
        "use_pose_pred": False,
    }
    vocfg = VOConfig(
        BUFFER_SIZE=64, MAX_FRAMES=64, PATCHES_PER_FRAME=16,
        REMOVAL_WINDOW=8, OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5,
        KEYFRAME_INDEX=2, MIXED_PRECISION=False, PROBE_THRESH=-1.0, MEM=16,
    )

    def ate_of(p):
        res = evaluate(net=p, trials=1, config_VO=vocfg, eval_cfg=eval_cfg,
                       save_dir=tempfile.mkdtemp())
        return res[root]["trial_0"]["ate"]

    ate_random = ate_of(params0)
    ate_trained = ate_of(params)
    print(f"ATE random={ate_random:.4f} trained={ate_trained:.4f}")
    assert np.isfinite(ate_trained)
    assert ate_trained < ate_random * 0.75, (ate_trained, ate_random)
