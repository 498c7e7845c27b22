"""Update-operator parity against a torch oracle with shared weights.

The reference's Update (ramp/net.py:34-90) depends on torch_scatter (not
installed here), so the oracle below reimplements its computation with plain
torch index ops, loads a random torch-layout state dict through
`ckpt.map_state_dict`, and requires the flax Update to reproduce the torch
outputs — covering every leaf of the `update.*` checkpoint mapping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rampvo_tpu.ckpt import map_state_dict
from rampvo_tpu.models import Update
from rampvo_tpu.ops.neighbors import neighbors

torch = pytest.importorskip("torch")

DIM = 384


def torch_update_oracle(sd, net, inp, corr, ii, jj, kk):
    """Forward of ramp/net.py:34-90 with plain torch ops."""
    import torch.nn.functional as F

    def lin(x, base):
        return F.linear(x, sd[f"{base}.weight"], sd[f"{base}.bias"])

    def ln(x, base):
        return F.layer_norm(x, (DIM,), sd[f"{base}.weight"],
                            sd[f"{base}.bias"], eps=1e-3)

    def mlp2(x, base):  # Linear, ReLU, Linear
        return lin(F.relu(lin(x, f"{base}.0")), f"{base}.2")

    def corr_mlp(x):
        x = F.relu(lin(x, "update.corr.0"))
        x = ln(lin(x, "update.corr.2"), "update.corr.3")
        return lin(F.relu(x), "update.corr.5")

    def soft_agg(x, ix, base):
        _, jx = torch.unique(ix, return_inverse=True)
        G = int(jx.max()) + 1
        gx = lin(x, f"{base}.g")
        # scatter softmax
        mx = torch.full((G, DIM), -1e30)
        mx = mx.index_reduce(0, jx, gx, "amax", include_self=True)
        ex = torch.exp(gx - mx[jx])
        den = torch.zeros(G, DIM).index_add(0, jx, ex)
        w = ex / den[jx]
        y = torch.zeros(G, DIM).index_add(0, jx, lin(x, f"{base}.f") * w)
        return lin(y, f"{base}.h")[jx]

    def gated_residual(x, base):
        gate = torch.sigmoid(lin(x, f"{base}.gate.0"))
        res = lin(F.relu(lin(x, f"{base}.res.0")), f"{base}.res.2")
        return x + gate * res

    net = net + inp + corr_mlp(corr)
    net = ln(net, "update.norm")

    ix, jx = neighbors(jnp.asarray(kk.numpy()), jnp.asarray(jj.numpy()))
    ix = torch.from_numpy(np.asarray(ix)).long()
    jx = torch.from_numpy(np.asarray(jx)).long()
    mask_ix = (ix >= 0).float()[:, None]
    mask_jx = (jx >= 0).float()[:, None]
    net = net + mlp2(mask_ix * net[ix], "update.c1")
    net = net + mlp2(mask_jx * net[jx], "update.c2")

    net = net + soft_agg(net, kk, "update.agg_kk")
    net = net + soft_agg(net, ii * 12345 + jj, "update.agg_ij")

    net = ln(net, "update.gru.0")
    net = gated_residual(net, "update.gru.1")
    net = ln(net, "update.gru.2")
    net = gated_residual(net, "update.gru.3")

    delta = lin(F.relu(net), "update.d.1")
    weight = torch.sigmoid(lin(F.relu(net), "update.w.1"))
    return net, delta, weight


def make_torch_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.05

    def ln(name):
        sd[f"{name}.weight"] = 1 + 0.1 * torch.randn(DIM, generator=g)
        sd[f"{name}.bias"] = 0.1 * torch.randn(DIM, generator=g)

    lin("update.c1.0", DIM, DIM), lin("update.c1.2", DIM, DIM)
    lin("update.c2.0", DIM, DIM), lin("update.c2.2", DIM, DIM)
    ln("update.norm")
    for agg in ("agg_kk", "agg_ij"):
        for f in "fgh":
            lin(f"update.{agg}.{f}", DIM, DIM)
    ln("update.gru.0"), ln("update.gru.2")
    for i in (1, 3):
        lin(f"update.gru.{i}.gate.0", DIM, DIM)
        lin(f"update.gru.{i}.res.0", DIM, DIM)
        lin(f"update.gru.{i}.res.2", DIM, DIM)
    lin("update.corr.0", 2 * 49 * 9, DIM)
    lin("update.corr.2", DIM, DIM)
    ln("update.corr.3")
    lin("update.corr.5", DIM, DIM)
    lin("update.d.1", DIM, 2)
    lin("update.w.1", DIM, 2)
    return sd


def test_update_matches_torch_oracle():
    rng = np.random.RandomState(0)
    E = 64
    net = rng.randn(E, DIM).astype(np.float32) * 0.5
    inp = rng.randn(E, DIM).astype(np.float32) * 0.5
    corr = rng.randn(E, 2 * 49 * 9).astype(np.float32) * 0.1
    ii = rng.randint(0, 5, E).astype(np.int64)
    jj = rng.randint(0, 5, E).astype(np.int64)
    kk = rng.randint(0, 12, E).astype(np.int64)

    sd = make_torch_state_dict()
    with torch.no_grad():
        net_t, delta_t, weight_t = torch_update_oracle(
            sd, torch.from_numpy(net), torch.from_numpy(inp),
            torch.from_numpy(corr), torch.from_numpy(ii),
            torch.from_numpy(jj), torch.from_numpy(kk),
        )

    variables, _ = map_state_dict(
        {k: v.numpy() for k, v in sd.items()}, "MultiScale"
    )
    m = Update(3)
    net_j, (delta_j, weight_j) = m.apply(
        {"params": variables["params"]["update"]},
        jnp.asarray(net), jnp.asarray(inp), jnp.asarray(corr),
        jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32),
        jnp.asarray(kk, jnp.int32),
    )

    np.testing.assert_allclose(np.asarray(net_j), net_t.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(delta_j), delta_t.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(weight_j), weight_t.numpy(),
                               atol=5e-4, rtol=1e-3)
