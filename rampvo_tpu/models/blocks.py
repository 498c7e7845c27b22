"""Network building blocks (ref: ramp/blocks.py).

SoftAgg replaces torch_scatter softmax-pooling with `jax.ops.segment_*`
(static segment counts, valid-masked for fixed-capacity edge tables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.scatter import compact_ids, segment_softmax, segment_sum


@jax.custom_vjp
def grad_clip(x):
    """Identity with backward grads NaN-zeroed and clamped to ±0.01
    (ref: ramp/blocks.py:76-91)."""
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


grad_clip.defvjp(_gc_fwd, _gc_bwd)


@jax.custom_vjp
def grad_zero(x):
    """Identity; backward zeroes NaNs and grads with |g| > 0.1
    (ref: ramp/blocks.py:93-109)."""
    return x


def _gz_fwd(x):
    return x, None


def _gz_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.where(jnp.abs(g) > 0.1, 0.0, g),)


grad_zero.defvjp(_gz_fwd, _gz_bwd)


class GatedResidual(nn.Module):
    """x + sigmoid(W_g x) * MLP(x)  (ref: ramp/blocks.py:15-31)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim, name="gate_fc")(x))
        res = nn.Dense(self.dim, name="res_fc2")(
            nn.relu(nn.Dense(self.dim, name="res_fc1")(x))
        )
        return x + gate * res


class SoftAgg(nn.Module):
    """Softmax attention-pooling over index groups (ref: ramp/blocks.py:33-50).

    x [E, D], ix [E] arbitrary int group ids; output [E, D] where each row
    receives its group's pooled value. `valid` masks fixed-capacity padding:
    invalid rows contribute nothing (their own output is garbage and must be
    ignored downstream).
    """

    dim: int

    @nn.compact
    def __call__(self, x, ix, valid=None, lattice=None, axis=None,
                 precompacted=False):
        E = x.shape[0]
        f = nn.Dense(self.dim, name="f")
        g = nn.Dense(self.dim, name="g")
        h = nn.Dense(self.dim, name="h")

        if lattice is not None:
            # dense formulation over the edge lattice [NI, T, M]: groups are
            # whole lattice axes (patch track kk -> axis 1, frame pair
            # ii/jj -> axis 2), so the softmax-pool is a masked reduction —
            # no compact_ids sort, no segment scatter, no unsort gather.
            NI, T, M = lattice
            xl = x.reshape(NI, T, M, x.shape[-1])
            vl = (
                jnp.ones((NI, T, M, 1), bool) if valid is None
                else valid.reshape(NI, T, M, 1)
            )
            gx = g(xl)
            mx = jnp.max(jnp.where(vl, gx, -jnp.inf), axis=axis, keepdims=True)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            ex = jnp.where(vl, jnp.exp(gx - mx), 0.0)
            denom = jnp.maximum(
                jnp.sum(ex, axis=axis, keepdims=True), 1e-20
            )
            y = jnp.sum(f(xl) * (ex / denom), axis=axis, keepdims=True)
            out = jnp.broadcast_to(h(y), xl.shape)
            return out.reshape(E, x.shape[-1])

        if precompacted:
            jx = ix.astype(jnp.int32)  # already dense ranks (static sched)
        else:
            jx = compact_ids(ix.astype(jnp.int32), capacity=E)
        w = segment_softmax(g(x), jx, num_segments=E, valid=valid)
        y = segment_sum(f(x) * w, jx, num_segments=E, valid=valid)
        return h(y)[jx]


class SoftAggBasic(nn.Module):
    """SoftAgg variant with a scalar attention logit
    (ref: ramp/blocks.py:52-69)."""

    dim: int

    @nn.compact
    def __call__(self, x, ix, valid=None):
        E = x.shape[0]
        f = nn.Dense(self.dim, name="f")
        g = nn.Dense(1, name="g")
        h = nn.Dense(self.dim, name="h")

        jx = compact_ids(ix.astype(jnp.int32), capacity=E)
        w = segment_softmax(g(x), jx, num_segments=E, valid=valid)
        y = segment_sum(f(x) * w, jx, num_segments=E, valid=valid)
        return h(y)[jx]


class LayerNorm1D(nn.Module):
    """LayerNorm over the channel dim of [B, C, L] inputs
    (ref: ramp/blocks.py:7-13)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = jnp.swapaxes(x, -1, -2)
        x = nn.LayerNorm(epsilon=1e-4)(x)
        return jnp.swapaxes(x, -1, -2)
