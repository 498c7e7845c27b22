"""Lie-group classes with operator sugar, registered as JAX pytrees.

API mirrors the surface the reference uses from lietorch
(ramp/lietorch/groups.py: SE3/SO3/Sim3/RxSO3, `*`, .inv(), .log(), .exp,
.act/act4 via `*` on points, .adjT, .matrix, .retr, .scale, indexing),
implemented over the functional kernels in `ops.py`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ops

__all__ = ["SO3", "SE3", "RxSO3", "Sim3"]


class _LieGroup:
    """Thin array wrapper; subclasses bind the functional ops."""

    N: int  # embedding dim
    K: int  # tangent dim

    def __init__(self, data: jnp.ndarray):
        self.data = jnp.asarray(data)

    # ---- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # ---- generic API ------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape[:-1]

    def __getitem__(self, index):
        return type(self)(self.data[index])

    def __repr__(self):
        return f"{type(self).__name__}(shape={self.shape})"

    @classmethod
    def exp(cls, xi):
        return cls(cls._exp(xi))

    def log(self):
        return self._log(self.data)

    def inv(self):
        return type(self)(self._inv(self.data))

    def mul(self, other):
        return type(self)(self._mul(self.data, other.data))

    def act(self, p):
        return self._act(self.data, p)

    def __mul__(self, other):
        if isinstance(other, _LieGroup):
            return self.mul(other)
        # group action on points: 4-vectors use act4 where defined
        other = jnp.asarray(other)
        if other.shape[-1] == 4 and hasattr(self, "_act4"):
            return self._act4(self.data, other)
        return self.act(other)

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        base = jnp.zeros(cls.N, dtype=dtype).at[cls._id_index].set(1.0)
        return cls(jnp.broadcast_to(base, tuple(shape) + (cls.N,)))

    @classmethod
    def IdentityLike(cls, other):
        return cls.Identity(*other.shape, dtype=other.data.dtype)

    def retr(self, xi):
        return type(self).exp(xi) * self


@jax.tree_util.register_pytree_node_class
class SO3(_LieGroup):
    N, K = 4, 3
    _id_index = 3
    _exp = staticmethod(ops.so3_exp)
    _log = staticmethod(ops.so3_log)
    _inv = staticmethod(ops.so3_inv)
    _mul = staticmethod(ops.so3_mul)
    _act = staticmethod(ops.so3_act)

    def matrix(self):
        from .quaternion import quat_to_matrix

        return quat_to_matrix(self.data)


@jax.tree_util.register_pytree_node_class
class SE3(_LieGroup):
    N, K = 7, 6
    _id_index = 6
    _exp = staticmethod(ops.se3_exp)
    _log = staticmethod(ops.se3_log)
    _inv = staticmethod(ops.se3_inv)
    _mul = staticmethod(ops.se3_mul)
    _act = staticmethod(ops.se3_act)
    _act4 = staticmethod(ops.se3_act4)

    def adj(self, x):
        return ops.se3_adj(self.data, x)

    def adjT(self, x):
        return ops.se3_adjT(self.data, x)

    def matrix(self):
        return ops.se3_matrix(self.data)

    def retr(self, xi):
        return SE3(ops.se3_retr(self.data, xi))

    def scale(self, s):
        """Scale the translation part (lietorch SE3.scale semantics)."""
        s = jnp.asarray(s)
        t = self.data[..., :3] * s[..., None] if s.ndim < self.data.ndim else self.data[..., :3] * s
        return SE3(jnp.concatenate([t, self.data[..., 3:7]], axis=-1))

    def translation(self):
        return self.data[..., :3]

    def normalize(self):
        return SE3(ops.se3_normalize(self.data))


@jax.tree_util.register_pytree_node_class
class RxSO3(_LieGroup):
    N, K = 5, 4
    _id_index = 3

    _exp = staticmethod(ops.rxso3_exp)
    _log = staticmethod(ops.rxso3_log)
    _inv = staticmethod(ops.rxso3_inv)
    _mul = staticmethod(ops.rxso3_mul)
    _act = staticmethod(ops.rxso3_act)

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        base = jnp.zeros(cls.N, dtype=dtype).at[3].set(1.0).at[4].set(1.0)
        return cls(jnp.broadcast_to(base, tuple(shape) + (cls.N,)))


@jax.tree_util.register_pytree_node_class
class Sim3(_LieGroup):
    N, K = 8, 7
    _id_index = 6

    _exp = staticmethod(ops.sim3_exp)
    _log = staticmethod(ops.sim3_log)
    _inv = staticmethod(ops.sim3_inv)
    _mul = staticmethod(ops.sim3_mul)
    _act = staticmethod(ops.sim3_act)

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        base = jnp.zeros(cls.N, dtype=dtype).at[6].set(1.0).at[7].set(1.0)
        return cls(jnp.broadcast_to(base, tuple(shape) + (cls.N,)))


def stack(groups, axis=0):
    """lietorch.stack equivalent."""
    cls = type(groups[0])
    return cls(jnp.stack([g.data for g in groups], axis=axis))
