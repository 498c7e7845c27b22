"""Lie-group identity + gradient tests.

Mirrors the assertion suite of the reference's ramp/lietorch/run_tests.py
(forward identities: Log∘Exp = id, X·X⁻¹ = I, adjoint identity, act == matrix)
as framework-agnostic specs, plus autodiff-vs-analytic checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rampvo_tpu.lie import SE3, SO3, RxSO3, Sim3, ops

GROUPS = [SO3, SE3, RxSO3, Sim3]
ATOL = 1e-5


def rand_tangent(cls, key, shape=(32,), scale=1.0):
    return scale * jax.random.normal(key, shape + (cls.K,))


def rand_group(cls, key, shape=(32,)):
    return cls.exp(rand_tangent(cls, key, shape))


@pytest.mark.parametrize("cls", GROUPS)
def test_exp_log_roundtrip(cls):
    key = jax.random.PRNGKey(0)
    a = rand_tangent(cls, key, scale=0.8)
    b = cls.exp(a).log()
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cls", GROUPS)
def test_exp_log_roundtrip_small_angle(cls):
    key = jax.random.PRNGKey(1)
    a = rand_tangent(cls, key, scale=1e-5)
    b = cls.exp(a).log()
    # f32 exp/log bottoms out near machine eps (Sim3 W-solve adds a few ulp);
    # a wrong Taylor branch would show up at ~1e-5 or as NaN.
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-4)


@pytest.mark.parametrize("cls", GROUPS)
def test_inv(cls):
    key = jax.random.PRNGKey(2)
    X = rand_group(cls, key)
    I = X * X.inv()
    expected = cls.Identity(*X.shape)
    np.testing.assert_allclose(I.data, expected.data, atol=ATOL)


@pytest.mark.parametrize("cls", GROUPS)
def test_mul_associative(cls):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    X, Y, Z = (rand_group(cls, k) for k in (k1, k2, k3))
    lhs = ((X * Y) * Z).data
    rhs = (X * (Y * Z)).data
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_se3_adjoint_identity():
    """X · Exp(a) == Exp(Adj_X a) · X  (run_tests.py:30-41 spec)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    X = rand_group(SE3, k1)
    a = rand_tangent(SE3, k2, X.shape, scale=0.5)
    lhs = (X * SE3.exp(a)).data
    rhs = (SE3.exp(X.adj(a)) * X).data
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_se3_adjT_is_transpose_of_adj():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    X = rand_group(SE3, k1, shape=(8,))
    a = jax.random.normal(k2, (8, 6))
    b = jax.random.normal(k3, (8, 6))
    # <Adj_X a, b> == <a, AdjT_X b>
    lhs = jnp.sum(X.adj(a) * b, axis=-1)
    rhs = jnp.sum(a * X.adjT(b), axis=-1)
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_se3_act_vs_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    X = rand_group(SE3, k1, shape=(16,))
    p = jax.random.normal(k2, (16, 3))
    ph = jnp.concatenate([p, jnp.ones((16, 1))], axis=-1)
    y1 = X.act(p)
    y2 = jnp.einsum("nij,nj->ni", X.matrix(), ph)[..., :3]
    np.testing.assert_allclose(y1, y2, atol=ATOL)


def test_se3_act4_homogeneous():
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    X = rand_group(SE3, k1, shape=(16,))
    ph = jax.random.normal(k2, (16, 4))
    y1 = X * ph
    y2 = jnp.einsum("nij,nj->ni", X.matrix(), ph)
    np.testing.assert_allclose(y1, y2, atol=1e-4)


def test_so3_act_vs_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    X = rand_group(SO3, k1, shape=(16,))
    p = jax.random.normal(k2, (16, 3))
    y1 = X.act(p)
    y2 = jnp.einsum("nij,nj->ni", X.matrix(), p)
    np.testing.assert_allclose(y1, y2, atol=ATOL)


@pytest.mark.parametrize("cls", GROUPS)
def test_exp_grad_finite_at_zero(cls):
    """Gradients through exp must be finite at the identity (Taylor branch)."""
    def f(xi):
        return jnp.sum(cls.exp(xi).data ** 2)

    g = jax.grad(f)(jnp.zeros(cls.K))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_log_grad_finite_near_identity():
    def f(xi):
        return jnp.sum(SE3.exp(xi).log() ** 2)

    g = jax.grad(f)(1e-6 * jnp.ones(6))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_numerical_jacobian():
    """Autodiff jacobian of exp matches finite differences (run_tests spec)."""
    xi = jnp.asarray([0.3, -0.2, 0.5, 0.1, -0.4, 0.25])
    J = jax.jacfwd(ops.se3_exp)(xi)
    eps = 1e-4
    for k in range(6):
        d = jnp.zeros(6).at[k].set(eps)
        fd = (ops.se3_exp(xi + d) - ops.se3_exp(xi - d)) / (2 * eps)
        np.testing.assert_allclose(J[:, k], fd, atol=1e-3)


def test_se3_scale():
    X = rand_group(SE3, jax.random.PRNGKey(9), shape=(4,))
    Y = X.scale(jnp.asarray(2.0))
    np.testing.assert_allclose(Y.data[..., :3], 2.0 * X.data[..., :3], atol=ATOL)
    np.testing.assert_allclose(Y.data[..., 3:], X.data[..., 3:], atol=ATOL)


def test_sim3_scale_action():
    """Sim3 with pure scale acts as s·p."""
    g = Sim3(jnp.asarray([0, 0, 0, 0, 0, 0, 1, 2.0]))
    p = jnp.asarray([1.0, -2.0, 3.0])
    np.testing.assert_allclose(g.act(p), 2.0 * p, atol=ATOL)


def test_jit_and_vmap_compatible():
    X = rand_group(SE3, jax.random.PRNGKey(10), shape=(8,))
    f = jax.jit(lambda g, p: g.act(p))
    p = jnp.ones((8, 3))
    np.testing.assert_allclose(f(X, p), X.act(p), atol=ATOL)

    g = jax.vmap(lambda d: SE3(d).log())(X.data)
    np.testing.assert_allclose(g, X.log(), atol=ATOL)
