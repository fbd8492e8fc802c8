"""Tests for the Optimize escape-hatch collection (the reference's
nsol/optimize.py counterpart — ours is tested, theirs was dead code)."""

import numpy as np
import jax.numpy as jnp

from nsol_tpu.optimize import Optimize


def test_lsmr_solves_least_squares(rng):
    M = rng.rand(30, 20)
    x_true = rng.rand(20)
    b = M @ x_true
    A = lambda x: jnp.asarray(M) @ x
    A_adj = lambda y: jnp.asarray(M.T) @ y
    x = np.asarray(Optimize.lsmr(A, A_adj, jnp.asarray(b), iter_max=200))
    np.testing.assert_allclose(x, x_true, atol=1e-7)


def test_cg_solves_spd(rng):
    Q = rng.rand(15, 15)
    M = Q.T @ Q + 5 * np.eye(15)
    x_true = rng.rand(15)
    b = M @ x_true
    x = np.asarray(Optimize.cg(lambda v: jnp.asarray(M) @ v,
                               jnp.asarray(b), iter_max=100))
    np.testing.assert_allclose(x, x_true, atol=1e-8)


def test_nnls_projects(rng):
    M = rng.rand(25, 10)
    b = rng.rand(25)
    x = np.asarray(Optimize.nnls(lambda x: jnp.asarray(M) @ x,
                                 lambda y: jnp.asarray(M.T) @ y,
                                 jnp.asarray(b), iter_max=100))
    assert (x >= 0).all()


def test_minimize_quadratic(rng):
    c = rng.rand(12)

    def fun(x):
        return jnp.sum((x - jnp.asarray(c)) ** 2)

    x = np.asarray(Optimize.minimize(fun, jnp.zeros(12), iter_max=100))
    np.testing.assert_allclose(x, c, atol=1e-5)


def test_least_squares_residual(rng):
    M = rng.rand(20, 8)
    x_true = np.abs(rng.rand(8))
    b = M @ x_true

    def fun(x):
        return jnp.asarray(M) @ x - jnp.asarray(b)

    x = np.asarray(Optimize.least_squares(
        fun, jnp.zeros(8), bounds=(0, np.inf), iter_max=200))
    np.testing.assert_allclose(M @ x, b, atol=1e-4)


def test_nnls_matches_scipy_objective(rng):
    """Optimize.nnls (projected-Newton sweeps) vs scipy.optimize.nnls on a
    problem whose unconstrained optimum has negative entries, so the
    constraint is genuinely active."""
    import scipy.optimize

    M = rng.rand(30, 12)
    x_signed = rng.rand(12) - 0.6  # several negative coordinates
    b = M @ x_signed + 0.05 * rng.randn(30)
    x_scipy, r_scipy = scipy.optimize.nnls(M, b)
    assert (np.linalg.lstsq(M, b, rcond=None)[0] < 0).any()

    x = np.asarray(Optimize.nnls(lambda v: jnp.asarray(M) @ v,
                                 lambda y: jnp.asarray(M.T) @ y,
                                 jnp.asarray(b), iter_max=40, cg_iters=12))
    assert (x >= 0).all()
    r_ours = np.linalg.norm(M @ x - b)
    assert r_ours <= r_scipy * 1.001
