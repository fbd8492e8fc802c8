"""Proximal-operator tests vs independent numpy evaluation of the reference
formulas (nsol/proximal_operators.py, nsol/admm_linear_solver.py:239-253)."""

import numpy as np
import jax.numpy as jnp

from nsol_tpu.ops import prox


def test_soft_threshold(rng):
    t = rng.randn(100) * 2
    ours = np.asarray(prox.soft_threshold(jnp.asarray(t), 0.7))
    ref = np.maximum(np.abs(t) - 0.7, 0) * np.sign(t)
    np.testing.assert_array_almost_equal(ours, ref, decimal=12)


def test_prox_ell1_denoising(rng):
    x = rng.randn(50)
    x0 = rng.randn(50) * 3
    ours = np.asarray(
        prox.prox_ell1_denoising(jnp.asarray(x), 0.3, jnp.asarray(x0),
                                 x_scale=2.0))
    x0s = x0 / 2.0
    ref = x0s + np.maximum(np.abs(x - x0s) - 0.3, 0) * np.sign(x - x0s)
    np.testing.assert_array_almost_equal(ours, ref, decimal=12)


def test_prox_ell2_denoising(rng):
    x = rng.randn(50)
    x0 = rng.randn(50)
    ours = np.asarray(
        prox.prox_ell2_denoising(jnp.asarray(x), 0.4, jnp.asarray(x0)))
    np.testing.assert_array_almost_equal(ours, (x + 0.4 * x0) / 1.4,
                                         decimal=12)


def test_prox_tv_conj_componentwise(rng):
    """Componentwise projection quirk preserved
    (nsol/proximal_operators.py:138-140)."""
    x = rng.randn(4, 10) * 3
    ours = np.asarray(prox.prox_tv_conj(jnp.asarray(x), 0.5))
    ref = x / np.maximum(1, np.abs(x))
    np.testing.assert_array_almost_equal(ours, ref, decimal=12)


def test_prox_huber_conj(rng):
    x = rng.randn(30) * 3
    sigma, gamma = 0.8, 0.05
    ours = np.asarray(prox.prox_huber_conj(jnp.asarray(x), sigma, gamma))
    y = x / (1.0 + sigma * gamma)
    ref = y / np.maximum(1, np.abs(y))
    np.testing.assert_array_almost_equal(ours, ref, decimal=12)


def test_prox_huber_conj_does_not_mutate(rng):
    """The reference mutates its input in place (x /= ...); we are
    functional."""
    x = jnp.asarray(rng.randn(10))
    x_before = np.array(x)
    prox.prox_huber_conj(x, 0.5)
    np.testing.assert_array_equal(np.asarray(x), x_before)


def test_vectorial_soft_threshold_matches_reference(rng):
    """Grouped shrinkage vs the reference's split/threshold/rescale loop
    (nsol/admm_linear_solver.py:239-253)."""
    d, shape = 3, (8, 9)
    t = rng.randn(d, *shape) * 2
    tau = 0.9
    ours = np.asarray(prox.vectorial_soft_threshold(jnp.asarray(t), tau))

    t_norm = np.sqrt(np.sum(t ** 2, axis=0))
    ind = t_norm > tau
    ref = np.zeros_like(t)
    for i in range(d):
        comp = np.zeros(shape)
        st = np.maximum(np.abs(t_norm[ind]) - tau, 0) * np.sign(t_norm[ind])
        comp[ind] = st * t[i][ind] / t_norm[ind]
        ref[i] = comp
    np.testing.assert_array_almost_equal(ours, ref, decimal=12)
