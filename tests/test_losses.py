"""Loss-function tests: vectorized jnp losses vs scalar reference math.

Ports tests/loss_functions_test.py:44-125 (loss/gradient vs a scalar
loop-reference) and :181-238 (residual→cost/gradient helpers vs analytic
least-squares formulas).
"""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from nsol_tpu.ops import losses as lf

DECIMALS = 10
LOSS_NAMES = ["linear", "soft_l1", "huber", "cauchy", "arctan"]


def _scalar_loss(name, f2, f_scale):
    """Independent scalar re-derivation of each loss (math module only)."""
    z = f2 / f_scale ** 2
    if name == "linear":
        return f2
    if name == "soft_l1":
        return 2.0 * (math.sqrt(1.0 + z) - 1.0) * f_scale ** 2
    if name == "huber":
        g = 1.345
        body = z if z < g * g else 2.0 * g * math.sqrt(z) - g * g
        return body * f_scale ** 2
    if name == "cauchy":
        return math.log1p(z) * f_scale ** 2
    if name == "arctan":
        return math.atan(z) * f_scale ** 2


def _scalar_gradient(name, f2, f_scale):
    z = f2 / f_scale ** 2
    if name == "linear":
        return 1.0
    if name == "soft_l1":
        return 1.0 / math.sqrt(1.0 + z)
    if name == "huber":
        g = 1.345
        return 1.0 if z < g * g else g / math.sqrt(z)
    if name == "cauchy":
        return 1.0 / (1.0 + z)
    if name == "arctan":
        return 1.0 / (1.0 + z * z)


@pytest.mark.parametrize("name", LOSS_NAMES)
@pytest.mark.parametrize("f_scale", [1.0, 0.7, 2.3])
def test_loss_vs_scalar_reference(name, f_scale, rng):
    f2 = rng.rand(200) * 10.0
    ours = np.asarray(lf.LOSSES[name](jnp.asarray(f2), f_scale=f_scale))
    ref = np.array([_scalar_loss(name, v, f_scale) for v in f2])
    np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)


@pytest.mark.parametrize("name", LOSS_NAMES)
@pytest.mark.parametrize("f_scale", [1.0, 0.7, 2.3])
def test_gradient_loss_vs_scalar_reference(name, f_scale, rng):
    f2 = rng.rand(200) * 10.0
    ours = np.asarray(
        lf.GRADIENT_LOSSES[name](jnp.asarray(f2), f_scale=f_scale))
    ref = np.array([_scalar_gradient(name, v, f_scale) for v in f2])
    np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)


@pytest.mark.parametrize("name", LOSS_NAMES)
def test_gradient_is_derivative_of_loss(name, rng):
    """ρ'(f²) == dρ/d(f²) by central differences."""
    f2 = rng.rand(50) * 5.0 + 0.1
    eps = 1e-6
    num = (np.asarray(lf.LOSSES[name](jnp.asarray(f2 + eps)))
           - np.asarray(lf.LOSSES[name](jnp.asarray(f2 - eps)))) / (2 * eps)
    ana = np.asarray(lf.GRADIENT_LOSSES[name](jnp.asarray(f2)))
    np.testing.assert_array_almost_equal(num, ana, decimal=6)


def test_cost_from_residual_least_squares(rng):
    """½‖Ax−b‖² and its gradient vs analytic formulas on random A, b, x
    (ports tests/loss_functions_test.py:181-238)."""
    m, n = 30, 20
    A = rng.rand(m, n)
    b = rng.rand(m)
    x = rng.rand(n)
    r = A.dot(x) - b
    cost = float(lf.cost_from_residual(jnp.asarray(r)))
    np.testing.assert_almost_equal(cost, 0.5 * np.sum(r ** 2),
                                   decimal=DECIMALS)
    w = np.asarray(lf.gradient_cost_from_residual(jnp.asarray(r)))
    grad = A.T.dot(w)
    np.testing.assert_array_almost_equal(grad, A.T.dot(r), decimal=DECIMALS)
