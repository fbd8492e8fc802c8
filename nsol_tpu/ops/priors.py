"""Regularizer (prior) cost evaluation.

jnp re-expression of the reference's ``PriorMeasures``
(nsol/prior_measures.py:18-52) on shaped arrays. The differential operator
``D`` is expected to return the stacked ``(d, *shape)`` gradient field of
:func:`nsol_tpu.ops.grad.gradient`.
"""

import jax.numpy as jnp

from nsol_tpu.ops import losses

__all__ = [
    "zeroth_order_tikhonov", "first_order_tikhonov",
    "total_variation", "huber",
]

#: Default Huber smoothing for the regularizer — note: differs from the
#: data-loss default 1.345 (reference: nsol/prior_measures.py:43 vs
#: nsol/loss_functions.py:149).
HUBER_PRIOR_GAMMA = 0.05


def zeroth_order_tikhonov(x):
    """TK0: ``½‖x‖²`` (reference: nsol/prior_measures.py:19-20)."""
    return 0.5 * jnp.sum(x * x)


def first_order_tikhonov(x, D):
    """TK1: ``½‖Dx‖²`` (reference: nsol/prior_measures.py:23-24)."""
    Dx = D(x)
    return 0.5 * jnp.sum(Dx * Dx)


def total_variation(x, D):
    """Isotropic TV: ``Σ √(Σ_k (Dx)_k²)``
    (reference: nsol/prior_measures.py:27-37)."""
    Dx = D(x)
    return jnp.sum(jnp.sqrt(jnp.sum(Dx * Dx, axis=0)))


def huber(x, D, gamma=HUBER_PRIOR_GAMMA):
    """Huber of the gradient magnitude, ``½ Σ ρ_huber(‖Dx‖²)``
    (reference: nsol/prior_measures.py:40-52, reusing LossFunctions.huber)."""
    Dx = D(x)
    mag2 = jnp.sum(Dx * Dx, axis=0)
    return 0.5 * jnp.sum(losses.huber(mag2, gamma=gamma))
