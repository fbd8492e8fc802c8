"""Tier-1 mathematical-property tests for the operator layer.

Ports the reference test strategy (tests/kernels_test.py): adjointness of
every operator pair to 1e-10 via the dot-product test
``|<Ax, y> - <x, Aᵀy>| ≈ 0``, kernel/spacing scaling, gradient = stacked
per-axis derivatives — plus parity of our jnp operators against the
scipy.ndimage oracle the reference is built on.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nsol_tpu.ops import kernels as K
from nsol_tpu.ops import grad as G
from nsol_tpu.ops import conv as C

DECIMALS = 10
SHAPES = {1: (50,), 2: (40, 50), 3: (20, 30, 40)}
SPACINGS = {1: [2.0], 2: [1.5, 2.0], 3: [1.5, 2.0, 0.7]}


def _vdot(a, b):
    return float(np.sum(np.asarray(a, dtype=np.float64)
                        * np.asarray(b, dtype=np.float64)))


# ---------------------------------------------------------------- kernels

@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_gaussian_kernel_normalized_and_symmetric(ndim, rng):
    cov = np.diag([1.3, 2.1, 0.8][:ndim]) ** 2
    spacing = np.asarray(SPACINGS[ndim])
    k = K.gaussian_kernel(cov if ndim > 1 else cov[0, 0],
                          alpha_cut=3, spacing=spacing)
    assert k.ndim == ndim
    np.testing.assert_almost_equal(k.sum(), 1.0, decimal=12)
    for ax in range(ndim):
        np.testing.assert_array_almost_equal(k, np.flip(k, axis=ax),
                                             decimal=14)
    assert all(s % 2 == 1 for s in k.shape)


def test_gaussian_kernel_matches_reference_construction_2d():
    """Cross-check the quirky axis pairing against a literal re-evaluation of
    the reference formula (nsol/kernels.py:120-158)."""
    cov = np.diag([1.2, 2.3]) ** 2
    spacing = np.array([1.1, 0.9])
    k = K.gaussian_kernel(cov, alpha_cut=3, spacing=spacing)

    x_max, y_max = np.ceil(np.sqrt(cov.diagonal()) * 3 / spacing)
    xs = np.arange(-x_max, x_max + 1)
    ys = np.arange(-y_max, y_max + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.array([Y.flatten(), X.flatten()])
    S = np.diag(spacing)
    M = S.dot(np.linalg.inv(cov)).dot(S)
    vals = np.sum(pts * M.dot(pts), 0)
    ref = np.exp(-0.5 * vals)
    ref = (ref / ref.sum()).reshape(xs.size, ys.size)
    np.testing.assert_array_almost_equal(k, ref, decimal=14)


# ----------------------------------------------------------- conv parity

@pytest.mark.parametrize("ndim", [1, 2, 3])
@pytest.mark.parametrize("mode", ["wrap", "constant"])
def test_convolve_matches_ndimage(ndim, mode, rng):
    x = rng.rand(*SHAPES[ndim])
    cov = np.diag([1.3, 0.9, 1.1][:ndim]) ** 2
    k = K.gaussian_kernel(cov if ndim > 1 else cov[0, 0], alpha_cut=2,
                          spacing=np.ones(ndim))
    ours = np.asarray(C.convolve(jnp.asarray(x), k, mode=mode))
    ref = ndi.convolve(x, k, mode=mode)
    np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_convolve_even_kernel_matches_ndimage(ndim, rng):
    """Origin convention for even kernels (forward difference)."""
    x = rng.rand(*SHAPES[ndim])
    for axis in range(ndim):
        kf = K.forward_difference_kernel(axis, ndim, spacing=1.7)
        ours = np.asarray(C.convolve(jnp.asarray(x), kf, mode="constant"))
        ref = ndi.convolve(x, kf, mode="constant")
        np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_fft_blur_matches_ndimage_wrap(ndim, rng):
    x = rng.rand(*SHAPES[ndim])
    cov = np.diag([1.5, 1.0, 0.8][:ndim]) ** 2
    spacing = np.asarray(SPACINGS[ndim])
    k = K.gaussian_kernel(cov if ndim > 1 else cov[0, 0], alpha_cut=3,
                          spacing=spacing)
    A, A_adj = C.make_blur_operators(
        cov if ndim > 1 else cov[0, 0], alpha_cut=3, spacing=spacing,
        shape=x.shape, method="fft")
    ours = np.asarray(A(jnp.asarray(x)))
    ref = ndi.convolve(x, k, mode="wrap")
    np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)


# ------------------------------------------------------------ adjointness

@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_separable_blur_matches_ndimage_wrap(ndim, rng):
    x = rng.rand(*SHAPES[ndim])
    cov = np.diag([1.5, 1.0, 0.8][:ndim]) ** 2
    spacing = np.asarray(SPACINGS[ndim])
    k = K.gaussian_kernel(cov if ndim > 1 else cov[0, 0], alpha_cut=3,
                          spacing=spacing)
    A, A_adj = C.make_blur_operators(
        cov if ndim > 1 else cov[0, 0], alpha_cut=3, spacing=spacing,
        method="separable")
    ours = np.asarray(A(jnp.asarray(x)))
    ref = ndi.convolve(x, k, mode="wrap")
    np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)


def test_separable_factors_rejects_full_covariance():
    cov = np.array([[2.0, 0.8], [0.8, 1.5]])
    k = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    assert C.separable_factors(k) is None


@pytest.mark.parametrize("ndim", [1, 2, 3])
@pytest.mark.parametrize("method", ["fft", "direct", "separable"])
def test_blur_adjointness(ndim, method, rng):
    """|<Ax,y> - <x,Aᵀy>| ≈ 0 to 10 decimals
    (ports tests/kernels_test.py:138-170)."""
    shape = SHAPES[ndim]
    x = rng.rand(*shape)
    y = rng.rand(*shape)
    cov = np.diag([1.5, 1.0, 0.8][:ndim]) ** 2
    A, A_adj = C.make_blur_operators(
        cov if ndim > 1 else cov[0, 0], alpha_cut=3,
        spacing=SPACINGS[ndim], shape=shape, method=method)
    lhs = _vdot(A(jnp.asarray(x)), y)
    rhs = _vdot(x, A_adj(jnp.asarray(y)))
    np.testing.assert_almost_equal(lhs, rhs, decimal=DECIMALS)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_gradient_adjointness(ndim, rng):
    """Ports tests/kernels_test.py:172-220 for the stacked gradient pair."""
    shape = SHAPES[ndim]
    x = rng.rand(*shape)
    y = rng.rand(ndim, *shape)
    spacing = SPACINGS[ndim]
    lhs = _vdot(G.gradient(jnp.asarray(x), spacing), y)
    rhs = _vdot(x, G.gradient_adjoint(jnp.asarray(y), spacing))
    np.testing.assert_almost_equal(lhs, rhs, decimal=DECIMALS)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_gradient_matches_ndimage_stencils(ndim, rng):
    """Component i of gradient == ndimage convolve with the forward-difference
    kernel of spatial direction i (ports tests/kernels_test.py:222-301)."""
    x = rng.rand(*SHAPES[ndim])
    spacing = SPACINGS[ndim]
    g = np.asarray(G.gradient(jnp.asarray(x), spacing))
    for i in range(ndim):
        axis = ndim - 1 - i
        kf = K.forward_difference_kernel(axis, ndim, spacing=spacing[i])
        ref = ndi.convolve(x, kf, mode="constant")
        np.testing.assert_array_almost_equal(g[i], ref, decimal=DECIMALS)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_gradient_adjoint_is_minus_backward_difference(ndim, rng):
    """Adjoint of forward difference = -backward difference
    (reference: nsol/linear_operators.py:98-106)."""
    y = rng.rand(*SHAPES[ndim])
    spacing = SPACINGS[ndim]
    for i in range(ndim):
        axis = ndim - 1 - i
        ours = np.asarray(
            G.forward_difference_adjoint(jnp.asarray(y), axis)) / spacing[i]
        kb = K.backward_difference_kernel(axis, ndim, spacing=spacing[i])
        ref = ndi.convolve(y, -kb, mode="constant")
        np.testing.assert_array_almost_equal(ours, ref, decimal=DECIMALS)
