"""Tests for the fused normal operators and the normal-equation CG path."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nsol_tpu.ops import conv as C
from nsol_tpu.ops import grad as G
from nsol_tpu.ops import kernels as K
from nsol_tpu.solvers.tikhonov import tikhonov_solve
from nsol_tpu.solvers.admm import admm_solve

SHAPES = {1: (50,), 2: (40, 50), 3: (20, 30, 40)}
SPACINGS = {1: [2.0], 2: [1.5, 2.0], 3: [1.5, 2.0, 0.7]}


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_normal_blur_equals_composition(ndim, rng):
    x = rng.rand(*SHAPES[ndim])
    cov = np.diag([1.5, 1.0, 0.8][:ndim]) ** 2
    spacing = SPACINGS[ndim]
    A, A_adj = C.make_blur_operators(
        cov if ndim > 1 else cov[0, 0], alpha_cut=3, spacing=spacing,
        method="separable")
    nA = C.make_normal_blur_operator(
        cov if ndim > 1 else cov[0, 0], alpha_cut=3, spacing=spacing)
    ours = np.asarray(nA(jnp.asarray(x)))
    ref = np.asarray(A_adj(A(jnp.asarray(x))))
    np.testing.assert_array_almost_equal(ours, ref, decimal=10)


def test_normal_blur_fft_fallback_full_covariance(rng):
    x = rng.rand(24, 26)
    cov = np.array([[2.0, 0.6], [0.6, 1.5]])
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, shape=x.shape,
                                     method="fft")
    nA = C.make_normal_blur_operator(cov, alpha_cut=3, shape=x.shape)
    ours = np.asarray(nA(jnp.asarray(x)))
    ref = np.asarray(A_adj(A(jnp.asarray(x))))
    np.testing.assert_array_almost_equal(ours, ref, decimal=10)


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_gradient_normal_equals_composition(ndim, rng):
    x = rng.rand(*SHAPES[ndim])
    spacing = SPACINGS[ndim]
    ours = np.asarray(G.gradient_normal(jnp.asarray(x), spacing))
    ref = np.asarray(G.gradient_adjoint(
        G.gradient(jnp.asarray(x), spacing), spacing))
    np.testing.assert_array_almost_equal(ours, ref, decimal=10)


def test_tikhonov_cg_matches_cgls(rng):
    """Normal-equation CG and augmented CGLS agree on the converged
    Tikhonov solution."""
    shape = (24, 24)
    cov = np.diag([1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    b = ndi.convolve(rng.rand(*shape), kern, mode="wrap")
    alpha = 0.05

    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, method="separable")
    nA = C.make_normal_blur_operator(cov, alpha_cut=3)
    ident = lambda z: z

    x_cgls = np.asarray(tikhonov_solve(
        A, A_adj, ident, ident, jnp.asarray(b), 0.0, jnp.zeros(shape),
        alpha, minimizer="lsmr", iter_max=200))
    x_cg = np.asarray(tikhonov_solve(
        A, A_adj, ident, ident, jnp.asarray(b), 0.0, jnp.zeros(shape),
        alpha, minimizer="cg", iter_max=200, normal_A=nA))
    np.testing.assert_allclose(x_cg, x_cgls, atol=1e-8)


def test_admm_cg_normal_objective_parity(rng):
    """ADMM with the fused normal-equation inner CG reaches the same
    objective as the CGLS inner solver."""
    shape = (24, 24)
    cov = np.diag([1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    x_true = np.zeros(shape)
    x_true[6:18, 6:18] = 1.0
    b = ndi.convolve(x_true, kern, mode="wrap") + 0.02 * rng.randn(*shape)
    alpha, rho = 0.01, 0.5

    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, method="separable")
    nA = C.make_normal_blur_operator(cov, alpha_cut=3)
    Bg, Bg_adj = G.make_gradient_operators()

    def objective(v):
        v = np.asarray(v)
        r = ndi.convolve(v, kern, mode="wrap") - b
        g = np.asarray(G.gradient(jnp.asarray(v)))
        return 0.5 * np.sum(r ** 2) + alpha * np.sum(
            np.sqrt(np.sum(g ** 2, axis=0)))

    x_cgls, _ = admm_solve(A, A_adj, Bg, Bg_adj, jnp.asarray(b), 0.0,
                           jnp.asarray(b), alpha, rho, iterations=20,
                           iter_max=10, minimizer="lsmr")
    x_cg, _ = admm_solve(A, A_adj, Bg, Bg_adj, jnp.asarray(b), 0.0,
                         jnp.asarray(b), alpha, rho, iterations=20,
                         iter_max=10, minimizer="cg", normal_A=nA,
                         normal_B=G.gradient_normal)
    np.testing.assert_allclose(objective(x_cg), objective(x_cgls),
                               rtol=1e-3)