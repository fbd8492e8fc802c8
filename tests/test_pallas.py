"""Pallas kernel correctness in interpreter mode (CPU).

The production Pallas path is the fused VMEM-resident ADMM solver
(nsol_tpu/ops/pallas/fused.py — whole solve in one program, real-TPU
benchmarked in BASELINE.md); these tests pin its parity against the XLA
implementation. The earlier experimental lane-axis-roll blur kernel was
retired (supersession recorded in BASELINE.md).
"""

import numpy as np
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from nsol_tpu.ops import conv as C
from nsol_tpu.ops import kernels as K


def test_fused_admm_kernel_matches_xla_path(rng):
    """The fused VMEM-resident ADMM kernel (whole solve in one Pallas
    program) must match admm_solve(minimizer='cg') with the same MXU
    operators — same algorithm, same guards, step for step."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import separable_factors
    from nsol_tpu.ops.pallas.fused import (
        make_fused_admm_solver, fused_admm_fits_vmem,
    )
    from nsol_tpu.solvers.admm import admm_solve

    shape = (16, 16, 16)
    assert fused_admm_fits_vmem(shape)
    cov = np.diag([1.0, 1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)

    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nA = MM.matmul_convolve_fn(
        [np.convolve(f, f[::-1]) for f in factors], shape, np.float32)
    nB = MM.matmul_gradient_normal_fn(shape, dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()

    bj = jnp.asarray(b)
    br = jnp.zeros((3,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=5, iter_max=6,
        minimizer="cg", normal_A=nA, normal_B=nB))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))

    solve = make_fused_admm_solver(shape, cov, iterations=5, iter_max=6,
                                   dtype=jnp.float32, interpret=True)
    x_fused = solve(b, b, 0.01, 0.5)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_admm_kernel_2d(rng):
    """2-D variant of the fused kernel parity check."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import separable_factors
    from nsol_tpu.ops.pallas.fused import make_fused_admm_solver
    from nsol_tpu.solvers.admm import admm_solve

    shape = (24, 20)
    cov = np.diag([0.8, 0.8]) ** 2
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    b = ndi.convolve(rng.rand(*shape), kern, mode="wrap").astype(np.float32)

    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nA = MM.matmul_convolve_fn(
        [np.convolve(f, f[::-1]) for f in factors], shape, np.float32)
    nB = MM.matmul_gradient_normal_fn(shape, dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()

    bj = jnp.asarray(b)
    br = jnp.zeros((2,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=4, iter_max=5,
        minimizer="cg", normal_A=nA, normal_B=nB))(
            bj, br, bj, jnp.float32(0.02), jnp.float32(0.5))

    solve = make_fused_admm_solver(shape, cov, iterations=4, iter_max=5,
                                   dtype=jnp.float32, interpret=True)
    x_fused = solve(b, b, 0.02, 0.5)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref),
                               atol=2e-5, rtol=1e-5)
