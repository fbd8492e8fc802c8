"""Additional solver coverage: 1-D problems, 3-D primal-dual, robust data
losses through the full ADMM wrapper, TK1 with b_reg, interface paths."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from nsol_tpu.ops import conv as C
from nsol_tpu.ops import grad as G
from nsol_tpu.ops import kernels as K
from nsol_tpu.ops import prox as prox_ops
from nsol_tpu.interface import DeconvolutionSolverStudyInterface
from nsol_tpu.solvers.wrappers import (
    PrimalDualSolver, ADMMLinearSolver, TikhonovLinearSolver,
)


def test_pd_denoising_1d(rng):
    """1-D TV-L2 denoising: the reference's 1-D spike-signal scenario
    (tests/solvers_test.py:68-81)."""
    n = 100
    x_clean = np.zeros(n)
    x_clean[30:60] = 10.0
    b = x_clean + rng.randn(n)
    grad_op, grad_adj = G.make_gradient_operators()
    bj = jnp.asarray(b / b.max())
    solver = PrimalDualSolver(
        prox_f=lambda x, tau: prox_ops.prox_ell2_denoising(x, tau, bj),
        prox_g_conj=prox_ops.prox_tv_conj,
        B=grad_op, B_conj=grad_adj, L2=8, x0=np.array(b), alpha=1.0,
        iterations=50, x_scale=b.max())
    solver.run()
    x = solver.get_x()
    assert np.mean((x - x_clean) ** 2) < np.mean((b - x_clean) ** 2)


def test_pd_denoising_3d(rng):
    """3-D TV-L2 denoising (the reference hardcodes L2=8 even here)."""
    shape = (12, 14, 16)
    x_clean = np.zeros(shape)
    x_clean[3:9, 4:10, 5:11] = 5.0
    b = x_clean + 1.5 * rng.randn(*shape)
    grad_op, grad_adj = G.make_gradient_operators()
    bj = jnp.asarray(b / b.max())
    solver = PrimalDualSolver(
        prox_f=lambda x, tau: prox_ops.prox_ell2_denoising(x, tau, bj),
        prox_g_conj=prox_ops.prox_tv_conj,
        B=grad_op, B_conj=grad_adj, L2=8, x0=np.array(b), alpha=0.5,
        iterations=40, x_scale=b.max())
    solver.run()
    x = solver.get_x()
    assert np.mean((x - x_clean) ** 2) < np.mean((b - x_clean) ** 2)


@pytest.mark.parametrize("data_loss", ["soft_l1", "huber", "cauchy",
                                       "arctan"])
def test_admm_robust_losses(data_loss, rng):
    """Robust data losses through ADMM + box-L-BFGS inner solves: outliers
    in the data should corrupt the robust solution less than the linear
    one."""
    shape = (20, 20)
    cov = np.diag([0.8, 0.8])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    x_true = np.zeros(shape)
    x_true[5:15, 5:15] = 1.0
    b = ndi.convolve(x_true, kern, mode="wrap")
    # salt outliers
    b_corrupt = b.copy()
    idx = rng.choice(b.size, size=8, replace=False)
    b_corrupt.reshape(-1)[idx] += 20.0

    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, method="separable")
    Bg, Bg_adj = G.make_gradient_operators()

    def solve(loss):
        s = ADMMLinearSolver(
            A=A, A_adj=A_adj, b=b_corrupt, B=Bg, B_adj=Bg_adj,
            x0=np.array(b_corrupt), dimension=2, alpha=0.01, rho=0.5,
            iterations=10, iter_max=20, data_loss=loss,
            data_loss_scale=0.5,
            minimizer="lsmr" if loss == "linear" else "L-BFGS-B")
        s.run()
        return s.get_x()

    x_lin = solve("linear")
    x_rob = solve(data_loss)
    err_lin = np.mean((x_lin - x_true) ** 2)
    err_rob = np.mean((x_rob - x_true) ** 2)
    assert err_rob < err_lin, (err_rob, err_lin)


def test_tikhonov_tk1_with_b_reg(rng):
    """TK1 with a non-zero regularizer target: x-update drives D x toward
    b_reg (the ADMM inner-problem structure)."""
    shape = (16, 16)
    cov = np.diag([0.8, 0.8])
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, method="separable")
    Bg, Bg_adj = G.make_gradient_operators()
    x_true = rng.rand(*shape)
    b = np.asarray(A(jnp.asarray(x_true)))
    b_reg = np.asarray(G.gradient(jnp.asarray(x_true)))

    solver = TikhonovLinearSolver(
        A=A, A_adj=A_adj, b=b, B=Bg, B_adj=Bg_adj, b_reg=b_reg,
        x0=np.zeros(shape), alpha=1.0, iter_max=100)
    solver.run()
    x = solver.get_x()
    np.testing.assert_allclose(x, x_true, atol=0.05)


def test_interface_huberl2_runs(rng):
    b = rng.rand(20, 20) * 10
    cov = np.diag([0.8, 0.8])
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, method="separable")
    Bg, Bg_adj = G.make_gradient_operators()
    iface = DeconvolutionSolverStudyInterface(
        A=A, A_adj=A_adj, D=Bg, D_adj=Bg_adj, b=b, x0=np.array(b),
        alpha=0.05, x_scale=b.max(), iter_max=5, iterations=10,
        minimizer="lsmr", measures=[], reconstruction_type="HuberL2",
        dimension=2)
    iface.set_up_solver()
    iface.set_up_measures()
    solver = iface.get_solver()
    solver.run()
    assert np.isfinite(solver.get_x()).all()
    m = iface.get_measures()
    assert "Reg" in m and "Data" in m
    assert np.isfinite(float(m["Reg"](jnp.asarray(b))))


def test_interface_x_ref_mask(rng):
    """Masked similarity measures (reference …interface.py:183-199)."""
    b = rng.rand(16, 16)
    x_ref = rng.rand(16, 16)
    mask = np.zeros((16, 16))
    mask[4:12, 4:12] = 1
    Bg, Bg_adj = G.make_gradient_operators()
    ident = lambda z: z
    iface = DeconvolutionSolverStudyInterface(
        A=ident, A_adj=ident, D=Bg, D_adj=Bg_adj, b=b, x0=np.array(b),
        alpha=0.05, x_scale=1.0, iter_max=5, iterations=5,
        minimizer="lsmr", measures=["RMSE"],
        reconstruction_type="TK0L2", dimension=2, x_ref=x_ref,
        x_ref_mask=mask)
    iface.set_up_solver()
    iface.set_up_measures()
    m = iface.get_measures()
    got = float(m["RMSE"](jnp.asarray(b)))
    want = np.sqrt(np.mean((b[mask > 0] - x_ref[mask > 0]) ** 2))
    np.testing.assert_almost_equal(got, want, decimal=10)
