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


def _pd_reference(shape, rtype, alg_type, b, alpha, L2, iterations,
                  rng=None):
    """XLA-path PD denoise with the exact CLI prox wiring."""
    from functools import partial
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops import prox as prox_ops
    from nsol_tpu.solvers.primal_dual import primal_dual_solve

    bj = jnp.asarray(b)
    if rtype.endswith("L1"):
        prox_f = lambda x, tau: prox_ops.prox_ell1_denoising(x, tau, bj)
    else:
        prox_f = lambda x, tau: prox_ops.prox_ell2_denoising(x, tau, bj)
    prox_g_conj = (prox_ops.prox_tv_conj if rtype.startswith("TV")
                   else prox_ops.prox_huber_conj)
    grad_op, grad_adj = G.make_gradient_operators()
    x, _ = jax.jit(partial(
        primal_dual_solve, prox_f, prox_g_conj, grad_op, grad_adj,
        iterations=iterations, alg_type=alg_type))(
            bj, jnp.float32(alpha), jnp.float32(L2))
    return np.asarray(x)


def test_fused_pd_denoise_kernel_matches_xla_path(rng):
    """Fused VMEM PD denoiser == primal_dual_solve for every
    reconstruction type and step-size schedule (2-D)."""
    from nsol_tpu.ops.pallas.fused import (
        make_fused_pd_denoise_solver, fused_pd_fits_vmem,
    )

    shape = (24, 16)
    assert fused_pd_fits_vmem(shape)
    b = rng.rand(*shape).astype(np.float32)

    for rtype, alg in (("TVL2", "ALG2"), ("TVL1", "ALG2"),
                       ("HuberL2", "ALG3"), ("HuberL1", "ALG2_AHMOD"),
                       ("TVL2", "ALG3"), ("HuberL2", "ALG2")):
        x_ref = _pd_reference(shape, rtype, alg, b, 0.3, 8.0, 12)
        solve = make_fused_pd_denoise_solver(
            shape, rtype, alg_type=alg, iterations=12, interpret=True)
        x_fused = np.asarray(solve(b, b, 0.3, 8.0))
        np.testing.assert_allclose(x_fused, x_ref, atol=2e-6, rtol=1e-5,
                                   err_msg="%s/%s" % (rtype, alg))


def test_fused_pd_denoise_kernel_3d(rng):
    """3-D variant (the reference's L2=8-even-in-3-D quirk rides the
    runtime L2 scalar, so the kernel is agnostic to it)."""
    from nsol_tpu.ops.pallas.fused import make_fused_pd_denoise_solver

    shape = (12, 16, 16)
    b = rng.rand(*shape).astype(np.float32)
    x_ref = _pd_reference(shape, "TVL2", "ALG2", b, 0.5, 8.0, 8)
    solve = make_fused_pd_denoise_solver(
        shape, "TVL2", alg_type="ALG2", iterations=8, interpret=True)
    np.testing.assert_allclose(np.asarray(solve(b, b, 0.5, 8.0)), x_ref,
                               atol=2e-6, rtol=1e-5)


def test_fused_pd_denoise_alpha_sweep_no_retrace(rng):
    """alpha/L2 are runtime scalars: two different alphas through the SAME
    solve callable must both match the XLA path."""
    from nsol_tpu.ops.pallas.fused import make_fused_pd_denoise_solver

    shape = (16, 16)
    b = rng.rand(*shape).astype(np.float32)
    solve = make_fused_pd_denoise_solver(
        shape, "TVL2", alg_type="ALG2", iterations=10, interpret=True)
    for alpha in (0.1, 0.9):
        x_ref = _pd_reference(shape, "TVL2", "ALG2", b, alpha, 8.0, 10)
        np.testing.assert_allclose(np.asarray(solve(b, b, alpha, 8.0)),
                                   x_ref, atol=2e-6, rtol=1e-5)


def test_fused_pd_denoise_compact_state(rng):
    """Opt-in ``compact=True`` (bf16-stored x/x̄/p, f32 arithmetic on the
    bf16-exact upcasts, exact1 single-pass difference matmuls): the PD
    iterate has no exact outer correction, so — unlike the ADMM kernel's
    compact_dirs — the iterate itself is perturbed at the bf16 rounding
    class. Gates: voxel deviation ≲1e-2 relative; converged-objective
    deviation ≲0.5 % for the smooth L2 data term and ≲2 % for the SAD
    (L1) term, which is more sensitive to iterate rounding (measured:
    0.08 % TVL2 / 0.9 % HuberL1 here, 1.7 % on the 1024² config-4 probe
    at alpha≈0.95 — the +33 % throughput trade,
    benchmarks/pd_compact_probe.py)."""
    from nsol_tpu.ops.pallas.fused import make_fused_pd_denoise_solver

    shape = (48, 64)
    b = rng.rand(*shape).astype(np.float32)
    alpha, L2 = 0.3, 8.0
    for rtype in ("TVL2", "HuberL1"):
        exact = make_fused_pd_denoise_solver(
            shape, rtype, iterations=25, record=True, interpret=True)
        comp = make_fused_pd_denoise_solver(
            shape, rtype, iterations=25, record=True, interpret=True,
            compact=True)
        x_e, rec_e = exact(b, b, alpha, L2)
        x_c, rec_c = comp(b, b, alpha, L2)
        x_e, x_c = np.asarray(x_e), np.asarray(x_c)
        vox = np.max(np.abs(x_e - x_c)) / np.max(np.abs(x_e))
        assert vox < 2e-2, (rtype, vox)
        obj_e = float(rec_e["Data"][-1]) + alpha * float(rec_e["Reg"][-1])
        obj_c = float(rec_c["Data"][-1]) + alpha * float(rec_c["Reg"][-1])
        band = 2e-2 if rtype.endswith("L1") else 5e-3
        assert abs(obj_e - obj_c) / abs(obj_e) < band, (rtype, obj_e, obj_c)
    # 3-D leading-axis stencil leg
    shape3 = (8, 16, 16)
    b3 = rng.rand(*shape3).astype(np.float32)
    e3 = make_fused_pd_denoise_solver(shape3, "TVL2", iterations=10,
                                      interpret=True)
    c3 = make_fused_pd_denoise_solver(shape3, "TVL2", iterations=10,
                                      interpret=True, compact=True)
    xe = np.asarray(e3(b3, b3, 0.5, 8.0))
    xc = np.asarray(c3(b3, b3, 0.5, 8.0))
    assert np.max(np.abs(xe - xc)) / np.max(np.abs(xe)) < 2e-2


def test_blocked_normal_operator_matches_fused_normal(rng):
    """Streaming z-blocked ``AᵀA + ρDᵀD`` == make_normal_blur_operator +
    ρ·gradient_normal (wrap blur vs zero-boundary Laplacian, both exact)."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    v = rng.rand(*shape).astype(np.float32)

    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    want = np.asarray(jax.jit(
        lambda u: nA(u) + 0.37 * G.gradient_normal(u))(jnp.asarray(v)))

    apply_M = make_blocked_normal_operator(shape, cov, block=8,
                                           interpret=True)
    got = np.asarray(apply_M(v, 0.37))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_blocked_normal_operator_rho_runtime_and_spacing(rng):
    """rho is a runtime scalar (two values through one callable) and voxel
    spacing flows into both the blur kernel and the Laplacian scales."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator

    shape = (24, 16, 16)
    cov = np.diag([1.5, 0.8, 0.8])
    spacing = np.array([1.25, 0.8, 2.0])
    v = rng.rand(*shape).astype(np.float32)

    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   spacing=spacing, dtype=np.float32)
    apply_M = make_blocked_normal_operator(shape, cov, spacing=spacing,
                                           block=8, interpret=True)
    for rho in (0.0, 1.7):
        want = np.asarray(jax.jit(
            lambda u: nA(u)
            + rho * G.gradient_normal(u, spacing))(jnp.asarray(v)))
        np.testing.assert_allclose(np.asarray(apply_M(v, rho)), want,
                                   atol=2e-5, rtol=1e-5,
                                   err_msg="rho=%g" % rho)


def test_admm_solve_with_blocked_normal_M(rng):
    """admm_solve(normal_M=<blocked kernel>) == admm_solve with the
    separate fused normal operators — the scale-path integration."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import (separable_factors,
                                   make_normal_blur_operator)
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator
    from nsol_tpu.solvers.admm import admm_solve

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)

    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()

    bj = jnp.asarray(b)
    br = jnp.zeros((3,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=4, iter_max=5,
        minimizer="cg", normal_A=nA, normal_B=G.gradient_normal))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))

    apply_M = make_blocked_normal_operator(shape, cov, block=8,
                                           interpret=True)
    x_blk, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=4, iter_max=5,
        minimizer="cg", normal_M=apply_M))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(x_blk), np.asarray(x_ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_admm_robust_irls_matches_xla_path(rng):
    """Fused ADMM kernel with a robust loss == admm_solve(minimizer='irls')
    with the same operators — MM sweeps, active-set freeze, masked CG,
    b_reg-ignoring quirk and all."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import separable_factors
    from nsol_tpu.ops.pallas.fused import make_fused_admm_solver
    from nsol_tpu.solvers.admm import admm_solve

    shape = (24, 16)
    cov = np.diag([0.8, 0.8]) ** 2
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    b = ndi.convolve(rng.rand(*shape), kern, mode="wrap").astype(np.float32)

    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nB = MM.matmul_gradient_normal_fn(shape, dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()

    bj = jnp.asarray(b)
    br = jnp.zeros((2,) + shape, jnp.float32)
    for loss, dls in (("huber", 1.0), ("soft_l1", 0.3)):
        x_ref, _ = jax.jit(partial(
            admm_solve, A, A, Bg, Bg_adj, iterations=3, iter_max=3,
            minimizer="irls", irls_cg_iters=5, data_loss=loss,
            normal_B=nB))(
                bj, br, bj, jnp.float32(0.02), jnp.float32(0.5),
                data_loss_scale=jnp.float32(dls))
        solve = make_fused_admm_solver(
            shape, cov, iterations=3, iter_max=3, data_loss=loss,
            irls_cg_iters=5, dtype=jnp.float32, interpret=True)
        x_fused = solve(b, b, 0.02, 0.5, data_loss_scale=dls)
        np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref),
                                   atol=2e-5, rtol=1e-5, err_msg=loss)


def test_blocked_cg_step_matches_composition(rng):
    """Fused p'=r+βp ; q=Mp' ; pq=Σp'q == the unfused composition."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import make_blocked_cg_step

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    r = rng.rand(*shape).astype(np.float32)
    p = rng.rand(*shape).astype(np.float32)

    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    step = make_blocked_cg_step(shape, cov, block=8, interpret=True)
    for beta, rho in ((0.0, 0.5), (0.83, 1.9)):
        pn_want = r + beta * p
        q_want = np.asarray(jax.jit(
            lambda u: nA(u) + rho * G.gradient_normal(u))(
                jnp.asarray(pn_want)))
        pn, q, pq = step(r, p, beta, rho)
        np.testing.assert_allclose(np.asarray(pn), pn_want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(q), q_want, atol=2e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(float(pq), float(np.sum(pn_want
                                                           * q_want)),
                                   rtol=1e-4)


def test_blocked_admm_solve_matches_xla_path(rng):
    """Full streaming blocked ADMM == admm_solve(minimizer='cg') with the
    fused normal operators — the past-VMEM scale path, end to end."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import (separable_factors,
                                   make_normal_blur_operator)
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve
    from nsol_tpu.solvers.admm import admm_solve

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)

    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()

    bj = jnp.asarray(b)
    br = jnp.zeros((3,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=4, iter_max=5,
        minimizer="cg", normal_A=nA, normal_B=G.gradient_normal))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))

    solve = blocked_admm_solve(shape, cov, iterations=4, iter_max=5,
                               block=8, interpret=True, mode="step")
    x_blk = solve(b, b, 0.01, 0.5)
    np.testing.assert_allclose(np.asarray(x_blk), np.asarray(x_ref),
                               atol=5e-5, rtol=1e-4)

    # fully fused sweep mode: same algorithm with the residual-norm
    # recurrence for beta (exact-corrected every sweep) — trajectory
    # equality only up to f32 recurrence noise, so compare the iterate
    # loosely and the converged objective tightly
    solve_sw = blocked_admm_solve(shape, cov, iterations=4, iter_max=5,
                                  block=8, interpret=True, mode="sweep")
    x_sw = solve_sw(b, b, 0.01, 0.5)
    np.testing.assert_allclose(np.asarray(x_sw), np.asarray(x_ref),
                               atol=2e-3, rtol=1e-3)

    def objective(x):
        x = jnp.asarray(x)
        r = A(x) - bj
        g = Bg(x)
        return float(0.5 * jnp.sum(r * r)
                     + 0.01 * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0))))

    np.testing.assert_allclose(objective(x_sw), objective(x_ref),
                               rtol=1e-4)


def test_fused_pd_denoise_records_match_xla(rng):
    """In-kernel Reg/Data recording == primal_dual_solve's record_fn
    (the study engine's L-curve feeds), row 0 = x0 state."""
    from functools import partial
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops import prox as prox_ops
    from nsol_tpu.ops.pallas.fused import make_fused_pd_denoise_solver
    from nsol_tpu.solvers.primal_dual import primal_dual_solve

    shape = (24, 16)
    b = rng.rand(*shape).astype(np.float32)
    bj = jnp.asarray(b)
    grad_op, grad_adj = G.make_gradient_operators()

    def prox_f(x, tau):
        return prox_ops.prox_ell2_denoising(x, tau, bj)

    def record(x):
        g = grad_op(x)
        return {"Reg": jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0))),
                "Data": jnp.sum((x - bj) ** 2)}

    x_ref, recs_ref = jax.jit(partial(
        primal_dual_solve, prox_f, prox_ops.prox_tv_conj, grad_op,
        grad_adj, iterations=7, record_fn=record))(
            bj, jnp.float32(0.4), jnp.float32(8.0))

    solve = make_fused_pd_denoise_solver(shape, "TVL2", iterations=7,
                                         record=True, interpret=True)
    x, recs = solve(b, b, 0.4, 8.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=2e-6, rtol=1e-5)
    for k in ("Reg", "Data"):
        np.testing.assert_allclose(np.asarray(recs[k]),
                                   np.asarray(recs_ref["measures"][k]),
                                   rtol=2e-5, err_msg=k)


def test_fused_pd_denoise_vmaps_over_alpha(rng):
    """jax.vmap over the runtime alpha — the 64-alpha L-curve sweep shape
    (BASELINE config 4) through the fused kernel."""
    from nsol_tpu.ops.pallas.fused import make_fused_pd_denoise_solver

    shape = (16, 16)
    b = rng.rand(*shape).astype(np.float32)
    solve = make_fused_pd_denoise_solver(shape, "TVL2", iterations=6,
                                         record=True, interpret=True)
    alphas = jnp.asarray([0.1, 0.5, 1.2], jnp.float32)
    xs, recs = jax.vmap(
        lambda a: solve(b, b, a, jnp.float32(8.0)))(alphas)
    assert xs.shape == (3,) + shape
    assert recs["Reg"].shape == (3, 7)
    for i, a in enumerate(np.asarray(alphas)):
        x1, r1 = solve(b, b, float(a), 8.0)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x1),
                                   atol=2e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(recs["Data"][i]),
                                   np.asarray(r1["Data"]), rtol=2e-5)


def test_blocked_normal_operator_high3_close_to_highest(rng):
    """3-pass split-bf16 emulated-HIGH matmuls track the HIGHEST apply to
    ~bf16-squared relative error (the documented scale-config opt-in)."""
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    v = rng.rand(*shape).astype(np.float32)
    hi = make_blocked_normal_operator(shape, cov, block=8, interpret=True)
    h3 = make_blocked_normal_operator(shape, cov, block=8,
                                      precision="high3", interpret=True)
    a = np.asarray(hi(v, 0.5))
    b = np.asarray(h3(v, 0.5))
    scale = np.max(np.abs(a))
    assert np.max(np.abs(a - b)) / scale < 5e-5


def test_blocked_cg_sweep_matches_composition(rng):
    """One fused sweep == the unfused composition of the deferred x/r
    updates, direction update, SPD apply, and all four reductions — for
    both DMA buffering layouts."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import make_blocked_cg_sweep

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    x = rng.rand(*shape).astype(np.float32)
    r = rng.rand(*shape).astype(np.float32)
    p = rng.rand(*shape).astype(np.float32)
    q = rng.rand(*shape).astype(np.float32)

    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    for n_buf in (2, 1, 3):
        sweep = make_blocked_cg_sweep(shape, cov, block=8, interpret=True,
                                      n_buf=n_buf)
        for a, beta, rho in ((0.0, 0.0, 0.5), (0.37, 0.83, 1.9)):
            r_want = r - a * q
            pn_want = r_want + beta * p
            q_want = np.asarray(jax.jit(
                lambda u: nA(u) + rho * G.gradient_normal(u))(
                    jnp.asarray(pn_want)))
            x_want = x + a * p
            xo, ro, qo, pn, g, pq, rq, qq = sweep(x, r, p, q, a, beta,
                                                  rho)
            np.testing.assert_allclose(np.asarray(xo), x_want, atol=1e-6)
            np.testing.assert_allclose(np.asarray(ro), r_want, atol=1e-6)
            np.testing.assert_allclose(np.asarray(pn), pn_want, atol=1e-6)
            np.testing.assert_allclose(np.asarray(qo), q_want, atol=2e-5,
                                       rtol=1e-5)
            np.testing.assert_allclose(
                float(g), float(np.sum(r_want * r_want)), rtol=1e-4)
            np.testing.assert_allclose(
                float(pq), float(np.sum(pn_want * q_want)), rtol=1e-4)
            np.testing.assert_allclose(
                float(rq), float(np.sum(r_want * q_want)), rtol=1e-4)
            np.testing.assert_allclose(
                float(qq), float(np.sum(q_want * q_want)), rtol=1e-4)


def test_blocked_cg_step_single_buffered_matches(rng):
    """n_buf=1 (the VMEM-tight 512-wide-plane layout) == n_buf=2."""
    from nsol_tpu.ops.pallas.blocked import make_blocked_cg_step

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    r = rng.rand(*shape).astype(np.float32)
    p = rng.rand(*shape).astype(np.float32)
    s2 = make_blocked_cg_step(shape, cov, block=8, interpret=True)
    s1 = make_blocked_cg_step(shape, cov, block=8, interpret=True,
                              n_buf=1)
    pn2, q2, pq2 = s2(r, p, 0.7, 1.1)
    pn1, q1, pq1 = s1(r, p, 0.7, 1.1)
    np.testing.assert_array_equal(np.asarray(pn1), np.asarray(pn2))
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(pq1), np.asarray(pq2))


def test_fused_pd_banded_diff_matches_xla(rng):
    """Axes >= 512 route through the block-banded difference schedule
    (128-wide diagonal-block matmuls + masked corner terms); a 512×256
    image exercises banded-lane/dense-sublane mixing and a 512×512 one
    both-banded. Must match primal_dual_solve like the dense path does."""
    from nsol_tpu.ops.pallas import fused as F

    for shape in ((256, 512), (512, 512)):
        b = rng.rand(*shape).astype(np.float32)
        ax0, ax1 = (s >= F._BANDED_MIN_AXIS for s in shape)
        x_ref = _pd_reference(shape, "TVL2", "ALG2", b, 0.3, 8.0, 6)
        solve = F.make_fused_pd_denoise_solver(
            shape, "TVL2", alg_type="ALG2", iterations=6, interpret=True)
        np.testing.assert_allclose(np.asarray(solve(b, b, 0.3, 8.0)),
                                   x_ref, atol=2e-6, rtol=1e-5,
                                   err_msg=str(shape))


def test_banded_diff_primitive_matches_dense(rng):
    """_banded_diff == the dense difference matmul on both minor axes and
    both directions (forward / adjoint), at a banded-eligible length."""
    import jax.numpy as jnp
    from nsol_tpu.ops.pallas import fused as F

    u = rng.rand(8, 512).astype(np.float32)
    Dfull = F.difference_matrix(512)
    Dblk = jnp.asarray(F.difference_matrix(128))
    for axis, arr in ((1, u), (0, u.T.copy())):
        for cross, C_full, C_blk in ((+1, Dfull, Dblk),
                                     (-1, Dfull.T, Dblk.T)):
            want = np.asarray(F._minor_matmul(
                jnp.asarray(arr), jnp.asarray(C_full), axis, 2))
            got = np.asarray(F._banded_diff(jnp.asarray(arr),
                                            jnp.asarray(C_blk), cross,
                                            axis, 2))
            np.testing.assert_allclose(got, want, atol=1e-6,
                                       err_msg="axis=%d cross=%d"
                                       % (axis, cross))


def test_banded_window_matmul_matches_dense(rng):
    """Windowed-band (256, 128) form == the dense matmul for a circulant
    blur-normal matrix on a 512 axis, both minor axes."""
    import jax.numpy as jnp
    from nsol_tpu.ops.matmul_ops import circulant_matrix
    from nsol_tpu.ops.pallas import fused as F

    taps = np.convolve(*(np.array([0.25, 0.5, 0.25]),) * 2)
    N = circulant_matrix(taps, 512, np.float32)
    W = jnp.asarray(F.banded_window_matrix(N))
    u = rng.rand(16, 512).astype(np.float32)
    for axis, arr in ((1, u), (0, u.T.copy())):
        want = np.asarray(F._minor_matmul(jnp.asarray(arr),
                                          jnp.asarray(N), axis, 2))
        got = np.asarray(F._banded_window_matmul(
            jnp.asarray(arr), W, axis, 2, jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg="axis=%d" % axis)


def test_blocked_normal_operator_banded_axis(rng):
    """Blocked AᵀA+ρDᵀD on a volume with a banded (>=512) minor axis ==
    the XLA fused normal operators (wrap-correct circulant windows +
    boundary-corrected Laplacian rows)."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import (_Stencils,
                                             make_blocked_normal_operator)

    shape = (16, 512, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    st = _Stencils(shape, cov, 3, None, np.float32)
    assert st.banded_y and not st.banded_x
    v = rng.rand(*shape).astype(np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    want = np.asarray(jax.jit(
        lambda u: nA(u) + 0.7 * G.gradient_normal(u))(jnp.asarray(v)))
    apply_M = make_blocked_normal_operator(shape, cov, block=8,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(apply_M(v, 0.7)), want,
                               atol=2e-5, rtol=1e-5)


def test_blocked_admm_solve_apply_mode_matches_xla(rng):
    """mode='apply' (512-wide-plane fallback: XLA CG around the blocked
    apply) == admm_solve(minimizer='cg') with the same operators."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve
    from nsol_tpu.solvers.admm import admm_solve

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import separable_factors

    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    bj = jnp.asarray(b)
    br = jnp.zeros((3,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=4, iter_max=5,
        minimizer="cg", normal_A=nA, normal_B=G.gradient_normal))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))
    solve = blocked_admm_solve(shape, cov, iterations=4, iter_max=5,
                               block=8, interpret=True, mode="apply")
    np.testing.assert_allclose(np.asarray(solve(b, b, 0.01, 0.5)),
                               np.asarray(x_ref), atol=5e-5, rtol=1e-4)


def test_pd_run_sweep_fused_path_matches_xla(rng, monkeypatch):
    """PrimalDualSolver.run_sweep with reconstruction hints routes through
    the fused Pallas kernel (NSOL_TPU_FUSED_INTERPRET on CPU) and must
    reproduce the XLA sweep — iterates AND the study's type-matched
    Reg/Data measure records under a non-unit x_scale — for all four
    reconstruction types."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops import prox as prox_ops
    from nsol_tpu.ops import priors, measures as sim
    from nsol_tpu.solvers.wrappers import PrimalDualSolver

    monkeypatch.setenv("NSOL_TPU_FUSED_INTERPRET", "1")
    shape = (24, 16)
    observed = (rng.rand(*shape) * 200).astype(np.float64)
    x_scale = float(observed.max())
    bj = jnp.asarray(observed / x_scale, jnp.float32)
    grad_op, grad_adj = G.make_gradient_operators()
    alphas = np.array([0.05, 0.3, 0.9])

    for rtype in ("TVL2", "TVL1", "HuberL2", "HuberL1"):
        ell1 = rtype.endswith("L1")
        hub = rtype.startswith("Huber")
        if ell1:
            prox_f = lambda x, tau: prox_ops.prox_ell1_denoising(x, tau,
                                                                 bj)
        else:
            prox_f = lambda x, tau: prox_ops.prox_ell2_denoising(x, tau,
                                                                 bj)
        prox_g = (prox_ops.prox_huber_conj if hub
                  else prox_ops.prox_tv_conj)
        if hub:
            reg_fn = lambda x: priors.huber(x, grad_op)
        else:
            reg_fn = lambda x: priors.total_variation(x, grad_op)
        if ell1:
            data_fn = lambda x: sim.sum_of_absolute_differences(x,
                                                                observed)
        else:
            data_fn = lambda x: sim.sum_of_squared_differences(x,
                                                               observed)
        measures = {"Reg": reg_fn, "Data": data_fn}

        def build(**hints):
            return PrimalDualSolver(
                prox_f=prox_f, prox_g_conj=prox_g, B=grad_op,
                B_conj=grad_adj, L2=8, x0=np.array(observed),
                iterations=8, x_scale=x_scale, **hints)

        x_ref, rec_ref = build().run_sweep({"alpha": alphas},
                                           measures=measures)
        fused_solver = build(reconstruction_type=rtype, observation=bj)
        assert fused_solver._fused_sweep(alphas, measures) is not None
        x_f, rec_f = fused_solver.run_sweep({"alpha": alphas},
                                            measures=measures)
        np.testing.assert_allclose(x_f, x_ref, atol=2e-4, rtol=1e-4,
                                   err_msg=rtype)
        for m in ("Reg", "Data"):
            np.testing.assert_allclose(
                rec_f[m], rec_ref[m], rtol=2e-4, atol=1e-3,
                err_msg="%s/%s" % (rtype, m))


def test_admm_run_sweep_fused_path_matches_xla(rng, monkeypatch):
    """ADMMLinearSolver.run_sweep with the separable-blur hint routes the
    alpha×rho grid through the fused whole-solve Pallas kernel and must
    reproduce the XLA vmapped sweep — iterates AND the deconvolution
    study's Reg/Data records under a non-unit x_scale — for the linear/cg
    and huber/irls inner-engine pairings."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G, losses as lf
    from nsol_tpu.ops import priors
    from nsol_tpu.ops.conv import (make_blur_operators,
                                   make_normal_blur_operator)
    from nsol_tpu.solvers.wrappers import ADMMLinearSolver

    monkeypatch.setenv("NSOL_TPU_FUSED_INTERPRET", "1")
    shape = (16, 16)
    cov = np.diag([1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    x_true = (rng.rand(*shape) > 0.6) * 180.0
    observed = ndi.convolve(x_true, kern, mode="wrap")
    x_scale = float(observed.max())

    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()

    def reg_fn(x):
        return priors.total_variation(x, Bg)

    grid = {"alpha": np.array([0.01, 0.05]), "rho": np.array([0.5, 1.1])}
    alphas = np.repeat(grid["alpha"], 2)
    rhos = np.tile(grid["rho"], 2)

    for data_loss, minimizer, kw in (
            ("linear", "cg", {}),
            ("huber", "irls", {"irls_cg_iters": 5})):
        def data_fn(x, dl=data_loss):
            r = (A(jnp.asarray(x, jnp.float32))
                 - jnp.asarray(observed, jnp.float32)).reshape(-1)
            return lf.cost_from_residual(r, dl, 2.0)

        measures = {"Reg": reg_fn, "Data": data_fn}

        def build(**hints):
            return ADMMLinearSolver(
                A=A, A_adj=A_adj, b=np.array(observed), B=Bg,
                B_adj=Bg_adj, x0=np.array(observed), iterations=3,
                iter_max=4, minimizer=minimizer, data_loss=data_loss,
                data_loss_scale=2.0, x_scale=x_scale, normal_A=nA,
                normal_B=G.gradient_normal, **dict(kw, **hints))

        x_ref, rec_ref = build().run_sweep(
            {"alpha": alphas, "rho": rhos}, measures=measures)
        fused_solver = build(blur_cov=cov)
        assert fused_solver._fused_sweep(
            alphas, rhos, np.full(4, 2.0), measures) is not None
        x_f, rec_f = fused_solver.run_sweep(
            {"alpha": alphas, "rho": rhos}, measures=measures)
        np.testing.assert_allclose(x_f, x_ref, atol=2e-3, rtol=1e-3,
                                   err_msg=data_loss)
        for m in ("Reg", "Data"):
            np.testing.assert_allclose(
                rec_f[m], rec_ref[m], rtol=2e-3,
                atol=2e-3 * abs(np.asarray(rec_ref[m])).max(),
                err_msg="%s/%s" % (data_loss, m))


def test_fused_tikhonov_kernel_matches_xla(rng):
    """Fused whole-solve Tikhonov kernel == tikhonov_solve for TK0/TK1 ×
    linear(cg)/huber(irls), bounds (0, ∞), b_reg = 0."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops.conv import (make_blur_operators,
                                   make_normal_blur_operator)
    from nsol_tpu.ops.pallas.fused import make_fused_tikhonov_solver
    from nsol_tpu.solvers.tikhonov import tikhonov_solve

    shape = (16, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    ident = lambda z: z
    bj = jnp.asarray(b)

    for reg, B, B_adj, nB in (("TK0", ident, ident, ident),
                              ("TK1", Bg, Bg_adj, G.gradient_normal)):
        br = jnp.zeros_like(B(bj))
        for data_loss, minimizer in (("linear", "cg"), ("huber", "irls")):
            x_ref = jax.jit(partial(
                tikhonov_solve, A, A_adj, B, B_adj,
                data_loss=data_loss, data_loss_scale=2.0,
                minimizer=minimizer, iter_max=6, irls_cg_iters=5,
                normal_A=nA, normal_B=nB))(
                    bj, br, bj, jnp.float32(0.05))
            solve = make_fused_tikhonov_solver(
                shape, cov, reg=reg, iter_max=6, data_loss=data_loss,
                irls_cg_iters=5, interpret=True)
            x_f = solve(b, b, 0.05, data_loss_scale=2.0)
            np.testing.assert_allclose(
                np.asarray(x_f), np.asarray(x_ref), atol=5e-5, rtol=1e-4,
                err_msg="%s/%s" % (reg, data_loss))


def test_tikhonov_run_sweep_fused_path_matches_xla(rng, monkeypatch):
    """TikhonovLinearSolver.run_sweep with the TK hints routes through
    the fused kernel and reproduces the XLA sweep — iterates AND the
    two-row (x0, solution) records under non-unit x_scale."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G, priors
    from nsol_tpu.ops.conv import (make_blur_operators,
                                   make_normal_blur_operator)
    from nsol_tpu.solvers.wrappers import TikhonovLinearSolver

    monkeypatch.setenv("NSOL_TPU_FUSED_INTERPRET", "1")
    shape = (16, 16)
    cov = np.diag([1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    observed = ndi.convolve((rng.rand(*shape) > 0.6) * 170.0, kern,
                            mode="wrap")
    x_scale = float(observed.max())
    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    alphas = np.array([0.02, 0.08, 0.3])
    measures = {"Reg": lambda x: priors.first_order_tikhonov(x, Bg)}

    def build(**hints):
        return TikhonovLinearSolver(
            A=A, A_adj=A_adj, b=np.array(observed), B=Bg, B_adj=Bg_adj,
            x0=np.array(observed), iter_max=6, minimizer="cg",
            x_scale=x_scale, normal_A=nA, normal_B=G.gradient_normal,
            **hints)

    x_ref, rec_ref = build().run_sweep({"alpha": alphas},
                                       measures=measures)
    fused_solver = build(blur_cov=cov, reg_kind="TK1")
    assert fused_solver._fused_sweep(alphas, np.ones(3),
                                     lambda x: {}) is not None
    x_f, rec_f = fused_solver.run_sweep({"alpha": alphas},
                                        measures=measures)
    np.testing.assert_allclose(x_f, x_ref, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(rec_f["Reg"], rec_ref["Reg"], rtol=1e-3)
    assert rec_f["Reg"].shape == (3, 2)


def test_blocked_normal_operator_2d_matches_xla(rng):
    """2-D (z, y)-blocked apply (rectangular y band matmuls over DMA'd
    2-D wrap halos, boundary-corrected Laplacian rows) == the XLA fused
    normal operators, incl. anisotropic spacing and runtime rho."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator_2d

    for shape, spacing in (((16, 32, 16), None),
                           ((24, 16, 16), (1.0, 1.5, 0.8))):
        cov = np.diag([1.0, 1.0, 1.0])
        v = rng.rand(*shape).astype(np.float32)
        nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                       spacing=spacing, dtype=np.float32)
        want = np.asarray(jax.jit(
            lambda u: nA(u) + 1.3 * G.gradient_normal(u, spacing))(
                jnp.asarray(v)))
        ap = make_blocked_normal_operator_2d(
            shape, cov, spacing=spacing, z_block=8, y_block=8,
            interpret=True)
        np.testing.assert_allclose(np.asarray(ap(v, 1.3)), want,
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=str((shape, spacing)))


def test_blocked_normal_operator_2d_anisotropic_y(rng):
    """Anisotropic covariance with sigma_y > sigma_z: the y halo must be
    sized from the Y-axis band (halo_y), not the z halo — the round-3
    form silently wrapped taps into the wrong columns (ADVICE r3 high)."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import (_Stencils, _band_matrix,
                                             make_blocked_normal_operator_2d)

    shape = (16, 32, 16)
    cov = np.diag([0.64, 4.0, 0.64])
    st = _Stencils(shape, cov, 3, None, jnp.float32)
    assert st.halo_y > st.halo  # the configuration the bug needs
    v = rng.rand(*shape).astype(np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    want = np.asarray(jax.jit(
        lambda u: nA(u) + 0.7 * G.gradient_normal(u))(jnp.asarray(v)))
    ap = make_blocked_normal_operator_2d(shape, cov, z_block=8,
                                         y_block=16, interpret=True)
    np.testing.assert_allclose(np.asarray(ap(v, 0.7)), want,
                               atol=2e-5, rtol=1e-5)

    # the underlying guard: a band wider than the halo is a hard error,
    # not silent wraparound
    with np.testing.assert_raises(ValueError):
        _band_matrix(np.ones(11), 16, 4, np.float32)


def test_banded_window_matrix_rejects_wide_band():
    """A band whose half-width exceeds the 3-block window must raise
    (silent truncation otherwise), and _Stencils falls back to the dense
    matmul for such blurs instead of enabling the banded form."""
    from nsol_tpu.ops.matmul_ops import circulant_matrix
    from nsol_tpu.ops.pallas.blocked import _Stencils
    from nsol_tpu.ops.pallas.fused import banded_window_matrix

    taps = np.ones(2 * 130 + 1)  # half-width 130 > 122
    M = circulant_matrix(taps, 512, np.float32)
    with np.testing.assert_raises(ValueError):
        banded_window_matrix(M)
    # in-range band still works
    ok = circulant_matrix(np.ones(13), 512, np.float32)
    W = banded_window_matrix(ok)
    assert W.shape == (384, 128)

    # a sigma-26 blur on a 512 axis (half-width > 122) must not enable
    # the banded schedule
    st = _Stencils((16, 512, 16), np.diag([1.0, 676.0, 1.0]), 3, None,
                   jnp.float32)
    assert st.halo_y > 122 and not st.banded_y


def test_blocked_admm_solve_auto_2d_apply(rng):
    """blocked_admm_solve(mode='apply') on a >=512-wide-y volume
    auto-selects the 2-D (z, y)-blocked operator and still matches the
    XLA path."""
    import scipy.ndimage as ndi
    from functools import partial

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import (separable_factors,
                                   make_normal_blur_operator)
    from nsol_tpu.ops.pallas.blocked import (blocked_admm_solve,
                                             pick_zy_blocks)
    from nsol_tpu.solvers.admm import admm_solve

    shape = (16, 512, 16)
    assert pick_zy_blocks(shape, 6)[0] is not None
    cov = np.diag([1.0, 1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    bj = jnp.asarray(b)
    br = jnp.zeros((3,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=2, iter_max=4,
        minimizer="cg", normal_A=nA, normal_B=G.gradient_normal))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))
    solve = blocked_admm_solve(shape, cov, iterations=2, iter_max=4,
                               interpret=True, mode="apply")
    np.testing.assert_allclose(np.asarray(solve(b, b, 0.01, 0.5)),
                               np.asarray(x_ref), atol=5e-5, rtol=1e-4)


def test_blocked_cg_step_2d_matches_composition(rng):
    """2-D blocked CG step == the unfused composition, and
    blocked_admm_solve auto-selects it (mode 'step2d') on a
    512-wide-y volume, matching the XLA path."""
    from functools import partial

    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops import matmul_ops as MM
    from nsol_tpu.ops.conv import (separable_factors,
                                   make_normal_blur_operator)
    from nsol_tpu.ops.pallas.blocked import (blocked_admm_solve,
                                             make_blocked_cg_step_2d)
    from nsol_tpu.solvers.admm import admm_solve

    shape = (16, 512, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    r = rng.rand(*shape).astype(np.float32)
    p = rng.rand(*shape).astype(np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    step = make_blocked_cg_step_2d(shape, cov, z_block=8, y_block=128,
                                   interpret=True)
    for beta, rho in ((0.0, 0.5), (0.83, 1.9)):
        pn_want = r + beta * p
        q_want = np.asarray(jax.jit(
            lambda u: nA(u) + rho * G.gradient_normal(u))(
                jnp.asarray(pn_want)))
        pn, q, pq = step(r, p, beta, rho)
        np.testing.assert_allclose(np.asarray(pn), pn_want, atol=1e-6)
        np.testing.assert_allclose(np.asarray(q), q_want, atol=2e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(
            float(pq), float(np.sum(pn_want * q_want)), rtol=1e-4)

    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    bj = jnp.asarray(b)
    br = jnp.zeros((3,) + shape, jnp.float32)
    x_ref, _ = jax.jit(partial(
        admm_solve, A, A, Bg, Bg_adj, iterations=2, iter_max=4,
        minimizer="cg", normal_A=nA, normal_B=G.gradient_normal))(
            bj, br, bj, jnp.float32(0.01), jnp.float32(0.5))
    solve = blocked_admm_solve(shape, cov, iterations=2, iter_max=4,
                               interpret=True, mode="step2d")
    np.testing.assert_allclose(np.asarray(solve(b, b, 0.01, 0.5)),
                               np.asarray(x_ref), atol=5e-5, rtol=1e-4)


def test_blocked_admm_solve_compact_state(rng):
    """Compact bf16 CG state (VERDICT r3 item 2): r/p/q + halo slabs in
    bfloat16 with f32 accumulation must converge to the f32 path's
    objective well inside the 0.1% parity band, for both the fused-step
    and apply formulations."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve

    shape = (32, 16, 16)
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    A, _ = make_blur_operators(cov, alpha_cut=3, shape=shape,
                               dtype=np.float32)
    Bg, _ = G.make_gradient_operators()

    def objective(x):
        r = np.asarray(A(jnp.asarray(x))) - b
        g = np.asarray(Bg(jnp.asarray(x)))
        return (0.5 * np.sum(r * r)
                + 0.01 * np.sum(np.sqrt(np.sum(g * g, axis=0))))

    for mode in ("step", "apply"):
        solve32 = blocked_admm_solve(shape, cov, iterations=6, iter_max=6,
                                     interpret=True, mode=mode)
        solve16 = blocked_admm_solve(shape, cov, iterations=6, iter_max=6,
                                     interpret=True, mode=mode,
                                     state_dtype=jnp.bfloat16)
        o32 = objective(np.asarray(solve32(b, b, 0.01, 0.5)))
        o16 = objective(np.asarray(solve16(b, b, 0.01, 0.5)))
        assert abs(o16 - o32) / abs(o32) < 1e-3, (mode, o16, o32)


def test_blocked_prepadded_window_semantics(rng):
    """make_blocked_normal_operator_prepadded: the per-shard kernel of
    the sharded scale path — (a) full-volume wrap prepad with row0=0
    equals the wrap-DMA kernel, (b) two z-windows of a taller global
    volume with their row0 offsets reassemble the global result (the
    runtime global-boundary Laplacian rows land on the right window)."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_normal_blur_operator
    from nsol_tpu.ops.pallas.blocked import (
        _Stencils, make_blocked_normal_operator_prepadded)

    shape = (32, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    st = _Stencils(shape, cov, 3, None, jnp.float32)
    r = st.halo
    v = rng.rand(*shape).astype(np.float32)
    nA = make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    want = np.asarray(jax.jit(
        lambda u: nA(u) + 0.7 * G.gradient_normal(u))(jnp.asarray(v)))

    v_ext = np.concatenate([v[-r:], v, v[:r]], axis=0)
    ap = make_blocked_normal_operator_prepadded(shape, cov,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(ap(v_ext, 0.7, 0)), want,
                               atol=2e-5, rtol=1e-5)

    local = (16, 16, 16)
    ap2 = make_blocked_normal_operator_prepadded(local, cov, z_total=32,
                                                 interpret=True)
    outs = []
    for s in range(2):
        lo = s * 16
        idx = np.arange(lo - r, lo + 16 + r) % 32
        outs.append(np.asarray(ap2(v[idx], 0.7, lo)))
    np.testing.assert_allclose(np.concatenate(outs, axis=0), want,
                               atol=2e-5, rtol=1e-5)


def test_blocked_sweep_compact_state(rng):
    """Compact bf16 state through the fully-fused sweep formulation
    matches the f32 step path inside the objective band."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve

    shape = (32, 16, 16)
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    A, _ = make_blur_operators(cov, alpha_cut=3, shape=shape,
                               dtype=np.float32)
    Bg, _ = G.make_gradient_operators()

    def objective(x):
        r = np.asarray(A(jnp.asarray(x))) - b
        g = np.asarray(Bg(jnp.asarray(x)))
        return (0.5 * np.sum(r * r)
                + 0.01 * np.sum(np.sqrt(np.sum(g * g, axis=0))))

    o_ref = objective(np.asarray(blocked_admm_solve(
        shape, cov, iterations=6, iter_max=6, interpret=True,
        mode="step")(b, b, 0.01, 0.5)))
    o_swp = objective(np.asarray(blocked_admm_solve(
        shape, cov, iterations=6, iter_max=6, interpret=True,
        mode="sweep", state_dtype=jnp.bfloat16)(b, b, 0.01, 0.5)))
    assert abs(o_swp - o_ref) / abs(o_ref) < 1e-3


def test_fused_admm_compact_dirs(rng):
    """compact_dirs (bf16-exact CG directions + high2 Laplacian passes)
    stays in f32-noise range of the plain high3 kernel."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K
    from nsol_tpu.ops.pallas.fused import make_fused_admm_solver

    shape = (16, 16, 16)
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    b = ndi.convolve((rng.rand(*shape) > 0.6).astype(np.float32), kern,
                     mode="wrap").astype(np.float32)
    xs = {}
    for tag, kw in (("plain", {}), ("cd", dict(compact_dirs=True))):
        solve = make_fused_admm_solver(shape, cov, iterations=10,
                                       iter_max=8, precision="high3",
                                       interpret=True, **kw)
        xs[tag] = np.asarray(solve(b, b, 0.01, 0.5))
    dev = np.abs(xs["cd"] - xs["plain"]).max() \
        / max(1.0, np.abs(xs["plain"]).max())
    assert dev < 5e-4, dev  # f32-noise class (vs the ~1% blocked-compact)

    with np.testing.assert_raises(ValueError):
        make_fused_admm_solver(shape, cov, compact_dirs=True,
                               interpret=True)  # requires high3


def test_blocked_robust_operators(rng):
    """The robust streaming operators (ops/pallas/robust.py): blur,
    blur+lap (the IRLS gradient pass) and the one-pass weighted normal
    ``Aᵀ(w·A v) + ρDᵀD v`` all match the XLA operator compositions."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops.pallas.robust import (
        make_blocked_blur_operator, make_blocked_weighted_normal_operator)

    shape = (32, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    v = rng.rand(*shape).astype(np.float32)
    w = (rng.rand(*shape) * 0.9 + 0.1).astype(np.float32)
    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)

    blur = make_blocked_blur_operator(shape, cov, interpret=True)
    want = np.asarray(jax.jit(A)(jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(blur(v)), want, atol=2e-6)

    bl = make_blocked_blur_operator(shape, cov, with_lap=True,
                                    interpret=True)
    want = np.asarray(jax.jit(
        lambda y, u: A(y) + 0.7 * G.gradient_normal(u))(
            jnp.asarray(v), jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(bl(v, w, 0.7)), want, atol=2e-6)

    wn = make_blocked_weighted_normal_operator(shape, cov, interpret=True)
    want = np.asarray(jax.jit(
        lambda vv, ww: A_adj(ww * A(vv)) + 0.7 * G.gradient_normal(vv))(
            jnp.asarray(v), jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(wn(v, w, 0.7)), want, atol=2e-6)


def test_blocked_robust_admm_matches_xla_irls(rng):
    """blocked_robust_admm_solve (the past-VMEM robust path, VERDICT r4
    item 1) matches admm_solve(minimizer='irls') on the XLA operators —
    same MM sweeps, same masked CG, same b_reg-ignoring quirk."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops import losses as lf
    from nsol_tpu.ops.pallas.robust import blocked_robust_admm_solve
    from nsol_tpu.solvers.admm import admm_solve

    shape = (32, 16, 16)
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    b += 0.05 * rng.randn(*shape).astype(np.float32)
    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    br = jnp.zeros((3,) + shape, jnp.float32)
    al, rh, dls = 0.01, 0.5, 1.0
    bj = jnp.asarray(b)

    for loss in ("huber", "cauchy"):
        x_xla, _ = jax.jit(lambda bi, x0, loss=loss: admm_solve(
            A, A_adj, Bg, Bg_adj, bi, br, x0, al, rh, iterations=4,
            iter_max=3, data_loss=loss, data_loss_scale=dls,
            minimizer="irls", irls_cg_iters=5,
            normal_B=G.gradient_normal))(bj, bj)
        solve = blocked_robust_admm_solve(
            shape, cov, iterations=4, iter_max=3, irls_cg_iters=5,
            data_loss=loss, interpret=True)
        x_blk = jax.jit(
            lambda bi, x0: solve(bi, x0, al, rh, dls))(bj, bj)
        np.testing.assert_allclose(np.asarray(x_blk), np.asarray(x_xla),
                                   atol=5e-6)

        def objective(x):
            r = np.asarray(A(jnp.asarray(x))) - b
            g = np.asarray(Bg(jnp.asarray(x)))
            return float(
                0.5 * np.sum(lf.LOSSES[loss](r * r, f_scale=dls))
                + al * np.sum(np.sqrt(np.sum(g * g, axis=0))))

        assert abs(objective(np.asarray(x_blk))
                   - objective(np.asarray(x_xla))) \
            <= 1e-3 * abs(objective(np.asarray(x_xla)))


def test_blocked_compact_dirs(rng):
    """compact_dirs on the blocked solver (round 5, VERDICT r4 item 2):
    r/x/reductions stay f32, only the directions p/q round to bf16 —
    the voxel deviation must collapse ~50x vs the full-compact mode
    (measured 2e-4 vs 1e-2 relative on this config) and the flags must
    be mutually exclusive."""
    import pytest
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve

    shape = (32, 16, 16)
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = jnp.asarray(ndi.convolve(x_true, kern, mode="wrap")
                    .astype(np.float32))
    al, rh = 0.01, 0.5

    def run(**kw):
        s = blocked_admm_solve(shape, cov, iterations=6, iter_max=8,
                               block=8, interpret=True, **kw)
        return np.asarray(jax.jit(
            lambda bi, x0: s(bi, x0, al, rh))(b, b))

    for mode in ("step", "apply"):
        x_f32 = run(mode=mode)
        x_dirs = run(mode=mode, compact_dirs=True)
        x_full = run(mode=mode, state_dtype=jnp.bfloat16)
        sc = np.abs(x_f32).max()
        dev_dirs = np.abs(x_dirs - x_f32).max() / sc
        dev_full = np.abs(x_full - x_f32).max() / sc
        assert dev_dirs < 5e-4, dev_dirs
        assert dev_dirs < 0.1 * dev_full  # the point of the split

    with pytest.raises(ValueError):
        blocked_admm_solve(shape, cov, interpret=True,
                           compact_dirs=True,
                           state_dtype=jnp.bfloat16)


def test_fused_robust_compact_dirs(rng):
    """compact_dirs on the fused robust-IRLS kernel (round 5): the
    bf16-exact inner-CG directions let the first-pass blur matmuls run
    "high2" and the Laplacian "exact1" — the result must stay in the
    f32-noise class of the exact-HIGHEST kernel."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K
    from nsol_tpu.ops.pallas.fused import make_fused_admm_solver

    shape = (64, 64)
    cov = np.diag([1.0, 1.0])
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(2))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)
    b += 0.05 * rng.randn(*shape).astype(np.float32)

    def run(**kw):
        s = make_fused_admm_solver(shape, cov, iterations=4, iter_max=3,
                                   data_loss="huber", irls_cg_iters=4,
                                   interpret=True, **kw)
        return np.asarray(s(b, b, 0.01, 0.5, data_loss_scale=1.0))

    x0 = run()
    x1 = run(precision="high3", compact_dirs=True)
    assert np.abs(x1 - x0).max() / np.abs(x0).max() < 1e-4


def test_blocked_weighted_normal_operator_2d(rng):
    """The 2-D (z, y)-blocked weighted normal kernel (round 5 — the
    512-wide-plane robust apply with double-buffered halo DMA) matches
    the XLA operator composition; a full robust solve through it
    (explicit small blocks) matches the 1-D kernel's solve."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops.pallas.robust import (
        make_blocked_weighted_normal_operator_2d)

    shape = (32, 16, 16)
    cov = np.diag([1.0, 1.0, 1.0])
    v = rng.rand(*shape).astype(np.float32)
    w = (rng.rand(*shape) * 0.9 + 0.1).astype(np.float32)
    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    want = np.asarray(jax.jit(
        lambda vv, ww: A_adj(ww * A(vv)) + 0.7 * G.gradient_normal(vv))(
            jnp.asarray(v), jnp.asarray(w)))
    ap = make_blocked_weighted_normal_operator_2d(
        shape, cov, z_block=8, y_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ap(v, w, 0.7)), want,
                               atol=2e-6)

    # anisotropic covariance exercises the distinct y/z halos
    cov2 = np.diag([0.8, 1.2, 0.9]) ** 2
    A2, A2_adj = make_blur_operators(cov2, alpha_cut=3, shape=shape,
                                     dtype=np.float32)
    want2 = np.asarray(jax.jit(
        lambda vv, ww: A2_adj(ww * A2(vv))
        + 0.7 * G.gradient_normal(vv))(jnp.asarray(v), jnp.asarray(w)))
    ap2 = make_blocked_weighted_normal_operator_2d(
        shape, cov2, z_block=8, y_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ap2(v, w, 0.7)), want2,
                               atol=2e-6)


def test_blocked_compact_nonunit_spacing(rng):
    """Non-unit spacing through the compact paths: the Laplacian
    matrices are no longer bf16-exact, so "exact1" must gate OFF (the
    high2 2-pass form takes over) and results must stay in the
    rounded-direction class of the f32 path."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K
    from nsol_tpu.ops.pallas.blocked import _Stencils, blocked_admm_solve

    shape = (32, 16, 16)
    cov = np.diag([1.0] * 3)
    spacing = np.array([0.7, 0.9, 1.1])
    st = _Stencils(shape, cov, 3, spacing, jnp.float32)
    assert not st.lap_exact  # the gate must see non-exact matrices
    st1 = _Stencils(shape, cov, 3, None, jnp.float32)
    assert st1.lap_exact

    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=spacing)
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = jnp.asarray(ndi.convolve(x_true, kern, mode="wrap")
                    .astype(np.float32))

    def run(**kw):
        # sub-unit spacing widens the voxel-space blur halo past block
        # 8 — let the layout picker choose (16 here)
        s = blocked_admm_solve(shape, cov, spacing=spacing, iterations=4,
                               iter_max=6, interpret=True, **kw)
        return np.asarray(jax.jit(
            lambda bi, x0: s(bi, x0, 0.01, 0.5))(b, b))

    x_f32 = run(mode="step")
    x_dirs = run(mode="step", compact_dirs=True)
    sc = np.abs(x_f32).max()
    # wider (sub-unit-spacing) blur + high2 fallback: still the
    # rounded-direction class, an order below full-compact's ~1e-2
    assert np.abs(x_dirs - x_f32).max() / sc < 2e-3


def test_blocked_robust_anisotropic(rng):
    """blocked_robust_admm_solve with anisotropic covariance (distinct
    per-axis halos) + compact_dirs matches the XLA IRLS path."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K, grad as G
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops.pallas.robust import blocked_robust_admm_solve
    from nsol_tpu.solvers.admm import admm_solve

    shape = (32, 16, 16)
    cov = np.diag([1.3, 0.8, 1.1]) ** 2
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = jnp.asarray(ndi.convolve(x_true, kern, mode="wrap")
                    .astype(np.float32))
    A, A_adj = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    br = jnp.zeros((3,) + shape, jnp.float32)

    x_xla, _ = jax.jit(lambda bi, x0: admm_solve(
        A, A_adj, Bg, Bg_adj, bi, br, x0, 0.01, 0.5, iterations=3,
        iter_max=3, data_loss="huber", minimizer="irls",
        irls_cg_iters=4, normal_B=G.gradient_normal))(b, b)
    for kw in ({}, {"compact_dirs": True}):
        solve = blocked_robust_admm_solve(
            shape, cov, iterations=3, iter_max=3, irls_cg_iters=4,
            data_loss="huber", interpret=True, **kw)
        x_blk = np.asarray(jax.jit(
            lambda bi, x0: solve(bi, x0, 0.01, 0.5))(b, b))
        tol = 5e-6 if not kw else 5e-4
        assert np.abs(x_blk - np.asarray(x_xla)).max() \
            / max(1e-6, np.abs(np.asarray(x_xla)).max()) < tol


def test_measured_negative_options_still_work(rng):
    """The measured-negative/probe options stay functional (recorded
    verdicts in BASELINE.md): pipelined_cg, blur_reorder='high2',
    compact_dirs='qf32' — each must produce f32-noise/rounded-class
    results, not silently bit-rot."""
    import scipy.ndimage as ndi

    from nsol_tpu.ops import kernels as K
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve
    from nsol_tpu.ops.pallas.fused import make_fused_admm_solver

    shape = (16, 16, 16)
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    x_true = (rng.rand(*shape) > 0.6).astype(np.float32)
    b = ndi.convolve(x_true, kern, mode="wrap").astype(np.float32)

    base = np.asarray(make_fused_admm_solver(
        shape, cov, iterations=4, iter_max=6, interpret=True,
        precision="high3", compact_dirs=True)(b, b, 0.01, 0.5))
    pipe = np.asarray(make_fused_admm_solver(
        shape, cov, iterations=4, iter_max=6, interpret=True,
        precision="high3", compact_dirs=True, pipelined_cg=True,
        blur_reorder=False)(b, b, 0.01, 0.5))
    sc = np.abs(base).max()
    assert np.abs(pipe - base).max() / sc < 1e-3

    bb = jnp.asarray(b)
    bsol = blocked_admm_solve(shape, cov, iterations=4, iter_max=6,
                              block=8, interpret=True, mode="step",
                              compact_dirs="qf32",
                              blur_reorder="high2")
    xq = np.asarray(jax.jit(
        lambda bi, x0: bsol(bi, x0, 0.01, 0.5))(bb, bb))
    assert np.abs(xq - base).max() / sc < 1e-3


def test_blocked_blur_operator_2d(rng):
    """The 2-D (z, y)-blocked blur kernel (round 5 — the 512-wide-plane
    per-sweep pass of the robust solver) matches the XLA blur,
    isotropic and anisotropic."""
    from nsol_tpu.ops.conv import make_blur_operators
    from nsol_tpu.ops.pallas.robust import make_blocked_blur_operator_2d

    shape = (32, 16, 16)
    for cov in (np.diag([1.0] * 3), np.diag([1.3, 0.8, 1.1]) ** 2):
        v = rng.rand(*shape).astype(np.float32)
        A, _ = make_blur_operators(cov, alpha_cut=3, shape=shape,
                                   dtype=np.float32)
        want = np.asarray(jax.jit(A)(jnp.asarray(v)))
        ap = make_blocked_blur_operator_2d(shape, cov, z_block=8,
                                           y_block=8, interpret=True)
        np.testing.assert_allclose(np.asarray(ap(v)), want, atol=2e-6)
