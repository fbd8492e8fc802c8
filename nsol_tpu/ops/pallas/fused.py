"""Fused VMEM-resident ADMM solver: the whole solve as ONE Pallas kernel.

Why: the MXU matmul path is HBM-bound (BASELINE.md: 256³ scales at exactly
64× the 64³ time). A 50×10 ADMM solve at 64³ executes ~500 inner-CG
operator applications, each streaming the 1 MiB volume HBM→VMEM→HBM plus
elementwise passes — ~20 GB of traffic for ~100 GFLOP of MXU work. For
volumes whose working set fits in VMEM (~14 volumes of state), this kernel
runs the ENTIRE solve — outer splitting loop, inner normal-equation CG,
prox/dual updates — inside one Pallas program: the volume is loaded once,
every iteration reads/writes VMEM only, and the result is stored once.

Scope (the flagship TV-L2 deconvolution path, BASELINE config 3):
linear data loss, separable (diagonal-covariance) wrap blur, ``b_reg = 0``,
non-negativity bounds — exactly the problem `bench.py` measures. The
algorithm mirrors :func:`nsol_tpu.solvers.admm.admm_solve` with
``minimizer="cg"`` step for step (same guards, same precision), so the two
paths converge to the same objective; parity is pinned by
tests/test_pallas.py against the XLA implementation.

Axis mapping to the Mosaic layout (volumes are (z, y, x); the minor two
dims (y, x) are the tiled sublane/lane dims, z is untiled):

* x axis (lanes)    — circulant/tridiagonal **matmul** on the MXU,
  contracting the minor dim directly (no relayout).
* y axis (sublanes) — minor-dims swap sandwich: ``swapaxes(-1, -2)`` →
  lanes matmul → swap back (a supported on-chip transpose).
* z axis (untiled)  — **roll-accumulate stencil**: `jnp.roll` along an
  untiled axis is slab reindexing (cheap, unlike the pathological
  lane-axis rolls — CLAUDE.md), so the wrap conv is Σ_j k_j·roll(x, j−c)
  and the zero-boundary ``DᵀD`` is the explicit second-difference stencil.
  (A leading-axis ``dot_general`` would need a minor-dim reshape Mosaic
  does not support — measured: `infer-vector-layout: unsupported shape
  cast (64x64x64 → 64x4096)`.)

Reference anchors: nsol/admm_linear_solver.py:202-253 (ADMM updates),
nsol/tikhonov_linear_solver.py:146-158 (fixed-trip inner Krylov).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsol_tpu.ops.grad import _spacing_array

__all__ = ["make_fused_admm_solver", "fused_admm_fits_vmem"]

#: conservative VMEM budget for auto-selection: persistent state + CG
#: temporaries + compiler headroom, in dtype-sized volumes
_STATE_VOLUMES = 16
_VMEM_BUDGET_BYTES = 64 * 1024 * 1024


def fused_admm_fits_vmem(shape, dtype=jnp.float32):
    """Heuristic: does the fused solver's working set fit in VMEM?"""
    bytes_per_vol = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
    return _STATE_VOLUMES * bytes_per_vol <= _VMEM_BUDGET_BYTES


def _minor_matmul(u, C, axis, ndim, precision=lax.Precision.HIGHEST):
    """Circulant/tridiagonal matmul along one of the two minor (tiled)
    axes: ``y[..., i, ...] = Σ_m C[i, m] u[..., m, ...]``."""
    kw = dict(preferred_element_type=u.dtype, precision=precision)
    if axis == ndim - 1:
        return lax.dot_general(u, C, (((ndim - 1,), (1,)), ((), ())), **kw)
    if axis == ndim - 2:
        ut = jnp.swapaxes(u, ndim - 2, ndim - 1)
        yt = lax.dot_general(ut, C, (((ndim - 1,), (1,)), ((), ())), **kw)
        return jnp.swapaxes(yt, ndim - 2, ndim - 1)
    raise ValueError("matmul only on the two minor axes")


def _roll_conv_axis0(u, taps):
    """Wrap conv along the untiled leading axis:
    ``y[i] = Σ_j k[j] u[(i + c − j) mod n]`` = Σ_j k_j · roll(u, j − c)."""
    c = len(taps) // 2
    out = None
    for j, k in enumerate(taps):
        # shift 0 must bypass jnp.roll: its concat-of-slices lowering
        # produces a zero-length slice that Mosaic rejects
        t = (u if j == c else jnp.roll(u, j - c, axis=0)) * k
        out = t if out is None else out + t
    return out


def _fwd_diff(u, axis):
    """Forward difference, zero pad right (ops/grad.py conventions)."""
    upper = jnp.concatenate(
        [lax.slice_in_dim(u, 1, u.shape[axis], axis=axis),
         jnp.zeros_like(lax.slice_in_dim(u, 0, 1, axis=axis))], axis=axis)
    return upper - u


def _fwd_diff_adj(y, axis):
    """Adjoint (= minus backward difference), zero pad left."""
    lower = jnp.concatenate(
        [jnp.zeros_like(lax.slice_in_dim(y, 0, 1, axis=axis)),
         lax.slice_in_dim(y, 0, y.shape[axis] - 1, axis=axis)], axis=axis)
    return lower - y


def _lap_axis0_stencil(u, inv_h2):
    """Zero-boundary ``DᵀD`` second difference along the leading axis
    (matches ops/grad.py::gradient_normal: first entry x[0]−x[1])."""
    up = jnp.concatenate(
        [lax.slice_in_dim(u, 1, u.shape[0], axis=0),
         jnp.zeros_like(lax.slice_in_dim(u, 0, 1, axis=0))], axis=0)
    down = jnp.concatenate(
        [jnp.zeros_like(lax.slice_in_dim(u, 0, 1, axis=0)),
         lax.slice_in_dim(u, 0, u.shape[0] - 1, axis=0)], axis=0)
    t = 2.0 * u - up - down
    first = lax.slice_in_dim(t, 0, 1, axis=0) \
        - lax.slice_in_dim(u, 0, 1, axis=0)
    t = jnp.concatenate([first, lax.slice_in_dim(t, 1, t.shape[0], axis=0)],
                        axis=0)
    return t * inv_h2


def make_fused_admm_solver(shape, cov, alpha_cut=3, spacing=None,
                           iterations=10, iter_max=10, dtype=jnp.float32,
                           precision=lax.Precision.HIGHEST,
                           interpret=False):
    """Build ``solve(b, x0, alpha, rho) -> x`` as one Pallas program.

    ``shape``: static volume shape (2-D or 3-D). ``cov`` must be diagonal
    (separable blur). ``alpha``/``rho`` stay runtime scalars — sweeping
    them does not retrace or recompile. ``precision`` sets the MXU pass
    count for the minor-axis matmuls; Mosaic lowers only HIGHEST and
    DEFAULT (lax.Precision.HIGH raises NotImplementedError in the Pallas
    dot lowering), and DEFAULT breaks CG convergence on this problem
    (BASELINE.md precision ladder) — so HIGHEST is both the default and
    the only parity-preserving choice in-kernel.
    """
    from nsol_tpu.ops.kernels import gaussian_kernel
    from nsol_tpu.ops.conv import separable_factors
    from nsol_tpu.ops.matmul_ops import circulant_matrix, laplacian_matrix

    ndim = len(shape)
    if ndim not in (2, 3):
        raise ValueError("fused ADMM kernel supports 2-D/3-D volumes")
    kernel64 = gaussian_kernel(cov, alpha_cut=alpha_cut, spacing=spacing,
                               dtype=np.float64)
    factors = separable_factors(kernel64)
    if factors is None:
        raise ValueError("fused ADMM kernel requires a separable "
                         "(diagonal-covariance) blur")
    s = _spacing_array(spacing, ndim)  # spatial (x, y[, z]) order

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    # minor (tiled) axes get matrices; a 3-D leading axis gets 1-D taps
    n_stencil = 1 if ndim == 3 else 0
    A_taps = [np.asarray(f, np_dtype) for f in factors[:n_stencil]]
    N_taps = [np.convolve(f, f[::-1]).astype(np_dtype)
              for f in factors[:n_stencil]]
    A_mats = [circulant_matrix(f, shape[ax], np_dtype)
              for ax, f in enumerate(factors) if ax >= n_stencil]
    N_mats = [circulant_matrix(np.convolve(f, f[::-1]), shape[ax], np_dtype)
              for ax, f in enumerate(factors) if ax >= n_stencil]
    T_mats = [laplacian_matrix(shape[ax], s[ndim - 1 - ax], np_dtype)
              for ax in range(n_stencil, ndim)]
    # leading-axis Laplacian scale (axis 0 differentiates spatial dir ndim-1)
    lap0_inv_h2 = np.asarray(1.0 / s[ndim - 1] ** 2, np_dtype)
    # gradient component i differentiates array axis ndim-1-i, scaled 1/s[i]
    inv_s = [np.asarray(1.0 / s[i], np_dtype) for i in range(ndim)]

    def conv_all(u, taps, mats):
        for t in taps:
            u = _roll_conv_axis0(u, t)
        for k, C in enumerate(mats):
            u = _minor_matmul(u, C, n_stencil + k, ndim, precision)
        return u

    def lap(u, T_m):
        out = None
        if n_stencil:
            out = _lap_axis0_stencil(u, lap0_inv_h2)
        for k, T in enumerate(T_m):
            t = _minor_matmul(u, T, n_stencil + k, ndim, precision)
            out = t if out is None else out + t
        return out

    def kernel(b_ref, x0_ref, alpha_ref, rho_ref, *mat_refs):
        out_ref = mat_refs[-1]
        mats = [m[:] for m in mat_refs[:-1]]
        A_m = mats[:len(A_mats)]
        N_m = mats[len(A_mats):len(A_mats) + len(N_mats)]
        T_m = mats[len(A_mats) + len(N_mats):]

        alpha = alpha_ref[0, 0]
        rho = rho_ref[0, 0]
        b = b_ref[:]
        x = x0_ref[:]

        def grad_comp(u, i):
            return _fwd_diff(u, ndim - 1 - i) * inv_s[i]

        def div_acc(comps):
            out = None
            for i in range(ndim):
                t = _fwd_diff_adj(comps[i], ndim - 1 - i) * inv_s[i]
                out = t if out is None else out + t
            return out

        def apply_M(u):
            return conv_all(u, N_taps, N_m) + rho * lap(u, T_m)

        At_b = conv_all(b, A_taps, A_m)  # A symmetric: Aᵀb = Ab

        # v0 = Bx0, w0 = 0 (solvers/admm.py:55-56)
        v = tuple(grad_comp(x, i) for i in range(ndim))
        w = tuple(jnp.zeros_like(x) for _ in range(ndim))
        tau = alpha / rho

        def outer(_, carry):
            x, v, w = carry
            rhs = At_b + rho * div_acc(
                tuple(v[i] - w[i] for i in range(ndim)))

            # inner CG, mirroring solvers/cg.py::cg exactly
            r = rhs - apply_M(x)
            gamma = jnp.sum(r * r)
            p = r

            def cg_body(_, c):
                x, r, p, gamma = c
                q = apply_M(p)
                pq = jnp.sum(p * q)
                a = jnp.where(pq > 0, gamma / jnp.where(pq > 0, pq, 1.0),
                              0.0)
                x = x + a * p
                r = r - a * q
                gamma_new = jnp.sum(r * r)
                beta = jnp.where(gamma > 0,
                                 gamma_new / jnp.where(gamma > 0, gamma,
                                                       1.0), 0.0)
                p = r + beta * p
                return (x, r, p, gamma_new)

            x, _, _, _ = lax.fori_loop(0, iter_max, cg_body,
                                       (x, r, p, gamma))
            x = jnp.maximum(x, 0.0)  # reference default bounds (0, ∞)

            # vectorial soft-threshold (ops/prox.py:61-73)
            t = tuple(grad_comp(x, i) + w[i] for i in range(ndim))
            norm2 = None
            for ti in t:
                norm2 = ti * ti if norm2 is None else norm2 + ti * ti
            norm = jnp.sqrt(norm2)
            scale = jnp.where(
                norm > tau,
                jnp.maximum(norm - tau, 0.0)
                / jnp.where(norm > tau, norm, 1.0), 0.0)
            v = tuple(ti * scale for ti in t)
            w = tuple(ti - vi for ti, vi in zip(t, v))
            return (x, v, w)

        x, v, w = lax.fori_loop(0, iterations, outer, (x, v, w))
        out_ref[:] = x

    mats = [jnp.asarray(m) for m in (A_mats + N_mats + T_mats)]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[vmem, vmem, smem, smem] + [vmem] * len(mats),
        out_specs=vmem,
        # The whole-solve working set (~24 MiB at 64³: x, b, Aᵀb, v, w,
        # CG r/p/q + op temporaries) exceeds the conservative 16 MiB
        # default scoped-VMEM cap; the hardware has far more.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def solve(b, x0, alpha, rho):
        a = jnp.full((1, 1), alpha, dtype)
        r = jnp.full((1, 1), rho, dtype)
        return call(jnp.asarray(b, dtype), jnp.asarray(x0, dtype), a, r,
                    *mats)

    return solve
