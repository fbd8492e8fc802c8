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
from nsol_tpu.ops import losses as lf

__all__ = ["make_fused_admm_solver", "fused_admm_fits_vmem",
           "make_fused_tikhonov_solver",
           "make_fused_pd_denoise_solver", "fused_pd_fits_vmem"]

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
    axes: ``y[..., i, ...] = Σ_m C[i, m] u[..., m, ...]``.

    ``precision="high3"``: 3-pass split-bf16 emulation of
    ``lax.Precision.HIGH`` (Mosaic's dot lowering supports only HIGHEST
    and DEFAULT). Exact hi/lo split — f32 = bf16(hi) + lo with both
    addends f32 — then ``u·C ≈ u_hi·C_hi + u_hi·C_lo + u_lo·C_hi``
    (the dropped lo·lo term is ~2⁻¹⁶ relative). Halves the MXU passes of
    HIGHEST; the blocked 256³ apply is ~56 % MXU-pass-bound (BASELINE.md
    probe), so this is the documented opt-in for scale configs."""
    if precision == "high3":
        u_hi = u.astype(jnp.bfloat16).astype(u.dtype)
        C_hi = C.astype(jnp.bfloat16).astype(C.dtype)
        d = lax.Precision.DEFAULT
        return (_minor_matmul(u_hi, C_hi, axis, ndim, d)
                + _minor_matmul(u_hi, C - C_hi, axis, ndim, d)
                + _minor_matmul(u - u_hi, C_hi, axis, ndim, d))
    if precision == "high2":
        # caller guarantees ``u`` is EXACT in bfloat16 (compact-state
        # slab values upcast to f32): high3's third pass
        # ``(u − u_hi)·C_hi`` is identically zero — two DEFAULT passes
        # at the same accuracy as high3 on these operands
        C_hi = C.astype(jnp.bfloat16).astype(C.dtype)
        d = lax.Precision.DEFAULT
        return (_minor_matmul(u, C_hi, axis, ndim, d)
                + _minor_matmul(u, C - C_hi, axis, ndim, d))
    if precision == "exact1":
        # caller guarantees BOTH operands are bf16-exact (compact-state
        # slab values AND an integer-valued matrix — e.g. the Laplacian
        # at unit spacing, verified host-side via :func:`bf16_exact`):
        # high2's second pass ``u·(C−C_hi)`` is identically zero too —
        # ONE DEFAULT pass, bit-identical (round 5)
        return _minor_matmul(u, C, axis, ndim, lax.Precision.DEFAULT)
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


def bf16_exact(M):
    """True when every entry of ``M`` is exactly representable in
    bfloat16 (e.g. the integer-valued Laplacian matrices at unit
    spacing) — the host-side gate for the ``"exact1"`` single-pass
    matmul mode. ``NSOL_TPU_NO_EXACT1=1`` disables the mode (A/B
    probes + safety escape)."""
    import os

    import ml_dtypes

    if os.environ.get("NSOL_TPU_NO_EXACT1"):
        return False
    M32 = np.asarray(M, np.float32)
    return bool(np.all(
        M32 == M32.astype(ml_dtypes.bfloat16).astype(np.float32)))


def difference_matrix(n, dtype=np.float32):
    """(n, n) forward-difference matrix with the zero-pad-right convention
    of ops/grad.py::forward_difference: ``D = −I + superdiag(1)`` (last row
    = −e_n). The adjoint (−backward difference) is exactly ``Dᵀ``."""
    D = -np.eye(n) + np.diag(np.ones(n - 1), 1)
    return D.astype(dtype)


def _exact_bf16_matmul(u, C, axis, ndim, exact1=False):
    """Minor-axis matmul with a matrix whose entries are EXACT in bfloat16
    (the ±1/0 difference matrices): 3-way bf16 split of ``u``, one DEFAULT
    MXU pass each. f32-faithful — C has no low part, and the third split
    term carries ``u``'s residual below 2⁻¹⁶ relative — at HALF of
    HIGHEST's 6 passes.

    ``exact1=True``: the caller guarantees ``u`` itself is bf16-exact
    (compact-state values upcast to f32) — the split terms u2/u3 are
    identically zero, so ONE DEFAULT pass is bit-identical (the exact1
    reasoning of :func:`_minor_matmul`)."""
    if exact1:
        return _minor_matmul(u, C, axis, ndim, "exact1")
    d = lax.Precision.DEFAULT
    u1 = u.astype(jnp.bfloat16).astype(u.dtype)
    r1 = u - u1
    u2 = r1.astype(jnp.bfloat16).astype(u.dtype)
    u3 = r1 - u2
    return (_minor_matmul(u1, C, axis, ndim, d)
            + _minor_matmul(u2, C, axis, ndim, d)
            + _minor_matmul(u3, C, axis, ndim, d))


#: minor-axis length from which the block-banded difference schedule
#: replaces the dense (n, n) matmul (crossover measured between 256 and
#: 1024 — BASELINE.md config-4 note; at 256 the dense matmul already
#: matches the MXU's native 128-contraction granularity closely)
_BANDED_MIN_AXIS = 512


def _banded_diff_lane(u, Cblk, cross, ndim, exact1=False):
    """Lane-axis difference apply as 128-wide block-banded matmuls.

    ``D`` is bidiagonal, so its (128, 128)-blocked form has identical
    diagonal blocks (``difference_matrix(128)``) plus a single-corner
    off-diagonal block. Per chunk: one exact-bf16 matmul (128 MACs/element
    instead of the dense n) plus the corner term as a masked single-lane
    broadcast on the VPU — O(axis_len/128)× fewer MACs. ``cross=+1`` is
    the forward difference (chunk's last lane += next chunk's first),
    ``cross=−1`` the adjoint (first lane += previous chunk's last)."""
    n = u.shape[-1]
    nb = n // 128
    lane = lax.broadcasted_iota(jnp.int32, u.shape[:-1] + (128,), ndim - 1)
    chunks = []
    for j in range(nb):
        uj = lax.slice_in_dim(u, j * 128, (j + 1) * 128, axis=ndim - 1)
        yj = _exact_bf16_matmul(uj, Cblk, ndim - 1, ndim, exact1=exact1)
        if cross > 0 and j < nb - 1:
            nxt = lax.slice_in_dim(u, (j + 1) * 128, (j + 1) * 128 + 1,
                                   axis=ndim - 1)
            yj = yj + jnp.where(lane == 127, nxt, 0.0)
        if cross < 0 and j > 0:
            prv = lax.slice_in_dim(u, j * 128 - 1, j * 128, axis=ndim - 1)
            yj = yj + jnp.where(lane == 0, prv, 0.0)
        chunks.append(yj)
    return jnp.concatenate(chunks, axis=ndim - 1)


def banded_window_matrix(M, dtype=None):
    """(384, 128) windowed-band form of a SHIFT-INVARIANT banded (n, n)
    matrix ``M`` (circulant blur normal, interior Laplacian rows), for
    :func:`_banded_window_matmul`. Because the band is shift-invariant,
    every output 128-block ``j`` is the same contraction of the 3-block
    input window ``u[(j−1)·128 : (j+2)·128)`` (wrapped at the ends):
    extract it once from the first interior block row. Requires n ≥ 384
    and a band half-width ≤ 122."""
    n = M.shape[0]
    if n < 384 or n % 128:
        raise ValueError("banded window form needs n >= 384, n % 128 == 0")
    Mrows = np.asarray(M)[128:256]
    if n > 384 and np.any(Mrows[:, 384:]):
        # band (incl. circulant wrap) extends past the 3-block window —
        # extracting would silently truncate it; callers fall back to
        # the dense matmul
        raise ValueError(
            "band half-width exceeds the 3-block (384-col) window; "
            "use the dense matmul for this matrix")
    W = Mrows[:, 0:384].T.copy()
    return W.astype(dtype or M.dtype)


def _banded_window_matmul(u, W, axis, ndim, precision):
    """Minor-axis matmul with a shift-invariant banded matrix in windowed
    form ``W`` (384, 128): ``out_j = window_j · W`` with the window
    wrapped at the axis ends — 384 MACs per element regardless of the
    axis length, instead of the dense matmul's n (1.33× at 512, 2.7× at
    1024). The caller fixes up non-circulant boundary rows (the
    Laplacian's) afterwards."""
    if axis == ndim - 2:
        ut = jnp.swapaxes(u, ndim - 2, ndim - 1)
        yt = _banded_window_matmul(ut, W, ndim - 1, ndim, precision)
        return jnp.swapaxes(yt, ndim - 2, ndim - 1)
    if axis != ndim - 1:
        raise ValueError("banded window matmul only on the minor axes")
    n = u.shape[-1]
    nb = n // 128
    kw = dict(preferred_element_type=u.dtype, precision=precision)

    def win_dot(win):
        if precision == "exact1":
            # both operands bf16-exact (see _minor_matmul) — one pass
            return lax.dot_general(
                win, W, (((ndim - 1,), (0,)), ((), ())),
                preferred_element_type=u.dtype,
                precision=lax.Precision.DEFAULT)
        if precision in ("high3", "high2"):
            w_hi = W.astype(jnp.bfloat16).astype(W.dtype)
            u_hi = win.astype(jnp.bfloat16).astype(win.dtype)
            d = lax.Precision.DEFAULT
            kw3 = dict(preferred_element_type=u.dtype, precision=d)
            dims = (((ndim - 1,), (0,)), ((), ()))
            out = (lax.dot_general(u_hi, w_hi, dims, **kw3)
                   + lax.dot_general(u_hi, W - w_hi, dims, **kw3))
            if precision == "high3":
                # "high2": the caller guarantees win is bf16-exact, so
                # this third pass is identically zero
                out = out + lax.dot_general(win - u_hi, w_hi, dims,
                                            **kw3)
            return out
        return lax.dot_general(win, W, (((ndim - 1,), (0,)), ((), ())),
                               **kw)

    chunks = []
    for j in range(nb):
        start = ((j - 1) * 128) % n
        if start + 384 <= n:
            win = lax.slice_in_dim(u, start, start + 384, axis=ndim - 1)
        else:
            win = jnp.concatenate(
                [lax.slice_in_dim(u, start, n, axis=ndim - 1),
                 lax.slice_in_dim(u, 0, 384 - (n - start), axis=ndim - 1)],
                axis=ndim - 1)
        chunks.append(win_dot(win))
    return jnp.concatenate(chunks, axis=ndim - 1)


def _banded_diff(u, Cblk, cross, axis, ndim, exact1=False):
    """Block-banded difference along either minor axis (sublane via the
    swap sandwich, as in :func:`_minor_matmul`)."""
    if axis == ndim - 1:
        return _banded_diff_lane(u, Cblk, cross, ndim, exact1=exact1)
    if axis != ndim - 2:
        raise ValueError("banded diff only on the two minor axes")
    ut = jnp.swapaxes(u, ndim - 2, ndim - 1)
    yt = _banded_diff_lane(ut, Cblk, cross, ndim, exact1=exact1)
    return jnp.swapaxes(yt, ndim - 2, ndim - 1)


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


def _cg_inkernel(apply_M, rhs, x0, iters, apply_dir=None,
                 round_dir=None, pipelined=False):
    """Fixed-trip CG mirroring solvers/cg.py::cg — same zero-guards, so
    the fused kernels match the XLA paths step for step.

    ``round_dir`` (compact-directions mode): rounds each search
    direction to bfloat16-exact values before the SPD apply, enabling
    ``apply_dir`` to run its Laplacian matmuls at "high2" (one fewer MXU
    pass at identical accuracy on the rounded operand); x/r/reductions
    stay f32. CG is self-correcting on the rounded directions (same
    argument as the blocked compact state).

    ``pipelined`` (round 5, VERDICT r4 item 5): ONE reduction barrier
    per iteration instead of two — the three dots pq/rq/qq are all
    available right after the apply, and ``‖r'‖²`` follows from the
    exact real-arithmetic identity ``γ' = γ − 2a·rq + a²·qq`` (the
    same recurrence the blocked sweep kernel uses), so β is pure scalar
    work and the second vector-then-reduce leg drops off the
    latency-bound dependency chain. Each ADMM outer iteration restarts
    CG with an exactly-computed γ0, bounding the f32 recurrence drift
    to one 10-trip inner solve."""
    if round_dir is None:
        round_dir = lambda u: u
    if apply_dir is None:
        apply_dir = apply_M
    r = rhs - apply_M(x0)
    gamma = jnp.sum(r * r)
    p = round_dir(r)

    def body(_, c):
        x, r, p, gamma = c
        q = apply_dir(p)
        pq = jnp.sum(p * q)
        if pipelined:
            rq = jnp.sum(r * q)
            qq = jnp.sum(q * q)
        a = jnp.where(pq > 0, gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
        x = x + a * p
        r = r - a * q
        if pipelined:
            gamma_new = jnp.maximum(
                gamma - 2.0 * a * rq + a * a * qq, 0.0)
        else:
            gamma_new = jnp.sum(r * r)
        beta = jnp.where(gamma > 0,
                         gamma_new / jnp.where(gamma > 0, gamma, 1.0), 0.0)
        p = round_dir(r + beta * p)
        return (x, r, p, gamma_new)

    x, _, _, _ = lax.fori_loop(0, iters, body, (x0, r, p, gamma))
    return x


def make_fused_admm_solver(shape, cov, alpha_cut=3, spacing=None,
                           iterations=10, iter_max=10, dtype=jnp.float32,
                           precision=lax.Precision.HIGHEST,
                           data_loss="linear", irls_cg_iters=8,
                           record=False, interpret=False,
                           compact_dirs=False, pipelined_cg=False,
                           blur_reorder=True, diff_matmul=None):
    """Build ``solve(b, x0, alpha, rho) -> x`` as one Pallas program.

    ``record=True``: the kernel also records the deconvolution study's
    L-curve measures per outer iterate (row 0 = x0, matching the XLA
    path's observer semantics) — ``Reg = TV(∇x)`` and
    ``Data = ½ Σ ρ_C(r²)`` with ``r = Ax − b`` (one extra blur apply per
    outer iteration) — and ``solve`` returns
    ``(x, {"Reg": (iterations+1,), "Data": (iterations+1,)})``. The
    Data record's loss scale ``C`` is an independent RUNTIME scalar
    (``solve(..., record_dls=C)``): callers working in ``x/x_scale``
    units pass ``data_loss_scale/x_scale`` and postscale the recorded
    value by ``x_scale²`` (the f_scale family identity
    ``cost_{C}(s·r) = s²·cost_{C/s}(r)``); the Reg record postscales
    ``×x_scale``.

    ``shape``: static volume shape (2-D or 3-D). ``cov`` must be diagonal
    (separable blur). ``alpha``/``rho`` stay runtime scalars — sweeping
    them does not retrace or recompile. ``precision`` sets the MXU pass
    count for the minor-axis matmuls; Mosaic lowers only HIGHEST and
    DEFAULT (lax.Precision.HIGH raises NotImplementedError in the Pallas
    dot lowering), and DEFAULT breaks CG convergence on this problem
    (BASELINE.md precision ladder) — so HIGHEST is both the default and
    the only parity-preserving choice in-kernel.

    ``data_loss="linear"``: the x-update is ``iter_max`` warm-started CG
    iterations on the fused normal equations (the flagship TV-L2 path).
    A robust loss (huber/soft_l1/cauchy/arctan) mirrors
    ``tikhonov_solve(minimizer="irls")`` instead: ``iter_max`` MM sweeps,
    each freezing the weights ``ρ'(r²)`` and the active box constraints,
    then ``irls_cg_iters`` masked-CG iterations — including the
    reference's b_reg-ignoring quirk of the robust minimize path
    (nsol/tikhonov_linear_solver.py:276-280), so it converges to the same
    point as the XLA path. ``solve`` then takes an extra runtime
    ``data_loss_scale`` argument.
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
    # diff_matmul (round 5): the prox/dual grad/div on the MINOR axes
    # as bidiagonal MXU matmuls (the PD kernel's lesson — minor shifts
    # are pathological Mosaic data movement) instead of the concat-
    # slice _fwd_diff. Measured +16 % same-session on the latency-bound
    # north-star; f32-faithful (_exact_bf16_matmul), dev 3e-6 class.
    # Default: on with compact_dirs (the production config); the exact
    # HIGHEST kernels keep the original form.
    if diff_matmul is None:
        diff_matmul = bool(compact_dirs)
    D_mats = ([difference_matrix(shape[ax], np_dtype)
               for ax in range(n_stencil, ndim)] if diff_matmul else [])

    def conv_all(u, taps, mats):
        for t in taps:
            u = _roll_conv_axis0(u, t)
        for k, C in enumerate(mats):
            u = _minor_matmul(u, C, n_stencil + k, ndim, precision)
        return u

    # compact-directions mode (opt-in, linear CG path): round each CG
    # search direction to bf16-exact values so the Laplacian matmuls
    # (which act on the direction DIRECTLY) drop high3's third pass at
    # identical accuracy — the same "high2" lever as the blocked compact
    # state. The blur matmuls can't (their operand is the z-tap
    # accumulation, not bf16-exact).
    if compact_dirs and precision != "high3":
        raise ValueError("compact_dirs requires precision='high3'")
    # bf16-exact Laplacian matrices (unit spacing) drop high2's second
    # (identically-zero) pass too -> ONE DEFAULT pass, bit-identical
    lap_dir_prec = precision
    if compact_dirs:
        lap_dir_prec = ("exact1" if all(bf16_exact(T) for T in T_mats)
                        else "high2")

    def lap(u, T_m, prec=precision):
        out = None
        if n_stencil:
            out = _lap_axis0_stencil(u, lap0_inv_h2)
        for k, T in enumerate(T_m):
            t = _minor_matmul(u, T, n_stencil + k, ndim, prec)
            out = t if out is None else out + t
        return out

    robust = data_loss != "linear"
    grad_rho = lf.gradient_loss(data_loss) if robust else None
    loss_fn = lf.LOSSES[data_loss]

    def kernel(b_ref, x0_ref, alpha_ref, rho_ref, *rest_refs):
        rest = list(rest_refs)
        dls = rest.pop(0)[0, 0] if robust else None
        rec_dls = rest.pop(0)[0, 0] if record else None
        if record:
            out_ref, reg_ref, data_ref = rest[-3:]
            mat_refs = rest[:-3]
        else:
            out_ref = rest[-1]
            mat_refs = rest[:-1]
        mats = [m[:] for m in mat_refs]
        A_m = mats[:len(A_mats)]
        N_m = mats[len(A_mats):len(A_mats) + len(N_mats)]
        nT_end = len(A_mats) + len(N_mats) + len(T_mats)
        T_m = mats[len(A_mats) + len(N_mats):nT_end]
        D_m = mats[nT_end:nT_end + len(D_mats)]
        DT_m = mats[nT_end + len(D_mats):]

        alpha = alpha_ref[0, 0]
        rho = rho_ref[0, 0]
        b = b_ref[:]
        x = x0_ref[:]

        def grad_comp(u, i):
            ax = ndim - 1 - i
            if diff_matmul and ax >= n_stencil:
                t = _exact_bf16_matmul(u, D_m[ax - n_stencil], ax, ndim)
            else:
                t = _fwd_diff(u, ax)
            return t * inv_s[i]

        def div_acc(comps):
            out = None
            for i in range(ndim):
                ax = ndim - 1 - i
                if diff_matmul and ax >= n_stencil:
                    t = _exact_bf16_matmul(comps[i],
                                           DT_m[ax - n_stencil], ax,
                                           ndim)
                else:
                    t = _fwd_diff_adj(comps[i], ax)
                out = (t * inv_s[i] if out is None
                       else out + t * inv_s[i])
            return out

        def apply_M(u):
            return conv_all(u, N_taps, N_m) + rho * lap(u, T_m)

        def apply_M_dir(u):
            # u is a bf16-exact rounded direction in compact_dirs mode.
            # Round 5: separable convs commute, so the blur-normal's
            # minor matmuls run FIRST — directly on the bf16-exact u at
            # "high2" (2 passes, bit-identical to high3 on these
            # operands — same argument as the Laplacian) — and the
            # z-tap roll-accumulation follows on the VPU. In the
            # VMEM-resident kernel the reorder is free (no extended
            # block rows to pay for, unlike the blocked kernels); it
            # cuts the apply's MXU passes 10 → 8 on the latency-bound
            # dependency chain.
            if compact_dirs and blur_reorder:
                s = u
                for k, Cm in enumerate(N_m):
                    s = _minor_matmul(s, Cm, n_stencil + k, ndim,
                                      "high2")
                for t in N_taps:
                    s = _roll_conv_axis0(s, t)
                return s + rho * lap(u, T_m, lap_dir_prec)
            return conv_all(u, N_taps, N_m) \
                + rho * lap(u, T_m, lap_dir_prec)

        round_dir = ((lambda u: u.astype(jnp.bfloat16).astype(dtype))
                     if compact_dirs else None)

        # A symmetric: Aᵀb = Ab (loop-invariant for the linear CG path)
        At_b = None if robust else conv_all(b, A_taps, A_m)

        # v0 = Bx0, w0 = 0 (solvers/admm.py:55-56)
        v = tuple(grad_comp(x, i) for i in range(ndim))
        w = tuple(jnp.zeros_like(x) for _ in range(ndim))
        tau = alpha / rho

        def irls_sweep(_, x):
            # one MM sweep of tikhonov_solve(minimizer="irls") with
            # alpha=rho, bounds (0, ∞), b_reg ignored (the reference's
            # robust minimize-path quirk) — solvers/tikhonov.py:156-204
            r = conv_all(x, A_taps, A_m) - b
            wts = grad_rho(r * r, f_scale=dls)
            g = conv_all(wts * r, A_taps, A_m) + rho * lap(x, T_m)
            free = jnp.where(jnp.logical_and(x <= 0.0, g > 0.0),
                             0.0, 1.0).astype(x.dtype)

            def apply_W(u):
                uf = free * u
                Auf = conv_all(uf, A_taps, A_m)
                return free * (conv_all(wts * Auf, A_taps, A_m)
                               + rho * lap(uf, T_m)) + (u - uf)

            def apply_W_dir(u):
                # compact_dirs: u is a bf16-exact rounded inner-CG
                # direction and the {0,1} mask preserves exactness, so
                # the FIRST blur pass's minor matmuls run at "high2"
                # directly on uf (blur reorder: matmuls before the
                # z-tap accumulation, free in the VMEM kernel) and the
                # Laplacian at lap_dir_prec; the second pass's operand
                # wts·A(uf) is f32 and keeps ``precision``.
                uf = free * u
                s = uf
                for k, Cm in enumerate(A_m):
                    s = _minor_matmul(s, Cm, n_stencil + k, ndim,
                                      "high2")
                for t in A_taps:
                    s = _roll_conv_axis0(s, t)
                return free * (conv_all(wts * s, A_taps, A_m)
                               + rho * lap(uf, T_m, lap_dir_prec)) \
                    + (u - uf)

            step = _cg_inkernel(
                apply_W, -free * g, jnp.zeros_like(x), irls_cg_iters,
                apply_dir=apply_W_dir if compact_dirs else None,
                round_dir=round_dir if compact_dirs else None)
            return jnp.maximum(x + step, 0.0)

        def write_measures(t, u):
            # deconvolution-study L-curve feeds, observer semantics
            # (interface.py Reg/Data trackers; one extra blur apply)
            g2 = None
            for i in range(ndim):
                gi = grad_comp(u, i)
                g2 = gi * gi if g2 is None else g2 + gi * gi
            reg = jnp.sum(jnp.sqrt(g2))
            r = conv_all(u, A_taps, A_m) - b
            data = 0.5 * jnp.sum(loss_fn(r * r, f_scale=rec_dls))
            reg_ref[pl.ds(t, 1), :] = jnp.full((1, 128), reg, dtype)
            data_ref[pl.ds(t, 1), :] = jnp.full((1, 128), data, dtype)

        if record:
            write_measures(0, x)

        def outer(it, carry):
            x, v, w = carry
            if robust:
                x = lax.fori_loop(0, iter_max, irls_sweep, x)
            else:
                rhs = At_b + rho * div_acc(
                    tuple(v[i] - w[i] for i in range(ndim)))
                x = _cg_inkernel(apply_M, rhs, x, iter_max,
                                 apply_dir=apply_M_dir,
                                 round_dir=round_dir,
                                 pipelined=pipelined_cg)
                x = jnp.maximum(x, 0.0)  # reference bounds (0, ∞)

            if record:
                write_measures(it + 1, x)

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

    mats = [jnp.asarray(m) for m in (A_mats + N_mats + T_mats + D_mats
                                     + [D.T.copy() for D in D_mats])]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)

    out_shape = jax.ShapeDtypeStruct(shape, dtype)
    out_specs = vmem
    if record:
        rec_shape = jax.ShapeDtypeStruct((iterations + 1, 128), dtype)
        out_shape = (out_shape, rec_shape, rec_shape)
        out_specs = (vmem, vmem, vmem)

    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vmem, vmem, smem, smem] + ([smem] if robust else [])
        + ([smem] if record else []) + [vmem] * len(mats),
        out_specs=out_specs,
        # The whole-solve working set (~24 MiB at 64³: x, b, Aᵀb, v, w,
        # CG r/p/q + op temporaries) exceeds the conservative 16 MiB
        # default scoped-VMEM cap; the hardware has far more.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def solve(b, x0, alpha, rho, data_loss_scale=1.0, record_dls=1.0):
        a = jnp.full((1, 1), alpha, dtype)
        r = jnp.full((1, 1), rho, dtype)
        extra = ((jnp.full((1, 1), data_loss_scale, dtype),) if robust
                 else ())
        extra += ((jnp.full((1, 1), record_dls, dtype),) if record
                  else ())
        out = call(jnp.asarray(b, dtype), jnp.asarray(x0, dtype), a, r,
                   *extra, *mats)
        if record:
            x, reg, data = out
            return x, {"Reg": reg[:, 0], "Data": data[:, 0]}
        return out

    return solve


def make_fused_tikhonov_solver(shape, cov, alpha_cut=3, spacing=None,
                               reg="TK1", iter_max=10, dtype=jnp.float32,
                               precision=lax.Precision.HIGHEST,
                               data_loss="linear", irls_cg_iters=8,
                               interpret=False, compact_dirs=False):
    """Build ``solve(b, x0, alpha, data_loss_scale=1) -> x``: one whole
    Tikhonov-regularized deconvolution solve as ONE Pallas program — the
    TK0L2/TK1L2 counterpart of :func:`make_fused_admm_solver`, covering
    the study engine's remaining two reconstruction types.

    ``reg="TK0"`` uses ``B = I`` (``BᵀB = I``), ``reg="TK1"`` the stacked
    gradient (``BᵀB`` = the one-pass boundary-corrected Laplacian).
    Semantics mirror ``tikhonov_solve`` exactly: ``b_reg = 0``, bounds
    ``(0, ∞)`` (x0 clipped on entry, solution clipped on exit), linear
    loss → ``iter_max`` warm-started CG iterations on the normal
    equations (``minimizer="cg"``), robust loss → ``iter_max``
    projected-Newton IRLS sweeps of ``irls_cg_iters`` masked-CG
    iterations each (``minimizer="irls"``, b_reg-ignoring quirk
    included). ``alpha``/``data_loss_scale`` stay runtime scalars.
    Reference anchor: nsol/tikhonov_linear_solver.py:120-220.
    """
    from nsol_tpu.ops.kernels import gaussian_kernel
    from nsol_tpu.ops.conv import separable_factors
    from nsol_tpu.ops.matmul_ops import circulant_matrix, laplacian_matrix

    if reg not in ("TK0", "TK1"):
        raise ValueError("reg must be TK0 or TK1")
    ndim = len(shape)
    if ndim not in (2, 3):
        raise ValueError("fused Tikhonov kernel supports 2-D/3-D volumes")
    kernel64 = gaussian_kernel(cov, alpha_cut=alpha_cut, spacing=spacing,
                               dtype=np.float64)
    factors = separable_factors(kernel64)
    if factors is None:
        raise ValueError("fused Tikhonov kernel requires a separable "
                         "(diagonal-covariance) blur")
    s = _spacing_array(spacing, ndim)

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    n_stencil = 1 if ndim == 3 else 0
    A_taps = [np.asarray(f, np_dtype) for f in factors[:n_stencil]]
    N_taps = [np.convolve(f, f[::-1]).astype(np_dtype)
              for f in factors[:n_stencil]]
    A_mats = [circulant_matrix(f, shape[ax], np_dtype)
              for ax, f in enumerate(factors) if ax >= n_stencil]
    N_mats = [circulant_matrix(np.convolve(f, f[::-1]), shape[ax],
                               np_dtype)
              for ax, f in enumerate(factors) if ax >= n_stencil]
    T_mats = ([] if reg == "TK0" else
              [laplacian_matrix(shape[ax], s[ndim - 1 - ax], np_dtype)
               for ax in range(n_stencil, ndim)])
    lap0_inv_h2 = np.asarray(1.0 / s[ndim - 1] ** 2, np_dtype)

    def conv_all(u, taps, mats):
        for t in taps:
            u = _roll_conv_axis0(u, t)
        for k, C in enumerate(mats):
            u = _minor_matmul(u, C, n_stencil + k, ndim, precision)
        return u

    def reg_apply(u, T_m, prec=precision):
        if reg == "TK0":
            return u
        out = _lap_axis0_stencil(u, lap0_inv_h2) if n_stencil else None
        for k, T in enumerate(T_m):
            t = _minor_matmul(u, T, n_stencil + k, ndim, prec)
            out = t if out is None else out + t
        return out

    # compact-directions levers (round 5, mirrors make_fused_admm_solver):
    # rounded CG directions -> blur matmuls reordered before the z taps
    # at "high2", regularizer matmuls at "exact1"/"high2"
    if compact_dirs and precision != "high3":
        raise ValueError("compact_dirs requires precision='high3'")
    reg_dir_prec = precision
    if compact_dirs and reg == "TK1":
        reg_dir_prec = ("exact1" if all(bf16_exact(T) for T in T_mats)
                        else "high2")
    round_dir = ((lambda u: u.astype(jnp.bfloat16).astype(dtype))
                 if compact_dirs else None)

    robust = data_loss != "linear"
    grad_rho = lf.gradient_loss(data_loss) if robust else None

    def kernel(b_ref, x0_ref, alpha_ref, *rest_refs):
        rest = list(rest_refs)
        dls = rest.pop(0)[0, 0] if robust else None
        out_ref = rest[-1]
        mat_refs = rest[:-1]
        mats = [m[:] for m in mat_refs]
        A_m = mats[:len(A_mats)]
        N_m = mats[len(A_mats):len(A_mats) + len(N_mats)]
        T_m = mats[len(A_mats) + len(N_mats):]

        alpha = alpha_ref[0, 0]
        b = b_ref[:]
        x = jnp.maximum(x0_ref[:], 0.0)  # clip x0 onto the box

        def blur_dir(u):
            # matmuls first on the bf16-exact rounded direction at
            # "high2", z taps after (convs commute; free in VMEM)
            s = u
            for k, Cm in enumerate(A_m):
                s = _minor_matmul(s, Cm, n_stencil + k, ndim, "high2")
            for t in A_taps:
                s = _roll_conv_axis0(s, t)
            return s

        if robust:
            def irls_sweep(_, x):
                r = conv_all(x, A_taps, A_m) - b
                wts = grad_rho(r * r, f_scale=dls)
                g = conv_all(wts * r, A_taps, A_m) \
                    + alpha * reg_apply(x, T_m)
                free = jnp.where(jnp.logical_and(x <= 0.0, g > 0.0),
                                 0.0, 1.0).astype(x.dtype)

                def apply_W(u):
                    uf = free * u
                    Auf = conv_all(uf, A_taps, A_m)
                    return free * (conv_all(wts * Auf, A_taps, A_m)
                                   + alpha * reg_apply(uf, T_m)) \
                        + (u - uf)

                def apply_W_dir(u):
                    uf = free * u  # {0,1} mask keeps bf16 exactness
                    return free * (conv_all(wts * blur_dir(uf),
                                            A_taps, A_m)
                                   + alpha * reg_apply(uf, T_m,
                                                       reg_dir_prec)) \
                        + (u - uf)

                step = _cg_inkernel(
                    apply_W, -free * g, jnp.zeros_like(x),
                    irls_cg_iters,
                    apply_dir=apply_W_dir if compact_dirs else None,
                    round_dir=round_dir)
                return jnp.maximum(x + step, 0.0)

            x = lax.fori_loop(0, iter_max, irls_sweep, x)
        else:
            At_b = conv_all(b, A_taps, A_m)  # A symmetric: Aᵀb = Ab

            def apply_M(u):
                return conv_all(u, N_taps, N_m) \
                    + alpha * reg_apply(u, T_m)

            def apply_M_dir(u):
                # the normal-blur matmuls ride the rounded direction
                s = u
                for k, Cm in enumerate(N_m):
                    s = _minor_matmul(s, Cm, n_stencil + k, ndim,
                                      "high2")
                for t in N_taps:
                    s = _roll_conv_axis0(s, t)
                return s + alpha * reg_apply(u, T_m, reg_dir_prec)

            x = _cg_inkernel(
                apply_M, At_b, x, iter_max,
                apply_dir=apply_M_dir if compact_dirs else None,
                round_dir=round_dir)
            x = jnp.maximum(x, 0.0)
        out_ref[:] = x

    mats = [jnp.asarray(m) for m in (A_mats + N_mats + T_mats)]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[vmem, vmem, smem] + ([smem] if robust else [])
        + [vmem] * len(mats),
        out_specs=vmem,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def solve(b, x0, alpha, data_loss_scale=1.0):
        a = jnp.full((1, 1), alpha, dtype)
        extra = ((jnp.full((1, 1), data_loss_scale, dtype),) if robust
                 else ())
        return call(jnp.asarray(b, dtype), jnp.asarray(x0, dtype), a,
                    *extra, *mats)

    return solve


# --------------------------------------------------------------------------
# Fused primal-dual denoising (BASELINE config 1 class of problems)
# --------------------------------------------------------------------------

#: PD state: x, x̄, b + ndim dual components + operator temporaries.
_PD_STATE_VOLUMES = 12


def fused_pd_fits_vmem(shape, dtype=jnp.float32):
    """Heuristic: does the fused PD denoiser's working set fit in VMEM?"""
    bytes_per_vol = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
    return _PD_STATE_VOLUMES * bytes_per_vol <= _VMEM_BUDGET_BYTES


def _pd_schedules(alpha, L2, iterations, alg_type, dtype):
    """Per-iteration (σ_t, τ_t, τ_t·λ, θ_t) step-size schedules, computed in
    plain XLA so the Mosaic loop only *indexes* scalars (no in-kernel sqrt
    recurrence, no scalar loop carry). Mirrors
    :func:`nsol_tpu.solvers.primal_dual.primal_dual_solve`: σ/τ enter
    iteration t, θ_t is the over-relaxation applied at iteration t.
    """
    alpha = jnp.asarray(alpha, dtype)
    L2 = jnp.asarray(L2, dtype)
    lmbda = 1.0 / alpha

    if alg_type == "ALG3":
        delta = jnp.asarray(0.05, dtype)  # primal_dual.ALG3_HUBER_DELTA
        mu = 2.0 * jnp.sqrt(lmbda * delta / L2)
        theta = jnp.full((iterations,), 1.0 / (1.0 + mu), dtype)
        sigma = jnp.full((iterations,), mu / (2.0 * delta), dtype)
        tau = jnp.full((iterations,), mu / (2.0 * lmbda), dtype)
        return sigma, tau, tau * lmbda, theta

    if alg_type == "ALG2":
        tau0 = 1.0 / jnp.sqrt(L2)
        sigma0 = 1.0 / (L2 * tau0)
    else:  # ALG2_AHMOD
        tau0 = jnp.asarray(0.02, dtype)
        sigma0 = 4.0 / (L2 * tau0)
    gamma = 0.35 * lmbda

    def step(carry, _):
        tau_t, sigma_t = carry
        th = 1.0 / jnp.sqrt(1.0 + 2.0 * gamma * tau_t)
        out = (sigma_t, tau_t,
               th if alg_type == "ALG2" else jnp.asarray(0.0, dtype))
        return (tau_t * th, sigma_t / th), out

    _, (sigma, tau, theta) = lax.scan(step, (tau0, sigma0), None,
                                      length=iterations)
    return sigma, tau, tau * lmbda, theta


def make_fused_pd_denoise_solver(shape, reconstruction_type,
                                 alg_type="ALG2", iterations=50,
                                 spacing=None, dtype=jnp.float32,
                                 huber_gamma=0.05, record=False,
                                 compact=False,
                                 interpret=False):
    """Build ``solve(b, x0, alpha, L2) -> x``: a whole Chambolle–Pock
    denoising solve as ONE VMEM-resident Pallas program.

    The XLA PD path (solvers/primal_dual.py) is launch-overhead-bound at
    denoising sizes: 50 iterations of a handful of cheap fused kernels over
    a ≤1 MiB image. Here the image loads into VMEM once and all
    ``iterations`` steps run inside one Mosaic program; the gradient/
    divergence stencils are concat-slice differences (all axes, incl. the
    tiled minor dims — same lowering the fused ADMM kernel uses for its
    v-update).

    ``reconstruction_type``: TVL1/TVL2 (componentwise TV-conj projection,
    reference quirk preserved) or HuberL1/HuberL2 (γ=0.05 shrink first);
    L1 vs L2 selects the shifted-soft-threshold vs closed-form ℓ2 primal
    prox with ``x0 = b`` (the denoising problem; reference:
    nsol/application/run_denoising.py:109-131, proximal_operators.py:95-159).
    ``alpha``/``L2`` stay runtime scalars — the step-size schedules are
    precomputed per call in plain XLA (`_pd_schedules`) and indexed from
    SMEM, so alpha sweeps neither retrace nor recompile.

    ``record=True``: the kernel also accumulates the study engine's
    L-curve measures in-graph per iterate, row 0 = the x0 state (matching
    the reference observer's add_x-at-init); ``solve`` returns
    ``(x, {"Reg": (iterations+1,), "Data": (iterations+1,)})``. The
    measure FORMULAS follow the reconstruction type exactly as the
    denoising-study CLI defines them (cli/run_denoising_study.py):
    ``Data`` is SSD for L2 types and SAD for L1 types (no ½ factor —
    reference quirk), ``Reg`` is isotropic TV for TV types and the
    Huber-of-gradient-magnitude prior for Huber types. The Huber record
    γ is a RUNTIME scalar (``solve(..., record_gamma=γ)``): callers
    working in ``x/x_scale`` units pass ``γ/x_scale`` and postscale the
    recorded value by ``x_scale²`` (the identity
    ``huber(s·x, γ) = s²·huber(x, γ/s)``), keeping the study's
    rescaled-iterate measure semantics without retracing per scale.

    ``compact=True`` (opt-in — PD has no exact outer correction, so
    unlike the ADMM kernel's ``compact_dirs`` this perturbs the iterate
    itself): the loop-carried state (x, x̄, dual p) is stored in VMEM as
    bfloat16 and every arithmetic step runs f32 on the upcast values.
    Because the upcast state is bf16-EXACT, the minor-axis difference
    matmuls collapse to ONE DEFAULT MXU pass each (the exact1 reasoning)
    and the loop's VMEM traffic halves. The converged PD fixed point
    moves by a bf16-rounding-class amount (~1e-3 relative voxel
    deviation — measured, tests/test_pallas.py); the in-kernel Reg/Data
    records measure the ROUNDED iterate (what the solver actually
    returns). Not a default anywhere; the exact kernels stay the
    parity-gated paths.
    """
    if reconstruction_type not in ("TVL1", "TVL2", "HuberL1", "HuberL2"):
        raise ValueError("unknown reconstruction type '%s'"
                         % reconstruction_type)
    if alg_type not in ("ALG2", "ALG2_AHMOD", "ALG3"):
        raise ValueError("alg_type must be one of ALG2/ALG2_AHMOD/ALG3")
    ndim = len(shape)
    if ndim not in (2, 3):
        raise ValueError("fused PD kernel supports 2-D/3-D volumes")
    ell1 = reconstruction_type.endswith("L1")
    huber = reconstruction_type.startswith("Huber")

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    s = _spacing_array(spacing, ndim)  # spatial (x, y[, z]) order
    inv_s = [np.asarray(1.0 / s[i], np_dtype) for i in range(ndim)]
    gamma_h = np.asarray(huber_gamma, np_dtype)

    # Minor-axis (tiled sublane/lane) differences as bidiagonal MXU
    # matmuls: lane-axis concat-slice shifts are the pathological Mosaic
    # data movement (measured: the shift variant of this kernel LOSES to
    # the XLA path; the matmul variant wins — BASELINE.md). The untiled
    # leading axis of a 3-D volume keeps the cheap slab-reindex stencil.
    # Axes of >= _BANDED_MIN_AXIS use the block-banded schedule (identical
    # 128-wide diagonal blocks + masked corner term) instead of the dense
    # (n, n) matmul whose O(n) MACs/element sank the 1024² alpha sweep
    # (round-2 VERDICT item 3).
    minor_axes = list(range(max(ndim - 2, 0), ndim))
    banded_ax = [shape[ax] >= _BANDED_MIN_AXIS and shape[ax] % 128 == 0
                 for ax in minor_axes]
    D_np = [difference_matrix(128 if banded else shape[ax], np_dtype)
            for ax, banded in zip(minor_axes, banded_ax)]
    D_all = D_np + [D.T.copy() for D in D_np]
    n_minor = len(D_np)

    def kernel(b_ref, x0_ref, sig_ref, tau_ref, ft_ref, th_ref,
               *mat_refs):
        if record:
            rg_ref = mat_refs[0]
            mat_refs = mat_refs[1:]
            out_ref, reg_ref, data_ref = mat_refs[-3:]
            mat_refs = mat_refs[:-3]
        else:
            out_ref = mat_refs[-1]
            mat_refs = mat_refs[:-1]
        Ds = [m[:] for m in mat_refs[:n_minor]]
        DTs = [m[:] for m in mat_refs[n_minor:2 * n_minor]]
        b = b_ref[:]
        x = x0_ref[:]

        def grad_comp(u, i):
            # compact mode: u is a bf16-exact upcast -> exact1 single pass
            ax = ndim - 1 - i
            if ax >= ndim - 2:
                k = ax - (ndim - 2)
                if banded_ax[k]:
                    t = _banded_diff(u, Ds[k], +1, ax, ndim, exact1=compact)
                else:
                    t = _exact_bf16_matmul(u, Ds[k], ax, ndim,
                                           exact1=compact)
            else:
                t = _fwd_diff(u, ax)
            return t * inv_s[i]

        def div_acc(comps):
            out = None
            for i in range(ndim):
                ax = ndim - 1 - i
                if ax >= ndim - 2:
                    k = ax - (ndim - 2)
                    if banded_ax[k]:
                        t = _banded_diff(comps[i], DTs[k], -1, ax, ndim,
                                         exact1=compact)
                    else:
                        t = _exact_bf16_matmul(comps[i], DTs[k], ax, ndim,
                                               exact1=compact)
                else:
                    t = _fwd_diff_adj(comps[i], ax)
                t = t * inv_s[i]
                out = t if out is None else out + t
            return out

        cdn = jnp.bfloat16 if compact else dtype

        def _round(v):
            return v.astype(cdn) if compact else v

        def _up(v):
            return v.astype(dtype) if compact else v

        def write_measures(t, u):
            # study-engine L-curve feeds, type-matched formulas
            # (cli/run_denoising_study.py measures_dic)
            g2 = None
            for i in range(ndim):
                gi = grad_comp(u, i)
                g2 = gi * gi if g2 is None else g2 + gi * gi
            if huber:
                grec = rg_ref[0, 0]
                g2rec = grec * grec
                reg = 0.5 * jnp.sum(jnp.where(
                    g2 < g2rec, g2,
                    2.0 * grec * jnp.sqrt(g2) - g2rec))
            else:
                reg = jnp.sum(jnp.sqrt(g2))
            d = u - b
            data = jnp.sum(jnp.abs(d)) if ell1 else jnp.sum(d * d)
            reg_ref[pl.ds(t, 1), :] = jnp.full((1, 128), reg, dtype)
            data_ref[pl.ds(t, 1), :] = jnp.full((1, 128), data, dtype)

        if record:
            write_measures(0, _up(_round(x)))

        def body(t, carry):
            x, x_mean, p = carry
            # compact: carry is stored bf16; all arithmetic below runs
            # f32 on the (bf16-exact) upcasts
            x = _up(x)
            x_mean = _up(x_mean)
            p = tuple(_up(pi) for pi in p)
            sigma = sig_ref[t, 0]
            tau = tau_ref[t, 0]
            ft = ft_ref[t, 0]      # τ·λ — the primal prox step
            theta = th_ref[t, 0]

            # dual ascent + conjugate prox (componentwise projection;
            # Huber shrinks by 1/(1+σγ) first)
            def prox_conj(q):
                if huber:
                    q = q / (1.0 + sigma * gamma_h)
                return q / jnp.maximum(1.0, jnp.abs(q))

            p = tuple(prox_conj(p[i] + sigma * grad_comp(x_mean, i))
                      for i in range(ndim))
            # round the fresh dual BEFORE the divergence so its matmuls
            # see the same bf16-exact value the next iteration carries
            p = tuple(_up(_round(pi)) for pi in p)

            # primal prox at x − τ·Bᵀp with step τλ, x0 = b
            z = x - tau * div_acc(p)
            if ell1:
                d = z - b
                x_new = b + jnp.maximum(jnp.abs(d) - ft, 0.0) * jnp.sign(d)
            else:
                x_new = (z + ft * b) / (1.0 + ft)
            # the compact iterate IS the rounded value — measures and the
            # over-relaxation step both see it
            x_new = _up(_round(x_new))

            if record:
                write_measures(t + 1, x_new)
            x_mean = x_new + theta * (x_new - x)
            return (_round(x_new), _round(x_mean), tuple(_round(pi)
                                                         for pi in p))

        x_c = _round(x)
        p0 = tuple(jnp.zeros_like(x_c) for _ in range(ndim))
        x, _, _ = lax.fori_loop(0, iterations, body, (x_c, x_c, p0))
        out_ref[:] = _up(x)

    mats = [jnp.asarray(D) for D in D_all]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((iterations, 1), memory_space=pltpu.SMEM)

    out_shape = jax.ShapeDtypeStruct(shape, dtype)
    out_specs = vmem
    if record:
        rec_shape = jax.ShapeDtypeStruct((iterations + 1, 128), dtype)
        out_shape = (out_shape, rec_shape, rec_shape)
        out_specs = (vmem, vmem, vmem)

    rec_smem = [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] \
        if record else []
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vmem, vmem, smem, smem, smem, smem] + rec_smem
        + [vmem] * len(mats),
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def solve(b, x0, alpha, L2, record_gamma=huber_gamma):
        sigma, tau, ft, theta = _pd_schedules(alpha, L2, iterations,
                                              alg_type, dtype)
        extra = ((jnp.full((1, 1), record_gamma, dtype),) if record
                 else ())
        out = call(jnp.asarray(b, dtype), jnp.asarray(x0, dtype),
                   sigma[:, None], tau[:, None], ft[:, None],
                   theta[:, None], *extra, *mats)
        if record:
            x, reg, data = out
            return x, {"Reg": reg[:, 0], "Data": data[:, 0]}
        return out

    return solve
