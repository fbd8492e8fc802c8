"""Streaming blocked kernels for ROBUST deconvolution past VMEM.

The linear-loss scale path (ops/pallas/blocked.py) exploits the
self-correlated normal operator: ``AᵀA`` of a separable wrap blur is one
separable conv, so the whole SPD apply is ONE streaming pass. A robust
data loss (huber/soft_l1/cauchy/arctan — the reference solves these at
any size via its scipy minimize path,
/root/reference/nsol/tikhonov_linear_solver.py:197-220, with the
weighted gradient of /root/reference/nsol/linear_solver.py:331-340)
breaks that trick: the IRLS weight sits BETWEEN the two blur passes,
``M_W v = Aᵀ(w ⊙ (A v)) + ρ·DᵀD v``.

The kernel here keeps it one streaming pass anyway: per z-block the
first blur pass is evaluated on the ``block + 2·r_A`` EXTENDED rows
(the input halo is the full normal-operator halo ``r = 2·r_A``, so the
extended first-pass rows are exact), the weight multiplies in VMEM, and
the second blur pass + the boundary-corrected Laplacian produce the
center rows — 2 halo'd reads (v, w) + 1 write per application instead
of the two-kernel formulation's 4 reads + 2 writes. The per-block MXU
cost grows by ``(B + 2·r_A)/B`` on the first pass's minor matmuls —
measured cheaper than the extra HBM round-trip of materializing
``A v``.

Builders:

* :func:`make_blocked_blur_operator` — streaming ``A v`` (halo
  ``r_A``); ``with_lap=True`` adds ``+ ρ·DᵀD u`` of a second input (the
  IRLS gradient ``∇cost = Aᵀ(w·r) + ρ·DᵀD x`` in one pass, using
  ``A = Aᵀ`` for the symmetric Gaussian).
* :func:`make_blocked_weighted_normal_operator` — ``M_W`` above, the
  CG hot apply of every IRLS sweep (1-D z-blocked);
  :func:`make_blocked_weighted_normal_operator_2d` — its (z, y)-blocked
  512-wide-plane form (double-buffered where the 1-D layout only fits
  single-buffered). Both take ``io_dtype=jnp.bfloat16`` for the
  compact levers (bf16 slabs, one-DEFAULT-pass matmul-first blur,
  exact1/high2 Laplacian).
* :func:`blocked_robust_admm_solve` — the full ADMM solve for robust
  TV-deconvolution past VMEM, mirroring
  ``admm_solve(minimizer="irls")`` guard for guard (MM sweeps freezing
  ``w = ρ'(r²)`` and the active box constraints, masked CG on the free
  variables, the reference's b_reg-ignoring robust-path quirk —
  /root/reference/nsol/tikhonov_linear_solver.py:276-280); parity is
  pinned in tests/test_pallas.py against the XLA IRLS path.

Layout/DMA machinery (wrap-halo slab copies, double buffering, VMEM
budget model, minor-axis MXU matmuls incl. ``precision="high3"`` and
the windowed-band forms) is shared with ops/pallas/blocked.py.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsol_tpu.ops import losses as lf
from nsol_tpu.ops.pallas.blocked import (
    _Stencils, _load_ext_pipelined, _pick_layout, _conv_minor,
    _lap_minor, _ext_dma_pre,
)
from nsol_tpu.ops.pallas.fused import banded_window_matrix, _minor_matmul

__all__ = ["make_blocked_blur_operator",
           "make_blocked_weighted_normal_operator",
           "make_blocked_weighted_normal_operator_2d",
           "blocked_robust_admm_solve"]


class _RobustStencils(_Stencils):
    """_Stencils plus the single-blur (non-normal) operator data: z taps
    of ``A`` itself and the per-minor-axis blur circulants."""

    def __init__(self, shape, cov, alpha_cut, spacing, dtype):
        _Stencils.__init__(self, shape, cov, alpha_cut, spacing, dtype)
        from nsol_tpu.ops.matmul_ops import circulant_matrix

        self.a_z = np.asarray(self.factors[0], self.np_dtype)
        self.r_a = len(self.a_z) // 2
        # the normal halo is exactly twice the blur halo (nfac = f⋆f)
        assert self.halo == 2 * self.r_a
        _, Y, X = shape
        wb = lambda M: jnp.asarray(banded_window_matrix(M))
        Ay = circulant_matrix(self.factors[1], Y, self.np_dtype)
        Ax = circulant_matrix(self.factors[2], X, self.np_dtype)
        self.Ay = wb(Ay) if self.banded_y else jnp.asarray(Ay)
        self.Ax = wb(Ax) if self.banded_x else jnp.asarray(Ax)


def _lap_center(get, st, rho, i, block, ty, tx, r, precision,
                lap_precision=None, row0=None, z_total=None):
    """``ρ·DᵀD`` on a slab's ``block`` center rows — the Laplacian half
    of blocked.py::_normal_center (zero-boundary corrections of
    ops/grad.py:108 at the global z edges). Under spatial sharding the
    slab is a window of a larger global z axis: ``row0`` (traced) is
    the global row of local row 0, ``z_total`` the global extent."""
    Z = st.shape[0] if z_total is None else z_total
    center = get(r, block)
    up = get(r + 1, block)
    down = get(r - 1, block)
    lz = 2.0 * center - up - down
    off = i * block if row0 is None else i * block + row0
    rows = lax.broadcasted_iota(jnp.int32, (block, 1, 1), 0) + off
    first = lax.slice_in_dim(center, 0, 1, axis=0) \
        - lax.slice_in_dim(center, 1, 2, axis=0)
    last = 2.0 * lax.slice_in_dim(center, block - 1, block, axis=0) \
        - lax.slice_in_dim(center, block - 2, block - 1, axis=0)
    lz = jnp.where(rows == 0, first, lz)
    lz = jnp.where(rows == Z - 1, last, lz)
    lp = precision if lap_precision is None else lap_precision
    lap = lz * st.inv_h2_z \
        + _lap_minor(center, ty, 1, st.banded_y, st.inv_h2_y, lp) \
        + _lap_minor(center, tx, 2, st.banded_x, st.inv_h2_x, lp)
    return rho * lap


def _blur_rows(get, st, ay, ax, n_rows, precision):
    """``A`` applied to slab rows ``[0, n_rows)`` (z taps consume the
    ``r_a`` halo on each side, then the minor-axis circulant matmuls)."""
    s = None
    for t in range(2 * st.r_a + 1):
        term = st.a_z[t] * get(t, n_rows)
        s = term if s is None else s + term
    s = _conv_minor(s, ay, 1, st.banded_y, precision)
    return _conv_minor(s, ax, 2, st.banded_x, precision)


def _robust_layout(st, shape, r, n_ext, block, prepadded, dtype,
                   slab_dtype=None):
    """(block, n_buf, nblk) for a robust streaming kernel; prepadded
    tiny shards (CPU-mesh tests, many-way shardings) fall back to one
    single-buffered block. ``slab_dtype``: the DMA'd slab dtype when it
    differs (compact bf16 halves slab residency — unlocks the 512³
    1-D layout that f32 cannot fit, albeit single-buffered)."""
    Z, Y, X = shape
    if block is None:
        block, n_buf = _pick_layout(shape, r, dtype, n_ext=n_ext,
                                    n_io=1, n_tmp=8,
                                    slab_dtype=slab_dtype)
        if block is None and prepadded:
            plane = Y * X * jnp.dtype(dtype).itemsize
            if (n_ext + 1) * (Z + 2 * r) * plane + 8 * Z * plane \
                    <= 112 * 1024 * 1024:
                block, n_buf = Z, 1
        if block is None:
            raise ValueError("no z-block layout of shape %s fits the "
                             "scoped-VMEM budget" % (shape,))
    else:
        n_buf = 2
    if prepadded:
        if Z % block:
            raise ValueError("local z extent %d not divisible by block "
                             "%d" % (Z, block))
        nblk = Z // block
    else:
        nblk = st.validate_block(block)
    return block, n_buf, nblk


def make_blocked_blur_operator(shape, cov, alpha_cut=3, spacing=None,
                               block=None, dtype=jnp.float32,
                               precision=lax.Precision.HIGHEST,
                               with_lap=False, interpret=False,
                               prepadded=False, z_total=None, vma=None):
    """Streaming z-blocked ``A v`` (separable wrap Gaussian blur) — and,
    with ``with_lap=True``, ``apply(y, u, rho) -> A y + rho·DᵀD u``:
    since the symmetric Gaussian has ``A = Aᵀ``, that second form IS the
    IRLS cost gradient ``Aᵀ(w·r) + ρ·DᵀD x`` when called with
    ``y = w·r, u = x`` (/root/reference/nsol/linear_solver.py:331-340).

    Semantics match ops/conv.py's separable wrap blur and
    ops/grad.py::gradient_normal exactly; halos are the BLUR half-width
    ``r_a`` (half the normal operator's).

    ``prepadded=True`` (the sharded per-shard form, as
    blocked.py::make_blocked_normal_operator_prepadded): inputs arrive
    with their z halos already attached (``ppermute`` ring exchange
    under ``shard_map``), the slab DMA is one contiguous copy, and the
    Laplacian's global-boundary rows are selected from the traced
    ``row0`` / static ``z_total``; ``apply`` then takes
    ``(y_ext[, u_ext], rho, row0)``."""
    st = _RobustStencils(shape, cov, alpha_cut, spacing, dtype)
    r = max(st.r_a, 1)  # the lap stencil needs at least one halo row
    n_ext = 2 if with_lap else 1
    block, n_buf, nblk = _robust_layout(st, shape, r, n_ext, block,
                                        prepadded, dtype)
    Z, Y, X = shape
    z_total = int(z_total) if z_total is not None else Z
    dma = _ext_dma_pre if prepadded else None

    def kernel(sc_ref, row0_ref, ay_ref, ax_ref, ty_ref, tx_ref, *refs):
        if with_lap:
            y_hbm, u_hbm, out_ref, ext_y, ext_u, sem_y, sem_u = refs
            inputs = [(y_hbm, ext_y, sem_y), (u_hbm, ext_u, sem_u)]
        else:
            y_hbm, out_ref, ext_y, sem_y = refs
            inputs = [(y_hbm, ext_y, sem_y)]
        i = pl.program_id(0)
        slot = _load_ext_pipelined(inputs, i, nblk, Z, block, r,
                                   n_buf=n_buf, dma=dma)
        gety = lambda s0, n: ext_y[slot, pl.ds(s0 + (r - st.r_a), n)]
        q = _blur_rows(gety, st, ay_ref[:], ax_ref[:], block, precision)
        if with_lap:
            getu = lambda s0, n: ext_u[slot, pl.ds(s0, n)]
            q = q + _lap_center(
                getu, st, sc_ref[0, 0], i, block, ty_ref[:], tx_ref[:],
                r, precision,
                row0=row0_ref[0, 0] if prepadded else None,
                z_total=z_total if prepadded else None)
        out_ref[:] = q

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    slab = lambda: pltpu.VMEM((n_buf, block + 2 * r, Y, X), dtype)
    sem = lambda: pltpu.SemaphoreType.DMA((n_buf,))
    scratch = ([slab(), slab(), sem(), sem()] if with_lap
               else [slab(), sem()])
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            smem(), smem(),
            const(st.Ay.shape), const(st.Ax.shape),
            const(st.Ty.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] if with_lap else []),
        out_specs=pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            shape, dtype,
            vma=frozenset(vma) if vma is not None else None),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def _call(y, u, rho, row0):
        rr = jnp.full((1, 1), rho, dtype)
        r0 = jnp.full((1, 1), row0, jnp.int32)
        args = (rr, r0, st.Ay, st.Ax, st.Ty, st.Tx,
                jnp.asarray(y, dtype))
        if with_lap:
            args += (jnp.asarray(u, dtype),)
        return call(*args)

    if prepadded and with_lap:
        apply = lambda y_ext, u_ext, rho, row0: _call(y_ext, u_ext, rho,
                                                      row0)
    elif prepadded:
        apply = lambda y_ext: _call(y_ext, None, 0.0, 0)
    elif with_lap:
        apply = lambda y, u, rho: _call(y, u, rho, 0)
    else:
        apply = lambda y: _call(y, None, 0.0, 0)

    apply.halo = r
    apply.block = block
    return apply


def make_blocked_weighted_normal_operator(shape, cov, alpha_cut=3,
                                          spacing=None, block=None,
                                          dtype=jnp.float32,
                                          precision=lax.Precision.HIGHEST,
                                          interpret=False,
                                          prepadded=False, z_total=None,
                                          vma=None, io_dtype=None):
    """Build ``apply(v, w, rho) -> Aᵀ(w ⊙ (A v)) + rho·DᵀD v`` streaming
    over z-blocks in ONE pass — the SPD apply of every IRLS inner-CG
    iteration on a robust deconvolution (the weighted normal equations
    of the MM surrogate, solvers/tikhonov.py::tikhonov_solve
    ``minimizer="irls"``).

    Per block: the first blur pass is evaluated on the extended
    ``block + 2·r_a`` rows straight from the ``v`` slab (whose halo is
    the full ``r = 2·r_a``, so those rows are exact), the frozen IRLS
    weight ``w`` (halo ``r_a``, loaded with the same ``r``-halo slab
    machinery) multiplies in VMEM, and the second (adjoint = identical,
    symmetric taps) blur pass plus the boundary-corrected Laplacian
    produce the center. One read of v + one of w + one write — vs 4
    reads + 2 writes for the two-kernel split.

    ``prepadded=True``: sharded per-shard form — v and w arrive with
    their ``r``-row z halos attached, the slab DMA is contiguous, and
    the Laplacian's global-boundary rows come from the traced ``row0``
    / static ``z_total``; ``apply`` takes ``(v_ext, w_ext, rho,
    row0)``.

    ``io_dtype=jnp.bfloat16`` (round 5, compact robust): v/w/q and the
    slabs live in bf16 (HBM traffic ~halves) while all arithmetic runs
    in ``dtype``; the bf16-exact slab lets the FIRST blur pass's minor
    matmuls run as ONE DEFAULT pass on the full slab rows BEFORE the
    z-tap accumulation (the "default1" reorder of the linear blocked
    kernels) and the Laplacian as "exact1"/"high2". The second pass's
    operand is an f32 accumulation and keeps ``precision``. Callers
    keep r/x/g and the outer gradient f32 (inexact-Newton correction —
    same argument as the linear compact_dirs mode)."""
    st = _RobustStencils(shape, cov, alpha_cut, spacing, dtype)
    io = dtype if io_dtype is None else jnp.dtype(io_dtype)
    lap_prec = (("exact1" if st.lap_exact else "high2")
                if io == jnp.bfloat16 else None)
    r = st.halo  # = 2·r_a ≥ 2 — covers the lap's ±1 too
    block, n_buf, nblk = _robust_layout(st, shape, r, 2, block,
                                        prepadded, dtype,
                                        slab_dtype=io)
    Z, Y, X = shape
    z_total = int(z_total) if z_total is not None else Z
    ra = st.r_a
    dma = _ext_dma_pre if prepadded else None

    def kernel(sc_ref, row0_ref, ay_ref, ax_ref, ty_ref, tx_ref, v_hbm,
               w_hbm, out_ref, ext_v, ext_w, sem_v, sem_w):
        i = pl.program_id(0)
        slot = _load_ext_pipelined(
            [(v_hbm, ext_v, sem_v), (w_hbm, ext_w, sem_w)], i, nblk, Z,
            block, r, n_buf=n_buf, dma=dma)
        ay, ax = ay_ref[:], ax_ref[:]
        getv_ext = lambda s0, n: ext_v[slot, pl.ds(s0, n)].astype(dtype)
        if io == jnp.bfloat16:
            # "default1" reorder: ONE DEFAULT-pass matmul per minor
            # axis on the bf16-exact FULL slab rows, z taps after —
            # onto the extended rows [-r_a, block + r_a)
            s_all = getv_ext(0, block + 2 * r)
            s_all = _conv_minor(s_all, ay, 1, st.banded_y,
                                lax.Precision.DEFAULT)
            s_all = _conv_minor(s_all, ax, 2, st.banded_x,
                                lax.Precision.DEFAULT)
            s = None
            for t in range(2 * ra + 1):
                term = st.a_z[t] * lax.slice_in_dim(
                    s_all, t, t + block + 2 * ra, axis=0)
                s = term if s is None else s + term
        else:
            # pass 1: A v on the EXTENDED rows [-r_a, block + r_a) —
            # slab row s0 of the range maps to index s0 + (r - r_a)
            s = _blur_rows(getv_ext, st, ay, ax, block + 2 * ra,
                           precision)
        # frozen IRLS weight: w slab rows [-r_a, block + r_a) align with
        # s (w was DMA'd with the same r halo; offset r - r_a)
        s = s * ext_w[slot, pl.ds(r - ra, block + 2 * ra)].astype(dtype)
        # pass 2 (adjoint = same symmetric taps) on the center rows;
        # operand is an f32 accumulation — keeps ``precision``
        q = None
        for t in range(2 * ra + 1):
            term = st.a_z[t] * lax.slice_in_dim(s, t, t + block, axis=0)
            q = term if q is None else q + term
        q = _conv_minor(q, ay, 1, st.banded_y, precision)
        q = _conv_minor(q, ax, 2, st.banded_x, precision)
        getv = lambda s0, n: ext_v[slot, pl.ds(s0, n)].astype(dtype)
        q = q + _lap_center(
            getv, st, sc_ref[0, 0], i, block, ty_ref[:], tx_ref[:], r,
            precision, lap_precision=lap_prec,
            row0=row0_ref[0, 0] if prepadded else None,
            z_total=z_total if prepadded else None)
        out_ref[:] = q.astype(io)

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            smem(), smem(),
            const(st.Ay.shape), const(st.Ax.shape),
            const(st.Ty.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            shape, io,
            vma=frozenset(vma) if vma is not None else None),
        scratch_shapes=[
            pltpu.VMEM((n_buf, block + 2 * r, Y, X), io),
            pltpu.VMEM((n_buf, block + 2 * r, Y, X), io),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def _call(v, w, rho, row0):
        rr = jnp.full((1, 1), rho, dtype)
        r0 = jnp.full((1, 1), row0, jnp.int32)
        return call(rr, r0, st.Ay, st.Ax, st.Ty, st.Tx,
                    jnp.asarray(v, io), jnp.asarray(w, io))

    if prepadded:
        apply = lambda v_ext, w_ext, rho, row0: _call(v_ext, w_ext, rho,
                                                      row0)
    else:
        apply = lambda v, w, rho: _call(v, w, rho, 0)

    apply.halo = r
    apply.block = block
    return apply


def blocked_robust_admm_solve(shape, cov, alpha_cut=3, spacing=None,
                              iterations=10, iter_max=10,
                              irls_cg_iters=8, data_loss="huber",
                              dtype=jnp.float32,
                              precision=lax.Precision.HIGHEST,
                              interpret=False, compact_dirs=False):
    """Build ``solve(b, x0, alpha, rho, data_loss_scale=1.0) -> x``:
    robust ADMM TV-deconvolution for volumes past VMEM, fully streaming
    (VERDICT r4 item 1 — the last problem-class × scale cell).

    The x-update mirrors ``tikhonov_solve(minimizer="irls")`` exactly
    (``alpha=rho``, bounds ``(0, ∞)``, the reference's b_reg-ignoring
    robust-path quirk): ``iter_max`` MM sweeps, each freezing
    ``w = ρ'(r²)`` and the active box constraints, then
    ``irls_cg_iters`` masked-CG iterations whose SPD apply is the
    one-pass streaming :func:`make_blocked_weighted_normal_operator`;
    the residual and gradient ride
    :func:`make_blocked_blur_operator` (``with_lap`` fuses
    ``Aᵀ(w·r) + ρ·DᵀD x`` into one pass). Outer TV prox/dual updates
    are the same XLA elementwise chains as the linear
    ``blocked_admm_solve``. Parity vs ``admm_solve(minimizer="irls")``
    on the XLA matmul operators is pinned in tests/test_pallas.py."""
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.prox import vectorial_soft_threshold

    blur = None
    if shape[1] >= 512:
        # 512-wide planes: the 2-D blur restores double-buffered DMA
        # where the 1-D layout only fits single-buffered
        try:
            blur = make_blocked_blur_operator_2d(
                shape, cov, alpha_cut=alpha_cut, spacing=spacing,
                dtype=dtype, precision=precision, interpret=interpret)
        except ValueError:
            blur = None
    if blur is None:
        blur = make_blocked_blur_operator(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing,
            dtype=dtype, precision=precision, interpret=interpret)
    try:
        blur_lap = make_blocked_blur_operator(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing,
            dtype=dtype, precision=precision, with_lap=True,
            interpret=interpret)
    except ValueError:
        # 512³-class: the two-input fused 1-D gradient pass exceeds the
        # VMEM budget in f32 — the 2-D form fits (double-buffered);
        # compose blur + exact XLA Laplacian as the last resort (the
        # gradient stays exact-f32 either way)
        blur_lap = None
        if shape[1] >= 512:
            try:
                blur_lap = make_blocked_blur_operator_2d(
                    shape, cov, alpha_cut=alpha_cut, spacing=spacing,
                    dtype=dtype, precision=precision, with_lap=True,
                    interpret=interpret)
            except ValueError:
                blur_lap = None
        if blur_lap is None:
            from nsol_tpu.ops import grad as _G

            blur_lap = lambda y, u, rho: blur(y) \
                + rho * _G.gradient_normal(u, spacing)
    # compact_dirs (round 5): the inner-CG directions, the frozen
    # weights, and q stream through the weighted kernel in bf16 (r/x/g
    # and the per-sweep residual stay f32, computed by the exact f32
    # blur/blur_lap kernels above — the same inexact-Newton argument as
    # the linear compact_dirs mode: the MM sweep's gradient is exact,
    # only the inner SPD solve is slightly perturbed)
    io = jnp.dtype(jnp.bfloat16) if compact_dirs else dtype
    wnormal = None
    if shape[1] >= 512:
        # 512-wide planes: the 2-D (z, y)-blocked weighted kernel
        # double-buffers where the 1-D layout only fits single-buffered
        try:
            wnormal = make_blocked_weighted_normal_operator_2d(
                shape, cov, alpha_cut=alpha_cut, spacing=spacing,
                dtype=dtype, precision=precision, interpret=interpret,
                io_dtype=(io if compact_dirs else None))
        except ValueError:
            wnormal = None
    if wnormal is None:
        wnormal = make_blocked_weighted_normal_operator(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing, dtype=dtype,
            precision=precision, interpret=interpret,
            io_dtype=(io if compact_dirs else None))
    to_f = (lambda a: a) if io == dtype \
        else (lambda a: a.astype(dtype))
    to_io = (lambda a: a) if io == dtype \
        else (lambda a: a.astype(io))
    grad_rho = lf.gradient_loss(data_loss)

    def solve(b, x0, alpha, rho, data_loss_scale=1.0):
        b = jnp.asarray(b, dtype)
        x = jnp.asarray(x0, dtype)
        alpha = jnp.asarray(alpha, dtype)
        rho = jnp.asarray(rho, dtype)
        dls = jnp.asarray(data_loss_scale, dtype)
        v = G.gradient(x, spacing)
        w_dual = jnp.zeros_like(v)

        def irls_sweep(x, _):
            r = blur(x) - b
            wts = grad_rho(r * r, f_scale=dls)
            g = blur_lap(wts * r, x, rho)
            free = jnp.where(jnp.logical_and(x <= 0.0, g > 0.0),
                             0.0, 1.0).astype(dtype)
            wts16 = to_io(wts)

            # masked CG on the free variables (solvers/cg.py::cg
            # semantics, inlined so the apply stays the one-pass
            # kernel). compact_dirs: the direction pk is carried in
            # bf16 (masking by the {0,1} free map preserves bf16
            # exactness), x/r/reductions stay f32.
            rhs = -free * g
            xk = jnp.zeros_like(x)
            rk = rhs
            gamma = jnp.sum(rk * rk)
            pk = to_io(rk)

            def cg_iter(c, _):
                xk, rk, pk, gamma = c
                p32 = to_f(pk)
                pf = free * p32
                q = free * to_f(wnormal(pf, wts16, rho)) + (p32 - pf)
                pq = jnp.sum(p32 * q)
                a = jnp.where(pq > 0,
                              gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
                xk = xk + a * p32
                rk = rk - a * q
                gamma_new = jnp.sum(rk * rk)
                beta = jnp.where(gamma > 0,
                                 gamma_new
                                 / jnp.where(gamma > 0, gamma, 1.0),
                                 0.0)
                pk = to_io(rk + beta * p32)
                return (xk, rk, pk, gamma_new), None

            (xk, _, _, _), _ = lax.scan(
                cg_iter, (xk, rk, pk, gamma), None,
                length=irls_cg_iters)
            return jnp.maximum(x + xk, 0.0), None

        def outer(carry, _):
            x, v, w_dual = carry
            x, _ = lax.scan(irls_sweep, x, None, length=iter_max)
            t = G.gradient(x, spacing) + w_dual
            v = vectorial_soft_threshold(t, alpha / rho)
            w_dual = t - v
            return (x, v, w_dual), None

        (x, _, _), _ = lax.scan(outer, (x, v, w_dual), None,
                                length=iterations)
        return x

    return solve


def make_blocked_weighted_normal_operator_2d(shape, cov, alpha_cut=3,
                                             spacing=None, z_block=None,
                                             y_block=None,
                                             dtype=jnp.float32,
                                             precision=lax.Precision
                                             .HIGHEST,
                                             interpret=False,
                                             io_dtype=None):
    """2-D (z, y)-blocked ``apply(v, w, rho) -> Aᵀ(w ⊙ (A v)) + ρ·DᵀD v``
    — the 512-wide-plane variant of
    :func:`make_blocked_weighted_normal_operator`, whose 1-D layout only
    fits those volumes single-buffered (no DMA/compute overlap).

    The weighted structure needs pass-1 values on EXTENDED rows/cols
    (z ±r_a, y ±r_a_y) before the weight multiplies; to keep every
    Mosaic slice 8-aligned, pass 1's y conv is evaluated at the FULL
    window width ``By + 2·ry`` via a window→window band matrix whose
    first/last ``ry − r_a_y`` rows are never consumed (taps clipped),
    the weight multiplies at full width, and pass 2's y band maps the
    window to the ``By`` center exactly like the linear 2-D kernel.
    ``io_dtype=jnp.bfloat16`` enables the compact levers (bf16 slabs,
    one-DEFAULT-pass matmuls on the bf16-exact slab for pass 1 via the
    matmul-first reorder, "exact1"/"high2" Laplacian)."""
    from nsol_tpu.ops.pallas.blocked import (
        _band_matrix, _ext_dma_2d, _load_ext_2d_pipelined,
        pick_zy_blocks,
    )

    st = _RobustStencils(shape, cov, alpha_cut, spacing, dtype)
    io = dtype if io_dtype is None else jnp.dtype(io_dtype)
    lap_prec = (("exact1" if st.lap_exact else "high2")
                if io == jnp.bfloat16 else None)
    Z, Y, X = shape
    r = st.halo          # z halo = 2·r_a
    ra = st.r_a
    ra_y = len(st.factors[1]) // 2
    # sublane-dim DMA slices must be 8-aligned; the y halo must cover
    # the NORMAL band half-width (pass1 ± pass2 = 2·r_a_y = halo_y)
    ry = -((-max(st.halo_y, 1)) // 8) * 8
    if z_block is None or y_block is None:
        zb, yb = pick_zy_blocks(shape, r, dtype, n_ext=2,
                                halo_y=st.halo_y, slab_dtype=io)
        z_block = z_block or zb
        y_block = y_block or yb
    if z_block is None:
        raise ValueError(
            "no 2-D block layout of shape %s fits the scoped-VMEM "
            "budget for the weighted normal operator" % (shape,))
    Bz, By = int(z_block), int(y_block)
    for n, B, h, name in ((Z, Bz, r, "z"), (Y, By, ry, "y")):
        if n % B or n // B < 2 or B < h:
            raise ValueError(
                "%s axis %d must split into >=2 blocks of %d >= halo %d"
                % (name, n, B, h))
    nbz, nby = Z // Bz, Y // By

    # pass-1 y conv at FULL window width: out[j] = Σ_d f_y[d]·win[j −
    # r_a_y + d]; rows whose taps run off the window are never consumed
    fy = np.asarray(st.factors[1], st.np_dtype)
    win_w = By + 2 * ry
    W1 = np.zeros((win_w, win_w), st.np_dtype)
    for d, t in enumerate(fy):
        for j in range(win_w):
            c = j - ra_y + d
            if 0 <= c < win_w:
                W1[j, c] = t
    W1 = jnp.asarray(W1)  # (out, in) — _minor_matmul contracts C[i, m]
    # pass-2 y band: window → By center (same shape as the linear Wny)
    W2 = jnp.asarray(_band_matrix(fy, By, ry, st.np_dtype))
    # Laplacian y band + blur-normal x circulant / lap x from st
    lap_taps = np.array([-1.0, 2.0, -1.0]) * float(st.inv_h2_y)
    Wty = jnp.asarray(_band_matrix(lap_taps, By, ry, st.np_dtype))

    def kernel(sc_ref, w1_ref, w2_ref, wty_ref, ax_ref, tx_ref, v_hbm,
               w_hbm, out_ref, ext_v, ext_w, sem_v, sem_w):
        i = pl.program_id(0)
        jy = pl.program_id(1)
        slot = _load_ext_2d_pipelined(
            [(v_hbm, ext_v, sem_v), (w_hbm, ext_w, sem_w)], i, jy, nbz,
            nby, Z, Y, Bz, By, r, ry)
        ax, tx = ax_ref[:], tx_ref[:]
        getv = lambda s0, n: ext_v[slot, pl.ds(s0, n)].astype(dtype)
        # matmul-first (the convs commute): one DEFAULT pass on the
        # bf16-exact slab in compact mode (pass-1 operator rounds to
        # bf16; the caller's f32 outer gradient corrects — inexact
        # Newton), full ``precision`` otherwise
        p1 = (lax.Precision.DEFAULT if io == jnp.bfloat16
              else precision)
        s_all = getv(0, Bz + 2 * r)
        s_all = _minor_matmul(s_all, w1_ref[:], 1, 3, p1)
        s_all = _conv_minor(s_all, ax, 2, st.banded_x, p1)
        # z taps onto extended-z center rows [-r_a, Bz + r_a)
        s = None
        for t in range(2 * ra + 1):
            term = st.a_z[t] * lax.slice_in_dim(
                s_all, t, t + Bz + 2 * ra, axis=0)
            s = term if s is None else s + term
        # weight at full y-window width (8-aligned slicing only on z)
        s = s * ext_w[slot, pl.ds(r - ra, Bz + 2 * ra)].astype(dtype)
        # pass 2: z taps to the Bz center, then y window→center band,
        # then the x circulant — operand is f32 accumulation
        q = None
        for t in range(2 * ra + 1):
            term = st.a_z[t] * lax.slice_in_dim(s, t, t + Bz, axis=0)
            q = term if q is None else q + term
        q = _minor_matmul(q, w2_ref[:], 1, 3, precision)
        q = _conv_minor(q, ax, 2, st.banded_x, precision)

        # ρ·DᵀD on the (Bz, By) center — as _normal_center_2d's lap
        rho = sc_ref[0, 0]
        zc = lambda s0: getv(s0, Bz)[:, ry:ry + By]
        center = zc(r)
        lz = 2.0 * center - zc(r + 1) - zc(r - 1)
        rows = lax.broadcasted_iota(jnp.int32, (Bz, 1, 1), 0) + i * Bz
        first = lax.slice_in_dim(center, 0, 1, axis=0) \
            - lax.slice_in_dim(center, 1, 2, axis=0)
        last = 2.0 * lax.slice_in_dim(center, Bz - 1, Bz, axis=0) \
            - lax.slice_in_dim(center, Bz - 2, Bz - 1, axis=0)
        lz = jnp.where(rows == 0, first, lz)
        lz = jnp.where(rows == Z - 1, last, lz)
        lp = precision if lap_prec is None else lap_prec
        ly = _minor_matmul(getv(r, Bz), wty_ref[:], 1, 3, lp)
        ycols = lax.broadcasted_iota(jnp.int32, (1, By, 1), 1) + jy * By
        u0 = lax.slice_in_dim(center, 0, 1, axis=1)
        u1 = lax.slice_in_dim(center, 1, 2, axis=1)
        um1 = lax.slice_in_dim(center, By - 1, By, axis=1)
        um2 = lax.slice_in_dim(center, By - 2, By - 1, axis=1)
        ly = jnp.where(ycols == 0, (u0 - u1) * st.inv_h2_y, ly)
        ly = jnp.where(ycols == Y - 1, (2.0 * um1 - um2) * st.inv_h2_y,
                       ly)
        lap = lz * st.inv_h2_z + ly \
            + _lap_minor(center, tx, 2, st.banded_x, st.inv_h2_x, lp)
        out_ref[:] = (q + rho * lap).astype(io)

    const = lambda shp: pl.BlockSpec(shp, lambda i, j: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nbz, nby),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            const(W1.shape), const(W2.shape), const(Wty.shape),
            const(st.Ax.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Bz, By, X), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, io),
        scratch_shapes=[
            pltpu.VMEM((2, Bz + 2 * r, By + 2 * ry, X), io),
            pltpu.VMEM((2, Bz + 2 * r, By + 2 * ry, X), io),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def apply(v, w, rho):
        rr = jnp.full((1, 1), rho, dtype)
        return call(rr, W1, W2, Wty, st.Ax, st.Tx,
                    jnp.asarray(v, io), jnp.asarray(w, io))

    apply.halo = r
    apply.block = Bz
    return apply


def make_blocked_blur_operator_2d(shape, cov, alpha_cut=3, spacing=None,
                                  z_block=None, y_block=None,
                                  dtype=jnp.float32,
                                  precision=lax.Precision.HIGHEST,
                                  interpret=False, with_lap=False):
    """2-D (z, y)-blocked streaming ``A v`` — the 512-wide-plane form of
    :func:`make_blocked_blur_operator` (whose 1-D layout at those
    volumes only fits single-buffered): smaller 2-D slabs restore the
    double-buffered halo DMA for the robust solver's per-sweep residual
    and gradient passes. The y conv is a window→center band matmul
    (same machinery as the linear 2-D kernels); exact f32 throughout
    (these passes feed the IRLS gradient, which anchors the MM fixed
    point)."""
    from nsol_tpu.ops.pallas.blocked import (
        _band_matrix, _load_ext_2d_pipelined, pick_zy_blocks,
    )

    st = _RobustStencils(shape, cov, alpha_cut, spacing, dtype)
    Z, Y, X = shape
    ra = st.r_a
    r = max(ra, 1)
    ra_y = len(st.factors[1]) // 2
    ry = -((-max(ra_y, 1)) // 8) * 8
    n_ext = 2 if with_lap else 1
    if z_block is None or y_block is None:
        zb, yb = pick_zy_blocks(shape, r, dtype, n_ext=n_ext,
                                halo_y=ra_y)
        z_block = z_block or zb
        y_block = y_block or yb
    if z_block is None:
        raise ValueError(
            "no 2-D block layout of shape %s fits the scoped-VMEM "
            "budget for the blur operator" % (shape,))
    Bz, By = int(z_block), int(y_block)
    for n, B, h, name in ((Z, Bz, r, "z"), (Y, By, ry, "y")):
        if n % B or n // B < 2 or B < h:
            raise ValueError(
                "%s axis %d must split into >=2 blocks of %d >= halo %d"
                % (name, n, B, h))
    nbz, nby = Z // Bz, Y // By
    fy = np.asarray(st.factors[1], st.np_dtype)
    Wy = jnp.asarray(_band_matrix(fy, By, ry, st.np_dtype))
    lap_taps = np.array([-1.0, 2.0, -1.0]) * float(st.inv_h2_y)
    Wty = jnp.asarray(_band_matrix(lap_taps, By, ry, st.np_dtype))

    def kernel(sc_ref, wy_ref, wty_ref, ax_ref, tx_ref, *refs):
        if with_lap:
            y_hbm, u_hbm, out_ref, ext_y, ext_u, sem_y, sem_u = refs
            inputs = [(y_hbm, ext_y, sem_y), (u_hbm, ext_u, sem_u)]
        else:
            y_hbm, out_ref, ext_y, sem_y = refs
            inputs = [(y_hbm, ext_y, sem_y)]
        i = pl.program_id(0)
        jy = pl.program_id(1)
        slot = _load_ext_2d_pipelined(inputs, i, jy, nbz, nby, Z, Y, Bz,
                                      By, r, ry)
        get = lambda s0, n: ext_y[slot, pl.ds(s0, n)]
        # z taps consume the z halo (offset r - r_a keeps generality for
        # the degenerate r_a = 0 case where r = 1)
        q = None
        for t in range(2 * ra + 1):
            term = st.a_z[t] * get(t + (r - ra), Bz)
            q = term if q is None else q + term
        q = _minor_matmul(q, wy_ref[:], 1, 3, precision)
        q = _conv_minor(q, ax_ref[:], 2, st.banded_x, precision)

        if with_lap:
            # rho*DtD of the second input on the (Bz, By) center —
            # the same boundary-exact block as the 2-D weighted kernel
            rho = sc_ref[0, 0]
            getu = lambda s0, n: ext_u[slot, pl.ds(s0, n)]
            zc = lambda s0: getu(s0, Bz)[:, ry:ry + By]
            center = zc(r)
            lz = 2.0 * center - zc(r + 1) - zc(r - 1)
            rows = lax.broadcasted_iota(jnp.int32, (Bz, 1, 1), 0) \
                + i * Bz
            first = lax.slice_in_dim(center, 0, 1, axis=0) \
                - lax.slice_in_dim(center, 1, 2, axis=0)
            last = 2.0 * lax.slice_in_dim(center, Bz - 1, Bz, axis=0) \
                - lax.slice_in_dim(center, Bz - 2, Bz - 1, axis=0)
            lz = jnp.where(rows == 0, first, lz)
            lz = jnp.where(rows == Z - 1, last, lz)
            ly = _minor_matmul(getu(r, Bz), wty_ref[:], 1, 3, precision)
            ycols = lax.broadcasted_iota(jnp.int32, (1, By, 1), 1) \
                + jy * By
            u0 = lax.slice_in_dim(center, 0, 1, axis=1)
            u1 = lax.slice_in_dim(center, 1, 2, axis=1)
            um1 = lax.slice_in_dim(center, By - 1, By, axis=1)
            um2 = lax.slice_in_dim(center, By - 2, By - 1, axis=1)
            ly = jnp.where(ycols == 0, (u0 - u1) * st.inv_h2_y, ly)
            ly = jnp.where(ycols == Y - 1,
                           (2.0 * um1 - um2) * st.inv_h2_y, ly)
            lap = lz * st.inv_h2_z + ly \
                + _lap_minor(center, tx_ref[:], 2, st.banded_x,
                             st.inv_h2_x, precision)
            q = q + rho * lap
        out_ref[:] = q

    const = lambda shp: pl.BlockSpec(shp, lambda i, j: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    slab = lambda: pltpu.VMEM((2, Bz + 2 * r, By + 2 * ry, X), dtype)
    sem = lambda: pltpu.SemaphoreType.DMA((2,))
    scratch = ([slab(), slab(), sem(), sem()] if with_lap
               else [slab(), sem()])
    call = pl.pallas_call(
        kernel,
        grid=(nbz, nby),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            const(Wy.shape), const(Wty.shape), const(st.Ax.shape),
            const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] if with_lap else []),
        out_specs=pl.BlockSpec((Bz, By, X), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    if with_lap:
        def apply(y, u, rho):
            rr = jnp.full((1, 1), rho, dtype)
            return call(rr, Wy, Wty, st.Ax, st.Tx,
                        jnp.asarray(y, dtype), jnp.asarray(u, dtype))
    else:
        def apply(y):
            rr = jnp.zeros((1, 1), dtype)
            return call(rr, Wy, Wty, st.Ax, st.Tx,
                        jnp.asarray(y, dtype))

    apply.halo = r
    apply.block = Bz
    return apply
