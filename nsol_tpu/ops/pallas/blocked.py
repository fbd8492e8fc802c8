"""Blocked streaming kernels for volumes too large for VMEM.

The fused whole-solve kernel (ops/pallas/fused.py) requires the full ADMM
working set resident in VMEM (~≤160³). Above that the solve is HBM-bound:
each inner-CG iteration of the XLA matmul path streams the volume once per
axis pass of ``AᵀA`` (3×), once more for ``DᵀD``, plus the elementwise CG
updates — measured breakdown in BASELINE.md ("Where the 256³ time goes").

Two kernels stream the volume in z-blocks with a manual wrap-halo DMA (the
blur's circular boundary needs overlapping windows, which is outside
BlockSpec's non-overlapping tiling model — inputs stay in ANY/HBM and each
grid step copies a halo-extended slab into VMEM scratch). The slab copies
are DOUBLE-BUFFERED: grid step ``i`` prefetches block ``i+1``'s slab into
the alternate scratch slot before computing on block ``i``, overlapping
the HBM read latency with the MXU/VPU work (see ``_load_ext_pipelined``):

* :func:`make_blocked_normal_operator` — ``M v = AᵀA v + ρ·DᵀD v`` in ONE
  pass (1 halo-read + 1 write instead of ~10 sweeps); plugs into the
  normal-equation CG via the ``normal_M`` hook of
  :func:`nsol_tpu.solvers.tikhonov.tikhonov_solve`.
* :func:`make_blocked_cg_step` — the fused CG hot step
  ``p' = r + β·p ; q = M p' ; pq = Σ p'·q`` in ONE pass (2 halo-reads +
  2 writes + per-block partial dots). :func:`blocked_admm_solve` builds
  the full ADMM TV-L2 solve around it, leaving only one multi-output XLA
  fusion (x/r update + ‖r‖²) per CG iteration.

Layout: (z, y, x) volumes; y/x are the tiled sublane/lane dims where all
stencils ride the MXU as circulant/tridiagonal/bidiagonal matmuls (minor-
axis shifts are pathological in Mosaic — BASELINE.md); z is the untiled
streaming axis (static-slice tap accumulation over the halo).

Semantics exactly match ``make_normal_blur_operator`` (self-correlated
separable wrap conv, ops/conv.py:170) plus ``ρ ·`` ``gradient_normal``
(zero-boundary second difference with the forward-difference boundary
corrections, ops/grad.py:108), and ``blocked_admm_solve`` mirrors
``admm_solve(minimizer="cg")`` guard for guard; parity is pinned in
tests/test_pallas.py. ``ρ`` (and ``α``) are runtime scalars.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsol_tpu.ops.grad import _spacing_array
from nsol_tpu.ops.pallas.fused import _minor_matmul

__all__ = ["make_blocked_normal_operator", "make_blocked_cg_step",
           "make_blocked_cg_sweep", "blocked_admm_solve", "pick_z_block"]

#: scoped-VMEM budget for layout selection: the 127 MiB CompilerParams cap
#: minus headroom for Mosaic's own temporaries (register spills to VMEM,
#: matmul staging) — the 512³ working sets sit right at this edge.
_LAYOUT_BUDGET_BYTES = 112 * 1024 * 1024


def pick_z_block(shape, halo, dtype=jnp.float32, n_ext=1,
                 budget_bytes=72 * 1024 * 1024):
    """Largest z-block in {64, 32, 16, 8} whose slab working set (``n_ext``
    halo-extended inputs, each DOUBLE-buffered for the DMA/compute overlap,
    + ~4 block-sized temporaries) fits the VMEM budget, or None."""
    plane = int(np.prod(shape[1:])) * jnp.dtype(dtype).itemsize
    for b in (64, 32, 16, 8):
        if shape[0] % b or shape[0] // b < 2 or b < halo:
            continue
        if 2 * n_ext * (b + 2 * halo) * plane + 4 * b * plane \
                <= budget_bytes:
            return b
    return None


class _Stencils(object):
    """Static per-shape operator data shared by the blocked kernels."""

    def __init__(self, shape, cov, alpha_cut, spacing, dtype):
        from nsol_tpu.ops.kernels import gaussian_kernel
        from nsol_tpu.ops.conv import separable_factors
        from nsol_tpu.ops.matmul_ops import circulant_matrix, \
            laplacian_matrix

        if len(shape) != 3:
            raise ValueError("blocked kernels are 3-D only")
        self.shape = tuple(shape)
        kernel64 = gaussian_kernel(cov, alpha_cut=alpha_cut,
                                   spacing=spacing, dtype=np.float64)
        factors = separable_factors(kernel64)
        if factors is None:
            raise ValueError("blocked kernels require a separable "
                             "(diagonal-covariance) blur")
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        self.np_dtype = np_dtype
        nfac = [np.convolve(f, f[::-1]) for f in factors]
        self.factors = factors  # float64 — matrix builders cast at the end
        self.z_taps = nfac[0].astype(np_dtype)
        self.halo = len(self.z_taps) // 2

        Z, Y, X = shape
        s = _spacing_array(spacing, 3)  # spatial (x, y, z) order
        self.Ny = jnp.asarray(circulant_matrix(nfac[1], Y, np_dtype))
        self.Nx = jnp.asarray(circulant_matrix(nfac[2], X, np_dtype))
        self.Ty = jnp.asarray(laplacian_matrix(Y, s[1], np_dtype))
        self.Tx = jnp.asarray(laplacian_matrix(X, s[0], np_dtype))
        self.inv_h2_z = np.asarray(1.0 / s[2] ** 2, np_dtype)

    def validate_block(self, block):
        Z = self.shape[0]
        if Z % block or Z // block < 2:
            raise ValueError("shape[0]=%d must split into >=2 blocks "
                             "of %d" % (Z, block))
        if block < self.halo:
            raise ValueError("block %d smaller than blur halo %d"
                             % (block, self.halo))
        return Z // block


def _ext_dma(v_hbm, ext_slot, sem_slot, j, nblk, Z, block, r, wait):
    """Issue (``wait=False``) or complete (``wait=True``) the wrap-halo
    DMAs loading block ``j``'s halo-extended slab
    ``[j·B − r, j·B + B + r)`` of ``v_hbm`` into the VMEM scratch slot
    ``ext_slot``. Start and wait are split so the caller can overlap the
    next block's copy with the current block's compute (double
    buffering); the wait call rebuilds identical descriptors, which is
    the supported way to block on an in-flight ``make_async_copy``."""
    def go(c):
        c.wait() if wait else c.start()

    @pl.when(j == 0)
    def _():
        go(pltpu.make_async_copy(v_hbm.at[pl.ds(Z - r, r)],
                                 ext_slot.at[pl.ds(0, r)], sem_slot))
        go(pltpu.make_async_copy(v_hbm.at[pl.ds(0, block + r)],
                                 ext_slot.at[pl.ds(r, block + r)],
                                 sem_slot))

    @pl.when(j == nblk - 1)
    def _():
        go(pltpu.make_async_copy(
            v_hbm.at[pl.ds(Z - block - r, block + r)],
            ext_slot.at[pl.ds(0, block + r)], sem_slot))
        go(pltpu.make_async_copy(v_hbm.at[pl.ds(0, r)],
                                 ext_slot.at[pl.ds(block + r, r)],
                                 sem_slot))

    if nblk > 2:  # interior blocks exist (their slice is static-sized)
        @pl.when(jnp.logical_and(j > 0, j < nblk - 1))
        def _():
            go(pltpu.make_async_copy(
                v_hbm.at[pl.ds(j * block - r, block + 2 * r)],
                ext_slot, sem_slot))


def _load_ext_pipelined(inputs, i, nblk, Z, block, r):
    """Double-buffered halo loads for grid step ``i``: wait for block
    ``i``'s slabs (started in the previous grid step, or right here when
    ``i == 0``) and prefetch block ``i+1``'s into the other slot while
    the caller computes. ``inputs = [(v_hbm, ext, sem), ...]`` with
    ``ext`` shaped ``(2, block+2r, Y, X)`` and ``sem`` a 2-element DMA
    semaphore array. Returns the slot index holding block ``i``."""
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nxt = lax.rem(i + two - 1, two)  # (i+1) % 2, avoiding i+1 overflowing

    @pl.when(i == 0)
    def _():
        for v_hbm, ext, sem in inputs:
            _ext_dma(v_hbm, ext.at[0], sem.at[0], i, nblk, Z, block, r,
                     wait=False)

    @pl.when(i + 1 < nblk)
    def _():
        for v_hbm, ext, sem in inputs:
            _ext_dma(v_hbm, ext.at[nxt], sem.at[nxt], i + 1, nblk, Z,
                     block, r, wait=False)

    for v_hbm, ext, sem in inputs:
        _ext_dma(v_hbm, ext.at[slot], sem.at[slot], i, nblk, Z, block, r,
                 wait=True)
    return slot


def _normal_center(get, st, rho, i, block, refs, precision):
    """``(AᵀA + ρ·DᵀD)`` of a halo-extended slab, evaluated on its
    ``block`` center rows. ``get(start, size)`` returns slab rows
    ``[start, start+size)`` — a *lazy* accessor (slicing the scratch ref
    per tap) so callers combining two slabs (the CG step's ``r + β·p``)
    never materialize a full extended temporary: that alone was ~20 MiB
    of scoped-VMEM stack at 512³ and tipped the kernel over the limit.
    ``refs = (ny, nx, ty, tx)`` loaded matrices."""
    ny, nx, ty, tx = refs
    Z = st.shape[0]
    r = st.halo

    # blur normal: z taps first (consume the halo), then the MXU
    # circulant matmuls on the remaining block rows only
    qa = None
    for t in range(2 * r + 1):
        term = st.z_taps[t] * get(t, block)
        qa = term if qa is None else qa + term
    qa = _minor_matmul(qa, ny, 1, 3, precision)
    qa = _minor_matmul(qa, nx, 2, 3, precision)

    # ρ · DᵀD on the center rows: zero-boundary corrections at the global
    # edges (the halo holds wrapped values the Laplacian must not see):
    # row 0 → x[0]−x[1], row Z−1 → 2x[Z−1]−x[Z−2] (ops/grad.py:108)
    center = get(r, block)
    up = get(r + 1, block)
    down = get(r - 1, block)
    lz = 2.0 * center - up - down
    rows = lax.broadcasted_iota(jnp.int32, (block, 1, 1), 0) + i * block
    first = lax.slice_in_dim(center, 0, 1, axis=0) \
        - lax.slice_in_dim(center, 1, 2, axis=0)
    last = 2.0 * lax.slice_in_dim(center, block - 1, block, axis=0) \
        - lax.slice_in_dim(center, block - 2, block - 1, axis=0)
    lz = jnp.where(rows == 0, first, lz)
    lz = jnp.where(rows == Z - 1, last, lz)
    lap = lz * st.inv_h2_z \
        + _minor_matmul(center, ty, 1, 3, precision) \
        + _minor_matmul(center, tx, 2, 3, precision)
    return qa + rho * lap, center


def make_blocked_normal_operator(shape, cov, alpha_cut=3, spacing=None,
                                 block=None, dtype=jnp.float32,
                                 precision=lax.Precision.HIGHEST,
                                 interpret=False):
    """Build ``apply(v, rho) -> AᵀA v + rho·DᵀD v`` streaming over z-blocks.

    ``shape`` must be 3-D with ``shape[0]`` divisible into ≥2 blocks of
    ``block`` rows (auto-picked when None); ``cov`` must be diagonal
    (separable blur). Use inside the normal-equation CG via the
    ``normal_M`` hook of :func:`nsol_tpu.solvers.tikhonov.tikhonov_solve`.
    """
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    if block is None:
        block = pick_z_block(shape, st.halo, dtype)
        if block is None:
            raise ValueError("no z-block fits VMEM for shape %s"
                             % (shape,))
    nblk = st.validate_block(block)
    Z, Y, X = shape
    r = st.halo

    def kernel(rho_ref, ny_ref, nx_ref, ty_ref, tx_ref, v_hbm, out_ref,
               ext, sem):
        i = pl.program_id(0)
        slot = _load_ext_pipelined([(v_hbm, ext, sem)], i, nblk, Z,
                                   block, r)
        get = lambda s0, n: ext[slot, pl.ds(s0, n)]
        q, _ = _normal_center(
            get, st, rho_ref[0, 0], i, block,
            (ny_ref[:], nx_ref[:], ty_ref[:], tx_ref[:]), precision)
        out_ref[:] = q

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const((Y, Y)), const((X, X)), const((Y, Y)), const((X, X)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * r, Y, X), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def apply(v, rho):
        rr = jnp.full((1, 1), rho, dtype)
        return call(rr, st.Ny, st.Nx, st.Ty, st.Tx, jnp.asarray(v, dtype))

    return apply


def make_blocked_cg_step(shape, cov, alpha_cut=3, spacing=None,
                         block=None, dtype=jnp.float32,
                         precision=lax.Precision.HIGHEST,
                         interpret=False):
    """Build the fused CG hot step
    ``step(r, p, beta, rho) -> (p_new, q, pq)`` with
    ``p_new = r + β·p``, ``q = (AᵀA + ρDᵀD) p_new``, ``pq = Σ p_new·q`` —
    ONE streaming pass (2 halo-reads + 2 block-writes + per-block partial
    dots) instead of separate direction-update / operator / dot sweeps.
    The ``β=0`` first trip makes ``p_new = r``, so the same program serves
    every CG iteration (solvers/cg.py semantics).
    """
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    if block is None:
        block = pick_z_block(shape, st.halo, dtype, n_ext=2)
    if block is None:
        # tight fallback: smallest legal block (512³ lands here)
        for cand in (8, 16, 32, 64):
            if (shape[0] % cand == 0 and shape[0] // cand >= 2
                    and cand >= st.halo):
                block = cand
                break
    if block is None:
        raise ValueError("no z-block fits VMEM for shape %s" % (shape,))
    # The tight fallback can still exceed the scoped-VMEM cap for large
    # Y·X planes (e.g. 256×1024×1024), in which case Mosaic only fails at
    # compile time deep inside the caller's first jit. Pre-check the
    # actual footprint — double-buffered halo slabs for the two inputs,
    # pipelined pn/q output blocks, ~4 block-sized compute temporaries —
    # and raise the construction-time ValueError callers already handle.
    plane = int(np.prod(shape[1:])) * jnp.dtype(dtype).itemsize
    footprint = (2 * 2 * (block + 2 * st.halo) + 2 * 2 * block
                 + 4 * block) * plane
    if footprint > 127 * 1024 * 1024:
        raise ValueError(
            "blocked CG-step working set (%d MiB at z-block %d) exceeds "
            "the 127 MiB scoped-VMEM limit for shape %s"
            % (footprint >> 20, block, shape))
    nblk = st.validate_block(block)
    Z, Y, X = shape
    r_h = st.halo

    def kernel(sc_ref, ny_ref, nx_ref, ty_ref, tx_ref, r_hbm, p_hbm,
               pn_ref, q_ref, pq_ref, ext_r, ext_p, sem_r, sem_p):
        i = pl.program_id(0)
        beta = sc_ref[0, 0]
        rho = sc_ref[0, 1]
        slot = _load_ext_pipelined(
            [(r_hbm, ext_r, sem_r), (p_hbm, ext_p, sem_p)], i, nblk, Z,
            block, r_h)
        # direction update fused into every slab access: q sees the new
        # direction's halo without materializing an extended temporary
        get = lambda s0, n: (ext_r[slot, pl.ds(s0, n)]
                             + beta * ext_p[slot, pl.ds(s0, n)])
        q, pn_center = _normal_center(
            get, st, rho, i, block,
            (ny_ref[:], nx_ref[:], ty_ref[:], tx_ref[:]), precision)
        pn_ref[:] = pn_center
        q_ref[:] = q
        # per-block partial dot; (1, 8, 128) broadcast satisfies the
        # Mosaic (8, 128) minor-dims tiling rule for blocked outputs
        pq_ref[:] = jnp.full((1, 8, 128), jnp.sum(pn_center * q), dtype)

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const((Y, Y)), const((X, X)), const((Y, Y)), const((X, X)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct((nblk, 8, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * r_h, Y, X), dtype),
            pltpu.VMEM((2, block + 2 * r_h, Y, X), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def step(r, p, beta, rho):
        sc = jnp.stack([jnp.asarray(beta, dtype),
                        jnp.asarray(rho, dtype)]).reshape(1, 2)
        pn, q, pq = call(sc, st.Ny, st.Nx, st.Ty, st.Tx,
                         jnp.asarray(r, dtype), jnp.asarray(p, dtype))
        return pn, q, jnp.sum(pq[:, 0, 0])

    return step


def blocked_admm_solve(shape, cov, alpha_cut=3, spacing=None,
                       iterations=10, iter_max=10, dtype=jnp.float32,
                       precision=lax.Precision.HIGHEST, block=None,
                       interpret=False):
    """Build ``solve(b, x0, alpha, rho) -> x``: ADMM TV-L2 deconvolution
    for volumes past VMEM, with every CG iteration reduced to the fused
    blocked step plus ONE multi-output XLA fusion (x/r update + ‖r‖²).

    Mirrors ``admm_solve(A..., minimizer="cg", normal_A=..., normal_B=...)``
    guard for guard (zero-protected α/β, warm-started CG, non-negativity
    clip, vectorial shrinkage with threshold α/ρ, b_reg = 0); parity is
    pinned in tests/test_pallas.py. The outer prox/dual updates stay XLA
    (elementwise chains XLA already fuses well).
    """
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops.matmul_ops import matmul_convolve_fn
    from nsol_tpu.ops.prox import vectorial_soft_threshold

    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    cg_step = make_blocked_cg_step(shape, cov, alpha_cut=alpha_cut,
                                   spacing=spacing, block=block,
                                   dtype=dtype, precision=precision,
                                   interpret=interpret)
    apply_M = make_blocked_normal_operator(shape, cov, alpha_cut=alpha_cut,
                                           spacing=spacing, block=block,
                                           dtype=dtype, precision=precision,
                                           interpret=interpret)
    # one-time Aᵀb (A symmetric ⇒ Aᵀb = Ab): loop-invariant, XLA matmuls.
    # ``precision`` may be the Pallas-only "high3" string (3-pass
    # emulated-HIGH inside the kernels); the XLA-side constant prep is
    # loop-invariant so it always runs at full HIGHEST precision.
    A = matmul_convolve_fn(st.factors, shape, st.np_dtype,
                           precision=lax.Precision.HIGHEST)

    def solve(b, x0, alpha, rho):
        b = jnp.asarray(b, dtype)
        x = jnp.asarray(x0, dtype)
        alpha = jnp.asarray(alpha, dtype)
        rho = jnp.asarray(rho, dtype)
        At_b = A(b)
        v = G.gradient(x, spacing)
        w = jnp.zeros_like(v)

        def outer(carry, _):
            x, v, w = carry
            rhs = At_b + rho * G.gradient_adjoint(v - w, spacing)

            # warm-started CG on the normal equations (solvers/cg.py)
            r = rhs - apply_M(x, rho)
            gamma = jnp.sum(r * r)
            p = jnp.zeros_like(x)
            beta = jnp.asarray(0.0, dtype)

            def cg_iter(c, _):
                x, r, p, gamma, beta = c
                p, q, pq = cg_step(r, p, beta, rho)
                a = jnp.where(pq > 0,
                              gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
                x = x + a * p
                r = r - a * q
                gamma_new = jnp.sum(r * r)
                beta = jnp.where(gamma > 0,
                                 gamma_new / jnp.where(gamma > 0, gamma,
                                                       1.0), 0.0)
                return (x, r, p, gamma_new, beta), None

            (x, _, _, _, _), _ = lax.scan(
                cg_iter, (x, r, p, gamma, beta), None, length=iter_max)
            x = jnp.maximum(x, 0.0)  # reference default bounds (0, ∞)

            t = G.gradient(x, spacing) + w
            v = vectorial_soft_threshold(t, alpha / rho)
            w = t - v
            return (x, v, w), None

        (x, _, _), _ = lax.scan(outer, (x, v, w), None, length=iterations)
        return x

    return solve
