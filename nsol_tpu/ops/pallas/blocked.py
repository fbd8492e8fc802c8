"""Blocked streaming normal operator for volumes too large for VMEM.

The fused whole-solve kernel (ops/pallas/fused.py) requires the full ADMM
working set resident in VMEM (~≤160³). Above that the solve is HBM-bound:
each inner-CG iteration of the XLA matmul path streams the volume once per
axis pass of ``AᵀA`` (3×), once more for ``DᵀD``, plus the elementwise CG
updates — ~5 full read+write sweeps for ONE operator application
(BASELINE.md: 256³ runs at exactly 64× the 64³ time).

This kernel computes the entire SPD normal apply

    ``M v = AᵀA v + ρ · DᵀD v``

in ONE streaming pass: the volume is processed in z-blocks; each grid step
DMAs a halo-extended slab HBM→VMEM (wrap halo — the blur's circular
boundary), applies the z-axis self-correlated blur taps (static-slice
accumulate over the halo), the y/x circulant matmuls on the MXU, the
boundary-corrected Laplacian, and writes one output block. HBM traffic per
apply drops from ~10 volume sweeps to 1 read (+ halo) + 1 write.

Layout: (z, y, x) volumes; y/x are the tiled sublane/lane dims (matmuls —
same mapping as the fused kernel), z is the untiled streaming axis. The
wrap halo needs manual DMA (overlapping windows are outside BlockSpec's
non-overlapping tiling model): the input stays in ANY/HBM and each step
issues 1–2 async copies into a VMEM scratch slab.

Semantics exactly match ``make_normal_blur_operator`` (self-correlated
separable wrap conv, ops/conv.py:170) plus ``ρ ·`` ``gradient_normal``
(zero-boundary second difference with the forward-difference boundary
corrections, ops/grad.py:108); parity is pinned in tests/test_pallas.py.
``ρ`` is a runtime scalar (SMEM) — the ADMM rho sweep reuses one program.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsol_tpu.ops.grad import _spacing_array
from nsol_tpu.ops.pallas.fused import _minor_matmul

__all__ = ["make_blocked_normal_operator", "pick_z_block"]


def pick_z_block(shape, halo, dtype=jnp.float32,
                 budget_bytes=72 * 1024 * 1024):
    """Largest z-block in {64, 32, 16, 8} whose slab working set (extended
    input + ~4 block-sized temporaries) fits the VMEM budget, or None."""
    plane = int(np.prod(shape[1:])) * jnp.dtype(dtype).itemsize
    for b in (64, 32, 16, 8):
        if shape[0] % b or shape[0] // b < 2 or b < halo:
            continue
        if (b + 2 * halo) * plane + 4 * b * plane <= budget_bytes:
            return b
    return None


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
    from nsol_tpu.ops.kernels import gaussian_kernel
    from nsol_tpu.ops.conv import separable_factors
    from nsol_tpu.ops.matmul_ops import circulant_matrix, laplacian_matrix

    if len(shape) != 3:
        raise ValueError("blocked normal operator is 3-D only")
    Z, Y, X = shape

    kernel64 = gaussian_kernel(cov, alpha_cut=alpha_cut, spacing=spacing,
                               dtype=np.float64)
    factors = separable_factors(kernel64)
    if factors is None:
        raise ValueError("blocked normal operator requires a separable "
                         "(diagonal-covariance) blur")
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    nfac = [np.convolve(f, f[::-1]) for f in factors]
    z_taps = nfac[0].astype(np_dtype)
    r = len(z_taps) // 2

    if block is None:
        block = pick_z_block(shape, r, dtype)
        if block is None:
            raise ValueError("no z-block fits VMEM for shape %s" % (shape,))
    if Z % block or Z // block < 2:
        raise ValueError("shape[0]=%d must split into >=2 blocks of %d"
                         % (Z, block))
    if block < r:
        raise ValueError("block %d smaller than blur halo %d" % (block, r))
    nblk = Z // block

    s = _spacing_array(spacing, 3)  # spatial (x, y, z) order
    Ny = jnp.asarray(circulant_matrix(nfac[1], Y, np_dtype))
    Nx = jnp.asarray(circulant_matrix(nfac[2], X, np_dtype))
    Ty = jnp.asarray(laplacian_matrix(Y, s[1], np_dtype))
    Tx = jnp.asarray(laplacian_matrix(X, s[0], np_dtype))
    inv_h2_z = np.asarray(1.0 / s[2] ** 2, np_dtype)

    def kernel(rho_ref, ny_ref, nx_ref, ty_ref, tx_ref, v_hbm, out_ref,
               ext, sem):
        i = pl.program_id(0)
        rho = rho_ref[0, 0]

        # --- halo-extended slab DMA (wrap at the global z edges) ---------
        @pl.when(i == 0)
        def _():
            c = pltpu.make_async_copy(v_hbm.at[pl.ds(Z - r, r)],
                                      ext.at[pl.ds(0, r)], sem)
            c.start()
            c.wait()
            c = pltpu.make_async_copy(v_hbm.at[pl.ds(0, block + r)],
                                      ext.at[pl.ds(r, block + r)], sem)
            c.start()
            c.wait()

        @pl.when(i == nblk - 1)
        def _():
            c = pltpu.make_async_copy(
                v_hbm.at[pl.ds(Z - block - r, block + r)],
                ext.at[pl.ds(0, block + r)], sem)
            c.start()
            c.wait()
            c = pltpu.make_async_copy(v_hbm.at[pl.ds(0, r)],
                                      ext.at[pl.ds(block + r, r)], sem)
            c.start()
            c.wait()

        if nblk > 2:  # interior blocks exist (their slice is static-sized)
            @pl.when(jnp.logical_and(i > 0, i < nblk - 1))
            def _():
                c = pltpu.make_async_copy(
                    v_hbm.at[pl.ds(i * block - r, block + 2 * r)], ext,
                    sem)
                c.start()
                c.wait()

        u = ext[:]  # (block + 2r, Y, X)

        # --- blur normal: z taps first (consumes the halo), then the MXU
        # circulant matmuls on the remaining block rows only ---------------
        qa = None
        for t in range(2 * r + 1):
            term = z_taps[t] * lax.slice_in_dim(u, t, t + block, axis=0)
            qa = term if qa is None else qa + term
        qa = _minor_matmul(qa, ny_ref[:], 1, 3, precision)
        qa = _minor_matmul(qa, nx_ref[:], 2, 3, precision)

        # --- ρ · DᵀD on the center rows -----------------------------------
        center = lax.slice_in_dim(u, r, r + block, axis=0)
        up = lax.slice_in_dim(u, r + 1, r + block + 1, axis=0)
        down = lax.slice_in_dim(u, r - 1, r + block - 1, axis=0)
        lz = 2.0 * center - up - down
        # zero-boundary corrections at the global edges (the halo holds
        # wrapped values the Laplacian must not see): row 0 → x[0]−x[1],
        # row Z−1 → 2x[Z−1]−x[Z−2] (ops/grad.py:108 conventions)
        rows = lax.broadcasted_iota(jnp.int32, (block, 1, 1), 0) + i * block
        first = lax.slice_in_dim(center, 0, 1, axis=0) \
            - lax.slice_in_dim(center, 1, 2, axis=0)
        last = 2.0 * lax.slice_in_dim(center, block - 1, block, axis=0) \
            - lax.slice_in_dim(center, block - 2, block - 1, axis=0)
        lz = jnp.where(rows == 0, first, lz)
        lz = jnp.where(rows == Z - 1, last, lz)
        lap = lz * inv_h2_z \
            + _minor_matmul(center, ty_ref[:], 1, 3, precision) \
            + _minor_matmul(center, tx_ref[:], 2, 3, precision)

        out_ref[:] = qa + rho * lap

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
            pltpu.VMEM((block + 2 * r, Y, X), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def apply(v, rho):
        rr = jnp.full((1, 1), rho, dtype)
        return call(rr, Ny, Nx, Ty, Tx, jnp.asarray(v, dtype))

    return apply
