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
  2 writes + per-block partial dots), leaving one multi-output XLA
  fusion (x/r update + ‖r‖²) per CG iteration.
* :func:`make_blocked_cg_sweep` — the WHOLE CG iteration in one pass:
  the deferred x/r updates, the direction update, the SPD apply, and all
  four reductions; between sweeps only a scalar recurrence runs.
  :func:`blocked_admm_solve` builds the full ADMM TV-L2 solve around the
  best formulation the VMEM budget admits (sweep → step → plain XLA CG
  over the blocked apply).

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
from nsol_tpu.ops.pallas.fused import _minor_matmul, _banded_window_matmul

__all__ = ["make_blocked_normal_operator",
           "make_blocked_normal_operator_prepadded",
           "make_blocked_normal_operator_2d", "make_blocked_cg_step",
           "make_blocked_cg_step_2d", "make_blocked_cg_sweep",
           "blocked_admm_solve", "pick_z_block", "pick_zy_blocks"]

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
        # per-axis normal-band half-widths: with anisotropic diagonal
        # covariance these differ — the 2-D kernels size the y halo from
        # halo_y, NOT the z halo (silent wrap corruption otherwise)
        self.halo_y = len(nfac[1]) // 2
        self.halo_x = len(nfac[2]) // 2

        Z, Y, X = shape
        s = _spacing_array(spacing, 3)  # spatial (x, y, z) order
        # Axes >= 512 use the windowed-band form: the circulant/Laplacian
        # band is shift-invariant, so every output 128-block is the same
        # (384, 128) contraction of a 3-block input window — 384 MACs per
        # element instead of the dense matmul's Y/X (1.33× at 512, 2.7×
        # at 1024). Laplacian boundary rows are fixed up in `_lap_minor`.
        import os
        from nsol_tpu.ops.pallas.fused import banded_window_matrix
        no_banded = bool(os.environ.get("NSOL_TPU_NO_BANDED"))
        # the (384, 128) window truncates bands wider than 122 — fall
        # back to the dense matmul for very wide blurs (sigma >~ 21)
        self.banded_y = (not no_banded and Y >= 512 and Y % 128 == 0
                         and self.halo_y <= 122)
        self.banded_x = (not no_banded and X >= 512 and X % 128 == 0
                         and self.halo_x <= 122)
        wb = lambda M: jnp.asarray(banded_window_matrix(M))
        Ny = circulant_matrix(nfac[1], Y, np_dtype)
        Nx = circulant_matrix(nfac[2], X, np_dtype)
        Ty = laplacian_matrix(Y, s[1], np_dtype)
        Tx = laplacian_matrix(X, s[0], np_dtype)
        # integer-valued Laplacians (unit spacing) are bf16-EXACT: on
        # bf16-exact compact-state operands their matmul runs as ONE
        # DEFAULT pass bit-identically ("exact1", round 5)
        from nsol_tpu.ops.pallas.fused import bf16_exact
        self.lap_exact = bf16_exact(Ty) and bf16_exact(Tx)
        self.Ny = wb(Ny) if self.banded_y else jnp.asarray(Ny)
        self.Nx = wb(Nx) if self.banded_x else jnp.asarray(Nx)
        self.Ty = wb(Ty) if self.banded_y else jnp.asarray(Ty)
        self.Tx = wb(Tx) if self.banded_x else jnp.asarray(Tx)
        self.inv_h2_z = np.asarray(1.0 / s[2] ** 2, np_dtype)
        self.inv_h2_y = np.asarray(1.0 / s[1] ** 2, np_dtype)
        self.inv_h2_x = np.asarray(1.0 / s[0] ** 2, np_dtype)

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


def _ext_dma_pre(v_hbm, ext_slot, sem_slot, j, nblk, Z, block, r, wait):
    """Halo slab DMA for a PREPADDED input: ``v_hbm`` already carries the
    ``r``-plane halos on both ends (supplied by the caller — e.g. a
    ``ppermute`` ring exchange under ``shard_map``), so block ``j``'s
    extended slab is ONE contiguous copy ``[j·B, j·B + B + 2r)`` with no
    wrap cases. Signature matches :func:`_ext_dma` for
    :func:`_load_ext_pipelined`."""
    c = pltpu.make_async_copy(v_hbm.at[pl.ds(j * block, block + 2 * r)],
                              ext_slot, sem_slot)
    c.wait() if wait else c.start()


def _load_ext_pipelined(inputs, i, nblk, Z, block, r, n_buf=2,
                        dma=None):
    """Halo loads for grid step ``i``. With ``n_buf=2`` (double-buffered):
    wait for block ``i``'s slabs (started in the previous grid step, or
    right here when ``i == 0``) and prefetch block ``i+1``'s into the
    other slot while the caller computes. With ``n_buf=1`` (the VMEM-tight
    512³-class layouts): start and complete block ``i``'s copies inline —
    no prefetch overlap, half the slab residency. ``inputs = [(v_hbm, ext,
    sem), ...]`` with ``ext`` shaped ``(n_buf, block+2r, Y, X)`` and
    ``sem`` an ``n_buf``-element DMA semaphore array. ``dma`` selects the
    per-block copy routine (:func:`_ext_dma` wrap-halo default, or
    :func:`_ext_dma_pre` for prepadded inputs). Returns the slot index
    holding block ``i``."""
    dma = dma if dma is not None else _ext_dma
    if n_buf == 1:
        for v_hbm, ext, sem in inputs:
            dma(v_hbm, ext.at[0], sem.at[0], i, nblk, Z, block, r,
                wait=False)
        for v_hbm, ext, sem in inputs:
            dma(v_hbm, ext.at[0], sem.at[0], i, nblk, Z, block, r,
                wait=True)
        return jnp.asarray(0, i.dtype)

    nb = jnp.asarray(n_buf, i.dtype)
    slot = lax.rem(i, nb)

    @pl.when(i == 0)
    def _():  # warm-up: start the first n_buf − 1 blocks
        for k in range(min(n_buf - 1, nblk)):
            for v_hbm, ext, sem in inputs:
                dma(v_hbm, ext.at[k % n_buf], sem.at[k % n_buf],
                    jnp.asarray(k, i.dtype), nblk, Z, block, r,
                    wait=False)

    ahead = i + (n_buf - 1)

    @pl.when(ahead < nblk)
    def _():  # keep the pipeline n_buf − 1 blocks deep
        for v_hbm, ext, sem in inputs:
            dma(v_hbm, ext.at[lax.rem(ahead, nb)],
                sem.at[lax.rem(ahead, nb)], ahead, nblk, Z, block,
                r, wait=False)

    for v_hbm, ext, sem in inputs:
        dma(v_hbm, ext.at[slot], sem.at[slot], i, nblk, Z, block, r,
            wait=True)
    return slot


def _pick_layout(shape, halo, dtype, n_ext, n_io, n_tmp=6,
                 budget_bytes=_LAYOUT_BUDGET_BYTES, block=None,
                 slab_dtype=None):
    """Choose ``(block, n_buf)`` for a streaming kernel: the largest legal
    z-block — preferring double-buffered halo DMA — whose VMEM working set
    fits the budget. The model (validated against the compiler's scoped-
    allocation dump of the 256³ cg-step OOM, 2026-08-21):

    * ``n_ext`` halo-extended input slabs × ``n_buf`` DMA slots,
    * ONE extra extended scratch slab (the materialized ``p'`` — the fix
      for the 512³ register spill of the lazy two-slab accessor),
    * ``n_io`` × 2 block-sized windows (Pallas double-buffers every
      BlockSpec input/output),
    * ``n_tmp`` block-sized Mosaic compute temporaries (the
      ``_normal_center`` accumulator, the two swap-sandwich staging
      buffers, the Laplacian terms — ~6 blocks measured).

    ``slab_dtype``: dtype of the halo-extended slabs when it differs
    from the compute blocks' (compact bf16 state halves slab residency
    — can unlock layouts that don't fit in f32, e.g. the 1-D step at
    512³). Returns ``(None, None)`` when nothing fits."""
    plane = int(np.prod(shape[1:]))
    bpe = jnp.dtype(dtype).itemsize
    bpe_slab = jnp.dtype(slab_dtype or dtype).itemsize
    for n_buf in (2, 1):
        for b in ((64, 32, 16, 8) if block is None else (block,)):
            if shape[0] % b or shape[0] // b < 2 or b < halo:
                continue
            nbytes = (n_ext * n_buf + 1) * (b + 2 * halo) * plane \
                * bpe_slab + (2 * n_io + n_tmp) * b * plane * bpe
            if nbytes <= budget_bytes:
                return b, n_buf
    return None, None



def _compact_lap_prec(st, io_dtype, precision, extra_exact=True):
    """Laplacian matmul precision for compact-state kernels: bf16-exact
    operands allow dropping high3's third pass ("high2"); when the
    Laplacian MATRICES are bf16-exact too (unit spacing), the second
    pass is also identically zero -> ONE DEFAULT pass ("exact1",
    bit-identical; round 5)."""
    if io_dtype == jnp.bfloat16 and precision == "high3":
        return "exact1" if (st.lap_exact and extra_exact) else "high2"
    return None


def _conv_minor(u, mat, axis, banded, precision):
    """Circulant blur-normal matmul along a minor axis — dense or
    windowed-band (the wrap window is CORRECT for a circulant)."""
    if banded:
        return _banded_window_matmul(u, mat, axis, 3, precision)
    return _minor_matmul(u, mat, axis, 3, precision)


def _lap_minor(u, mat, axis, banded, inv_h2, precision):
    """Zero-boundary ``DᵀD`` matmul along a minor axis. The windowed-band
    form wraps, so its first/last rows see the other edge's values —
    overwrite them with the exact boundary rows of ops/grad.py:108
    (row 0 → x[0]−x[1], row n−1 → 2x[n−1]−x[n−2])."""
    if not banded:
        return _minor_matmul(u, mat, axis, 3, precision)
    y = _banded_window_matmul(u, mat, axis, 3, precision)
    n = u.shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, u.shape, axis)
    u0 = lax.slice_in_dim(u, 0, 1, axis=axis)
    u1 = lax.slice_in_dim(u, 1, 2, axis=axis)
    um1 = lax.slice_in_dim(u, n - 1, n, axis=axis)
    um2 = lax.slice_in_dim(u, n - 2, n - 1, axis=axis)
    y = jnp.where(idx == 0, (u0 - u1) * inv_h2, y)
    y = jnp.where(idx == n - 1, (2.0 * um1 - um2) * inv_h2, y)
    return y


def _normal_center(get, st, rho, i, block, refs, precision, row0=None,
                   z_total=None, lap_precision=None, blur_reorder=None):
    """``(AᵀA + ρ·DᵀD)`` of a halo-extended slab, evaluated on its
    ``block`` center rows. ``get(start, size)`` returns slab rows
    ``[start, start+size)`` — callers pass views of ONE materialized
    scratch slab (the lazy multi-slab accessor register-spilled at 512³).
    ``refs = (ny, nx, ty, tx)`` loaded matrices (dense or windowed-band
    per ``st.banded_y``/``st.banded_x``). Under spatial sharding the
    slab is a window of a LARGER z axis: ``row0`` (traced scalar) is the
    global row of local row 0 and ``z_total`` the global z extent, so
    the Laplacian's global-boundary corrections land on the right
    shard.

    ``blur_reorder`` (round 5, compact-state probes): run the blur
    circulant matmuls BEFORE the z-tap accumulation — on the EXTENDED
    ``block + 2r`` slab rows, which in compact modes are bf16-exact —
    at the given precision string ("high2" = 2 passes bit-identical to
    high3, "default1" = 1 DEFAULT pass: the blur OPERATOR rounds to
    bf16, a ~2⁻⁹ systematic operator perturbation whose objective
    impact must be measured). The extended-row cost is
    ``(B + 2r)/B`` more matmul rows; at ``"default1"`` the net MACs
    drop ~2.4× vs the center-rows high3 form."""
    ny, nx, ty, tx = refs
    Z = st.shape[0] if z_total is None else z_total
    r = st.halo

    if blur_reorder is not None:
        # matmuls first on the bf16-exact extended slab, z taps after
        prec1 = (lax.Precision.DEFAULT if blur_reorder == "default1"
                 else blur_reorder)
        s_ext = get(0, block + 2 * r)
        s_ext = _conv_minor(s_ext, ny, 1, st.banded_y, prec1)
        s_ext = _conv_minor(s_ext, nx, 2, st.banded_x, prec1)
        qa = None
        for t in range(2 * r + 1):
            term = st.z_taps[t] * lax.slice_in_dim(
                s_ext, t, t + block, axis=0)
            qa = term if qa is None else qa + term
    else:
        # blur normal: z taps first (consume the halo), then the MXU
        # circulant matmuls on the remaining block rows only
        qa = None
        for t in range(2 * r + 1):
            term = st.z_taps[t] * get(t, block)
            qa = term if qa is None else qa + term
        qa = _conv_minor(qa, ny, 1, st.banded_y, precision)
        qa = _conv_minor(qa, nx, 2, st.banded_x, precision)

    # ρ · DᵀD on the center rows: zero-boundary corrections at the global
    # edges (the halo holds wrapped values the Laplacian must not see):
    # row 0 → x[0]−x[1], row Z−1 → 2x[Z−1]−x[Z−2] (ops/grad.py:108)
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
    # the Laplacian matmuls act on ``center`` directly, which in
    # compact-state mode is a bf16-exact f32 value → the caller passes
    # lap_precision="high2" (one fewer MXU pass at identical accuracy)
    lp = precision if lap_precision is None else lap_precision
    lap = lz * st.inv_h2_z \
        + _lap_minor(center, ty, 1, st.banded_y, st.inv_h2_y, lp) \
        + _lap_minor(center, tx, 2, st.banded_x, st.inv_h2_x, lp)
    return qa + rho * lap, center


def make_blocked_normal_operator(shape, cov, alpha_cut=3, spacing=None,
                                 block=None, dtype=jnp.float32,
                                 precision=lax.Precision.HIGHEST,
                                 interpret=False, io_dtype=None,
                                 blur_reorder=None):
    """Build ``apply(v, rho) -> AᵀA v + rho·DᵀD v`` streaming over z-blocks.

    ``shape`` must be 3-D with ``shape[0]`` divisible into ≥2 blocks of
    ``block`` rows (auto-picked when None); ``cov`` must be diagonal
    (separable blur). Use inside the normal-equation CG via the
    ``normal_M`` hook of :func:`nsol_tpu.solvers.tikhonov.tikhonov_solve`.

    ``io_dtype`` (e.g. ``jnp.bfloat16``): COMPACT-state mode — the HBM
    input/output and the DMA'd halo slabs use this narrower dtype while
    every in-kernel computation (tap accumulation, MXU matmuls,
    Laplacian) runs in ``dtype`` (f32). Halves the dominant HBM traffic
    of the BW-bound scale configs (VERDICT r3 item 2); callers keep the
    CG work vectors in ``io_dtype`` and x/reductions in f32.
    """
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    io_dtype = dtype if io_dtype is None else jnp.dtype(io_dtype)
    # compact-state slab values are bf16-exact → the Laplacian matmuls
    # run at "high2" (one fewer MXU pass, identical accuracy)
    lap_prec = _compact_lap_prec(st, io_dtype, precision)
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
        get = lambda s0, n: ext[slot, pl.ds(s0, n)].astype(dtype)
        q, _ = _normal_center(
            get, st, rho_ref[0, 0], i, block,
            (ny_ref[:], nx_ref[:], ty_ref[:], tx_ref[:]), precision,
            lap_precision=lap_prec, blur_reorder=blur_reorder)
        out_ref[:] = q.astype(io_dtype)

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const(st.Ny.shape), const(st.Nx.shape),
            const(st.Ty.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, io_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block + 2 * r, Y, X), io_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def apply(v, rho):
        rr = jnp.full((1, 1), rho, dtype)
        return call(rr, st.Ny, st.Nx, st.Ty, st.Tx,
                    jnp.asarray(v, io_dtype))

    return apply


def make_blocked_normal_operator_prepadded(local_shape, cov, alpha_cut=3,
                                           spacing=None, z_total=None,
                                           block=None, dtype=jnp.float32,
                                           precision=lax.Precision.HIGHEST,
                                           interpret=False, vma=None):
    """Blocked ``apply(v_ext, rho, row0) -> AᵀA v + rho·DᵀD v`` over a
    PREPADDED z-window of a (possibly larger) global volume — the
    per-shard kernel of the sharded scale path (VERDICT r3 item 1).

    ``v_ext`` is the local ``(Zl + 2·halo, Y, X)`` block with its z wrap
    halos already attached (under ``shard_map``:
    :func:`nsol_tpu.parallel.halo.exchange_halo_wrap` supplies them via
    ``ppermute`` ring exchange, matching the reference's ``mode="wrap"``
    blur boundary globally — /root/reference/nsol/linear_operators.py:61).
    ``row0`` is the traced global row index of local row 0
    (``axis_index * Zl``) and ``z_total`` the static global z extent:
    the Laplacian's zero-boundary corrections
    (/root/reference/nsol/linear_operators.py:98-106 semantics via
    ops/grad.py) apply only on the shards holding global rows ``0`` /
    ``z_total−1``. The slab DMA is one contiguous copy per block (no
    wrap cases) — otherwise identical streaming/double-buffering to
    :func:`make_blocked_normal_operator`. Returned ``apply`` carries
    ``.halo`` and ``.block`` attributes for the caller's exchange."""
    st = _Stencils(local_shape, cov, alpha_cut, spacing, dtype)
    Zl, Y, X = local_shape
    z_total = int(z_total) if z_total is not None else Zl
    r = st.halo
    plane = Y * X * jnp.dtype(dtype).itemsize
    if block is None:
        block, n_buf = _pick_layout(local_shape, r, dtype, n_ext=1,
                                    n_io=1)
        if block is None:
            # tiny local shards (CPU-mesh tests, many-way shardings of
            # modest volumes): a single block trivially fits
            if (2 * (Zl + 2 * r) + 8 * Zl) * plane \
                    <= _LAYOUT_BUDGET_BYTES:
                block, n_buf = Zl, 1
            else:
                raise ValueError(
                    "no z-block layout of local shape %s fits the "
                    "scoped-VMEM budget" % (local_shape,))
    else:
        # validate the explicit block against the VMEM model instead of
        # letting an oversized caller block surface as a Mosaic
        # scoped-VMEM compile failure (ADVICE r4): double-buffered if it
        # fits, single-buffered fallback, else a construction-time error
        block = int(block)
        blk, n_buf = _pick_layout(local_shape, r, dtype, n_ext=1,
                                  n_io=1, block=block)
        if blk is None:
            raise ValueError(
                "explicit block %d of local shape %s does not fit the "
                "scoped-VMEM budget even single-buffered"
                % (block, local_shape))
    if Zl % block:
        raise ValueError("local z extent %d not divisible by block %d"
                         % (Zl, block))
    nblk = Zl // block

    def kernel(rho_ref, row0_ref, ny_ref, nx_ref, ty_ref, tx_ref,
               vext_hbm, out_ref, ext, sem):
        i = pl.program_id(0)
        slot = _load_ext_pipelined([(vext_hbm, ext, sem)], i, nblk, Zl,
                                   block, r, n_buf=n_buf,
                                   dma=_ext_dma_pre)
        get = lambda s0, n: ext[slot, pl.ds(s0, n)]
        q, _ = _normal_center(
            get, st, rho_ref[0, 0], i, block,
            (ny_ref[:], nx_ref[:], ty_ref[:], tx_ref[:]), precision,
            row0=row0_ref[0, 0], z_total=z_total)
        out_ref[:] = q

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const(st.Ny.shape), const(st.Nx.shape),
            const(st.Ty.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
        # inside shard_map the output varies over the sharded mesh axes;
        # check_vma=True requires declaring that on the out_shape
        out_shape=jax.ShapeDtypeStruct(
            local_shape, dtype,
            vma=frozenset(vma) if vma is not None else None),
        scratch_shapes=[
            pltpu.VMEM((n_buf, block + 2 * r, Y, X), dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def apply(v_ext, rho, row0):
        rr = jnp.full((1, 1), rho, dtype)
        r0 = jnp.full((1, 1), row0, jnp.int32)
        return call(rr, r0, st.Ny, st.Nx, st.Ty, st.Tx,
                    jnp.asarray(v_ext, dtype))

    apply.halo = r
    apply.block = block
    return apply


def _band_matrix(taps, n_out, halo, dtype):
    """(n_out, n_out + 2·halo) band contraction matrix for a halo-extended
    axis window: output row ``i`` contracts window cols ``i .. i+2·halo``
    with ``taps`` (len ≤ 2·halo+1, centered). Used by the 2-D blocked
    kernels where the y halo arrives via DMA instead of a wrapped dense
    circulant — the contraction is window-width (e.g. 140) instead of the
    axis length (512+)."""
    taps = np.asarray(taps, dtype)
    if len(taps) // 2 > halo:
        # negative ``off`` below would silently wrap taps into the
        # wrong columns via numpy negative indexing — hard error instead
        raise ValueError(
            "band half-width %d exceeds the DMA'd halo %d"
            % (len(taps) // 2, halo))
    off = halo - (len(taps) // 2)
    C = np.zeros((n_out, n_out + 2 * halo), dtype)
    for d, t in enumerate(taps):
        idx = np.arange(n_out)
        C[idx, idx + off + d] = t
    return C


def _ext_dma_2d(v_hbm, ext_slot, sem, i, j, nbz, nby, Z, Y, Bz, By, rz,
                ry, wait):
    """2-D wrap-halo DMA: load block (i, j)'s halo-extended slab
    ``[i·Bz−rz, i·Bz+Bz+rz) × [j·By−ry, j·By+By+ry) × X`` with wrap in
    BOTH axes, as up to 4 rectangular copies (≤2 z-ranges × ≤2
    y-ranges). ``ry`` must be a multiple of 8: Mosaic requires DMA
    slices along the sublane dimension to be tile-aligned (the blur halo
    of 6 is padded up). Start/wait split as in :func:`_ext_dma`."""
    def go(zs, zd, zn, ys, yd, yn):
        c = pltpu.make_async_copy(
            v_hbm.at[pl.ds(zs, zn), pl.ds(ys, yn)],
            ext_slot.at[pl.ds(zd, zn), pl.ds(yd, yn)], sem)
        c.wait() if wait else c.start()

    def y_cases(zs, zd, zn):
        @pl.when(j == 0)
        def _():
            go(zs, zd, zn, Y - ry, 0, ry)
            go(zs, zd, zn, 0, ry, By + ry)

        @pl.when(j == nby - 1)
        def _():
            go(zs, zd, zn, Y - By - ry, 0, By + ry)
            go(zs, zd, zn, 0, By + ry, ry)

        if nby > 2:
            @pl.when(jnp.logical_and(j > 0, j < nby - 1))
            def _():
                # dynamic sublane-dim offset: Mosaic needs the 8-divisible
                # proof spelled out (By and ry are multiples of 8)
                go(zs, zd, zn, pl.multiple_of(j * By - ry, 8), 0,
                   By + 2 * ry)

    @pl.when(i == 0)
    def _():
        y_cases(Z - rz, 0, rz)
        y_cases(0, rz, Bz + rz)

    @pl.when(i == nbz - 1)
    def _():
        y_cases(Z - Bz - rz, 0, Bz + rz)
        y_cases(0, Bz + rz, rz)

    if nbz > 2:
        @pl.when(jnp.logical_and(i > 0, i < nbz - 1))
        def _():
            y_cases(i * Bz - rz, 0, Bz + 2 * rz)


def _load_ext_2d_pipelined(inputs, i, jy, nbz, nby, Z, Y, Bz, By, r, ry,
                           n_buf=2):
    """Pipelined 2-D wrap-halo loads over the row-major (i, jy) grid:
    wait for the current block's slabs, keep the prefetch pipeline
    ``n_buf − 1`` grid steps deep. Returns the current slot index."""
    l = i * nby + jy
    nb = jnp.asarray(n_buf, l.dtype)
    slot = lax.rem(l, nb)

    @pl.when(l == 0)
    def _():  # warm-up: start the first n_buf − 1 grid steps
        for k in range(min(n_buf - 1, nbz * nby)):
            ik = jnp.asarray(k // nby, l.dtype)
            jk = jnp.asarray(k % nby, l.dtype)
            for v_hbm, ext, sem in inputs:
                _ext_dma_2d(v_hbm, ext.at[k % n_buf], sem.at[k % n_buf],
                            ik, jk, nbz, nby, Z, Y, Bz, By, r, ry,
                            wait=False)

    ahead = l + (n_buf - 1)

    @pl.when(ahead < nbz * nby)
    def _():
        i1 = ahead // nby
        j1 = lax.rem(ahead, jnp.asarray(nby, l.dtype))
        for v_hbm, ext, sem in inputs:
            _ext_dma_2d(v_hbm, ext.at[lax.rem(ahead, nb)],
                        sem.at[lax.rem(ahead, nb)], i1, j1, nbz,
                        nby, Z, Y, Bz, By, r, ry, wait=False)

    for v_hbm, ext, sem in inputs:
        _ext_dma_2d(v_hbm, ext.at[slot], sem.at[slot], i, jy, nbz, nby,
                    Z, Y, Bz, By, r, ry, wait=True)
    return slot


def _normal_center_2d(get, st, rho, i, jy, Bz, By, r, ry, refs,
                      precision, lap_precision=None, blur_reorder=None):
    """``(AᵀA + ρ·DᵀD)`` of a 2-D halo-extended slab, evaluated on its
    ``(Bz, By)`` center. ``get(s0, n)`` returns slab z-rows (full y
    extension); ``refs = (wny, wty, nx, tx)`` — the rectangular y band
    matrices plus the x-axis matrices. Boundary semantics as in
    :func:`_normal_center`, with the y Laplacian's two global rows
    overwritten exactly. ``blur_reorder`` as in :func:`_normal_center`
    (matmuls on the bf16-exact extended rows before the z taps)."""
    wny, wty, nx, tx = refs
    Z, Y, _ = st.shape

    if blur_reorder is not None:
        prec1 = (lax.Precision.DEFAULT if blur_reorder == "default1"
                 else blur_reorder)
        s_ext = get(0, Bz + 2 * r)
        s_ext = _minor_matmul(s_ext, wny, 1, 3, prec1)
        s_ext = _conv_minor(s_ext, nx, 2, st.banded_x, prec1)
        qa = None
        for t in range(2 * r + 1):
            term = st.z_taps[t] * lax.slice_in_dim(
                s_ext, t, t + Bz, axis=0)
            qa = term if qa is None else qa + term
    else:
        qa = None
        for t in range(2 * r + 1):
            term = st.z_taps[t] * get(t, Bz)
            qa = term if qa is None else qa + term
        qa = _minor_matmul(qa, wny, 1, 3, precision)
        qa = _conv_minor(qa, nx, 2, st.banded_x, precision)

    zc = lambda s0: get(s0, Bz)[:, ry:ry + By]
    center = zc(r)
    lz = 2.0 * center - zc(r + 1) - zc(r - 1)
    rows = lax.broadcasted_iota(jnp.int32, (Bz, 1, 1), 0) + i * Bz
    first = lax.slice_in_dim(center, 0, 1, axis=0) \
        - lax.slice_in_dim(center, 1, 2, axis=0)
    last = 2.0 * lax.slice_in_dim(center, Bz - 1, Bz, axis=0) \
        - lax.slice_in_dim(center, Bz - 2, Bz - 1, axis=0)
    lz = jnp.where(rows == 0, first, lz)
    lz = jnp.where(rows == Z - 1, last, lz)

    lp = precision if lap_precision is None else lap_precision
    ly = _minor_matmul(get(r, Bz), wty, 1, 3, lp)
    ycols = lax.broadcasted_iota(jnp.int32, (1, By, 1), 1) + jy * By
    u0 = lax.slice_in_dim(center, 0, 1, axis=1)
    u1 = lax.slice_in_dim(center, 1, 2, axis=1)
    um1 = lax.slice_in_dim(center, By - 1, By, axis=1)
    um2 = lax.slice_in_dim(center, By - 2, By - 1, axis=1)
    ly = jnp.where(ycols == 0, (u0 - u1) * st.inv_h2_y, ly)
    ly = jnp.where(ycols == Y - 1, (2.0 * um1 - um2) * st.inv_h2_y, ly)

    lap = lz * st.inv_h2_z + ly \
        + _lap_minor(center, tx, 2, st.banded_x, st.inv_h2_x, lp)
    return qa + rho * lap, center


def make_blocked_normal_operator_2d(shape, cov, alpha_cut=3, spacing=None,
                                    z_block=32, y_block=128,
                                    dtype=jnp.float32,
                                    precision=lax.Precision.HIGHEST,
                                    interpret=False, io_dtype=None,
                                    n_buf=2, blur_reorder=None):
    """2-D (z, y)-blocked ``apply(v, rho) -> AᵀA v + rho·DᵀD v`` — the
    512-wide-plane variant of :func:`make_blocked_normal_operator`.

    Splitting y as well as z cuts the wrap-halo read amplification
    (e.g. (44/32)·(140/128) = 1.50× at (32, 128) vs 2.5× for the 1-D
    z-block 8 a 512³ volume is forced into) AND shrinks the y contraction
    from the axis length to the window width (140 → 2 MXU tiles instead
    of the windowed-band 384): the y-axis operators become rectangular
    band matmuls (`_band_matrix`) over the DMA'd halo, with the
    Laplacian's two global-boundary rows overwritten exactly. Both
    boundary-condition semantics match ops/conv.py / ops/grad.py; parity
    pinned in tests/test_pallas.py."""
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    io_dtype = dtype if io_dtype is None else jnp.dtype(io_dtype)
    Z, Y, X = shape
    r = st.halo
    # sublane-dim DMA slices must be 8-aligned: pad the y halo up.
    # Sized from the Y-axis band (halo_y), NOT the z halo — anisotropic
    # covariance (sigma_y != sigma_z) makes them differ.
    ry = -((-max(st.halo_y, 1)) // 8) * 8
    lap_prec = _compact_lap_prec(st, io_dtype, precision)
    Bz, By = int(z_block), int(y_block)
    for n, B, h, name in ((Z, Bz, r, "z"), (Y, By, ry, "y")):
        if n % B or n // B < 2 or B < h:
            raise ValueError(
                "%s axis %d must split into >=2 blocks of %d >= halo %d"
                % (name, n, B, h))
    if By % 8:
        raise ValueError("y_block must be a multiple of 8")
    nbz, nby = Z // Bz, Y // By

    nfac = [np.convolve(f, f[::-1]) for f in st.factors]
    lap_taps = np.array([-1.0, 2.0, -1.0]) * float(st.inv_h2_y)
    Wny = jnp.asarray(_band_matrix(nfac[1], By, ry, st.np_dtype))
    Wty = jnp.asarray(_band_matrix(lap_taps, By, ry, st.np_dtype))

    def kernel(rho_ref, wny_ref, wty_ref, nx_ref, tx_ref, v_hbm, out_ref,
               ext, sem):
        i = pl.program_id(0)
        jy = pl.program_id(1)
        slot = _load_ext_2d_pipelined([(v_hbm, ext, sem)], i, jy, nbz,
                                      nby, Z, Y, Bz, By, r, ry,
                                      n_buf=n_buf)
        get = lambda s0, n: ext[slot, pl.ds(s0, n)].astype(dtype)
        q, _ = _normal_center_2d(
            get, st, rho_ref[0, 0], i, jy, Bz, By, r, ry,
            (wny_ref[:], wty_ref[:], nx_ref[:], tx_ref[:]), precision,
            lap_precision=lap_prec, blur_reorder=blur_reorder)
        out_ref[:] = q.astype(io_dtype)

    const = lambda shp: pl.BlockSpec(shp, lambda i, j: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nbz, nby),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            const(Wny.shape), const(Wty.shape),
            const(st.Nx.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Bz, By, X), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, io_dtype),
        scratch_shapes=[
            pltpu.VMEM((n_buf, Bz + 2 * r, By + 2 * ry, X), io_dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def apply(v, rho):
        rr = jnp.full((1, 1), rho, dtype)
        return call(rr, Wny, Wty, st.Nx, st.Tx,
                    jnp.asarray(v, io_dtype))

    return apply


def pick_zy_blocks(shape, halo, dtype=jnp.float32, n_ext=1,
                   budget_bytes=_LAYOUT_BUDGET_BYTES, halo_y=None,
                   slab_dtype=None):
    """(z_block, y_block) for the 2-D blocked kernels, or (None, None).
    Only worthwhile for >= 512-wide y (below that the 1-D z-blocking has
    less halo overhead); working set = ``n_ext`` double-buffered 2-D
    slabs (+ one materialized p' slab when ``n_ext > 1``) + 2 output
    windows + ~6 block temporaries. ``halo_y`` is the y-axis band
    half-width when it differs from the z ``halo`` (anisotropic
    covariance). ``slab_dtype`` = the DMA'd slab dtype (compact-state
    bf16): bf16 slabs prefer Bz=16 (512³ probes 2026-08-21: 6.14 vs
    5.89 it/s at 32, reproduced 6.1 end-to-end) — finer pipeline
    granularity wins. f32 keeps the 32-first order: its Bz=8 probe was
    not reproducible (4.98 one session, 1.8 the next — tunnel-state
    sensitive), so the stable measured default stands."""
    Z, Y, X = shape
    if Y < 512 or Y % 128:
        return None, None
    ry = -((-max(halo_y if halo_y is not None else halo, 1)) // 8) * 8
    row = X * jnp.dtype(dtype).itemsize
    slab_row = X * jnp.dtype(slab_dtype or dtype).itemsize
    order = ((16, 32, 8) if jnp.dtype(slab_dtype or dtype).itemsize < 4
             else (32, 16, 8))
    for Bz in order:
        if Z % Bz or Z // Bz < 2 or Bz < halo:
            continue
        By = 128
        if By < ry or Y // By < 2:
            continue
        slabs = 2 * n_ext + (1 if n_ext > 1 else 0)
        nbytes = slabs * (Bz + 2 * halo) * (By + 2 * ry) * slab_row \
            + (2 * 2 + 6) * Bz * By * row
        if nbytes <= budget_bytes:
            return Bz, By
    return None, None


def make_blocked_cg_step_2d(shape, cov, alpha_cut=3, spacing=None,
                            z_block=None, y_block=None,
                            dtype=jnp.float32,
                            precision=lax.Precision.HIGHEST,
                            interpret=False):
    """2-D (z, y)-blocked fused CG hot step
    ``step(r, p, beta, rho) -> (p_new, q, pq)`` — the 512-wide-plane
    variant of :func:`make_blocked_cg_step`, which does NOT fit the
    scoped-VMEM budget in its 1-D layout there. Same contract: one
    streaming pass computes ``p' = r + β·p`` (materialized into one
    extended scratch slab, streamed out via manual DMA overlapped with
    the apply), ``q = (AᵀA + ρDᵀD) p'``, and the per-block partial
    ``Σ p'·q``."""
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    Z, Y, X = shape
    r = st.halo
    ry = -((-max(st.halo_y, 1)) // 8) * 8
    if z_block is None or y_block is None:
        zb, yb = pick_zy_blocks(shape, r, dtype, n_ext=2,
                                halo_y=st.halo_y)
        z_block = z_block or zb
        y_block = y_block or yb
    if z_block is None:
        raise ValueError(
            "no 2-D block layout of shape %s fits the scoped-VMEM "
            "budget for the blocked CG step" % (shape,))
    Bz, By = int(z_block), int(y_block)
    for n, B, h, name in ((Z, Bz, r, "z"), (Y, By, ry, "y")):
        if n % B or n // B < 2 or B < h:
            raise ValueError(
                "%s axis %d must split into >=2 blocks of %d >= halo %d"
                % (name, n, B, h))
    nbz, nby = Z // Bz, Y // By

    nfac = [np.convolve(f, f[::-1]) for f in st.factors]
    lap_taps = np.array([-1.0, 2.0, -1.0]) * float(st.inv_h2_y)
    Wny = jnp.asarray(_band_matrix(nfac[1], By, ry, st.np_dtype))
    Wty = jnp.asarray(_band_matrix(lap_taps, By, ry, st.np_dtype))

    def kernel(sc_ref, wny_ref, wty_ref, nx_ref, tx_ref, r_hbm, p_hbm,
               pn_hbm, q_ref, pq_ref, ext_r, ext_p, pn_ext, sem_r,
               sem_p, sem_out):
        i = pl.program_id(0)
        jy = pl.program_id(1)
        beta = sc_ref[0, 0]
        rho = sc_ref[0, 1]
        slot = _load_ext_2d_pipelined(
            [(r_hbm, ext_r, sem_r), (p_hbm, ext_p, sem_p)], i, jy, nbz,
            nby, Z, Y, Bz, By, r, ry)
        pn_ext[...] = ext_r[slot] + beta * ext_p[slot]
        out_dma = pltpu.make_async_copy(
            pn_ext.at[pl.ds(r, Bz), pl.ds(ry, By)],
            pn_hbm.at[pl.ds(i * Bz, Bz),
                      pl.ds(pl.multiple_of(jy * By, 8), By)], sem_out)
        out_dma.start()  # overlaps the whole M-apply below
        get = lambda s0, n: pn_ext[pl.ds(s0, n)]
        q, pn_center = _normal_center_2d(
            get, st, rho, i, jy, Bz, By, r, ry,
            (wny_ref[:], wty_ref[:], nx_ref[:], tx_ref[:]), precision)
        q_ref[:] = q
        pq_ref[0, 0] = jnp.full((8, 128), jnp.sum(pn_center * q), dtype)
        out_dma.wait()

    const = lambda shp: pl.BlockSpec(shp, lambda i, j: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nbz, nby),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            const(Wny.shape), const(Wty.shape),
            const(st.Nx.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Bz, By, X), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct((nbz, nby, 8, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Bz + 2 * r, By + 2 * ry, X), dtype),
            pltpu.VMEM((2, Bz + 2 * r, By + 2 * ry, X), dtype),
            pltpu.VMEM((Bz + 2 * r, By + 2 * ry, X), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def step(r_arr, p_arr, beta, rho):
        sc = jnp.stack([jnp.asarray(beta, dtype),
                        jnp.asarray(rho, dtype)]).reshape(1, 2)
        pn, q, pq = call(sc, Wny, Wty, st.Nx, st.Tx,
                         jnp.asarray(r_arr, dtype),
                         jnp.asarray(p_arr, dtype))
        return pn, q, jnp.sum(pq[:, :, 0, 0])

    return step


def make_blocked_cg_step(shape, cov, alpha_cut=3, spacing=None,
                         block=None, dtype=jnp.float32,
                         precision=lax.Precision.HIGHEST,
                         interpret=False, n_buf=None, io_dtype=None,
                         r_dtype=None, q_dtype=None, blur_reorder=None):
    """Build the fused CG hot step
    ``step(r, p, beta, rho) -> (p_new, q, pq)`` with
    ``p_new = r + β·p``, ``q = (AᵀA + ρDᵀD) p_new``, ``pq = Σ p_new·q`` —
    ONE streaming pass (2 halo-reads + 2 block-writes + per-block partial
    dots) instead of separate direction-update / operator / dot sweeps.
    The ``β=0`` first trip makes ``p_new = r``, so the same program serves
    every CG iteration (solvers/cg.py semantics).

    ``io_dtype`` (e.g. ``jnp.bfloat16``): compact-state mode — r/p/p'/q
    and the halo slabs live in the narrower dtype in HBM/VMEM while the
    p'-update, tap accumulation, matmuls and the ``Σp'q`` partial run in
    ``dtype`` (f32); the pq output stays f32. Halves the kernel's HBM
    traffic (VERDICT r3 item 2).

    ``r_dtype`` (round 5, compact-DIRECTIONS mode): dtype of the r
    input/slab alone when it differs from ``io_dtype`` — the
    fused-kernel ``compact_dirs`` split transferred to the blocked
    family (VERDICT r4 item 2): only the search directions p/p'/q round
    to bf16 while the residual r (carried f32 by the caller's XLA
    update) streams in f32, so the ~1 % voxel drift of the full-compact
    mode (which rounds r every iteration) collapses to the
    rounded-direction class; the p' slab stays bf16-exact so the
    Laplacian matmuls keep the 2-pass "high2" schedule.
    """
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    io_dtype = dtype if io_dtype is None else jnp.dtype(io_dtype)
    r_io = io_dtype if r_dtype is None else jnp.dtype(r_dtype)
    # ``q_dtype``: the q output alone (compact-dirs "qf32" variant: q
    # feeds the f32 r recurrence exactly, at +2 bytes/voxel traffic)
    q_io = io_dtype if q_dtype is None else jnp.dtype(q_dtype)
    lap_prec = _compact_lap_prec(st, io_dtype, precision)
    # Working set: 2 halo-extended inputs (r, p) × n_buf DMA slots + the
    # materialized p' slab + pipelined q out (2) + ~4 compute temporaries.
    # 512³ picks (block=8, n_buf=1); oversized planes (e.g. 1024² cuts)
    # raise the construction-time ValueError callers already handle
    # instead of a Mosaic compile failure deep inside the first jit.
    n_buf_override = n_buf
    block_req = block
    # mixed slab dtypes (compact-dirs: r f32, p bf16) budget with the
    # WIDER dtype — conservative, so a fitting layout really fits
    slab_pick = r_io if jnp.dtype(r_io).itemsize \
        > jnp.dtype(io_dtype).itemsize else io_dtype
    block, n_buf = _pick_layout(shape, st.halo, dtype, n_ext=2,
                                n_io=1, block=block,
                                slab_dtype=slab_pick)
    if block_req is None and block is not None and block > 16:
        # measured preference (256³ compact probe, 2026-08-21): z-block
        # 16 beats 32 at every prefetch depth (57.0 vs 54.0 it/s at
        # n_buf=2) — the finer grid interleaves DMA with compute better
        # than the lower halo amplification of bigger blocks, the same
        # direction as round 3's (16, dbl) > (32, single) finding. The
        # larger fitting block is only taken when 16 does not fit.
        b16, nb16 = _pick_layout(shape, st.halo, dtype, n_ext=2,
                                 n_io=1, block=16, slab_dtype=slab_pick)
        if b16 is not None:
            block, n_buf = b16, nb16
    if n_buf_override is not None:
        n_buf = n_buf_override
    if block is None:
        raise ValueError(
            "no z-block layout of shape %s fits the scoped-VMEM budget "
            "for the blocked CG step" % (shape,))
    nblk = st.validate_block(block)
    Z, Y, X = shape
    r_h = st.halo

    def kernel(sc_ref, ny_ref, nx_ref, ty_ref, tx_ref, r_hbm, p_hbm,
               pn_hbm, q_ref, pq_ref, ext_r, ext_p, pn_ext, sem_r, sem_p,
               sem_out):
        i = pl.program_id(0)
        beta = sc_ref[0, 0]
        rho = sc_ref[0, 1]
        slot = _load_ext_pipelined(
            [(r_hbm, ext_r, sem_r), (p_hbm, ext_p, sem_p)], i, nblk, Z,
            block, r_h, n_buf)
        # materialize p' = r + β·p into ONE extended scratch slab, then
        # run the single-input tap loop over it. The previous lazy
        # two-slab accessor kept per-tap slices of BOTH slabs live and
        # register-spilled 65 MB past VMEM at 512-wide planes. (In
        # compact-dirs mode r streams in r_io=f32 and only p'/q round.)
        pn_ext[...] = (ext_r[slot].astype(dtype)
                       + beta * ext_p[slot].astype(dtype)).astype(io_dtype)
        # p' center goes out via manual DMA straight from the scratch —
        # overlaps the whole M-apply below; waited before the block ends.
        out_dma = pltpu.make_async_copy(
            pn_ext.at[pl.ds(r_h, block)],
            pn_hbm.at[pl.ds(i * block, block)], sem_out)
        out_dma.start()
        get = lambda s0, n: pn_ext[pl.ds(s0, n)].astype(dtype)
        q, pn_center = _normal_center(
            get, st, rho, i, block,
            (ny_ref[:], nx_ref[:], ty_ref[:], tx_ref[:]), precision,
            lap_precision=lap_prec, blur_reorder=blur_reorder)
        q_ref[:] = q.astype(q_io)
        # per-block partial dot; (1, 8, 128) broadcast satisfies the
        # Mosaic (8, 128) minor-dims tiling rule for blocked outputs
        pq_ref[:] = jnp.full((1, 8, 128), jnp.sum(pn_center * q), dtype)
        out_dma.wait()

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const(st.Ny.shape), const(st.Nx.shape),
            const(st.Ty.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape, io_dtype),
            jax.ShapeDtypeStruct(shape, q_io),
            jax.ShapeDtypeStruct((nblk, 8, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buf, block + 2 * r_h, Y, X), r_io),
            pltpu.VMEM((n_buf, block + 2 * r_h, Y, X), io_dtype),
            pltpu.VMEM((block + 2 * r_h, Y, X), io_dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def step(r, p, beta, rho):
        sc = jnp.stack([jnp.asarray(beta, dtype),
                        jnp.asarray(rho, dtype)]).reshape(1, 2)
        pn, q, pq = call(sc, st.Ny, st.Nx, st.Ty, st.Tx,
                         jnp.asarray(r, r_io),
                         jnp.asarray(p, io_dtype))
        return pn, q, jnp.sum(pq[:, 0, 0])

    return step


def make_blocked_cg_sweep(shape, cov, alpha_cut=3, spacing=None,
                          block=None, dtype=jnp.float32,
                          precision=lax.Precision.HIGHEST,
                          interpret=False, n_buf=None, io_dtype=None,
                          blur_reorder=None):
    """Build the FULLY fused CG sweep: one streaming pass per CG iteration
    that touches HBM exactly once per array.

    ``sweep(x, r, p, q, a, beta, rho) -> (x', r', q', p', g, pq, rq, qq)``
    performs iteration ``k``'s operator application AND iteration
    ``k−1``'s deferred elementwise updates in the same z-blocked pass:

    * ``r' = r − a·q``   (the previous iteration's residual update),
    * ``p' = r' + β·p``  (materialized into one extended scratch slab),
    * ``q' = (AᵀA + ρDᵀD) p'``,
    * ``x' = x + a·p``   (the previous direction's solution update),
    * partial reductions ``g = Σr'²``, ``pq = Σp'q'``, ``rq = Σr'q'``,
      ``qq = Σq'²``.

    The caller runs the scalar recurrence between sweeps with NO array
    traffic: ``a_k = g/pq`` (``g`` is the EXACT ‖r'‖², a by-product of the
    pass), and ``β_k = γ_k/g`` with ``γ_k = g − 2·a_k·rq + a_k²·qq`` — the
    standard pipelined-CG residual-norm recurrence, self-corrected by the
    next sweep's exact ``g``. The one still-owed update after the last
    sweep (``x += a·p'``) is a single XLA fusion per ADMM iteration.

    This removes the per-CG-iteration multi-output XLA fusion of
    :func:`blocked_admm_solve`'s previous formulation — the builder's own
    256³ breakdown showed that elementwise HBM traffic (4 reads + 2
    writes of the full volume) was the remaining bound (BASELINE.md
    "Where the 256³ time actually goes"; round-2 VERDICT item 1). The
    reference hot loop all of this replaces is the lsmr inner iteration
    of nsol/tikhonov_linear_solver.py:146-158.
    """
    st = _Stencils(shape, cov, alpha_cut, spacing, dtype)
    io_dtype = dtype if io_dtype is None else jnp.dtype(io_dtype)
    lap_prec = _compact_lap_prec(st, io_dtype, precision)
    # 3 halo-extended inputs (r, q, p) + p' slab + x in (2) + x'/r'/q'
    # pipelined outs (6) + ~4 temporaries. 256³ picks (16, 2); 512-wide
    # planes do NOT fit (use make_blocked_cg_step there).
    n_buf_override = n_buf
    block, n_buf = _pick_layout(shape, st.halo, dtype, n_ext=3,
                                n_io=4, block=block,
                                slab_dtype=io_dtype)
    if n_buf_override is not None:
        n_buf = n_buf_override
    if block is None:
        raise ValueError(
            "no z-block layout of shape %s fits the scoped-VMEM budget "
            "for the fused CG sweep" % (shape,))
    nblk = st.validate_block(block)
    Z, Y, X = shape
    r_h = st.halo

    def kernel(sc_ref, ny_ref, nx_ref, ty_ref, tx_ref, r_hbm, q_hbm,
               p_hbm, x_ref, xo_ref, ro_ref, qo_ref, pn_hbm, dots_ref,
               ext_r, ext_q, ext_p, pn_ext, sem_r, sem_q, sem_p, sem_out):
        i = pl.program_id(0)
        a_prev = sc_ref[0, 0]
        beta = sc_ref[0, 1]
        rho = sc_ref[0, 2]
        slot = _load_ext_pipelined(
            [(r_hbm, ext_r, sem_r), (q_hbm, ext_q, sem_q),
             (p_hbm, ext_p, sem_p)], i, nblk, Z, block, r_h, n_buf)
        # deferred residual update + direction update in one fused pass
        # over the extended slabs, materialized once (512³ spill fix);
        # compact mode computes in f32 and stores io_dtype
        pn_ext[...] = (ext_r[slot].astype(dtype)
                       - a_prev * ext_q[slot].astype(dtype)
                       + beta * ext_p[slot].astype(dtype)).astype(io_dtype)
        out_dma = pltpu.make_async_copy(
            pn_ext.at[pl.ds(r_h, block)],
            pn_hbm.at[pl.ds(i * block, block)], sem_out)
        out_dma.start()  # overlaps the whole M-apply below
        get = lambda s0, n: pn_ext[pl.ds(s0, n)].astype(dtype)
        qn, pn_center = _normal_center(
            get, st, rho, i, block,
            (ny_ref[:], nx_ref[:], ty_ref[:], tx_ref[:]), precision,
            lap_precision=lap_prec, blur_reorder=blur_reorder)
        r_center = (ext_r[slot, pl.ds(r_h, block)].astype(dtype)
                    - a_prev
                    * ext_q[slot, pl.ds(r_h, block)].astype(dtype))
        xo_ref[:] = x_ref[:] + a_prev \
            * ext_p[slot, pl.ds(r_h, block)].astype(dtype)
        ro_ref[:] = r_center.astype(io_dtype)
        qo_ref[:] = qn.astype(io_dtype)
        # 4 partial dots packed into one (1, 32, 128) block — each scalar
        # broadcast over an (8, 128) tile (Mosaic minor-dims tiling rule)
        dots_ref[0] = jnp.concatenate(
            [jnp.full((8, 128), jnp.sum(r_center * r_center), dtype),
             jnp.full((8, 128), jnp.sum(pn_center * qn), dtype),
             jnp.full((8, 128), jnp.sum(r_center * qn), dtype),
             jnp.full((8, 128), jnp.sum(qn * qn), dtype)], axis=0)
        out_dma.wait()

    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((block, Y, X), lambda i: (i, 0, 0))
    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            const(st.Ny.shape), const(st.Nx.shape),
            const(st.Ty.shape), const(st.Tx.shape),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            blk(),
        ],
        out_specs=[
            blk(), blk(), blk(),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 32, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape, dtype),
            jax.ShapeDtypeStruct(shape, io_dtype),
            jax.ShapeDtypeStruct(shape, io_dtype),
            jax.ShapeDtypeStruct(shape, io_dtype),
            jax.ShapeDtypeStruct((nblk, 32, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buf, block + 2 * r_h, Y, X), io_dtype),
            pltpu.VMEM((n_buf, block + 2 * r_h, Y, X), io_dtype),
            pltpu.VMEM((n_buf, block + 2 * r_h, Y, X), io_dtype),
            pltpu.VMEM((block + 2 * r_h, Y, X), io_dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )

    def sweep(x, r, p, q, a, beta, rho):
        sc = jnp.stack([jnp.asarray(a, dtype), jnp.asarray(beta, dtype),
                        jnp.asarray(rho, dtype)]).reshape(1, 3)
        xo, ro, qo, pn, dots = call(
            sc, st.Ny, st.Nx, st.Ty, st.Tx, jnp.asarray(r, io_dtype),
            jnp.asarray(q, io_dtype), jnp.asarray(p, io_dtype),
            jnp.asarray(x, dtype))
        g = jnp.sum(dots[:, 0, 0])
        pq = jnp.sum(dots[:, 8, 0])
        rq = jnp.sum(dots[:, 16, 0])
        qq = jnp.sum(dots[:, 24, 0])
        return xo, ro, qo, pn, g, pq, rq, qq

    return sweep


def blocked_admm_solve(shape, cov, alpha_cut=3, spacing=None,
                       iterations=10, iter_max=10, dtype=jnp.float32,
                       precision=lax.Precision.HIGHEST, block=None,
                       interpret=False, mode="auto", state_dtype=None,
                       compact_dirs=False, blur_reorder="auto"):
    """Build ``solve(b, x0, alpha, rho) -> x``: ADMM TV-L2 deconvolution
    for volumes past VMEM, fully streaming.

    ``state_dtype`` (e.g. ``jnp.bfloat16``): compact CG state — the
    work vectors r/p/q and the DMA'd halo slabs are stored in the
    narrower dtype (HBM traffic of the BW-bound scale configs roughly
    halves, VERDICT r3 item 2) while x, every reduction, and all
    in-kernel arithmetic stay ``dtype`` (f32 accumulation). The r0 of
    each outer x-update is recomputed in f32 from scratch, so rounding
    does not accumulate across outer iterations.

    ``compact_dirs`` (round 5, VERDICT r4 item 2): the fused kernel's
    compact-DIRECTIONS split transferred here — only the CG search
    directions p/q (and their slabs) round to bfloat16; the residual r,
    x, and every reduction stay f32 AND the outer r0 uses a separate
    full-f32 apply. Keeps most of the full-compact traffic win and the
    2-pass "high2" Laplacian while collapsing the ~1 % voxel drift
    (driven by rounding r each iteration) to the rounded-direction
    class. Mutually exclusive with ``state_dtype``.

    ``mode="sweep"`` (default where it fits): every CG iteration is ONE
    z-blocked Pallas pass (:func:`make_blocked_cg_sweep`) — the deferred
    x/r elementwise updates and ALL reductions ride inside the streaming
    kernel, and the between-iteration work is a pure scalar recurrence
    (``γ`` via the pipelined-CG identity, exact-``‖r‖²``-corrected each
    sweep). ``mode="step"`` keeps the round-2 formulation (fused
    p'/apply/Σp'q kernel + one multi-output XLA fusion per iteration)
    whose trajectory matches the XLA CG bit-for-step — the VMEM-tight
    fallback for 512-wide planes and the exact-parity oracle in
    tests/test_pallas.py. ``mode="auto"`` picks "sweep" when its layout
    fits the VMEM budget.

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
    if compact_dirs and state_dtype is not None:
        raise ValueError("compact_dirs and state_dtype are mutually "
                         "exclusive")
    if compact_dirs and mode == "sweep":
        raise ValueError("compact_dirs is not supported for the sweep "
                         "formulation (measured slower anyway)")
    io = dtype if state_dtype is None else jnp.dtype(state_dtype)
    if compact_dirs:
        io = jnp.dtype(jnp.bfloat16)  # directions only; r stays f32
    to_io = (lambda a: a) if io == dtype else (lambda a: a.astype(io))
    to_f = (lambda a: a) if io == dtype else (lambda a: a.astype(dtype))
    # r's carry dtype: f32 in compact-dirs mode, io otherwise
    r_io = dtype if compact_dirs else io
    to_rio = (lambda a: a) if r_io == dtype \
        else (lambda a: a.astype(r_io))
    # blur_reorder="auto" (round 5): compact-state slabs are bf16-exact,
    # so the blur matmuls run FIRST on the extended rows as ONE DEFAULT
    # pass ("default1" — measured 256³ step dirs 55.5→59.7, full-compact
    # →65.6 it/s with objective unchanged to 1e-7 relative: the f32
    # outer r0 corrects the bf16-rounded inner operator exactly like an
    # inexact-Newton scheme). f32 state keeps the z-taps-first form.
    if blur_reorder == "auto":
        blur_reorder = "default1" if io == jnp.bfloat16 else None
    if mode == "auto":
        # "step" is the measured production formulation (46.1 vs the
        # sweep's 39.3 it/s at 256³ high3, same session 2026-08-21 — the
        # sweep's extra halo'd input and its output pipelining cost more
        # than the one XLA elementwise fusion it removes, which was
        # already hidden under DMA/MXU work). "sweep" stays available
        # explicitly, with its parity pinned in tests. Compact bf16
        # state halves slab residency, which can unlock the step layout
        # where f32 could not fit (512³) — but a SINGLE-buffered step
        # (no DMA/compute overlap) measured slower there than the 2-D
        # apply + XLA CG (5.0 vs 5.6 it/s compact, 2026-08-21), so auto
        # requires the double-buffered layout; "step" stays available
        # explicitly.
        blk_, nbuf_ = _pick_layout(shape, st.halo, dtype, n_ext=2,
                                   n_io=1, block=block,
                                   slab_dtype=(dtype if compact_dirs
                                               else io))
        if blk_ is not None and nbuf_ == 2:
            mode = "step"
        else:
            # 512-wide planes: the 1-D step layout exceeds the scoped-
            # VMEM budget. The 2-D step ("step2d") fits but measured a
            # WASH vs plain XLA CG around the 2-D apply (4.8 it/s both,
            # 2026-08-21 — the fused p-update/dot it absorbs was already
            # hidden, same lesson as the 256³ sweep), so auto picks the
            # simpler formulation; "step2d" stays available explicitly.
            mode = "apply"
    if mode == "sweep":
        cg_sweep = make_blocked_cg_sweep(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing, block=block,
            dtype=dtype, precision=precision, interpret=interpret,
            io_dtype=io, blur_reorder=blur_reorder)
    elif mode == "step":
        cg_step = make_blocked_cg_step(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing, block=block,
            dtype=dtype, precision=precision, interpret=interpret,
            io_dtype=io,
            r_dtype=(dtype if compact_dirs else None),
            q_dtype=(dtype if compact_dirs == "qf32" else None),
            blur_reorder=blur_reorder)
    elif mode == "step2d":
        if io != dtype:
            raise ValueError("state_dtype is not supported for "
                             "mode='step2d'")
        cg_step = make_blocked_cg_step_2d(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing,
            dtype=dtype, precision=precision, interpret=interpret)
        mode = "step"  # same solve loop as the 1-D step formulation
    elif mode != "apply":
        raise ValueError("mode must be auto/sweep/step/step2d/apply, "
                         "got %r" % (mode,))
    # the r0/apply operator: prefer the 2-D (z, y)-blocked kernel for
    # >= 512-wide y (lower halo amplification + window-width y
    # contraction: 4.8 vs 4.6 it/s at 512-cubed, same session)
    zb, yb = pick_zy_blocks(shape, st.halo, dtype, halo_y=st.halo_y,
                            slab_dtype=io)
    if zb is not None and block is None:
        apply_M = make_blocked_normal_operator_2d(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing, z_block=zb,
            y_block=yb, dtype=dtype, precision=precision,
            interpret=interpret, io_dtype=io, blur_reorder=blur_reorder)
    else:
        apply_M = make_blocked_normal_operator(
            shape, cov, alpha_cut=alpha_cut, spacing=spacing, block=block,
            dtype=dtype, precision=precision, interpret=interpret,
            io_dtype=io, blur_reorder=blur_reorder)
    # compact-dirs: the outer r0 must not round x — build a full-f32
    # apply for it (the CG p-applies keep the bf16 ``apply_M``)
    if compact_dirs and io != dtype:
        zb32, yb32 = pick_zy_blocks(shape, st.halo, dtype,
                                    halo_y=st.halo_y)
        if zb32 is not None and block is None:
            apply_f32 = make_blocked_normal_operator_2d(
                shape, cov, alpha_cut=alpha_cut, spacing=spacing,
                z_block=zb32, y_block=yb32, dtype=dtype,
                precision=precision, interpret=interpret)
        else:
            apply_f32 = make_blocked_normal_operator(
                shape, cov, alpha_cut=alpha_cut, spacing=spacing,
                block=block, dtype=dtype, precision=precision,
                interpret=interpret)
    else:
        apply_f32 = apply_M
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

        def cg_step_mode(x, r):
            # round-2 formulation: fused kernel + one XLA fusion per
            # iter. Full-compact mode carries r/p/q in ``io``;
            # compact-dirs keeps r (and x, reductions) f32 and rounds
            # only the directions p/q. The r update runs in f32 either
            # way.
            gamma = jnp.sum(r * r)
            r = to_rio(r)
            p = jnp.zeros(shape, io)
            beta = jnp.asarray(0.0, dtype)

            def cg_iter(c, _):
                x, r, p, gamma, beta = c
                p, q, pq = cg_step(r, p, beta, rho)
                a = jnp.where(pq > 0,
                              gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
                x = x + a * to_f(p)
                r32 = to_f(r) - a * to_f(q)
                gamma_new = jnp.sum(r32 * r32)
                beta = jnp.where(gamma > 0,
                                 gamma_new / jnp.where(gamma > 0, gamma,
                                                       1.0), 0.0)
                return (x, to_rio(r32), p, gamma_new, beta), None

            (x, _, _, _, _), _ = lax.scan(
                cg_iter, (x, r, p, gamma, beta), None, length=iter_max)
            return x

        def cg_sweep_mode(x, r):
            # fully fused: sweep k applies iteration k AND performs
            # iteration k−1's deferred updates; between sweeps only the
            # scalar recurrence runs (a from the exact in-kernel ‖r‖²,
            # β from the pipelined-CG γ identity). Compact mode carries
            # r/p/q in ``io``; x stays f32.
            r = to_io(r)
            zero = jnp.zeros_like(r)
            sc0 = jnp.asarray(0.0, dtype)

            def cg_iter(c, _):
                x, r, p, q, a, beta = c
                x, r, q, p, g, pq, rq, qq = cg_sweep(x, r, p, q, a, beta,
                                                     rho)
                a = jnp.where(pq > 0, g / jnp.where(pq > 0, pq, 1.0),
                              0.0)
                g_new = jnp.maximum(g - 2.0 * a * rq + a * a * qq, 0.0)
                beta = jnp.where(g > 0,
                                 g_new / jnp.where(g > 0, g, 1.0), 0.0)
                return (x, r, p, q, a, beta), None

            (x, r, p, q, a, beta), _ = lax.scan(
                cg_iter, (x, r, zero, zero, sc0, sc0), None,
                length=iter_max)
            # the last iteration's still-owed update
            return x + a * to_f(p)

        def cg_apply_mode(x, r):
            # plain CG (solvers/cg.py semantics) around the blocked
            # apply; full-compact keeps r/p/q in ``io``, compact-dirs
            # keeps r f32 and rounds only the directions; updates +
            # reductions are f32 either way
            gamma = jnp.sum(r * r)
            r = to_rio(r)
            p = to_io(r)

            def cg_iter(c, _):
                x, r, p, gamma = c
                q = apply_M(p, rho)
                p32, q32 = to_f(p), to_f(q)
                pq = jnp.sum(p32 * q32)
                a = jnp.where(pq > 0,
                              gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
                x = x + a * p32
                r32 = to_f(r) - a * q32
                gamma_new = jnp.sum(r32 * r32)
                beta = jnp.where(gamma > 0,
                                 gamma_new / jnp.where(gamma > 0, gamma,
                                                       1.0), 0.0)
                return (x, to_rio(r32), to_io(r32 + beta * p32),
                        gamma_new), None

            (x, _, _, _), _ = lax.scan(cg_iter, (x, r, p, gamma), None,
                                       length=iter_max)
            return x

        def outer(carry, _):
            x, v, w = carry
            rhs = At_b + rho * G.gradient_adjoint(v - w, spacing)

            # warm-started CG on the normal equations (solvers/cg.py);
            # r0 recomputed in f32 each outer iteration — compact-state
            # rounding cannot accumulate across the outer loop
            # (compact-dirs: apply_f32 keeps even x's rounding out)
            r = rhs - to_f(apply_f32(x, rho))
            x = {"sweep": cg_sweep_mode, "step": cg_step_mode,
                 "apply": cg_apply_mode}[mode](x, r)
            x = jnp.maximum(x, 0.0)  # reference default bounds (0, ∞)

            t = G.gradient(x, spacing) + w
            v = vectorial_soft_threshold(t, alpha / rho)
            w = t - v
            return (x, v, w), None

        (x, _, _), _ = lax.scan(outer, (x, v, w), None, length=iterations)
        return x

    return solve
