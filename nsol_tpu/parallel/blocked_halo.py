"""Sharding composed with the streaming blocked Pallas kernels.

Round-3 VERDICT item 1: the sharded scale path (BASELINE config 5) used
the XLA matmul operators of :mod:`nsol_tpu.parallel.matmul_halo` while
the single-chip optimization ladder topped out on the z-blocked Pallas
kernels of :mod:`nsol_tpu.ops.pallas.blocked` — two disjoint code paths.
This module composes them: each shard runs the SAME streaming blocked
``AᵀA + ρDᵀD`` kernel over its local z-window, with the shard-edge wrap
halos supplied by a ``ppermute`` ring exchange
(:func:`nsol_tpu.parallel.halo.exchange_halo_wrap`) feeding the kernel's
prepadded form, and the global zero-boundary Laplacian rows selected at
runtime from the shard's global row offset. All functions run *inside*
``shard_map``; CG inner products psum-reduce as before
(solvers/cg.py::tree_vdot).

Reference anchor: the hot loop this accelerates is the lsmr inner solve
of /root/reference/nsol/tikhonov_linear_solver.py:146-158 (the reference
itself has no distribution of any kind — SURVEY.md §2)."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from nsol_tpu.parallel import halo as _halo

__all__ = ["make_sharded_blocked_normal_operator",
           "make_sharded_blocked_robust_operators"]


def make_sharded_blocked_normal_operator(local_shape, cov, alpha_cut=3,
                                         spacing=None, axis_name="space",
                                         n_shards=1, dtype=jnp.float32,
                                         precision=None, block=None,
                                         interpret=False):
    """``apply(v, rho) -> (AᵀA + ρ·DᵀD) v`` for z-sharded volumes, with
    the per-shard apply running the streaming blocked Pallas kernel
    (double-buffered slab DMA, MXU minor-axis matmuls) instead of the
    XLA matmul composition.

    ``local_shape`` is the per-shard block ``(Z/n_shards, Y, X)``. The
    returned callable runs inside ``shard_map`` over ``axis_name`` and
    plugs into the ``normal_M`` hook of
    :func:`nsol_tpu.solvers.tikhonov.tikhonov_solve` /
    :func:`nsol_tpu.solvers.admm.admm_solve` (called as
    ``normal_M(v, rho)``). Raises ``ValueError`` when the blur is
    non-separable or no block layout fits — callers fall back to the
    matmul-halo operators."""
    from nsol_tpu.ops.pallas.blocked import \
        make_blocked_normal_operator_prepadded

    if precision is None:
        precision = lax.Precision.HIGHEST
    Zl = int(local_shape[0])
    # interpret mode evaluates the kernel body through the HLO
    # interpreter, whose per-op vma propagation rejects slices of the
    # varying input with unvarying indices — the caller's shard_map must
    # run with check_vma=False there (real Mosaic lowering is opaque to
    # the checker and only needs the declared out vma)
    ap = make_blocked_normal_operator_prepadded(
        tuple(local_shape), cov, alpha_cut=alpha_cut, spacing=spacing,
        z_total=Zl * int(n_shards), block=block, dtype=dtype,
        precision=precision, interpret=interpret,
        vma=None if interpret else (axis_name,))
    r = ap.halo

    def apply(v, rho):
        v_ext = _halo.exchange_halo_wrap(v, axis_name, n_shards,
                                         lo=r, hi=r, axis=0)
        row0 = lax.axis_index(axis_name) * Zl
        return ap(v_ext, rho, row0)

    apply.halo = r
    apply.block = ap.block
    return apply


def make_sharded_blocked_robust_operators(local_shape, cov, alpha_cut=3,
                                          spacing=None,
                                          axis_name="space", n_shards=1,
                                          dtype=jnp.float32,
                                          precision=None, interpret=False,
                                          io_dtype=None):
    """Sharded forms of the streaming ROBUST kernels
    (ops/pallas/robust.py, round 5): returns ``(blur, grad_W,
    normal_W)`` with

    * ``blur(x) -> A x`` (the per-sweep residual pass),
    * ``grad_W(x, wr, alpha) -> Aᵀ(wr) + α·DᵀD x`` (the IRLS gradient,
      one pass; A = Aᵀ for the symmetric Gaussian),
    * ``normal_W(vf, wts, alpha) -> Aᵀ(wts·A vf) + α·DᵀD vf`` (the
      one-pass weighted SPD apply of every inner-CG iteration),

    each running the SAME Mosaic program as the single-chip robust path
    over the shard's local z-window, with shard-edge wrap halos via
    ``ppermute`` feeding the prepadded kernel forms and the global
    Laplacian boundary rows selected from the shard's row offset. The
    signatures match ``tikhonov_solve``'s ``A``/``grad_W``/``normal_W``
    hook contract, so they plug straight into
    ``admm_solve(minimizer="irls", ...)`` inside ``shard_map``."""
    from nsol_tpu.ops.pallas.robust import (
        make_blocked_blur_operator, make_blocked_weighted_normal_operator,
    )

    if precision is None:
        precision = lax.Precision.HIGHEST
    Zl = int(local_shape[0])
    z_total = Zl * int(n_shards)
    vma = None if interpret else (axis_name,)
    kw = dict(alpha_cut=alpha_cut, spacing=spacing, dtype=dtype,
              precision=precision, interpret=interpret, prepadded=True,
              z_total=z_total, vma=vma)
    blur_p = make_blocked_blur_operator(tuple(local_shape), cov, **kw)
    blur_lap_p = make_blocked_blur_operator(tuple(local_shape), cov,
                                            with_lap=True, **kw)
    # the CG hot apply optionally streams compact (io_dtype=bf16 —
    # same default1/exact1 levers as the single-chip robust path); the
    # residual/gradient kernels above stay exact f32
    wnormal_p = make_blocked_weighted_normal_operator(
        tuple(local_shape), cov, io_dtype=io_dtype, **kw)

    def _ext(v, r):
        return _halo.exchange_halo_wrap(v, axis_name, n_shards,
                                        lo=r, hi=r, axis=0)

    def _row0():
        return lax.axis_index(axis_name) * Zl

    def blur(x):
        return blur_p(_ext(x, blur_p.halo))

    def grad_W(x, wr, alpha):
        rb = blur_lap_p.halo
        return blur_lap_p(_ext(wr, rb), _ext(x, rb), alpha, _row0())

    def normal_W(vf, wts, alpha):
        rw = wnormal_p.halo
        return wnormal_p(_ext(vf, rw), _ext(wts, rw), alpha, _row0())

    return blur, grad_W, normal_W
