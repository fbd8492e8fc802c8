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

__all__ = ["make_sharded_blocked_normal_operator"]


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
