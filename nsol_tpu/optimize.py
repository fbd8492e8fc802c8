"""Standalone optimizer escape hatches.

Counterpart of the reference's ``nsol/optimize.py`` (thin static wrappers
over scipy.sparse.linalg.lsmr / scipy.optimize.{lsq_linear, nnls,
least_squares, minimize}; self-declared "Not used for now",
nsol/optimize.py:6-8). Here the wrappers expose the library's jittable
solver primitives under one roof so downstream code can reach them without
importing solver internals — and, unlike the reference's dead code, they
are tested.
"""

import numpy as np
import jax.numpy as jnp

from nsol_tpu.solvers.cg import cg as _cg, cgls as _cgls
from nsol_tpu.solvers.lbfgs import lbfgs_box as _lbfgs_box
from nsol_tpu.solvers.tikhonov import tikhonov_solve as _tikhonov_solve

__all__ = ["Optimize"]


class Optimize(object):
    """Static collection mirroring the reference's ``Optimize`` surface."""

    @staticmethod
    def lsmr(A, A_adj, b, x0=None, iter_max=100, axis_name=None):
        """Least-squares ``min ‖Ax−b‖²`` via fixed-trip CGLS (the library's
        lsmr replacement)."""
        if x0 is None:
            x0 = jnp.zeros_like(A_adj(b))
        return _cgls(A, A_adj, b, x0, iters=iter_max, axis_name=axis_name)

    @staticmethod
    def cg(M, b, x0=None, iter_max=100, axis_name=None):
        """SPD solve ``Mx = b`` via conjugate gradients."""
        if x0 is None:
            x0 = jnp.zeros_like(b)
        return _cg(M, b, x0, iters=iter_max, axis_name=axis_name)

    @staticmethod
    def nnls(A, A_adj, b, x0=None, iter_max=30, cg_iters=8):
        """Non-negative least squares ``min_{x≥0} ½‖Ax−b‖²`` (the
        reference delegates to scipy.optimize.nnls).

        Runs the library's projected-Newton sweep (the ``minimizer="irls"``
        engine with the linear loss, where the reweighting is trivially
        the identity): each of the ``iter_max`` outer sweeps freezes the
        active set x=0 with outward gradient, CG-solves the normal
        equations on the free variables (``cg_iters`` each), and projects.
        A plain solve-then-clip converges to a measurably worse objective
        when the constraint is active — this does not.
        """
        if x0 is None:
            x0 = jnp.zeros_like(A_adj(b))
        ident = lambda z: z
        return _tikhonov_solve(
            A, A_adj, ident, ident, b, b_reg=jnp.zeros_like(x0), x0=x0,
            alpha=0.0, minimizer="irls", iter_max=iter_max,
            bounds=(0.0, np.inf), irls_cg_iters=cg_iters)

    @staticmethod
    def least_squares(fun, x0, bounds=(-np.inf, np.inf), iter_max=100):
        """Nonlinear least squares ``min ½‖fun(x)‖²`` over a box via the
        jittable box L-BFGS."""
        def cost(x):
            r = fun(x)
            return 0.5 * jnp.sum(r * r)

        return _lbfgs_box(cost, x0, lower=bounds[0], upper=bounds[1],
                          iters=iter_max)

    @staticmethod
    def minimize(fun, x0, bounds=None, iter_max=100):
        """Smooth minimization with optional box bounds (the reference's
        scipy.optimize.minimize escape hatch → box L-BFGS)."""
        lo = -np.inf if bounds is None else bounds[0]
        hi = np.inf if bounds is None else bounds[1]
        return _lbfgs_box(fun, x0, lower=lo, upper=hi, iters=iter_max)
