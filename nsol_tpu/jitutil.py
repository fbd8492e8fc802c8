"""jit helpers for operator-closure programs.

The library's operators are closures over their data (FFT spectra, stencil
kernels). Inside ``jax.jit`` those captures become HLO *literal constants* —
which the axon TPU remote compiler serializes pathologically slowly (a
64³-scale captured spectrum adds ~80 s to every compile; measured
2026-08-17). ``jit_closed`` uses ``jax.closure_convert`` to hoist every
captured array out of the program and pass it as a runtime argument
instead, restoring normal compile times while keeping the closure-based
operator API.
"""

import jax

__all__ = ["jit_closed"]


def jit_closed(fn, example_args, in_shardings=None, out_shardings=None):
    """Return a callable equivalent to ``jax.jit(fn)`` with all closure-
    captured arrays hoisted to arguments.

    ``example_args``: abstract or concrete example inputs used to trace
    ``fn`` once. The returned callable accepts the same arguments as ``fn``.

    ``in_shardings``: optional shardings for the *user* arguments (hoisted
    constants are left unspecified → replicated by the partitioner).
    """
    converted, consts = jax.closure_convert(fn, *example_args)
    kwargs = {}
    if in_shardings is not None:
        kwargs["in_shardings"] = list(in_shardings) + [None] * len(consts)
    if out_shardings is not None:
        kwargs["out_shardings"] = out_shardings
    jitted = jax.jit(converted, **kwargs)

    def call(*args):
        return jitted(*args, *consts)

    return call
