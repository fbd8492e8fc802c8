"""Real-TPU same-session A/B of the blocked streaming CG formulations.

Round-3 headline experiment (round-2 VERDICT items 1+2):

* ``python benchmarks/sweep_exp.py 256`` — 256³ TV-L2 ADMM+CG, 50×10:
  mode="step" (round-2: fused p'/apply/Σp'q kernel + one XLA fusion per
  CG iteration) vs mode="sweep" (round-3: the WHOLE CG iteration in one
  streaming pass, scalar-only recurrence between sweeps), each at
  HIGHEST and high3.
* ``python benchmarks/sweep_exp.py 512`` — 512³: the fused-CG working
  sets exceed VMEM at 512-wide planes (honest layout model), so the
  solve runs blocked-apply + XLA CG either way; the A/B is the
  windowed-band circulant/Laplacian matmuls (384 MACs/element) vs the
  dense 512-wide contractions, at high3.

Prints one JSON line per variant. Chained-fetch timing per BASELINE.md.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.ops import conv as C  # noqa: E402
from nsol_tpu.ops import grad as G  # noqa: E402

DTYPE = np.float32
ALPHA, RHO = 0.01, 0.5


def _problem(n):
    shape = (n, n, n)
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*shape) > 0.7).astype(DTYPE)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
                                 method="auto", dtype=DTYPE)
    Bg, _ = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    al = jnp.asarray(ALPHA, DTYPE)

    def objective(bi, x):
        r = A(x) - bi
        g = Bg(x)
        return 0.5 * jnp.sum(r * r) \
            + al * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))

    obj_f = jit_closed(objective, (b, b))
    return shape, cov, b, obj_f


def _measure(tag, make_f, b, obj_f, n_chain):
    f = make_f()
    t0 = time.perf_counter()
    x = f(b, b)
    np.asarray(x[0, 0, 0])
    warm = time.perf_counter() - t0
    obj = float(np.asarray(obj_f(b, x)))
    t0 = time.perf_counter()
    xi = b
    for _ in range(n_chain):
        xi = f(b, xi)
    np.asarray(xi[0, 0, 0])
    per = (time.perf_counter() - t0) / n_chain
    print(json.dumps({
        "variant": tag,
        "iters_per_sec": round(50 / per, 1),
        "s_per_solve": round(per, 3),
        "objective": round(obj, 1),
        "warmup_s": round(warm, 1),
    }), flush=True)
    return per


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    shape, cov, b, obj_f = _problem(n)
    al = jnp.asarray(ALPHA, DTYPE)
    rh = jnp.asarray(RHO, DTYPE)

    from nsol_tpu.ops.pallas.blocked import (
        blocked_admm_solve, make_blocked_normal_operator,
    )

    import os

    if "layouts" in sys.argv[2:]:
        # z-block layout probe at the step formulation: (16, 2) default
        # [double-buffered, 1.75x halo read amplification] vs (32, 1)
        # [single-buffered, 1.375x amplification]
        from nsol_tpu.ops.pallas.blocked import make_blocked_cg_step

        for tag, blk, nbuf in (("step_high3_b16x2", None, None),
                               ("step_high3_b32x1", 32, None),
                               ("step_high3_b16x3", 16, 3)):
            def make_f(blk=blk, nbuf=nbuf):
                import functools

                import nsol_tpu.ops.pallas.blocked as B

                orig = B.make_blocked_cg_step
                B.make_blocked_cg_step = functools.partial(orig,
                                                           n_buf=nbuf) \
                    if nbuf else orig
                try:
                    solve = blocked_admm_solve(
                        shape, cov, iterations=50, iter_max=10,
                        mode="step", block=blk, precision="high3")
                finally:
                    B.make_blocked_cg_step = orig
                return jit_closed(lambda bi, x0: solve(bi, x0, al, rh),
                                  (b, b))

            _measure("%d_%s" % (n, tag), make_f, b, obj_f, 3)
        return

    if n <= 256:
        # mode A/B at 256-cubed: step (round-2 formulation) vs the fully
        # fused sweep, each at HIGHEST and high3
        variants = [("step_highest", "step", None, False),
                    ("sweep_highest", "sweep", None, False),
                    ("step_high3", "step", "high3", False),
                    ("sweep_high3", "sweep", "high3", False)]
        n_chain = 3
    else:
        # 512-cubed: the fused-CG working sets exceed VMEM (honest layout
        # model) — mode resolves to "apply" (blocked apply + XLA CG). The
        # A/B here is the windowed-band circulant/Laplacian matmuls (384
        # MACs/element vs the dense 512).
        variants = [("apply2d_high3", "apply2d", "high3", False),
                    ("step2d_high3", "step2d", "high3", False)]
        n_chain = 2

    for tag, mode, prec, no_banded in variants:
        kw = {} if prec is None else {"precision": prec}
        if no_banded:
            os.environ["NSOL_TPU_NO_BANDED"] = "1"
        else:
            os.environ.pop("NSOL_TPU_NO_BANDED", None)

        def make_f(mode=mode, kw=kw):
            if mode == "apply2d":
                # 2-D (z, y)-blocked apply under the XLA CG: same solve
                # structure as mode="apply" with the 1-D operator swapped
                from functools import partial

                from nsol_tpu.ops.pallas.blocked import (
                    make_blocked_normal_operator_2d,
                )
                from nsol_tpu.solvers.admm import admm_solve

                A2, A_adj2 = C.make_blur_operators(
                    cov, alpha_cut=3, shape=shape, method="auto",
                    dtype=DTYPE)
                Bg2, Bg_adj2 = G.make_gradient_operators()
                normal_M = make_blocked_normal_operator_2d(
                    shape, cov, z_block=32, y_block=128, **kw)
                br = jnp.zeros((3,) + shape, DTYPE)

                def run(bi, x0):
                    x, _ = admm_solve(A2, A_adj2, Bg2, Bg_adj2, bi, br,
                                      x0, al, rh, iterations=50,
                                      iter_max=10, minimizer="cg",
                                      normal_M=normal_M)
                    return x

                return jit_closed(run, (b, b))
            solve = blocked_admm_solve(shape, cov, iterations=50,
                                       iter_max=10, mode=mode, **kw)
            return jit_closed(lambda bi, x0: solve(bi, x0, al, rh),
                              (b, b))

        _measure("%d_%s" % (n, tag), make_f, b, obj_f, n_chain)


if __name__ == "__main__":
    main()
