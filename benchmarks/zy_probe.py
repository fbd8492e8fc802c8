"""512^3 compact 2-D apply: does a finer (Bz, By) grid beat (32, 128)?
(Same finer-grid-interleave direction that took the 256^3 step 54->57.)"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.ops import conv as C  # noqa: E402
from nsol_tpu.ops import grad as G  # noqa: E402
from nsol_tpu.ops.pallas.blocked import \
    make_blocked_normal_operator_2d  # noqa: E402
from nsol_tpu.solvers.admm import admm_solve  # noqa: E402

SHAPE = (512, 512, 512)


def main():
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*SHAPE) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, shape=SHAPE,
                                     method="auto", dtype=jnp.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    del x_true, xj
    br = jnp.zeros((3,) + SHAPE, jnp.float32)
    al, rh = jnp.float32(0.01), jnp.float32(0.5)

    # compact CG loop around the 2-D apply, mirroring
    # blocked_admm_solve(mode="apply", state_dtype=bf16)
    from nsol_tpu.ops.pallas.blocked import blocked_admm_solve
    import nsol_tpu.ops.pallas.blocked as B

    for bz, by in ((32, 128), (16, 128), (8, 128)):
        orig = B.pick_zy_blocks
        B.pick_zy_blocks = lambda *a, **k: (bz, by)
        try:
            solve = blocked_admm_solve(SHAPE, cov, iterations=50,
                                       iter_max=10, mode="apply",
                                       precision="high3",
                                       state_dtype=None)
        except Exception as e:
            print("(%d,%d): build failed (%s)" % (bz, by, e), flush=True)
            B.pick_zy_blocks = orig
            continue
        finally:
            B.pick_zy_blocks = orig
        f = jit_closed(lambda bi, x0: solve(bi, x0, al, rh), (b, b))
        try:
            np.asarray(f(b, b)[0, 0, 0])
        except Exception as e:
            print("(%d,%d): run failed (%s)" % (bz, by, str(e)[:200]),
                  flush=True)
            continue
        n = 2
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(b, xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        print("(%d,%d): %.2f it/s" % (bz, by, 50 / per), flush=True)


if __name__ == "__main__":
    main()
