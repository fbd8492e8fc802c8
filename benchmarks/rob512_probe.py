"""512³ ROBUST probe (round 5): does the compact blocked robust path
fit and beat the matmul+IRLS fallback at the config-5 volume?"""

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
from nsol_tpu.ops import losses as lf  # noqa: E402
from nsol_tpu.ops import matmul_ops as MM  # noqa: E402
from nsol_tpu.ops.pallas.robust import blocked_robust_admm_solve  # noqa: E402
from nsol_tpu.solvers.admm import admm_solve  # noqa: E402


def main():
    shape = (512, 512, 512)
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*shape) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
                                     method="auto", dtype=np.float32)
    nB = MM.matmul_gradient_normal_fn(shape, dtype=np.float32)
    Bg, Bg_adj = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    noise = jnp.asarray((rng.rand(*shape) < 0.01).astype(np.float32)
                        * rng.randn(*shape).astype(np.float32))
    b = b + 0.5 * noise
    del x_true, xj, noise
    br = jnp.zeros((3,) + shape, np.float32)
    al = jnp.asarray(0.01, np.float32)
    rh = jnp.asarray(0.5, np.float32)
    ITERS, SWEEPS, CGI = 5, 5, 8

    def objective(bi, x):
        r = A(x) - bi
        g = Bg(x)
        return 0.5 * jnp.sum(lf.huber(r * r)) \
            + al * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))

    obj_f = jit_closed(objective, (b, b))

    def xla_solve(bi, x0):
        x, _ = admm_solve(A, A_adj, Bg, Bg_adj, bi, br, x0, al, rh,
                          iterations=ITERS, iter_max=SWEEPS,
                          data_loss="huber", minimizer="irls",
                          irls_cg_iters=CGI, normal_B=nB)
        return x

    legs = [("blocked_dirs_high3", dict(precision="high3",
                                        compact_dirs=True))]
    if "--with-xla" in sys.argv:
        # the XLA leg runs fine ALONE (measured 0.40 it/s vs the
        # blocked 0.97) but the two legs' summed HBM footprint crashed
        # the worker when run in one process — keep it opt-in and run
        # the legs in separate processes
        legs.append(("xla_matmul_irls", None))
    for tag, kw in legs:
        try:
            if kw is None:
                f = jit_closed(xla_solve, (b, b))
            else:
                solve = blocked_robust_admm_solve(
                    shape, cov, iterations=ITERS, iter_max=SWEEPS,
                    irls_cg_iters=CGI, data_loss="huber", **kw)
                f = jit_closed(lambda bi, x0: solve(bi, x0, al, rh),
                               (b, b))
            x = f(b, b)
            obj = float(np.asarray(obj_f(b, x)))
            n = 2
            t0 = time.perf_counter()
            xi = b
            for _ in range(n):
                xi = f(b, xi)
            np.asarray(xi[0, 0, 0])
            per = (time.perf_counter() - t0) / n
            print("%s: %.2f it/s  objective %.1f"
                  % (tag, ITERS / per, obj), flush=True)
        except Exception as e:
            print("%s: FAILED %s" % (tag, str(e)[:300]), flush=True)


if __name__ == "__main__":
    main()
