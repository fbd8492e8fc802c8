"""Same-session A/B: compact_dirs vs full-compact vs f32 on the blocked
scale ladder (round 5, VERDICT r4 item 2).

256³ runs the step formulation, 512³ the 2-D apply + XLA CG — the two
production scale paths. Every leg is chained-timed with one final fetch;
the f32 legs double as the session anchors (must reproduce 46.1 / 4.8
it/s within session tolerance for the numbers to be comparable)."""

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
from nsol_tpu.ops.pallas.blocked import blocked_admm_solve  # noqa: E402

DTYPE = np.float32


def bench_shape(shape, mode, n=3, legs=None):
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*shape) > 0.7).astype(DTYPE)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
                                 method="auto", dtype=DTYPE)
    Bg, _ = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    del x_true, xj
    al = jnp.asarray(0.01, DTYPE)
    rh = jnp.asarray(0.5, DTYPE)

    def objective(bi, x):
        r = A(x) - bi
        g = Bg(x)
        return 0.5 * jnp.sum(r * r) \
            + al * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))

    obj_f = jit_closed(objective, (b, b))
    if legs is None:
        legs = [("f32", {}),
                ("full_compact", {"state_dtype": jnp.bfloat16}),
                ("dirs", {"compact_dirs": True}),
                ("dirs_qf32", {"compact_dirs": "qf32"})]
    for tag, kw in legs:
        solve = blocked_admm_solve(shape, cov, iterations=50, iter_max=10,
                                   mode=mode, precision="high3", **kw)
        f = jit_closed(lambda bi, x0: solve(bi, x0, al, rh), (b, b))
        x = f(b, b)
        obj = float(np.asarray(obj_f(b, x)))
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(b, xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        print("%s %s %s: %.1f it/s  objective %.1f"
              % (shape, mode, tag, 50 / per, obj), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("256", "both"):
        bench_shape((256, 256, 256), "step", n=3)
    if which in ("512", "both"):
        bench_shape((512, 512, 512), "apply", n=2)
