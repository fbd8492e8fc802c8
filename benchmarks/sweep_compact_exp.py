"""Does compact state flip the round-3 sweep-vs-step verdict at 256^3?

Round 3: the fully-fused sweep LOST to step+XLA (39.3 vs 46.1 high3)
because its extra halo'd q input + output pipelining cost more than the
one XLA fusion it removes. Compact bf16 halves that extra traffic and
high2 trims the passes, so re-A/B (same session, anchored on step)."""

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
from nsol_tpu.ops.pallas.blocked import blocked_admm_solve  # noqa: E402

SHAPE = (256, 256, 256)
ITERS, ITER_MAX = 50, 10


def main():
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*SHAPE) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=SHAPE,
                                 method="auto", dtype=jnp.float32)
    Bg, _ = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    al = jnp.float32(0.01)

    def objective(bi, x):
        r = A(x) - bi
        g = Bg(x)
        return 0.5 * jnp.sum(r * r) \
            + al * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))

    obj_f = jit_closed(objective, (b, b))
    for tag, kw in (
            ("step-high3-bf16(anchor)",
             dict(mode="step", precision="high3",
                  state_dtype=jnp.bfloat16)),
            ("sweep-high3-bf16",
             dict(mode="sweep", precision="high3",
                  state_dtype=jnp.bfloat16))):
        solve = blocked_admm_solve(SHAPE, cov, iterations=ITERS,
                                   iter_max=ITER_MAX, **kw)
        f = jit_closed(lambda bi, x0: solve(bi, x0, al,
                                            jnp.float32(0.5)), (b, b))
        x = f(b, b)
        obj = float(np.asarray(obj_f(b, x)))
        n = 3
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(b, xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        print("%s: %.1f it/s, objective %.1f"
              % (tag, ITERS / per, obj), flush=True)


if __name__ == "__main__":
    main()
