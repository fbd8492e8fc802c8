"""512³ layout probe round 5 (VERDICT r4 item 3): attack the exposed-DMA
bind of the 2-D blocked apply. Levers: deeper prefetch (n_buf=3) and
wider y-blocks (By=256 — bf16 slabs fit it; halves the sequential grid
steps 128→64 AND lowers the halo read amplification 1.97→1.86).

All legs end-to-end ``blocked_admm_solve(mode="apply", high3,
state_dtype=bf16)`` — the 6.1 it/s production compact path — via
monkeypatched layout; anchor leg must reproduce 6.1."""

import functools
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
import nsol_tpu.ops.pallas.blocked as B  # noqa: E402

SHAPE = (512, 512, 512)


def main():
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*SHAPE) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=SHAPE,
                                 method="auto", dtype=jnp.float32)
    Bg, _ = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    del x_true, xj
    al, rh = jnp.float32(0.01), jnp.float32(0.5)

    def objective(bi, x):
        r = A(x) - bi
        g = Bg(x)
        return 0.5 * jnp.sum(r * r) \
            + al * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))

    obj_f = jit_closed(objective, (b, b))

    orig_pick = B.pick_zy_blocks
    orig_2d = B.make_blocked_normal_operator_2d
    state = {"f32": {"state_dtype": None},
             "bf16": {"state_dtype": jnp.bfloat16},
             "dirs": {"compact_dirs": True}}
    legs = [("bf16", 16, 128, 2),   # anchor: must reproduce 6.1
            ("bf16", 16, 128, 3),
            ("bf16", 16, 256, 2),
            ("bf16", 8, 256, 2),
            ("bf16", 8, 128, 3)]
    if len(sys.argv) > 1 and sys.argv[1] == "dirs":
        legs = [("dirs", 16, 128, 2), ("dirs", 16, 256, 2)]
    for sd, bz, by, nb in legs:
        B.pick_zy_blocks = lambda *a, **k: (bz, by)
        B.make_blocked_normal_operator_2d = functools.partial(
            orig_2d, n_buf=nb)
        try:
            solve = B.blocked_admm_solve(SHAPE, cov, iterations=50,
                                         iter_max=10, mode="apply",
                                         precision="high3",
                                         **state[sd])
            f = jit_closed(lambda bi, x0: solve(bi, x0, al, rh), (b, b))
            x = f(b, b)
            obj = float(np.asarray(obj_f(b, x)))
            n = 2
            t0 = time.perf_counter()
            xi = b
            for _ in range(n):
                xi = f(b, xi)
            np.asarray(xi[0, 0, 0])
            per = (time.perf_counter() - t0) / n
            print("%s (Bz=%d, By=%d, n_buf=%d): %.1f it/s  obj %.1f"
                  % (sd, bz, by, nb, 50 / per, obj), flush=True)
        except Exception as e:
            print("%s (Bz=%d, By=%d, n_buf=%d): FAILED %s"
                  % (sd, bz, by, nb, str(e)[:200]), flush=True)
        finally:
            B.pick_zy_blocks = orig_pick
            B.make_blocked_normal_operator_2d = orig_2d


if __name__ == "__main__":
    main()
