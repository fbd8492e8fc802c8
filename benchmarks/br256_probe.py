"""256³ step-kernel blur-reorder probe (round 5): matmuls BEFORE the
z-tap accumulation on the bf16-exact compact slab — "high2" (2 passes,
bit-identical class, pays (B+2r)/B extended rows) vs "default1" (ONE
DEFAULT pass: the blur OPERATOR rounds to bf16, a systematic ~2⁻⁹
perturbation whose objective impact this probe measures on hardware)."""

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


def main():
    shape = (256, 256, 256)
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*shape) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
                                 method="auto", dtype=np.float32)
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
    legs = [("dirs_anchor", dict(compact_dirs=True)),
            ("dirs_high2reorder", dict(compact_dirs=True,
                                       blur_reorder="high2")),
            ("dirs_default1", dict(compact_dirs=True,
                                   blur_reorder="default1")),
            ("full_default1", dict(state_dtype=jnp.bfloat16,
                                   blur_reorder="default1"))]
    for tag, kw in legs:
        solve = blocked_admm_solve(shape, cov, iterations=50,
                                   iter_max=10, mode="step",
                                   precision="high3", **kw)
        f = jit_closed(lambda bi, x0: solve(bi, x0, al, rh), (b, b))
        x = f(b, b)
        obj = float(np.asarray(obj_f(b, x)))
        n = 3
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(b, xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        print("%s: %.1f it/s  objective %.1f" % (tag, 50 / per, obj),
              flush=True)


if __name__ == "__main__":
    main()
