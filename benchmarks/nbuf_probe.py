"""256^3 compact step: does a 3-deep prefetch (bf16 slabs freed the
VMEM) hide more DMA latency than the default double buffer?"""

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
from nsol_tpu.ops.pallas.blocked import (  # noqa: E402
    blocked_admm_solve, make_blocked_cg_step, _pick_layout)

SHAPE = (256, 256, 256)


def main():
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*SHAPE) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=SHAPE,
                                 method="auto", dtype=jnp.float32)
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    al, rh = jnp.float32(0.01), jnp.float32(0.5)
    print("auto layout:", _pick_layout(SHAPE, 6, jnp.float32, n_ext=2,
                                       n_io=1, slab_dtype=jnp.bfloat16),
          flush=True)

    import nsol_tpu.ops.pallas.blocked as B

    for tag, block, nb in (("b16,2-buf", 16, 2),
                           ("b16,4-buf", 16, 4),
                           ("b8,4-buf", 8, 4),
                           ("b8,6-buf", 8, 6)):
        orig = B.make_blocked_cg_step

        def patched(*a, **k):
            if nb is not None:
                k["n_buf"] = nb
            if block is not None:
                k["block"] = block
            return orig(*a, **k)

        B.make_blocked_cg_step = patched
        try:
            solve = blocked_admm_solve(SHAPE, cov, iterations=50,
                                       iter_max=10, mode="step",
                                       precision="high3",
                                       state_dtype=jnp.bfloat16)
        finally:
            B.make_blocked_cg_step = orig
        f = jit_closed(lambda bi, x0: solve(bi, x0, al, rh), (b, b))
        np.asarray(f(b, b)[0, 0, 0])
        n = 3
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(b, xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        print("%s: %.1f it/s" % (tag, 50 / per), flush=True)


if __name__ == "__main__":
    main()
