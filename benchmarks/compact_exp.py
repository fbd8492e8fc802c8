"""Compact bf16 CG state A/B (VERDICT r3 item 2), same session.

256^3: step+high3 f32 anchor (round-3 production 46.1 it/s) vs compact.
512^3: 2-D apply + XLA CG high3 f32 anchor (4.8 it/s) vs compact, plus
the 1-D step that the halved slab residency newly fits.
Objectives must agree inside the 0.1% band (exit 1 otherwise).
"""

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

ITERS, ITER_MAX = 50, 10


def run_shape(shape, variants, n=3):
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*shape) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, _ = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
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
    out = {}
    for tag, kw in variants:
        try:
            solve = blocked_admm_solve(shape, cov, iterations=ITERS,
                                       iter_max=ITER_MAX, **kw)
        except ValueError as e:
            print("%s %s: skipped (%s)" % (shape, tag, e), flush=True)
            continue
        f = jit_closed(lambda bi, x0: solve(bi, x0, al,
                                            jnp.float32(0.5)), (b, b))
        x = f(b, b)
        obj = float(np.asarray(obj_f(b, x)))
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(b, xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        out[tag] = (round(ITERS / per, 1), obj)
        print("%s %s: %.1f it/s, objective %.1f"
              % (shape, tag, ITERS / per, obj), flush=True)
    return out


def main():
    fails = []
    res = run_shape(
        (256, 256, 256),
        [("step-high3-f32", dict(mode="step", precision="high3")),
         ("step-high3-bf16", dict(mode="step", precision="high3",
                                  state_dtype=jnp.bfloat16))])
    a, c = res["step-high3-f32"], res["step-high3-bf16"]
    if abs(c[1] - a[1]) > 1e-3 * abs(a[1]):
        fails.append("256^3 objective drift: %s vs %s" % (c[1], a[1]))

    res = run_shape(
        (512, 512, 512),
        [("apply-high3-f32", dict(mode="apply", precision="high3")),
         ("apply-high3-bf16", dict(mode="apply", precision="high3",
                                   state_dtype=jnp.bfloat16)),
         ("step-high3-bf16", dict(mode="step", precision="high3",
                                  state_dtype=jnp.bfloat16))])
    a = res["apply-high3-f32"]
    for tag in ("apply-high3-bf16", "step-high3-bf16"):
        if tag in res and abs(res[tag][1] - a[1]) > 1e-3 * abs(a[1]):
            fails.append("512^3 %s objective drift: %s vs %s"
                         % (tag, res[tag][1], a[1]))
    if fails:
        for m in fails:
            print("PARITY FAILURE: " + m, file=sys.stderr)
        sys.exit(1)
    print("ALL PARITY OK", flush=True)


if __name__ == "__main__":
    main()
