"""Same-session A/B: sharding composed with the blocked Pallas kernel.

VERDICT r3 item 1's real-TPU gate: on a 1-device "space" mesh the sharded
solve routed through the streaming blocked kernel
(parallel/blocked_halo.py) must show NO regression vs the unsharded
blocked apply + XLA CG path, and must beat the round-3 sharded matmul
path. 256³ TV-L2 ADMM (50×10), the config-5 per-chip workload.

Run on the real chip: ``python benchmarks/shard_blocked_exp.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.ops import conv as C  # noqa: E402
from nsol_tpu.ops import grad as G  # noqa: E402
from nsol_tpu.parallel import make_mesh  # noqa: E402
from nsol_tpu.parallel import halo as _halo  # noqa: E402
from nsol_tpu.parallel import matmul_halo  # noqa: E402
from nsol_tpu.parallel.blocked_halo import \
    make_sharded_blocked_normal_operator  # noqa: E402
from nsol_tpu.solvers.admm import admm_solve  # noqa: E402

DTYPE = jnp.float32
SHAPE = (256, 256, 256)
ITERS, ITER_MAX = 50, 10


def chain(f, b, n=3):
    np.asarray(f(b, b)[0, 0, 0])  # warm incl. lazy compile
    t0 = time.perf_counter()
    xi = b
    for _ in range(n):
        xi = f(b, xi)
    np.asarray(xi[0, 0, 0])
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    x_true = (rng.rand(*SHAPE) > 0.7).astype(np.float32)
    cov = np.diag([1.0] * 3)
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, shape=SHAPE,
                                     method="auto", dtype=DTYPE)
    Bg, Bg_adj = G.make_gradient_operators()
    xj = jnp.asarray(x_true)
    b = jit_closed(A, (xj,))(xj)
    br = jnp.zeros((3,) + SHAPE, DTYPE)
    al = jnp.asarray(0.01, DTYPE)
    rh = jnp.asarray(0.5, DTYPE)

    def objective(bi, x):
        r = A(x) - bi
        g = Bg(x)
        return 0.5 * jnp.sum(r * r) \
            + al * jnp.sum(jnp.sqrt(jnp.sum(g * g, axis=0)))

    obj_f = jit_closed(objective, (b, b))

    mesh = make_mesh((1,), ("space",))
    n_shards = 1
    local_shape = SHAPE

    def build_sharded(normal_M=None, use_matmul=False):
        if use_matmul:
            sA, sA_adj = matmul_halo.make_sharded_matmul_blur_operators(
                cov, alpha_cut=3, local_shape=local_shape,
                axis_name="space", n_shards=n_shards, dtype=DTYPE)
            nA = matmul_halo.make_sharded_matmul_normal_blur_operator(
                cov, alpha_cut=3, local_shape=local_shape,
                axis_name="space", n_shards=n_shards, dtype=DTYPE)
            nB = matmul_halo.make_sharded_matmul_gradient_normal(
                local_shape, axis_name="space", n_shards=n_shards,
                dtype=DTYPE)
            nM = None
        else:
            sA, sA_adj = matmul_halo.make_sharded_matmul_blur_operators(
                cov, alpha_cut=3, local_shape=local_shape,
                axis_name="space", n_shards=n_shards, dtype=DTYPE)
            nA = nB = None
            nM = normal_M
        sBg, sBg_adj = _halo.make_sharded_gradient_operators(
            None, axis_name="space", n_shards=n_shards)

        def local_solve(b_loc, x0_loc):
            x, _ = admm_solve(
                sA, sA_adj, sBg, sBg_adj, b_loc, 0.0, x0_loc, al, rh,
                iterations=ITERS, iter_max=ITER_MAX, minimizer="cg",
                axis_name="space", normal_A=nA, normal_B=nB, normal_M=nM)
            return x

        mapped = jax.shard_map(local_solve, mesh=mesh,
                               in_specs=(P("space"), P("space")),
                               out_specs=P("space"), check_vma=True)
        return jit_closed(mapped, (b, b))

    out = {}

    f_mm = build_sharded(use_matmul=True)
    per = chain(f_mm, b)
    out["sharded_matmul_it_s"] = round(ITERS / per, 1)
    out["obj_matmul"] = float(np.asarray(obj_f(b, f_mm(b, b))))
    print("sharded matmul path:", out["sharded_matmul_it_s"], "it/s",
          flush=True)

    for tag, prec in (("highest", None), ("high3", "high3")):
        nM = make_sharded_blocked_normal_operator(
            local_shape, cov, axis_name="space", n_shards=n_shards,
            dtype=DTYPE, precision=prec)
        f_blk = build_sharded(normal_M=nM)
        per = chain(f_blk, b)
        out["sharded_blocked_%s_it_s" % tag] = round(ITERS / per, 1)
        out["obj_blocked_%s" % tag] = float(
            np.asarray(obj_f(b, f_blk(b, b))))
        print("sharded blocked %s:" % tag,
              out["sharded_blocked_%s_it_s" % tag], "it/s", flush=True)

    # unsharded anchor: blocked apply + XLA CG (round-3 class: 34.5
    # HIGHEST / 42.2 high3 — cross-session, re-anchored here)
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator
    for tag, prec in (("highest", jax.lax.Precision.HIGHEST),
                      ("high3", "high3")):
        nM1 = make_blocked_normal_operator(SHAPE, cov, precision=prec)

        def solve1(bi, x0):
            x, _ = admm_solve(A, A_adj, Bg, Bg_adj, bi, br, x0, al, rh,
                              iterations=ITERS, iter_max=ITER_MAX,
                              minimizer="cg", normal_M=nM1)
            return x

        f1 = jit_closed(solve1, (b, b))
        per = chain(f1, b)
        out["unsharded_blocked_%s_it_s" % tag] = round(ITERS / per, 1)
        print("unsharded blocked %s:" % tag,
              out["unsharded_blocked_%s_it_s" % tag], "it/s", flush=True)

    import json
    print(json.dumps(out))
    devs = [abs(out["obj_blocked_highest"] - out["obj_matmul"]),
            abs(out["obj_blocked_high3"] - out["obj_matmul"])]
    assert max(devs) < 1e-3 * abs(out["obj_matmul"]), (devs, out)
    print("PARITY OK")


if __name__ == "__main__":
    main()
