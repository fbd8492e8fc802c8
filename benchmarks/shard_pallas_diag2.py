"""Pallas-in-shard_map slowdown: fixed overhead or size-dependent?

e1/e2) trivial BlockSpec kernel (x*2, proper vmem limit) at 256^3:
       plain jit vs 1-dev shard_map
e3/e4) same at (32, 64, 64) — if shard_map overhead is ~constant per
       call, it's dispatch/runtime, not data movement
e5)    256^3 blocked apply in shard_map via BlockSpec-INPUT form? n/a —
       instead: wrap-DMA kernel in shard_map at (32,64,64)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.parallel import make_mesh  # noqa: E402
from nsol_tpu.ops.pallas.blocked import \
    make_blocked_normal_operator  # noqa: E402


def chain(f, v, n=40):
    np.asarray(f(v)[0, 0, 0])
    t0 = time.perf_counter()
    x = v
    for _ in range(n):
        x = f(x)
    np.asarray(x[0, 0, 0])
    return (time.perf_counter() - t0) / n * 1e3


def triv(shape, zb):
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    return pl.pallas_call(
        k, grid=(shape[0] // zb,),
        in_specs=[pl.BlockSpec((zb,) + shape[1:], lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((zb,) + shape[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )


def main():
    rng = np.random.RandomState(0)
    mesh = make_mesh((1,), ("space",))

    for shape, zb in (((256, 256, 256), 8), ((32, 64, 64), 8)):
        v = jnp.asarray(rng.rand(*shape).astype(np.float32))
        t = triv(shape, zb)
        print("shape %s:" % (shape,), flush=True)
        print("  trivial plain jit: %.2f ms" % chain(jax.jit(t), v),
              flush=True)
        f = jax.jit(jax.shard_map(t, mesh=mesh, in_specs=(P("space"),),
                                  out_specs=P("space"), check_vma=False))
        print("  trivial in shard_map: %.2f ms" % chain(f, v), flush=True)

    shape = (32, 64, 64)
    v = jnp.asarray(rng.rand(*shape).astype(np.float32))
    ap = make_blocked_normal_operator(shape, np.diag([1.0] * 3), block=8)
    rho = jnp.float32(0.5)
    f1 = jit_closed(lambda u: ap(u, rho), (v,))
    print("small wrap-DMA plain jit: %.2f ms" % chain(f1, v), flush=True)
    f2 = jit_closed(jax.shard_map(
        lambda u: ap(u, rho), mesh=mesh, in_specs=(P("space"),),
        out_specs=P("space"), check_vma=False), (v,))
    print("small wrap-DMA in shard_map: %.2f ms" % chain(f2, v),
          flush=True)


if __name__ == "__main__":
    main()
