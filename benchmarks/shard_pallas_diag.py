"""Why is a pallas_call 260x slower inside shard_map? (same session)

d1) prepadded kernel in shard_map WITHOUT ppermute (wrap-pad via jnp
    inside the mapped fn)
d2) trivial BlockSpec-pipelined pallas kernel (x*2) plain jit
d3) the same trivial kernel inside 1-dev shard_map
d4) wrap-DMA blocked kernel (ANY + manual DMA) inside shard_map
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.parallel import make_mesh  # noqa: E402
from nsol_tpu.ops.pallas.blocked import (  # noqa: E402
    make_blocked_normal_operator, make_blocked_normal_operator_prepadded)

SHAPE = (256, 256, 256)
N = 40


def chain(f, v, n=N):
    np.asarray(f(v)[0, 0, 0])
    t0 = time.perf_counter()
    x = v
    for _ in range(n):
        x = f(x)
    np.asarray(x[0, 0, 0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
    rho = jnp.float32(0.5)
    cov = np.diag([1.0] * 3)
    mesh = make_mesh((1,), ("space",))

    pre = make_blocked_normal_operator_prepadded(SHAPE, cov)
    r = pre.halo

    def apply_pad_inside(u):
        u_ext = jnp.concatenate([u[-r:], u, u[:r]], axis=0)
        return pre(u_ext, rho, 0)

    f_d1 = jit_closed(jax.shard_map(
        apply_pad_inside, mesh=mesh, in_specs=(P("space"),),
        out_specs=P("space"), check_vma=False), (v,))
    print("d1) prepadded in shard_map, no ppermute: %.2f ms"
          % chain(f_d1, v), flush=True)

    def triv_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    triv = pl.pallas_call(
        triv_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((32, 256, 256), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((32, 256, 256), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )
    f_d2 = jax.jit(triv)
    print("d2) trivial BlockSpec kernel plain jit: %.2f ms"
          % chain(f_d2, v), flush=True)

    f_d3 = jax.jit(jax.shard_map(triv, mesh=mesh, in_specs=(P("space"),),
                                 out_specs=P("space"), check_vma=False))
    print("d3) trivial BlockSpec kernel in shard_map: %.2f ms"
          % chain(f_d3, v), flush=True)

    ap = make_blocked_normal_operator(SHAPE, cov)
    f_d4 = jit_closed(jax.shard_map(
        lambda u: ap(u, rho), mesh=mesh, in_specs=(P("space"),),
        out_specs=P("space"), check_vma=False), (v,))
    print("d4) wrap-DMA kernel in shard_map: %.2f ms"
          % chain(f_d4, v), flush=True)


if __name__ == "__main__":
    main()
