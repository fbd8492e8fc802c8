"""Is the shard_map pallas overhead per jit-INVOCATION or per internal
pallas CALL? Scan 100 trivial-kernel applies inside ONE jit program,
plain vs shard_map; same for the real prepadded blocked apply."""

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
from nsol_tpu.ops.pallas.blocked import \
    make_blocked_normal_operator_prepadded  # noqa: E402

SHAPE = (256, 256, 256)
INNER = 100


def chain(f, v, n=5):
    np.asarray(f(v)[0, 0, 0])
    t0 = time.perf_counter()
    x = v
    for _ in range(n):
        x = f(x)
    np.asarray(x[0, 0, 0])
    return (time.perf_counter() - t0) / n / INNER * 1e3


def main():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
    mesh = make_mesh((1,), ("space",))

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.0000001

    triv = pl.pallas_call(
        k, grid=(8,),
        in_specs=[pl.BlockSpec((32,) + SHAPE[1:], lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((32,) + SHAPE[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )

    def loop(u):
        return lax.scan(lambda c, _: (triv(c), None), u, None,
                        length=INNER)[0]

    print("per-apply ms inside ONE jit (trivial):", flush=True)
    print("  plain: %.3f" % chain(jax.jit(loop), v), flush=True)
    f = jax.jit(jax.shard_map(loop, mesh=mesh, in_specs=(P("space"),),
                              out_specs=P("space"), check_vma=False))
    print("  shard_map: %.3f" % chain(f, v), flush=True)

    pre = make_blocked_normal_operator_prepadded(SHAPE, np.diag([1.0] * 3))
    r = pre.halo
    rho = jnp.float32(0.5)

    def apply1(u):
        u_ext = jnp.concatenate([u[-r:], u, u[:r]], axis=0)
        return pre(u_ext, rho, 0)

    def loop2(u):
        return lax.scan(lambda c, _: (apply1(c), None), u, None,
                        length=INNER)[0]

    print("per-apply ms inside ONE jit (blocked prepadded):", flush=True)
    print("  plain: %.3f" % chain(jit_closed(loop2, (v,)), v), flush=True)
    f2 = jit_closed(jax.shard_map(loop2, mesh=mesh, in_specs=(P("space"),),
                                  out_specs=P("space"), check_vma=False),
                    (v,))
    print("  shard_map: %.3f" % chain(f2, v), flush=True)


if __name__ == "__main__":
    main()
