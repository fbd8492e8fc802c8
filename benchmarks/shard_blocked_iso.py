"""Isolate where the sharded blocked apply loses 10x (same session):

a) unsharded wrap-DMA blocked apply (the production kernel)
b) prepadded kernel under plain jit (host-side jnp wrap concat)
c) prepadded kernel inside a 1-device shard_map (ppermute halos)

If b ~= a, shard_map integration is the problem; if b is slow, the
prepadded kernel/DMA formulation is.
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
from nsol_tpu.parallel import make_mesh  # noqa: E402
from nsol_tpu.parallel.blocked_halo import \
    make_sharded_blocked_normal_operator  # noqa: E402
from nsol_tpu.ops.pallas.blocked import (  # noqa: E402
    make_blocked_normal_operator, make_blocked_normal_operator_prepadded)

SHAPE = (256, 256, 256)
N = 60


def chain_apply(f, v, n=N):
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

    ap = make_blocked_normal_operator(SHAPE, cov)
    f_a = jit_closed(lambda u: ap(u, rho), (v,))
    print("a) unsharded wrap-DMA apply: %.2f ms" % chain_apply(f_a, v),
          flush=True)

    pre = make_blocked_normal_operator_prepadded(SHAPE, cov)
    r = pre.halo

    def apply_pre(u):
        u_ext = jnp.concatenate([u[-r:], u, u[:r]], axis=0)
        return pre(u_ext, rho, 0)

    f_b = jit_closed(apply_pre, (v,))
    print("b) prepadded under plain jit: %.2f ms" % chain_apply(f_b, v),
          flush=True)

    mesh = make_mesh((1,), ("space",))
    sap = make_sharded_blocked_normal_operator(
        SHAPE, cov, axis_name="space", n_shards=1, dtype=jnp.float32)
    mapped = jax.shard_map(lambda u: sap(u, rho), mesh=mesh,
                           in_specs=(P("space"),), out_specs=P("space"))
    f_c = jit_closed(mapped, (v,))
    print("c) prepadded in 1-dev shard_map: %.2f ms" % chain_apply(f_c, v),
          flush=True)

    # parity spot check
    a = np.asarray(f_a(v))
    for tag, f in (("b", f_b), ("c", f_c)):
        d = np.abs(np.asarray(f(v)) - a).max()
        print("dev %s vs a: %g" % (tag, d), flush=True)


if __name__ == "__main__":
    main()
