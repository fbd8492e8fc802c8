"""Remaining suspects for the 60 ms/call: g1) concatenate-only loop
under shard_map; g2) ANY+DMA kernel fed a CONCATENATED (268-row) input;
g3) the real prepadded kernel fed a PRE-BUILT extended input (concat
outside the loop — isolates kernel vs concat)."""

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
R = 6
INNER = 50


def chain(f, v, n=4):
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

    def concat_only(u):
        def step(c, _):
            ext = jnp.concatenate([c[-R:], c, c[:R]], axis=0)
            return ext[R:-R] * 1.0000001, None

        return lax.scan(step, u, None, length=INNER)[0]

    p = chain(jax.jit(concat_only), v)
    s = chain(jax.jit(jax.shard_map(concat_only, mesh=mesh,
                                    in_specs=(P("space"),),
                                    out_specs=P("space"),
                                    check_vma=False)), v)
    print("g1 concat-only: plain %.3f ms, shard_map %.3f ms" % (p, s),
          flush=True)

    ZB = 32
    nblk = SHAPE[0] // ZB

    def body(v_hbm, o_ref, ext, sem):
        i = pl.program_id(0)
        c = pltpu.make_async_copy(v_hbm.at[pl.ds(i * ZB, ZB + 2 * R)],
                                  ext, sem)
        c.start()
        c.wait()
        o_ref[:] = ext[pl.ds(R, ZB)] * 1.0000001

    call = pl.pallas_call(
        body, grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ZB,) + SHAPE[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        scratch_shapes=[pltpu.VMEM((ZB + 2 * R,) + SHAPE[1:],
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )

    def loop2(u):
        def step(c, _):
            ext = jnp.concatenate([c[-R:], c, c[:R]], axis=0)
            return call(ext), None

        return lax.scan(step, u, None, length=INNER)[0]

    p = chain(jax.jit(loop2), v)
    s = chain(jax.jit(jax.shard_map(loop2, mesh=mesh,
                                    in_specs=(P("space"),),
                                    out_specs=P("space"),
                                    check_vma=False)), v)
    print("g2 concat+ANY-DMA kernel: plain %.3f ms, shard_map %.3f ms"
          % (p, s), flush=True)

    pre = make_blocked_normal_operator_prepadded(SHAPE, np.diag([1.0] * 3))
    rho = jnp.float32(0.5)

    def loop3(u):
        # concat once OUTSIDE the scan; kernel output re-extended by
        # slicing the fixed halo from the previous ext (approximation —
        # only for timing isolation, not numerics)
        def step(c, _):
            ext = jnp.concatenate([c[-R:], c, c[:R]], axis=0)
            return pre(ext, rho, 0), None

        return lax.scan(step, u, None, length=INNER)[0]

    p = chain(jit_closed(loop3, (v,)), v)
    s = chain(jit_closed(jax.shard_map(loop3, mesh=mesh,
                                       in_specs=(P("space"),),
                                       out_specs=P("space"),
                                       check_vma=False), (v,)), v)
    print("g3 real prepadded kernel: plain %.3f ms, shard_map %.3f ms"
          % (p, s), flush=True)


if __name__ == "__main__":
    main()
