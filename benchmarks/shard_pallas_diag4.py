"""Pin down the 60 ms/call: trivial kernel variants under shard_map.

f1) BlockSpec input (control)
f2) ANY input + manual DMA to VMEM scratch
f3) explicit HBM memory-space input + manual DMA
f4) ANY input + manual DMA, with SMEM scalar input present
All: scan of 50 applies inside one jit; per-apply ms plain vs shard_map.
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

from nsol_tpu.parallel import make_mesh  # noqa: E402

SHAPE = (256, 256, 256)
ZB = 32
INNER = 50


def chain(f, v, n=4):
    np.asarray(f(v)[0, 0, 0])
    t0 = time.perf_counter()
    x = v
    for _ in range(n):
        x = f(x)
    np.asarray(x[0, 0, 0])
    return (time.perf_counter() - t0) / n / INNER * 1e3


def dma_kernel(space, with_smem):
    nblk = SHAPE[0] // ZB

    def body(v_hbm, o_ref, ext, sem):
        i = pl.program_id(0)
        c = pltpu.make_async_copy(v_hbm.at[pl.ds(i * ZB, ZB)], ext, sem)
        c.start()
        c.wait()
        o_ref[:] = ext[:] * 1.0000001

    def body_smem(s_ref, v_hbm, o_ref, ext, sem):
        i = pl.program_id(0)
        c = pltpu.make_async_copy(v_hbm.at[pl.ds(i * ZB, ZB)], ext, sem)
        c.start()
        c.wait()
        o_ref[:] = ext[:] * s_ref[0, 0]

    in_specs = [pl.BlockSpec(memory_space=space)]
    if with_smem:
        in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)] + in_specs
    call = pl.pallas_call(
        body_smem if with_smem else body,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ZB,) + SHAPE[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        scratch_shapes=[pltpu.VMEM((ZB,) + SHAPE[1:], jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    if with_smem:
        s = jnp.full((1, 1), 1.0000001, jnp.float32)
        return lambda u: call(s, u)
    return call


def main():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
    mesh = make_mesh((1,), ("space",))

    def bspec_kernel():
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0000001

        return pl.pallas_call(
            k, grid=(SHAPE[0] // ZB,),
            in_specs=[pl.BlockSpec((ZB,) + SHAPE[1:],
                                   lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((ZB,) + SHAPE[1:],
                                   lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )

    variants = [
        ("f1 BlockSpec", bspec_kernel()),
        ("f2 ANY+DMA", dma_kernel(pltpu.ANY, False)),
        ("f4 ANY+DMA+SMEM", dma_kernel(pltpu.ANY, True)),
    ]
    try:
        variants.insert(2, ("f3 HBM+DMA",
                            dma_kernel(pltpu.MemorySpace.HBM, False)))
    except Exception as e:
        print("no HBM space variant:", e, flush=True)

    for name, k in variants:
        def loop(u, k=k):
            return lax.scan(lambda c, _: (k(c), None), u, None,
                            length=INNER)[0]

        p = chain(jax.jit(loop), v)
        s = chain(jax.jit(jax.shard_map(
            loop, mesh=mesh, in_specs=(P("space"),),
            out_specs=P("space"), check_vma=False)), v)
        print("%s: plain %.3f ms, shard_map %.3f ms" % (name, p, s),
              flush=True)


if __name__ == "__main__":
    main()
