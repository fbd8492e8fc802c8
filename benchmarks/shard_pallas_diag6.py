"""Bisect the real kernel's 140 ms/call under shard_map:

h1) g2-style ANY+DMA kernel + 4 const VMEM (256,256) matrix inputs
    (used via one matmul each)
h2) g2-style kernel + DOUBLE-BUFFERED cross-grid-step prefetch
    (2-slot scratch, semaphore array) — no matmuls
h3) h2 + the matmuls (≈ the real kernel's structure)
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

SHAPE = (256, 256, 256)
R = 6
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


def make_variant(matmuls, double_buf):
    nblk = SHAPE[0] // ZB
    prec = lax.Precision.HIGHEST

    def compute(ext_blk, mats):
        u = lax.slice_in_dim(ext_blk, R, R + ZB, axis=0) * 1.0000001
        if matmuls:
            for m in mats:
                ut = jnp.swapaxes(u, 1, 2)
                ut = lax.dot_general(
                    ut, m, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                u = jnp.swapaxes(ut, 1, 2)
                u = lax.dot_general(
                    u, m, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
        return u

    if double_buf:
        def body(m1, m2, m3, m4, v_hbm, o_ref, ext, sem):
            i = pl.program_id(0)
            nb = jnp.asarray(2, i.dtype)
            slot = lax.rem(i, nb)
            nxt = lax.rem(i + 1, nb)

            def dma(j, s):
                return pltpu.make_async_copy(
                    v_hbm.at[pl.ds(j * ZB, ZB + 2 * R)], ext.at[s],
                    sem.at[s])

            @pl.when(i == 0)
            def _():
                dma(i, slot).start()

            @pl.when(i + 1 < nblk)
            def _():
                dma(i + 1, nxt).start()

            dma(i, slot).wait()
            o_ref[:] = compute(ext[slot], (m1[:], m2[:], m3[:], m4[:]))

        scratch = [pltpu.VMEM((2, ZB + 2 * R) + SHAPE[1:], jnp.float32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        def body(m1, m2, m3, m4, v_hbm, o_ref, ext, sem):
            i = pl.program_id(0)
            c = pltpu.make_async_copy(
                v_hbm.at[pl.ds(i * ZB, ZB + 2 * R)], ext, sem)
            c.start()
            c.wait()
            o_ref[:] = compute(ext[...], (m1[:], m2[:], m3[:], m4[:]))

        scratch = [pltpu.VMEM((ZB + 2 * R,) + SHAPE[1:], jnp.float32),
                   pltpu.SemaphoreType.DMA]

    const = lambda: pl.BlockSpec((256, 256), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        body, grid=(nblk,),
        in_specs=[const(), const(), const(), const(),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ZB,) + SHAPE[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    mats = [jnp.eye(256, dtype=jnp.float32) for _ in range(4)]

    def loop(u):
        def step(c, _):
            ext = jnp.concatenate([c[-R:], c, c[:R]], axis=0)
            return call(*mats, ext), None

        return lax.scan(step, u, None, length=INNER)[0]

    return loop


def main():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
    mesh = make_mesh((1,), ("space",))

    for name, mm, db in (("h1 consts+matmul, single-buf", True, False),
                         ("h2 dbl-buf, no matmul", False, True),
                         ("h3 dbl-buf + matmul", True, True)):
        loop = make_variant(mm, db)
        p = chain(jit_closed(loop, (v,)), v)
        s = chain(jit_closed(jax.shard_map(
            loop, mesh=mesh, in_specs=(P("space"),),
            out_specs=P("space"), check_vma=False), (v,)), v)
        print("%s: plain %.3f ms, shard_map %.3f ms" % (name, p, s),
              flush=True)


if __name__ == "__main__":
    main()
