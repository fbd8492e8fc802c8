"""The shard_map slowdown is MXU-matmul-in-pallas: characterize it.

i1) pallas BlockSpec kernel, ONE (256,256)xHIGHEST matmul per block
i2) same with precision=DEFAULT (1 MXU pass instead of 6)
i3) same matmul volume in plain XLA (einsum over blocks)
Each: scan of 50 inside one jit, plain vs 1-dev shard_map per-call ms.
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


def pallas_matmul(precision):
    def k(m_ref, x_ref, o_ref):
        o_ref[:] = lax.dot_general(
            x_ref[:], m_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    return pl.pallas_call(
        k, grid=(SHAPE[0] // ZB,),
        in_specs=[pl.BlockSpec((256, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ZB,) + SHAPE[1:], lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((ZB,) + SHAPE[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )


def main():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
    m = jnp.asarray(np.eye(256, dtype=np.float32) * 0.999999)
    mesh = make_mesh((1,), ("space",))

    for name, prec in (("i1 pallas-matmul HIGHEST",
                        lax.Precision.HIGHEST),
                       ("i2 pallas-matmul DEFAULT",
                        lax.Precision.DEFAULT)):
        call = pallas_matmul(prec)

        def loop(u, call=call):
            return lax.scan(lambda c, _: (call(m, c), None), u, None,
                            length=INNER)[0]

        p = chain(jit_closed(loop, (v,)), v)
        s = chain(jit_closed(jax.shard_map(
            loop, mesh=mesh, in_specs=(P("space"),),
            out_specs=P("space"), check_vma=False), (v,)), v)
        print("%s: plain %.3f ms, shard_map %.3f ms" % (name, p, s),
              flush=True)

    def xla_loop(u):
        def step(c, _):
            return jnp.einsum("zyx,xw->zyw", c, m,
                              precision=lax.Precision.HIGHEST), None

        return lax.scan(step, u, None, length=INNER)[0]

    p = chain(jit_closed(xla_loop, (v,)), v)
    s = chain(jit_closed(jax.shard_map(
        xla_loop, mesh=mesh, in_specs=(P("space"),),
        out_specs=P("space"), check_vma=False), (v,)), v)
    print("i3 XLA einsum HIGHEST: plain %.3f ms, shard_map %.3f ms"
          % (p, s), flush=True)


if __name__ == "__main__":
    main()
