"""512^3 diagnostic split (round 5): raw blocked-apply throughput vs the
CG-loop end-to-end — how much of the 15 ms/apply budget is the kernel
itself vs the XLA elementwise interleave."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from nsol_tpu.jitutil import jit_closed
from nsol_tpu.ops.pallas.blocked import (
    make_blocked_normal_operator_2d, pick_zy_blocks)

SHAPE = (512, 512, 512)
rng = np.random.RandomState(0)
v = jnp.asarray(rng.rand(*SHAPE).astype(np.float32))
cov = np.diag([1.0] * 3)
zb, yb = pick_zy_blocks(SHAPE, 6, halo_y=6, slab_dtype=jnp.bfloat16)
ap = make_blocked_normal_operator_2d(SHAPE, cov, z_block=zb, y_block=yb,
                                     precision="high3",
                                     io_dtype=jnp.bfloat16)
rho = jnp.float32(0.5)

# (a) chained raw applies (output feeds input)
f = jit_closed(lambda u: ap(u, rho), (v.astype(jnp.bfloat16),))
u = f(v.astype(jnp.bfloat16)); np.asarray(u[0, 0, 0])
n = 40
t0 = time.perf_counter()
for _ in range(n):
    u = f(u)
np.asarray(u[0, 0, 0])
print("raw apply: %.2f ms" % ((time.perf_counter() - t0) / n * 1e3),
      flush=True)

# (b) apply + the CG elementwise fusion (one iteration worth)
def it(x, r, p, gamma):
    q = ap(p, rho)
    p32, q32 = p.astype(jnp.float32), q.astype(jnp.float32)
    pq = jnp.sum(p32 * q32)
    a = jnp.where(pq > 0, gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
    x = x + a * p32
    r32 = r.astype(jnp.float32) - a * q32
    g2 = jnp.sum(r32 * r32)
    beta = jnp.where(gamma > 0, g2 / jnp.where(gamma > 0, gamma, 1.0), 0.)
    return x, r32.astype(jnp.bfloat16), (r32 + beta * p32).astype(jnp.bfloat16), g2

g = jit_closed(it, (v, v.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                    jnp.float32(1.0)))
st = g(v, v.astype(jnp.bfloat16), v.astype(jnp.bfloat16), jnp.float32(1.0))
np.asarray(st[0][0, 0, 0])
t0 = time.perf_counter()
x, r, p, gam = v, v.astype(jnp.bfloat16), v.astype(jnp.bfloat16), jnp.float32(1.0)
for _ in range(n):
    x, r, p, gam = g(x, r, p, gam)
np.asarray(x[0, 0, 0])
print("apply+CG-fusion: %.2f ms" % ((time.perf_counter() - t0) / n * 1e3),
      flush=True)

# (c) the CG elementwise fusion alone (no kernel)
def fus(x, r, p, q, gamma):
    p32, q32 = p.astype(jnp.float32), q.astype(jnp.float32)
    pq = jnp.sum(p32 * q32)
    a = jnp.where(pq > 0, gamma / jnp.where(pq > 0, pq, 1.0), 0.0)
    x = x + a * p32
    r32 = r.astype(jnp.float32) - a * q32
    g2 = jnp.sum(r32 * r32)
    return x, r32.astype(jnp.bfloat16), (r32 + 0.3 * p32).astype(jnp.bfloat16), g2

h = jit_closed(fus, (v, v.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), jnp.float32(1.0)))
st = h(v, v.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
       v.astype(jnp.bfloat16), jnp.float32(1.0))
np.asarray(st[0][0, 0, 0])
t0 = time.perf_counter()
x, r, p, gam = v, v.astype(jnp.bfloat16), v.astype(jnp.bfloat16), jnp.float32(1.0)
q = v.astype(jnp.bfloat16)
for _ in range(n):
    x, r, p, gam = h(x, r, p, q, gam)
np.asarray(x[0, 0, 0])
print("CG-fusion alone: %.2f ms" % ((time.perf_counter() - t0) / n * 1e3),
      flush=True)
