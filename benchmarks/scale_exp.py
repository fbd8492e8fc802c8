"""Where does the 256³ ADMM+CG solve spend its time? (HBM-bound scale path)

Times the individual pieces of one CG iteration at 256³ with the chained-
execution methodology, to direct the large-volume optimization (BASELINE.md
"scale" rows): the fused normal blur (matmul vs roll paths), the fused
DᵀD, and the CG elementwise update chain. Prints one JSON line per probe.

Usage: python benchmarks/scale_exp.py [substring ...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.ops import conv as C  # noqa: E402
from nsol_tpu.ops import grad as G  # noqa: E402
from nsol_tpu.ops import kernels as K  # noqa: E402
from nsol_tpu.ops import matmul_ops as MM  # noqa: E402

SHAPE = (256, 256, 256)
DTYPE = np.float32
COV = np.diag([1.0, 1.0, 1.0])


def _chain(f, x0, n=20):
    xi = x0
    t0 = time.perf_counter()
    for _ in range(n):
        xi = f(xi)
    np.asarray(jax.tree_util.tree_leaves(xi)[0][..., :1, :1])
    return (time.perf_counter() - t0) / n


def _normalize(f):
    """Wrap an operator so chained outputs stay O(1) (divide by max)."""
    def g(x):
        y = f(x)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
    return g


def probe_normal_matmul():
    kern = K.gaussian_kernel(COV, alpha_cut=3, dtype=np.float64)
    factors = C.separable_factors(kern)
    nfac = [np.convolve(f, f[::-1]) for f in factors]
    nA = MM.matmul_convolve_fn(nfac, SHAPE, DTYPE)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))
    f = jit_closed(_normalize(nA), (x,))
    np.asarray(f(x)[:1, :1, :1])
    per = _chain(f, x)
    return {"probe": "normal_blur_matmul_256", "ms": round(per * 1e3, 3)}


def probe_normal_roll():
    nA = C.make_normal_blur_operator(COV, alpha_cut=3, shape=SHAPE,
                                     dtype=DTYPE)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))
    f = jit_closed(_normalize(nA), (x,))
    np.asarray(f(x)[:1, :1, :1])
    per = _chain(f, x)
    return {"probe": "normal_blur_roll_256", "ms": round(per * 1e3, 3)}


def probe_gradient_normal():
    nB = MM.matmul_gradient_normal_fn(SHAPE, dtype=DTYPE)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))
    f = jit_closed(_normalize(nB), (x,))
    np.asarray(f(x)[:1, :1, :1])
    per = _chain(f, x)
    return {"probe": "gradient_normal_matmul_256", "ms": round(per * 1e3, 3)}


def probe_gradient_normal_stencil():
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))
    f = jit_closed(_normalize(G.gradient_normal), (x,))
    np.asarray(f(x)[:1, :1, :1])
    per = _chain(f, x)
    return {"probe": "gradient_normal_stencil_256",
            "ms": round(per * 1e3, 3)}


def probe_normal_blocked():
    """Fused AᵀA + ρDᵀD in ONE streaming Pallas pass (ops/pallas/blocked)."""
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator

    apply_M = make_blocked_normal_operator(SHAPE, COV)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))

    def f(v):
        y = apply_M(v, jnp.asarray(0.5, DTYPE))
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)

    g = jit_closed(f, (x,))
    np.asarray(g(x)[:1, :1, :1])
    per = _chain(g, x)
    return {"probe": "normal_M_blocked_pallas_256", "ms": round(per * 1e3, 3)}


def probe_normal_matmul_plus_lap():
    """The XLA apply_M the CG actually runs: matmul normal blur + ρ·DᵀD
    matmul Laplacian in one jit (what the blocked kernel replaces)."""
    kern = K.gaussian_kernel(COV, alpha_cut=3, dtype=np.float64)
    factors = C.separable_factors(kern)
    nfac = [np.convolve(f, f[::-1]) for f in factors]
    nA = MM.matmul_convolve_fn(nfac, SHAPE, DTYPE)
    nB = MM.matmul_gradient_normal_fn(SHAPE, dtype=DTYPE)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))

    def f(v):
        y = nA(v) + 0.5 * nB(v)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)

    g = jit_closed(f, (x,))
    np.asarray(g(x)[:1, :1, :1])
    per = _chain(g, x)
    return {"probe": "normal_M_matmul_xla_256", "ms": round(per * 1e3, 3)}


def probe_normal_blocked_default_precision():
    """Diagnostic ONLY (fails CG parity — BASELINE precision ladder): the
    blocked apply with 1-pass DEFAULT matmuls instead of 6-pass HIGHEST.
    The gap bounds how MXU-bound the streaming kernel is."""
    from jax import lax
    from nsol_tpu.ops.pallas.blocked import make_blocked_normal_operator

    apply_M = make_blocked_normal_operator(
        SHAPE, COV, precision=lax.Precision.DEFAULT)
    x = jnp.asarray(np.random.RandomState(0).rand(*SHAPE).astype(DTYPE))

    def f(v):
        y = apply_M(v, jnp.asarray(0.5, DTYPE))
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)

    g = jit_closed(f, (x,))
    np.asarray(g(x)[:1, :1, :1])
    per = _chain(g, x)
    return {"probe": "normal_M_blocked_default_prec_256",
            "ms": round(per * 1e3, 3)}


def probe_cg_elementwise():
    """One CG iteration's elementwise update chain, operator replaced by a
    scalar multiply — isolates the non-operator HBM traffic."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*SHAPE).astype(DTYPE))

    def one_iter(state):
        x, r, p, gamma = state
        q = 1.0001 * p  # stand-in apply
        pq = jnp.sum(p * q)
        a = gamma / pq
        x = x + a * p
        r = r - a * q
        gamma_new = jnp.sum(r * r)
        p = r + (gamma_new / gamma) * p
        return (x, r, p, gamma_new)

    state = (x, x + 0.1, x + 0.2, jnp.asarray(1.0, DTYPE))
    f = jit_closed(one_iter, (state,))
    np.asarray(f(state)[0][:1, :1, :1])
    per = _chain(f, state)
    return {"probe": "cg_elementwise_256", "ms": round(per * 1e3, 3)}


def main():
    probes = (probe_normal_matmul, probe_normal_roll,
              probe_gradient_normal, probe_gradient_normal_stencil,
              probe_normal_matmul_plus_lap, probe_normal_blocked,
              probe_normal_blocked_default_precision,
              probe_cg_elementwise)
    sel = probes
    if len(sys.argv) > 1:
        sel = tuple(p for p in probes
                    if any(s in p.__name__ for s in sys.argv[1:]))
        if not sel:
            raise SystemExit("no probe matches %r; valid: %s"
                             % (sys.argv[1:],
                                ", ".join(p.__name__ for p in probes)))
    for p in sel:
        try:
            print(json.dumps(p()), flush=True)
        except Exception as e:
            print(json.dumps({"probe": p.__name__, "error": str(e)}),
                  flush=True)


if __name__ == "__main__":
    main()
