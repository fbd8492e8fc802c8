"""MXU precision experiment on the north-star config (VERDICT round 1 #2).

Measures Precision.HIGHEST (multi-pass bf16 = true f32) vs
Precision.DEFAULT (single-pass bf16 inputs, f32 accumulation) for the
circulant/tridiagonal matmul operators inside the ADMM + normal-equation-CG
solve: iterations/sec AND the converged objective, per BASELINE.md's
parity criterion. Prints one JSON line per variant.
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
import scipy.ndimage as ndi  # noqa: E402

from nsol_tpu.data import path as data_path  # noqa: E402
from nsol_tpu.io import read_nifti  # noqa: E402
from nsol_tpu.ops import grad as G  # noqa: E402
from nsol_tpu.ops import kernels as K  # noqa: E402
from nsol_tpu.ops import matmul_ops as MM  # noqa: E402
from nsol_tpu.ops.conv import separable_factors  # noqa: E402
from nsol_tpu.solvers.admm import admm_solve  # noqa: E402
from nsol_tpu.jitutil import jit_closed  # noqa: E402

ALPHA, RHO, ITERATIONS, ITER_MAX = 0.01, 0.5, 50, 10
SIGMA = 1.0
DTYPE = np.float32


def run_variant(precision, tag, x_true, kern, b_np):
    shape = x_true.shape
    cov = np.diag([SIGMA ** 2] * 3)
    factors = separable_factors(
        K.gaussian_kernel(cov, alpha_cut=3, dtype=np.float64))
    A = MM.matmul_convolve_fn(factors, shape, DTYPE, precision=precision)
    auto = [np.convolve(f, f[::-1]) for f in factors]
    nA = MM.matmul_convolve_fn(auto, shape, DTYPE, precision=precision)
    nB = MM.matmul_gradient_normal_fn(shape, dtype=DTYPE,
                                      precision=precision)
    Bg, Bg_adj = G.make_gradient_operators()

    b = jnp.asarray(b_np.astype(DTYPE))
    b_reg = jnp.zeros((3,) + shape, DTYPE)
    al = jnp.asarray(ALPHA, DTYPE)
    rh = jnp.asarray(RHO, DTYPE)
    solve = jit_closed(
        partial(admm_solve, A, A, Bg, Bg_adj,
                iterations=ITERATIONS, iter_max=ITER_MAX, minimizer="cg",
                normal_A=nA, normal_B=nB),
        (b, b_reg, b, al, rh))

    x, _ = solve(b, b_reg, b, al, rh)
    np.asarray(x)  # compile + first run

    n_chain = 10
    t0 = time.perf_counter()
    xi = b
    for _ in range(n_chain):
        xi, _ = solve(xi, b_reg, xi, al, rh)
    np.asarray(xi)
    per = (time.perf_counter() - t0) / n_chain

    x, _ = solve(b, b_reg, b, al, rh)
    xv = np.asarray(x, dtype=np.float64)
    # objective host-side in numpy (no extra TPU program; axon landmine)
    r = ndi.convolve(xv, kern, mode="wrap") - b_np
    comps = []
    for ax in (2, 1, 0):  # component order x, y, z
        up = np.concatenate(
            [np.take(xv, range(1, xv.shape[ax]), axis=ax),
             np.zeros_like(np.take(xv, [0], axis=ax))], axis=ax)
        comps.append(up - xv)
    g = np.stack(comps)
    objective = float(0.5 * np.sum(r ** 2)
                      + ALPHA * np.sum(np.sqrt(np.sum(g ** 2, axis=0))))
    print(json.dumps({
        "variant": tag,
        "iters_per_sec": round(ITERATIONS / per, 1),
        "ms_per_solve": round(per * 1e3, 3),
        "objective": round(objective, 2),
    }), flush=True)


def main():
    img = read_nifti(data_path("3D_SheppLoganPhantom_64.nii.gz"))
    x_true = img.data.astype(np.float64)
    cov = np.diag([SIGMA ** 2] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    b_np = ndi.convolve(x_true, kern, mode="wrap")

    variants = [(lax.Precision.HIGHEST, "highest"),
                (lax.Precision.HIGH, "high"),
                (lax.Precision.DEFAULT, "default")]
    if len(sys.argv) > 1:
        variants = [(p, t) for p, t in variants if t in sys.argv[1:]]
    for precision, tag in variants:
        run_variant(precision, tag, x_true, kern, b_np)


if __name__ == "__main__":
    main()
