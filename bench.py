"""Driver benchmark: north-star metric on real TPU hardware.

Config (BASELINE.md #3, the north-star): 3-D TV-L2 deconvolution of the
bundled Shepp-Logan 64³ phantom via ADMM (50 outer iterations, 10-iteration
CGLS inner solves, alpha=0.01, rho=0.5, Gaussian blur sigma=1 voxel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = ADMM outer iterations/sec on this chip and vs_baseline is the
speedup over the measured reference-equivalent CPU implementation
(scipy ndimage + lsmr, float64; see benchmarks/reference_baseline.py and
BASELINE.md — the reference publishes no numbers of its own).
"""

import json
import sys
import time
from functools import partial

import numpy as np

#: Measured by benchmarks/reference_baseline.py on this machine's CPU
#: (2026-08-17): 50 ADMM iterations in 97.97 s, objective 212334.64.
BASELINE_ITERS_PER_SEC = 0.5104
BASELINE_OBJECTIVE = 212334.64

ALPHA, RHO, ITERATIONS, ITER_MAX = 0.01, 0.5, 50, 10
SIGMA = 1.0


def main():
    import jax
    import jax.numpy as jnp

    from nsol_tpu.io import read_nifti
    from nsol_tpu.ops import conv as C
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops import kernels as K
    from nsol_tpu.solvers.admm import admm_solve

    img = read_nifti("/root/reference/data/3D_SheppLoganPhantom_64.nii.gz")
    dtype = np.float32
    x_true = img.data.astype(dtype)
    shape = x_true.shape

    cov = np.diag([SIGMA ** 2] * 3)
    A, A_adj = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
                                     method="fft", dtype=dtype)
    Bg, Bg_adj = G.make_gradient_operators()

    from nsol_tpu.jitutil import jit_closed

    b = A(jnp.asarray(x_true))
    b = jnp.asarray(np.asarray(b), dtype)  # materialize

    b_reg = jnp.zeros((3,) + shape, dtype)
    alpha = jnp.asarray(ALPHA, dtype)
    rho = jnp.asarray(RHO, dtype)
    solve = jit_closed(
        partial(admm_solve, A, A_adj, Bg, Bg_adj,
                iterations=ITERATIONS, iter_max=ITER_MAX, minimizer="lsmr"),
        (b, b_reg, b, alpha, rho))

    def run():
        x, _ = solve(b, b_reg, b, alpha, rho)
        x.block_until_ready()
        return x

    x = run()  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        x = run()
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    iters_per_sec = ITERATIONS / elapsed

    # converged objective for the parity record (stderr, not the JSON line)
    r = np.asarray(A(x)) - np.asarray(b)
    g = np.asarray(Bg(x))
    objective = float(0.5 * np.sum(r.astype(np.float64) ** 2)
                      + ALPHA * np.sum(np.sqrt(
                          np.sum(g.astype(np.float64) ** 2, axis=0))))
    print("objective=%.2f (reference-equivalent CPU: %.2f), elapsed=%.3fs"
          % (objective, BASELINE_OBJECTIVE, elapsed), file=sys.stderr)

    print(json.dumps({
        "metric": "admm_tv_deconv_3d_64_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iterations/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
