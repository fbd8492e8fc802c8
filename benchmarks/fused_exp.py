"""Real-TPU benchmark of the fused VMEM-resident ADMM Pallas kernel on the
north-star config (Shepp-Logan 64³, 50×10, alpha=0.01, rho=0.5) vs the MXU
matmul path measured by bench.py. Prints one JSON line."""

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
import scipy.ndimage as ndi  # noqa: E402

from nsol_tpu.data import path as data_path  # noqa: E402
from nsol_tpu.io import read_nifti  # noqa: E402
from nsol_tpu.ops import kernels as K  # noqa: E402
from nsol_tpu.ops.pallas.fused import make_fused_admm_solver  # noqa: E402

ALPHA, RHO, ITERATIONS, ITER_MAX = 0.01, 0.5, 50, 10
SIGMA = 1.0


def main():
    img = read_nifti(data_path("3D_SheppLoganPhantom_64.nii.gz"))
    x_true = img.data.astype(np.float64)
    shape = x_true.shape
    cov = np.diag([SIGMA ** 2] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    b_np = ndi.convolve(x_true, kern, mode="wrap")
    b = jnp.asarray(b_np.astype(np.float32))

    from jax import lax
    # same-session A/B (tunnel throughput drifts between sessions):
    # HIGHEST (6 MXU passes) vs high3 (3-pass split-bf16 emulated-HIGH,
    # _minor_matmul in ops/pallas/fused.py). lax.Precision.HIGH itself is
    # not lowerable by Mosaic.
    variants = sys.argv[1:] or ["highest", "high3"]
    bad = [t for t in variants if t not in ("highest", "high3")]
    if bad:
        # lax.Precision.HIGH dies with a NotImplementedError deep inside
        # the Mosaic compile — reject unknown tags up front instead.
        sys.exit("usage: fused_exp.py [highest|high3 ...] "
                 "(got %s)" % ", ".join(bad))
    for tag in variants:
        prec = lax.Precision.HIGHEST if tag == "highest" else tag
        solve = make_fused_admm_solver(shape, cov, iterations=ITERATIONS,
                                       iter_max=ITER_MAX, precision=prec)
        solve_j = jax.jit(solve)

        t0 = time.perf_counter()
        x = solve_j(b, b, ALPHA, RHO)
        np.asarray(x)  # compile + first execution
        print("warmup (incl. compile): %.1f s" % (time.perf_counter() - t0),
              file=sys.stderr)

        n_chain = 10
        t0 = time.perf_counter()
        xi = b
        for _ in range(n_chain):
            xi = solve_j(xi, xi, ALPHA, RHO)
        np.asarray(xi)
        per = (time.perf_counter() - t0) / n_chain

        x = solve_j(b, b, ALPHA, RHO)
        xv = np.asarray(x, dtype=np.float64)
        r = ndi.convolve(xv, kern, mode="wrap") - b_np
        comps = []
        for ax in (2, 1, 0):
            up = np.concatenate(
                [np.take(xv, range(1, xv.shape[ax]), axis=ax),
                 np.zeros_like(np.take(xv, [0], axis=ax))], axis=ax)
            comps.append(up - xv)
        g = np.stack(comps)
        objective = float(0.5 * np.sum(r ** 2)
                          + ALPHA * np.sum(np.sqrt(np.sum(g ** 2, axis=0))))

        print(json.dumps({
            "variant": "fused_pallas_admm_" + tag,
            "iters_per_sec": round(ITERATIONS / per, 1),
            "ms_per_solve": round(per * 1e3, 3),
            "objective": round(objective, 2),
        }))


if __name__ == "__main__":
    main()
