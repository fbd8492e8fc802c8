"""North-star (64^3 fused ADMM high3): compact_dirs A/B, same session."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from nsol_tpu.data import path as data_path  # noqa: E402
from nsol_tpu.io import read_nifti  # noqa: E402
from nsol_tpu.ops import kernels as K  # noqa: E402
from nsol_tpu.ops.pallas.fused import make_fused_admm_solver  # noqa: E402

ALPHA, RHO, ITERS, ITER_MAX = 0.01, 0.5, 50, 10


def main():
    img = read_nifti(data_path("3D_SheppLoganPhantom_64.nii.gz"))
    x_true = img.data.astype(np.float64)
    shape = x_true.shape
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    b_np = ndi.convolve(x_true, kern, mode="wrap")
    b = jnp.asarray(b_np.astype(np.float32))

    for tag, kw in (("high3", {}), ("high3+compact_dirs",
                                    dict(compact_dirs=True))):
        fused = make_fused_admm_solver(shape, cov, iterations=ITERS,
                                       iter_max=ITER_MAX,
                                       precision="high3", **kw)
        f = jax.jit(lambda xi: fused(xi, xi, ALPHA, RHO))
        x = f(b)
        xv = np.asarray(x, dtype=np.float64)
        r = ndi.convolve(xv, kern, mode="wrap") - b_np
        gx = np.stack([np.diff(np.concatenate(
            [xv, np.zeros_like(xv[..., :1] if ax == 2 else
                               (xv[:, :1] if ax == 1 else xv[:1]))],
            axis=ax), axis=ax) for ax in (2, 1, 0)])
        obj = float(0.5 * np.sum(r ** 2) + ALPHA * np.sum(
            np.sqrt(np.sum(gx ** 2, axis=0))))
        n = 15
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(xi)
        np.asarray(xi[0, 0, 0])
        per = (time.perf_counter() - t0) / n
        print("%s: %.0f it/s, objective %.2f"
              % (tag, ITERS / per, obj), flush=True)


if __name__ == "__main__":
    main()
