"""North-star chain levers A/B (round 5, VERDICT r4 item 5).

64³ Shepp fused ADMM at high3+compact_dirs (the round-4 production
config) vs the two round-5 chain levers: blur-matmul reorder (minor
matmuls on the bf16-exact direction BEFORE the z-tap accumulation →
"high2" 2-pass blur, free in the VMEM-resident kernel) and the
pipelined-CG recurrence (one reduction barrier per CG iteration).
Chained-fetch protocol as bench.py; objective printed per leg."""

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

ALPHA, RHO = 0.01, 0.5


def main():
    img = read_nifti(data_path("3D_SheppLoganPhantom_64.nii.gz"))
    x_true = img.data.astype(np.float64)
    shape = x_true.shape
    cov = np.diag([1.0] * 3)
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    b_np = ndi.convolve(x_true, kern, mode="wrap")
    b = jnp.asarray(b_np.astype(np.float32))

    legs = [
        ("r4_anchor", dict(blur_reorder=False)),
        ("reorder", dict(blur_reorder=True)),
        ("pipelined", dict(blur_reorder=False, pipelined_cg=True)),
        ("both", dict(blur_reorder=True, pipelined_cg=True)),
    ]
    for tag, kw in legs:
        solve = make_fused_admm_solver(
            shape, cov, iterations=50, iter_max=10, dtype=np.float32,
            precision="high3", compact_dirs=True, **kw)
        f = jax.jit(lambda xi: solve(b, xi, ALPHA, RHO))
        x = f(b)
        np.asarray(x)
        n = 10
        t0 = time.perf_counter()
        xi = b
        for _ in range(n):
            xi = f(xi)
        np.asarray(xi)
        per = (time.perf_counter() - t0) / n
        xv = np.asarray(f(b), dtype=np.float64)
        r = ndi.convolve(xv, kern, mode="wrap") - b_np
        gx = np.stack([np.diff(np.concatenate(
            [xv, np.zeros_like(xv[..., :1] if ax == 2 else
                               (xv[:, :1] if ax == 1 else xv[:1]))],
            axis=ax), axis=ax) for ax in (2, 1, 0)])
        obj = float(0.5 * np.sum(r ** 2)
                    + ALPHA * np.sum(np.sqrt(np.sum(gx ** 2, axis=0))))
        print("%s: %.0f it/s  objective %.2f" % (tag, 50 / per, obj),
              flush=True)


if __name__ == "__main__":
    main()
