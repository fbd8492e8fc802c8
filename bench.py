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
#: Same CPU reference-equivalent solve on the hash-frozen GENERATED
#: stand-in phantom (nsol_tpu/data.py content hashes; measured
#: 2026-08-21) — arms the parity gate on checkouts without
#: /root/reference.
BASELINE_OBJECTIVE_STANDIN = 219948.08

ALPHA, RHO, ITERATIONS, ITER_MAX = 0.01, 0.5, 50, 10
SIGMA = 1.0


def main():
    import jax

    # Persistent compilation cache: the axon AOT compile of the full solver
    # program is expensive (~340 s measured); cache it across bench runs.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import jax.numpy as jnp
    import scipy.ndimage as ndi

    from nsol_tpu.data import path as data_path
    from nsol_tpu.io import read_nifti
    from nsol_tpu.ops import conv as C
    from nsol_tpu.ops import grad as G
    from nsol_tpu.ops import kernels as K
    from nsol_tpu.solvers.admm import admm_solve
    from nsol_tpu.jitutil import jit_closed

    img = read_nifti(data_path("3D_SheppLoganPhantom_64.nii.gz"))
    dtype = np.float32
    x_true = img.data.astype(np.float64)
    shape = x_true.shape

    cov = np.diag([SIGMA ** 2] * 3)

    # Build b host-side (scipy) so bench compiles exactly ONE TPU program
    # (the axon remote compiler intermittently stalls for minutes per
    # program; fewer programs = robust bench wall-time).
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(3))
    b_np = ndi.convolve(x_true, kern, mode="wrap")
    b = jnp.asarray(b_np.astype(dtype))

    # Fastest configuration (measured ladder in BASELINE.md): the fused
    # VMEM-resident Pallas kernel — the ENTIRE ADMM solve in one program,
    # all state in VMEM (2823 vs 1942 it/s on the MXU matmul path,
    # 2026-08-20) — with precision="high3" minor-axis matmuls (3-pass
    # split-bf16 emulated-HIGH: 3272 vs 2809 it/s same-session on
    # 2026-08-21, objective 212554.56 vs 212557.79 — both in the 0.1 %
    # band vs the CPU reference 212334.64, benchmarks/fused_exp.py) and
    # compact_dirs (round-4: CG directions rounded bf16-exact → the
    # Laplacian matmuls drop to 2 passes; 4797 vs 3723 it/s same-session,
    # objective 212554.82 vs .56 — a 1e-6 shift, voxel dev 1.5e-05).
    # Fallback: MXU circulant-matmul operators + fused normal-equation CG
    # under jit.
    from nsol_tpu.ops.pallas.fused import (
        make_fused_admm_solver, fused_admm_fits_vmem,
    )

    def make_solve():
        if fused_admm_fits_vmem(shape, dtype):
            try:
                fused = make_fused_admm_solver(
                    shape, cov, iterations=ITERATIONS, iter_max=ITER_MAX,
                    dtype=dtype, precision="high3", compact_dirs=True)
                import jax as _jax

                f = _jax.jit(fused)
                return lambda xi: f(xi, xi, ALPHA, RHO), "fused"
            except Exception as e:  # pragma: no cover - defensive
                print("fused kernel unavailable (%s); matmul path" % e,
                      file=sys.stderr)
        from nsol_tpu.ops import matmul_ops as MM

        A, A_adj = C.make_blur_operators(cov, alpha_cut=3, shape=shape,
                                         method="auto", dtype=dtype)
        nA = C.make_normal_blur_operator(cov, alpha_cut=3, shape=shape,
                                         dtype=dtype)
        nB = MM.matmul_gradient_normal_fn(shape, dtype=dtype)
        Bg, Bg_adj = G.make_gradient_operators()
        b_reg = jnp.zeros((3,) + shape, dtype)
        alpha = jnp.asarray(ALPHA, dtype)
        rho = jnp.asarray(RHO, dtype)
        solve = jit_closed(
            partial(admm_solve, A, A_adj, Bg, Bg_adj,
                    iterations=ITERATIONS, iter_max=ITER_MAX,
                    minimizer="cg", normal_A=nA, normal_B=nB),
            (b, b_reg, b, alpha, rho))
        return lambda xi: solve(xi, b_reg, xi, alpha, rho)[0], "matmul"

    step, variant = make_solve()

    # NOTE on timing under the axon tunnel: ``block_until_ready`` does NOT
    # synchronize (returns immediately) and compilation happens lazily at
    # the first value fetch. Honest methodology: warm up with a real
    # ``np.asarray`` fetch, then CHAIN executions (each solve's output feeds
    # the next solve's input, forcing ordered real execution) and fetch only
    # the final result; per-solve time = total / n_chained.
    x = step(b)
    np.asarray(x)  # forces compile + first execution

    # --trace DIR: capture a jax.profiler device trace of the timed
    # chain (profiling.py; view in TensorBoard/Perfetto)
    import contextlib

    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
    from nsol_tpu import profiling

    tracer = (profiling.trace(trace_dir) if trace_dir
              else contextlib.nullcontext())

    n_chain = 10
    t0 = time.perf_counter()
    with tracer:
        xi = b
        for _ in range(n_chain):
            xi = step(xi)
        np.asarray(xi)
    elapsed = (time.perf_counter() - t0) / n_chain
    iters_per_sec = ITERATIONS / elapsed
    x = step(b)

    # converged objective for the parity record (stderr, not the JSON
    # line) — computed host-side to avoid a second TPU compile
    xv = np.asarray(x, dtype=np.float64)
    r = ndi.convolve(xv, kern, mode="wrap") - b_np
    gx = np.stack([np.diff(np.concatenate(
        [xv, np.zeros_like(xv[..., :1] if ax == 2 else
                           (xv[:, :1] if ax == 1 else xv[:1]))],
        axis=ax), axis=ax) for ax in (2, 1, 0)])
    objective = float(0.5 * np.sum(r ** 2)
                      + ALPHA * np.sum(np.sqrt(np.sum(gx ** 2, axis=0))))
    print("objective=%.2f (reference-equivalent CPU: %.2f), elapsed=%.3fs,"
          " variant=%s" % (objective, BASELINE_OBJECTIVE, elapsed, variant),
          file=sys.stderr)

    print(json.dumps({
        "metric": "admm_tv_deconv_3d_64_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iterations/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
    }))

    # Parity GATE (not just a printed number): a Mosaic/lowering regression
    # that drifts the converged objective must FAIL the bench run. Each
    # input source has its own recorded CPU objective: the reference's
    # bundled phantom (BASELINE_OBJECTIVE) and the hash-frozen generated
    # stand-in (BASELINE_OBJECTIVE_STANDIN, content-verified at
    # generation time) — so the gate arms on standalone checkouts too.
    # Band: 0.2 % — the measured f32/high3 trajectory variance is
    # ~0.10 % (BASELINE.md), a real lowering regression measures 3.4 %
    # (the DEFAULT-precision row of the precision ladder).
    from nsol_tpu.data import data_dir

    src = data_dir()
    anchor = None
    if src == "/root/reference/data":
        anchor = BASELINE_OBJECTIVE
    elif src.endswith(".generated_data"):
        anchor = BASELINE_OBJECTIVE_STANDIN
    if anchor is not None:
        rel = abs(objective - anchor) / anchor
        if rel > 0.002:
            print("PARITY FAILURE: objective %.2f deviates %.3f%% from the"
                  " reference-equivalent %.2f (band 0.2%%)"
                  % (objective, 100 * rel, anchor),
                  file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
