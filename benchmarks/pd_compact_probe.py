"""Same-session A/B probe: compact (bf16-state) fused PD kernel vs the
exact f32 kernel on the config-4 workload (Man 1024², 64-alpha vmapped
L-curve sweep, 50 it, in-kernel recording) and on the single-solve
config-1 shape (Lena 256²).

Run on real TPU. Prints one JSON line per leg + the A/B verdict.
"""
import json
import time

import numpy as np

import sys
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

from nsol_tpu.io import DataReader  # noqa: E402
from nsol_tpu.jitutil import jit_closed  # noqa: E402
from nsol_tpu.data import data_dir  # noqa: E402
from nsol_tpu.ops.pallas.fused import make_fused_pd_denoise_solver  # noqa: E402

DATA = data_dir()


def _read(name):
    r = DataReader(DATA + "/" + name)
    r.read_data()
    return r.get_data().astype(np.float32)


def sweep_leg(compact):
    man = _read("2D_Man_1024.png")
    b = jnp.asarray(man / float(man.max()))
    alphas = jnp.linspace(0.01, 1.5, 64, dtype=jnp.float32)
    fused = make_fused_pd_denoise_solver(man.shape, "TVL2", iterations=50,
                                         record=True, compact=compact)
    L2 = jnp.asarray(8.0, jnp.float32)

    def sweep(x0):
        return jax.vmap(lambda a: fused(b, x0, a, L2))(alphas)

    f = jit_closed(sweep, (b,))
    x_all, recs = f(b)
    np.asarray(x_all[0])          # warm fetch
    n = 3
    t0 = time.perf_counter()
    xi = b
    for _ in range(n):
        x_all, recs = f(xi)
        xi = x_all[0]
    np.asarray(xi)
    per = (time.perf_counter() - t0) / n
    # final-iterate objective at alpha index 40 for the parity line
    obj = float(recs["Data"][40][-1]) + float(alphas[40]) * \
        float(recs["Reg"][40][-1])
    return per, obj


def main():
    out = {}
    per_e, obj_e = sweep_leg(False)
    per_c, obj_c = sweep_leg(True)
    # second exact leg guards against session drift mid-probe
    per_e2, _ = sweep_leg(False)
    out["config"] = "man1024_64alpha_pd_sweep_compact_ab"
    out["s_per_sweep_exact"] = round(per_e, 4)
    out["s_per_sweep_exact_repeat"] = round(per_e2, 4)
    out["s_per_sweep_compact"] = round(per_c, 4)
    out["objective_exact"] = round(obj_e, 4)
    out["objective_compact"] = round(obj_c, 4)
    out["obj_rel_dev"] = round(abs(obj_e - obj_c) / abs(obj_e), 8)
    out["speedup"] = round(min(per_e, per_e2) / per_c, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
