"""nsol_tpu — TPU-native proximal-splitting solver library.

A from-scratch JAX/XLA/Pallas/pjit framework covering the problem class of
the NSoL reference (L1/L2 denoising and robust L2 deconvolution of 1D/2D/3D
image data with TK0/TK1/TV/Huber regularizers and robust data losses, solved
by Chambolle–Pock primal-dual, ADMM, and Tikhonov/CG), re-architected for
TPU: shaped arrays, scan-based solver loops, vmapped parameter sweeps, and
mesh-sharded volumes with halo exchange.
"""

import os as _os

if _os.environ.get("NSOL_TPU_PLATFORM"):
    # Select the JAX platform before any backend initializes. Setting the
    # JAX_PLATFORMS env var is NOT equivalent in the axon environment (the
    # TPU shim intercepts it); the config route works reliably.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["NSOL_TPU_PLATFORM"])

from nsol_tpu.__about__ import __version__  # noqa: F401,E402
