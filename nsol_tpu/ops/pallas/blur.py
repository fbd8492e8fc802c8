"""Pallas kernel: separable Gaussian blur with wrap boundary, VMEM-resident.

For volumes that fit VMEM (≲ 4 MB, e.g. the 64³ benchmark phantom or 256²
images) the whole separable convolution — every tap of every axis — runs in
one kernel launch over a VMEM-resident array: one HBM read, one HBM write,
all intermediate axis passes stay on-chip. The XLA fallback
(:func:`nsol_tpu.ops.conv.separable_convolve_fn`) materializes each
roll-accumulate pass through HBM.

Circular shifts use ``pltpu.roll``; tap weights are compile-time scalars
(tiny — no literal-serialization pathology).
"""

import numpy as np
import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_separable_blur_fn"]

#: VMEM budget for the resident path (input + accumulator + slack, bytes).
_VMEM_LIMIT = 4 * 1024 * 1024


def pallas_separable_blur_fn(factors, shape, dtype=np.float32):
    """Build ``A(x)`` for per-axis 1-D factors on a fixed ``shape``.

    Returns None if the shape/dtype is outside the resident-kernel envelope
    (caller falls back to the XLA path).
    """
    ndim = len(shape)
    if ndim not in (2, 3):
        return None
    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if nbytes * 3 > _VMEM_LIMIT:
        return None

    taps = [tuple(float(t) for t in np.asarray(f)) for f in factors]
    if len(taps) != ndim:
        return None

    def kernel(x_ref, o_ref, s_ref):
        # Ping-pong between the two resident buffers (s_ref, o_ref) with
        # read-modify-write accumulation so only one roll temporary is live
        # at a time (a pure add-chain overflows the 16M VMEM stack).
        bufs = [s_ref, o_ref] if ndim % 2 == 0 else [o_ref, s_ref]
        src = x_ref
        for ax, f in enumerate(taps):
            c = len(f) // 2
            n = shape[ax]
            dst = bufs[ax % 2]
            # ndimage semantics: y[i] = Σ_j f[j]·x[i + c − j]
            dst[:] = f[0] * pltpu.roll(src[:], (-c) % n, axis=ax)
            for j in range(1, len(f)):
                dst[:] = dst[:] + f[j] * pltpu.roll(src[:], (j - c) % n,
                                                    axis=ax)
            src = dst

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(shape, dtype)],
    )

    def apply(x):
        return fn(x.astype(dtype))

    return apply
