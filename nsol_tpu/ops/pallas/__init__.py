"""Pallas (Mosaic) kernels.

Production kernel: the fused VMEM-resident ADMM solver in
:mod:`nsol_tpu.ops.pallas.fused` — the whole TV-L2 deconvolution solve as
one program (see BASELINE.md optimization ladder level 4).
"""

from nsol_tpu.ops.pallas.fused import (
    make_fused_admm_solver, fused_admm_fits_vmem,
)

__all__ = ["make_fused_admm_solver", "fused_admm_fits_vmem"]
