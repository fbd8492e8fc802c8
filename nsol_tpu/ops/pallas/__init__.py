"""Pallas TPU kernels for the hot stencil/prox operations.

These are the "native" compute kernels of the framework (SURVEY.md §2: the
TPU build's native equivalents are the Pallas/XLA kernels replacing what
scipy.ndimage/lsmr do internally in the reference)."""

from nsol_tpu.ops.pallas.blur import pallas_separable_blur_fn

__all__ = ["pallas_separable_blur_fn"]
