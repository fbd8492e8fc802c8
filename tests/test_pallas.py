"""Pallas kernel correctness in interpreter mode (CPU).

The VMEM-resident blur kernel is validated against scipy here; on the axon
TPU it is functional but compile-pathological for lane-axis rolls
(CLAUDE.md), so the MXU matmul path is the production default.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp
from jax.experimental import pallas as pl

import nsol_tpu.ops.pallas.blur as PB
from nsol_tpu.ops import conv as C
from nsol_tpu.ops import kernels as K


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(PB.pl, "pallas_call", patched)


@pytest.mark.parametrize("shape", [(32, 40), (16, 20, 24)])
def test_pallas_blur_matches_ndimage(interpret_pallas, shape, rng):
    ndim = len(shape)
    cov = np.diag([1.2, 0.9, 1.0][:ndim]) ** 2
    kern = K.gaussian_kernel(cov, alpha_cut=3, spacing=np.ones(ndim),
                             dtype=np.float64)
    facs = C.separable_factors(kern)
    x = rng.rand(*shape)
    fn = PB.pallas_separable_blur_fn(facs, shape, np.float64)
    assert fn is not None
    ours = np.asarray(fn(jnp.asarray(x)))
    ref = ndi.convolve(x, kern, mode="wrap")
    np.testing.assert_array_almost_equal(ours, ref, decimal=12)


def test_pallas_blur_declines_oversized_volume():
    facs = [np.array([0.25, 0.5, 0.25])] * 3
    assert PB.pallas_separable_blur_fn(facs, (512, 512, 512),
                                       np.float32) is None


def test_pallas_blur_declines_1d():
    facs = [np.array([0.25, 0.5, 0.25])]
    assert PB.pallas_separable_blur_fn(facs, (64,), np.float32) is None
