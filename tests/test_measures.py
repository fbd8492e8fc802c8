"""Similarity-measure identity tests on a real bundled image.

Ports tests/similarity_measures_test.py (PSNR(x,x)=∞, NCC identities and
offset/scale invariance, Dice) plus checks of SSIM/MI/NMI behavior against
independent numpy evaluation.
"""

import numpy as np

import jax.numpy as jnp

from nsol_tpu.ops import measures as sim


def test_psnr_of_identical_images_is_infinite(lena_noise):
    x = jnp.asarray(lena_noise)
    assert np.isinf(float(sim.peak_signal_to_noise_ratio(x, x)))


def test_ncc_identities(lena_noise):
    x = jnp.asarray(lena_noise)
    n = lena_noise.size
    # The reference formula normalizes by n·std(ddof=1)², so NCC(x,x) is
    # exactly (n−1)/n, ≈1 (nsol/similarity_measures.py:112-120).
    np.testing.assert_almost_equal(
        float(sim.normalized_cross_correlation(x, x)), (n - 1) / n,
        decimal=10)
    np.testing.assert_almost_equal(
        float(sim.normalized_cross_correlation(x, x)), 1.0, decimal=4)
    np.testing.assert_almost_equal(
        float(sim.normalized_cross_correlation(x, -x)), -(n - 1) / n,
        decimal=10)
    # invariance to offset and positive scale (tests/similarity_...:63-78)
    np.testing.assert_almost_equal(
        float(sim.normalized_cross_correlation(x, 3.0 * x + 17.0)),
        (n - 1) / n, decimal=10)


def test_ssd_mse_rmse_mae_consistency(rng):
    x = rng.rand(30, 32)
    y = rng.rand(30, 32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    ssd = float(sim.sum_of_squared_differences(xj, yj))
    np.testing.assert_almost_equal(ssd, np.sum((x - y) ** 2), decimal=10)
    np.testing.assert_almost_equal(
        float(sim.mean_squared_error(xj, yj)), ssd / x.size, decimal=10)
    np.testing.assert_almost_equal(
        float(sim.root_mean_square_error(xj, yj)),
        np.sqrt(ssd / x.size), decimal=10)
    np.testing.assert_almost_equal(
        float(sim.mean_absolute_error(xj, yj)),
        np.mean(np.abs(x - y)), decimal=10)


def test_dice_score(rng):
    a = np.zeros((20, 20), dtype=bool)
    b = np.zeros((20, 20), dtype=bool)
    a[5:15, 5:15] = True
    b[10:20, 5:15] = True
    got = float(sim.dice_score(jnp.asarray(a), jnp.asarray(b)))
    inter = np.logical_and(a, b).sum()
    want = 2 * inter / (a.sum() + b.sum())
    np.testing.assert_almost_equal(got, want, decimal=10)
    np.testing.assert_almost_equal(
        float(sim.dice_score(jnp.asarray(a), jnp.asarray(a))), 1.0,
        decimal=10)


def test_entropy_and_mi_against_numpy(lena_noise, rng):
    x = lena_noise[::4, ::4]
    y = x + rng.randn(*x.shape)
    # Shannon entropy vs direct numpy histogram evaluation (loose: jnp and
    # numpy histograms bin ties at edges slightly differently)
    hist, _ = np.histogram(x, bins=100)
    p = hist / hist.sum()
    want = -np.sum([pi * np.log(pi) for pi in p if pi > 0])
    got = float(sim.shannon_entropy(jnp.asarray(x)))
    np.testing.assert_almost_equal(got, want, decimal=2)
    # MI symmetric and MI(x,x) >= MI(x,y)
    mi_xy = float(sim.mutual_information(jnp.asarray(x), jnp.asarray(y)))
    mi_yx = float(sim.mutual_information(jnp.asarray(y), jnp.asarray(x)))
    mi_xx = float(sim.mutual_information(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_almost_equal(mi_xy, mi_yx, decimal=8)
    assert mi_xx > mi_xy > 0
    nmi_xx = float(sim.normalized_mutual_information(jnp.asarray(x),
                                                     jnp.asarray(x)))
    assert nmi_xx > 1.5  # NMI(x,x) = 2 up to binning effects


def test_ssim_identity_and_degradation(lena_noise, rng):
    x = lena_noise[::2, ::2]
    xj = jnp.asarray(x)
    np.testing.assert_almost_equal(
        float(sim.structural_similarity(xj, xj)), 1.0, decimal=8)
    noisy = jnp.asarray(x + 25.0 * rng.randn(*x.shape))
    s = float(sim.structural_similarity(noisy, xj))
    assert 0.0 < s < 0.9
