"""PCA / robust-PCA tests: eigen-structure recovery and low-rank + sparse
decomposition quality on synthetic data."""

import numpy as np

from nsol_tpu.pca import (
    PrincipalComponentAnalysis,
    AlmRobustPrincipalComponentAnalysis,
    AdmmRobustPrincipalComponentAnalysis,
)


def test_pca_recovers_principal_axes(rng):
    # anisotropic 3-D Gaussian cloud with known principal directions
    n = 5000
    scales = np.array([5.0, 2.0, 0.5])
    pts = rng.randn(n, 3) * scales
    mean_shift = np.array([1.0, -2.0, 3.0])
    pts += mean_shift

    pca = PrincipalComponentAnalysis(pts)
    pca.run()

    np.testing.assert_allclose(pca.get_mean(), mean_shift, atol=0.2)
    eigval = pca.get_eigval()
    assert eigval[0] > eigval[1] > eigval[2]
    np.testing.assert_allclose(np.sqrt(eigval), scales, rtol=0.1)
    # principal axis aligned with x
    v = np.abs(pca.get_eigvec()[:, 0])
    np.testing.assert_allclose(v, [1, 0, 0], atol=0.05)
    # right-handed frame
    np.testing.assert_allclose(
        np.cross(pca.get_eigvec()[:, 0], pca.get_eigvec()[:, 1]),
        pca.get_eigvec()[:, 2], atol=1e-12)


def test_pca_rejects_bad_shape(rng):
    import pytest

    with pytest.raises(IOError):
        PrincipalComponentAnalysis(rng.rand(10, 5))


def _low_rank_plus_sparse(seed=7, m=40, n=30, rank=3, density=0.05):
    r = np.random.RandomState(seed)
    L = r.randn(m, rank) @ r.randn(rank, n)
    S = np.zeros((m, n))
    mask = r.rand(m, n) < density
    S[mask] = r.randn(mask.sum()) * 10
    return L, S


def test_alm_rpca_decomposition():
    L_true, S_true = _low_rank_plus_sparse()
    D = L_true + S_true
    rpca = AlmRobustPrincipalComponentAnalysis(D)
    L, S = rpca.fit(max_iter=1000)
    # recovered L should be close to the true low-rank part
    rel = np.linalg.norm(L - L_true) / np.linalg.norm(L_true)
    assert rel < 0.1, rel
    np.testing.assert_allclose(L + S, D, atol=0.1)


def test_admm_rpca_runs_and_decomposes():
    L_true, S_true = _low_rank_plus_sparse()
    D = L_true + S_true
    h = AdmmRobustPrincipalComponentAnalysis(D).run()
    assert "X3_admm" in h and "X1_admm" in h
    X3 = h["X3_admm"]
    # X3 is the low-rank component: effective rank well below full rank
    sv = np.linalg.svd(X3, compute_uv=False)
    eff_rank = int(np.sum(sv > 0.01 * sv[0]))
    assert eff_rank <= 15
    assert h["objval"][h["admm_iter"]] <= h["objval"][0]
