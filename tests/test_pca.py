"""PCA / robust-PCA tests: eigen-structure recovery and low-rank + sparse
decomposition quality on synthetic data."""

import os

import numpy as np
import pytest

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


def test_admm_rpca_matches_reference_algorithm():
    """Literal numpy re-evaluation of the reference's 3-way ADMM
    (nsol/principal_component_analysis.py:294-426) as oracle: iterates must
    match to machine precision."""
    from numpy.linalg import norm, svd

    def prox_l1(v, l):
        return np.maximum(0, v - l) - np.maximum(0, -v - l)

    def prox_matrix(v, l):
        U, S, Vt = svd(v, full_matrices=False)
        return U @ np.diag(prox_l1(S, l)) @ Vt

    L_true, S_true = _low_rank_plus_sparse()
    A = L_true + S_true
    m, n = A.shape
    N = 3
    g2 = 0.15 * norm(A.T, np.inf)
    g3 = 0.15 * norm(A, 2)
    lam, rho = 1.0, 1.0
    X1 = np.zeros((m, n))
    X2 = np.zeros((m, n))
    X3 = np.zeros((m, n))
    z = np.zeros((m, N * n))
    U = np.zeros((m, n))
    for k in range(100):
        B = (X1 + X2 + X3) / N - A / N + U
        X1 = (1 / (1 + lam)) * (X1 - B)
        X2 = prox_l1(X2 - B, lam * g2)
        X3 = prox_matrix(X3 - B, lam * g3)
        x = np.hstack([X1, X2, X3])
        zold = z
        z = x + np.tile(-(X1 + X2 + X3) / N + A / N, (1, N))
        r = norm(x - z, "fro")
        s = norm(-rho * (z - zold), "fro")
        ep = np.sqrt(m * n * N) * 1e-4 + 1e-2 * max(norm(x, "fro"),
                                                    norm(z, "fro"))
        ed = np.sqrt(m * n * N) * 1e-4 + 1e-2 * np.sqrt(N) * norm(rho * B,
                                                                  "fro")
        U = B
        if r < ep and s < ed:
            break

    h = AdmmRobustPrincipalComponentAnalysis(A).run()
    assert h["admm_iter"] == k
    np.testing.assert_allclose(h["X3_admm"], X3, atol=1e-10)
    np.testing.assert_allclose(h["X1_admm"], X1, atol=1e-10)
    # consensus: decomposition sums back to the data
    rel = norm(h["X1_admm"] + h["X2_admm"] + h["X3_admm"] - A) / norm(A)
    assert rel < 0.05


def test_pca_show_writes_figures(tmp_path, rng):
    """Principal-axes visualization (2-D and 3-D) saves a figure."""
    from nsol_tpu.pca import PrincipalComponentAnalysis

    for dim in (2, 3):
        pts = rng.randn(200, dim) * np.array([3.0, 1.0, 0.5][:dim])
        pca = PrincipalComponentAnalysis(pts)
        pca.run()
        path = str(tmp_path / ("axes%dd.png" % dim))
        pca.show(title="pca%dd" % dim, step=2, path=path)
        assert os.path.getsize(path) > 1000

    with pytest.raises(RuntimeError, match="Run 'run' first"):
        PrincipalComponentAnalysis(rng.randn(10, 2)).show(
            path=str(tmp_path / "x.png"))
