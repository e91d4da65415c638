"""Tests for batched silhouette/CH and the model-selection chain
(sharp_tpu/ops/{silhouette,select}.py) vs sklearn on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score, silhouette_samples

from sharp_tpu.ops.distance import pearson_distance, standardize_rows
from sharp_tpu.ops.silhouette import silhouette_median, masked_median
from sharp_tpu.ops.select import opt_hclust


def _blobs(n_per, centers, p, seed, spread=0.3):
    rng = np.random.default_rng(seed)
    X, y = [], []
    for c in range(centers):
        mu = rng.normal(size=p) * 3.0
        X.append(mu + spread * rng.normal(size=(n_per, p)))
        y.append(np.full(n_per, c))
    X = np.concatenate(X).astype(np.float32)
    y = np.concatenate(y)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def _pad(X, npad):
    n, p = X.shape
    Xp = np.zeros((npad, p), np.float32)
    Xp[:n] = X
    mask = np.zeros(npad, bool)
    mask[:n] = True
    return jnp.asarray(Xp), jnp.asarray(mask)


def test_masked_median_matches_numpy():
    rng = np.random.default_rng(0)
    for n, npad in [(7, 12), (8, 8), (31, 40)]:
        x = rng.normal(size=npad).astype(np.float32)
        mask = np.zeros(npad, bool)
        mask[:n] = True
        got = masked_median(jnp.asarray(x), jnp.asarray(mask), jnp.asarray(n))
        np.testing.assert_allclose(float(got), np.median(x[:n]), rtol=1e-6)


def test_silhouette_matches_sklearn():
    X, y = _blobs(15, 4, 8, seed=1)
    n = len(y)
    npad = 80
    nc_pad = 16
    Xp, mask = _pad(X, npad)
    D = pearson_distance(standardize_rows(Xp, mask), mask)
    D_real = jnp.where(mask[:, None] & mask[None, :], D, 0.0)
    D_real = jnp.where(jnp.eye(npad, dtype=bool), 0.0, D_real)

    labels = np.full(npad, nc_pad - 1, np.int32)
    labels[:n] = y
    got = float(
        silhouette_median(
            D_real, jnp.asarray(labels), mask, jnp.asarray(n), nc_pad
        )
    )
    d_np = 1.0 - np.corrcoef(X)
    np.fill_diagonal(d_np, 0.0)
    ref = np.median(silhouette_samples(d_np, y, metric="precomputed"))
    assert got == pytest.approx(ref, abs=1e-5)


@pytest.mark.parametrize("true_k", [3, 5, 7])
def test_opt_hclust_recovers_k(true_k):
    X, y = _blobs(20, true_k, 16, seed=true_k)
    n = len(y)
    npad = 160
    Xp, mask = _pad(X, npad)
    res = opt_hclust(
        Xp, mask, jnp.asarray(n), jnp.asarray(40),
        symmetric=False, minN=2, ncand=12, nc_pad=16,
    )
    assert int(res.k) == true_k
    assert adjusted_rand_score(y, np.asarray(res.labels)[:n]) == pytest.approx(1.0)
    assert float(res.maxsil) > 0.5


def test_fixed_N_cluster():
    X, y = _blobs(20, 4, 16, seed=9)
    n = len(y)
    Xp, mask = _pad(X, 96)
    res = opt_hclust(
        Xp, mask, jnp.asarray(n), jnp.asarray(40),
        symmetric=False, minN=2, ncand=10, nc_pad=16,
        N_cluster=jnp.asarray(2),
    )
    assert int(res.k) == 2


def test_symmetric_similarity_input():
    """Meta-clustering path: cluster a block-diagonal similarity matrix."""
    rng = np.random.default_rng(0)
    sizes = [6, 5, 7]
    n = sum(sizes)
    S = np.full((n, n), 0.05, np.float32)
    start = 0
    y = np.zeros(n, int)
    for ci, sz in enumerate(sizes):
        S[start : start + sz, start : start + sz] = 0.9
        y[start : start + sz] = ci
        start += sz
    S += rng.normal(scale=0.01, size=(n, n)).astype(np.float32)
    S = (S + S.T) / 2
    np.fill_diagonal(S, 1.0)

    npad = 24
    Sp = np.zeros((npad, npad), np.float32)
    Sp[:n, :n] = S
    mask = np.zeros(npad, bool)
    mask[:n] = True

    res = opt_hclust(
        jnp.asarray(Sp), jnp.asarray(mask), jnp.asarray(n), jnp.asarray(40),
        symmetric=True, minN=2, ncand=8, nc_pad=8,
        sil_thre=0.0,
    )
    assert int(res.k) == 3
    assert adjusted_rand_score(y, np.asarray(res.labels)[:n]) == pytest.approx(1.0)


def test_nested_sweep_matches_plain():
    """sweep_scores_nested == sweep_scores (up to fp association)."""
    import jax.numpy as jnp

    from sharp_tpu.ops.distance import pearson_distance, standardize_rows
    from sharp_tpu.ops.linkage import ward_linkage, cutree_multi
    from sharp_tpu.ops.silhouette import sweep_scores, sweep_scores_nested
    from sharp_tpu.ops.distance import _unit_rows

    for n, nreal, seed in [(64, 50, 0), (128, 128, 1)]:
        rng = np.random.default_rng(seed)
        X = np.zeros((n, 24), np.float32)
        X[:nreal] = rng.normal(size=(nreal, 24))
        mask = jnp.asarray(np.arange(n) < nreal)
        Z = standardize_rows(jnp.asarray(X), mask)
        D = pearson_distance(Z, mask)
        D_real = jnp.where(mask[:, None] & mask[None, :], D, 0.0)
        D_real = jnp.where(jnp.eye(n, dtype=bool), 0.0, D_real)
        feats = _unit_rows(Z) * mask[:, None].astype(jnp.float32)
        link = ward_linkage(D)
        nr = jnp.asarray(nreal)
        maxN = jnp.asarray(20)
        minN, ncand, nc_pad = 2, 19, 24
        cuts = cutree_multi(link.merges, nr, mask, maxN,
                            minN=minN, ncand=ncand, nc_pad=nc_pad)
        ks = (minN + jnp.arange(ncand)).astype(jnp.float32)
        m1, c1 = sweep_scores(D_real, feats, cuts.labels, ks, mask, nr,
                              nc_pad=nc_pad)
        m2, c2 = sweep_scores_nested(D_real, feats, link.merges,
                                     cuts.labels, mask, nr, maxN,
                                     minN=minN, ncand=ncand, nc_pad=nc_pad)
        valid = np.asarray(cuts.valid)
        np.testing.assert_allclose(np.asarray(m1)[valid],
                                   np.asarray(m2)[valid], rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c1)[valid],
                                   np.asarray(c2)[valid], rtol=2e-4)


def test_public_get_opt_hclust_and_gethclust():
    """Host-facing wrappers ~ ref get_opt_hclust / gethclust exports."""
    from scipy.spatial.distance import pdist, squareform
    from sklearn.metrics import adjusted_rand_score

    import sharp_tpu

    rng = np.random.default_rng(12)
    n = 100
    y = rng.integers(0, 4, n)
    X = (4.0 * np.eye(4)[y] @ rng.normal(size=(4, 12))
         + 0.2 * rng.normal(size=(n, 12))).astype(np.float32)

    res = sharp_tpu.get_opt_hclust(X)
    assert res["optN_cluster"] == 4
    assert adjusted_rand_score(y, res["f"]) == pytest.approx(1.0)
    assert res["f"].min() == 1  # 1-based like R
    assert res["v"].shape[1] == n

    # gethclust: precomputed distance + feature matrix
    d = squareform(pdist(X, metric="correlation")).astype(np.float32)
    res2 = sharp_tpu.gethclust(d, X)
    assert adjusted_rand_score(y, res2["f"]) == pytest.approx(1.0)
    assert len(res2["height"]) == n - 1


def test_saturated_median_silhouette_ch_tiebreak():
    """sMetaC-shape pathology: near-duplicate points (T fold-replicas per
    true cluster) saturate the median silhouette — k-1 and k cuts differ
    by ~1e-5 — and the argmax becomes float-noise. The CH near-tie
    re-ranking must recover the true k (observed on-device: msil
    k=10..13 within 6e-5, CH ratio 280x at the true cut)."""
    import jax.numpy as jnp

    from sharp_tpu.ops.select import opt_hclust

    rng = np.random.default_rng(4)
    true_k, reps, p = 12, 6, 64
    base = rng.normal(size=(true_k, p)).astype(np.float32) * 3.0
    pts = np.repeat(base, reps, axis=0)
    pts += rng.normal(size=pts.shape).astype(np.float32) * 1e-3
    NC = true_k * reps
    NC_pad = 128
    cents = np.zeros((NC_pad, p), np.float32)
    cents[:NC] = pts
    valid = np.arange(NC_pad) < NC
    mu = cents.mean(axis=1, keepdims=True)
    Xc = cents - mu
    U = Xc / np.sqrt((Xc * Xc).sum(axis=1, keepdims=True) + 1e-12)
    S = (U @ U.T).astype(np.float32)
    np.fill_diagonal(S, 1.0)

    res = opt_hclust(
        jnp.asarray(S), jnp.asarray(valid), jnp.asarray(NC),
        jnp.asarray(40),
        symmetric=True, minN=6, ncand=35, nc_pad=48,
        sil_thre=0.35, height_Ntimes=2.0,
    )
    assert int(res.k) == true_k, f"chose k={int(res.k)}, wanted {true_k}"
