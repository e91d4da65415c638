"""Tests for the analysis layer: ARI metrics, marker genes, per-cluster
split, and the embedding."""

import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu.analysis.ari import ari, rand_metrics
from sharp_tpu.analysis.markers import get_marker_genes, _holm
from sharp_tpu.analysis.percluster import get_percluster_exp
from sharp_tpu.analysis.embed import visualization_embedding
from tests.synth import make_tpm_like


def test_ari_matches_sklearn():
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.integers(0, 5, 200)
        b = rng.integers(0, 4, 200)
        assert ari(a, b) == pytest.approx(adjusted_rand_score(a, b), abs=1e-10)


def test_rand_metrics_perfect_agreement():
    y = np.array([0, 0, 1, 1, 2, 2, 2])
    m = rand_metrics(y, y + 10)  # label names don't matter
    assert m["HA"] == pytest.approx(1.0)
    assert m["Rand"] == pytest.approx(1.0)
    assert m["FM"] == pytest.approx(1.0)
    assert m["Jaccard"] == pytest.approx(1.0)


def test_rand_metrics_string_labels():
    truth = np.array(["a", "a", "b", "b", "c"])
    pred = np.array([1, 1, 2, 2, 3])
    assert ari(truth, pred) == pytest.approx(1.0)


def test_holm_matches_r_semantics():
    p = np.array([0.01, 0.04, 0.03, 0.005])
    adj = _holm(p)
    # R: p.adjust(c(.01,.04,.03,.005), "holm") -> 0.03 0.06 0.06 0.02
    np.testing.assert_allclose(adj, [0.03, 0.06, 0.06, 0.02], atol=1e-12)


def test_marker_genes_finds_planted_markers():
    rng = np.random.default_rng(5)
    n, D, C = 300, 400, 3
    y = rng.integers(1, C + 1, n)
    X = rng.lognormal(0.5, 0.5, size=(n, D)).astype(np.float32)
    # plant 5 clean markers per cluster
    planted = {}
    for c in range(1, C + 1):
        cols = np.arange((c - 1) * 5, c * 5) + 50
        X[y == c][:, cols]  # noqa
        X[np.ix_(y == c, cols)] *= 30.0
        planted[c] = set(cols)

    res = get_marker_genes(X, y)
    assert res.n_markers >= C  # every cluster keeps at least one marker
    found = {c: set() for c in planted}
    for g, c in zip(res.mginfo["gene_index"], res.mginfo["cluster"]):
        found[int(c)].add(int(g))
    for c in planted:
        hits = planted[c] & found[c]
        assert len(hits) >= 3, f"cluster {c}: planted {planted[c]} found {found[c]}"
    # AUC of planted markers should be high
    top = res.mginfo
    assert np.all(top["auc"] >= res.adauc - 1e-9)
    assert np.all(np.diff(np.searchsorted(np.unique(top["cluster"]), top["cluster"])) >= 0)


def test_marker_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    n = 150
    y = (rng.random(n) < 0.4).astype(int)
    x = rng.normal(size=n) + 1.2 * y
    X = np.stack([x, rng.normal(size=n)], axis=1).astype(np.float32)
    labels = y + 1
    res = get_marker_genes(X, labels, theta=0.0, p_thre=1.1, fc_thre=0.0)
    g0 = res.gallinfo
    # gene 0's best cluster should be cluster 2 (the y==1 group, higher expr)
    assert g0["cluster"][0] == 2
    ref_auc = roc_auc_score(y, x)
    assert g0["auc"][0] == pytest.approx(ref_auc, abs=1e-5)


def test_wilcoxon_p_matches_scipy():
    from scipy.stats import mannwhitneyu

    rng = np.random.default_rng(2)
    n = 120
    y = (rng.random(n) < 0.5).astype(int)
    x = rng.normal(size=n) + 0.6 * y
    X = x[:, None].astype(np.float32)
    res = get_marker_genes(X, y + 1, theta=0.0, p_thre=1.1, fc_thre=0.0)
    ref = mannwhitneyu(x[y == 1], x[y == 0], alternative="two-sided").pvalue
    assert res.gallinfo["pvalue"][0] == pytest.approx(ref, rel=1e-3)


def test_marker_genes_blocked_input_matches_full():
    rng = np.random.default_rng(9)
    n, D = 150, 120
    y = rng.integers(1, 4, n)
    X = rng.lognormal(0.5, 0.5, (n, D)).astype(np.float32)
    X[np.ix_(y == 2, np.arange(10))] *= 20.0
    full = get_marker_genes(X, y, chunk=50)
    blocked = get_marker_genes([X[:60], X[60:110], X[110:]], y, chunk=50)
    np.testing.assert_array_equal(
        full.mginfo["gene_index"], blocked.mginfo["gene_index"]
    )
    np.testing.assert_allclose(
        full.mginfo["auc"], blocked.mginfo["auc"], rtol=1e-6
    )
    np.testing.assert_allclose(full.mat, blocked.mat, rtol=1e-6)


def test_run_mtimes():
    from sharp_tpu import run_mtimes
    from tests.synth import make_tpm_like

    X, y = make_tpm_like(n_cells=120, n_genes=300, n_types=3, seed=15)
    grid = run_mtimes(X, mtimes=2, k_set=[3, 5], rN_seed=11)
    assert len(grid) == 2 and all(len(row) == 2 for row in grid)
    assert grid[0][0].paras["ensize_K"] == 3
    assert grid[1][0].paras["ensize_K"] == 5
    # same seed offset per repeat is deterministic across K rows
    assert grid[0][0].paras["rN_seed"] == 11
    assert grid[0][1].paras["rN_seed"] == 12


def test_percluster_split():
    X = np.arange(20, dtype=np.float32).reshape(10, 2)
    y = np.array([1, 1, 2, 2, 2, 1, 3, 3, 1, 2])
    parts = get_percluster_exp(X, y)
    assert set(parts) == {1, 2, 3}
    assert parts[1].shape == (4, 2)
    assert parts[2].shape == (4, 2)
    assert parts[3].shape == (2, 2)
    np.testing.assert_array_equal(parts[3], X[[6, 7]])


def test_embedding_separates_clusters():
    from sharp_tpu.types import SharpResult

    rng = np.random.default_rng(3)
    n, C = 120, 3
    y = rng.integers(0, C, n)
    x0 = np.eye(C, dtype=np.float32)[y] + 0.05 * rng.random((n, C)).astype(np.float32)
    viE = (y[:, None] * 2.0 + rng.normal(size=(n, 8))).astype(np.float32)
    res = SharpResult(
        pred_clusters=y + 1,
        N_pred_cluster=C,
        unique_pred_clusters=[1, 2, 3],
        distr_pred_clusters={},
        viE=viE,
        x0=x0,
    )
    emb, idx = visualization_embedding(res, n_iter=300)
    assert emb.shape == (n, 2)
    assert np.all(np.isfinite(emb))
    # within-cluster spread should be far below between-cluster spread
    cent = np.stack([emb[y == c].mean(0) for c in range(C)])
    within = np.mean([np.mean(np.linalg.norm(emb[y == c] - cent[c], axis=1)) for c in range(C)])
    between = np.mean(
        [np.linalg.norm(cent[a] - cent[b]) for a in range(C) for b in range(a + 1, C)]
    )
    assert between > 3 * within


def test_marker_genes_unlimited2_gene_partitioned(tmp_path):
    """Gene-partitioned input (directory of gene-block files, the
    reference's get_marker_genes_unlimited2 form, R :159-162) matches the
    single-matrix result run at the same thresholds."""
    from sharp_tpu.analysis.markers import (
        get_marker_genes,
        get_marker_genes_unlimited2,
    )
    from sharp_tpu.io.blocks import BlockStore

    rng = np.random.default_rng(3)
    n, D, C = 150, 90, 3
    y = rng.integers(1, C + 1, n)
    X = rng.poisson(1.0, size=(n, D)).astype(np.float32)
    for c in range(C):
        X[y == c + 1, c * 10 : c * 10 + 6] += rng.poisson(
            6.0, size=((y == c + 1).sum(), 6)
        )

    # matched thresholds: unlimited2 presets + its top-10 candidate rule
    ref = get_marker_genes(
        X, y, theta=1e-5, auc_thre=0.85, p_thre=0.05,
    )
    split = [X[:, :40], X[:, 40:70], X[:, 70:]]
    r_list = get_marker_genes_unlimited2(
        split, y, ng=1,
    )
    # ng=1 reduces to the base candidate rule -> identical selection
    np.testing.assert_array_equal(
        ref.mginfo["gene_index"], r_list.mginfo["gene_index"]
    )
    np.testing.assert_allclose(ref.mat, r_list.mat, rtol=1e-5)

    # directory-of-files form, default top-10 rule
    d = tmp_path / "gblocks"
    d.mkdir()
    for i, b in enumerate(split):
        np.savez(d / f"genes_{i}.npz", X=b)
    r_dir = get_marker_genes_unlimited2(str(d), y)
    assert r_dir.n_markers >= C  # every cluster keeps a marker
    assert set(np.unique(r_dir.mginfo["cluster"])) == set(range(1, C + 1))
    # stats columns agree with the in-memory list form at the same rule
    r_list10 = get_marker_genes_unlimited2(split, y)
    np.testing.assert_array_equal(
        r_dir.mginfo["gene_index"], r_list10.mginfo["gene_index"]
    )
