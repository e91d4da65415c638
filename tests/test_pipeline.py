"""End-to-end small-path pipeline tests (the reference's own smoke test is
Wang pancreas 479x~20k -> ARI >= 0.92, README.md:94-108; the TPM matrix is
a stripped blob in this mount so the gate runs on TPM-like synthetic data
of the same shape class)."""

import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu import sharp
from tests.synth import make_tpm_like


def test_small_path_golden_ari():
    X, y = make_tpm_like(n_cells=479, n_genes=2000, n_types=7, seed=3)
    res = sharp(X, rN_seed=2103, exp_type="TPM")
    assert len(res.pred_clusters) == 479
    ari = adjusted_rand_score(y, res.pred_clusters)
    assert ari >= 0.92, f"ARI {ari:.4f} below golden gate"
    assert res.N_pred_cluster == len(res.unique_pred_clusters)
    assert sum(res.distr_pred_clusters.values()) == 479
    assert res.viE.shape[0] == 479
    assert res.x0.shape[0] == 479
    assert res.paras["ensize_K"] == 15


def test_reproducible_with_seed():
    X, y = make_tpm_like(n_cells=200, n_genes=500, n_types=4, seed=5)
    r1 = sharp(X, rN_seed=42, ensize_K=5)
    r2 = sharp(X, rN_seed=42, ensize_K=5)
    np.testing.assert_array_equal(r1.pred_clusters, r2.pred_clusters)


def test_fixed_N_cluster():
    X, y = make_tpm_like(n_cells=150, n_genes=400, n_types=3, seed=7)
    res = sharp(X, rN_seed=1, ensize_K=5, N_cluster=3)
    assert res.N_pred_cluster == 3


def test_labels_one_based_contiguous():
    X, y = make_tpm_like(n_cells=120, n_genes=300, n_types=3, seed=11)
    res = sharp(X, rN_seed=9, ensize_K=5)
    u = np.unique(res.pred_clusters)
    assert u.min() == 1
    assert np.array_equal(u, np.arange(1, len(u) + 1))


def test_alternative_hmethod():
    """hmethod knob reaches the linkage (R supports several agglomeration
    methods, R/get_opt_hclust.R:7)."""
    X, y = make_tpm_like(n_cells=150, n_genes=400, n_types=3, seed=7)
    res = sharp(X, rN_seed=1, ensize_K=4, hmethod="average")
    assert len(res.pred_clusters) == 150
    assert res.paras["hmethod"] == "average"
    ari = adjusted_rand_score(y, res.pred_clusters)
    assert ari >= 0.8, f"average-linkage ARI {ari:.3f}"


def test_sharp_rM_injection():
    """sharp(rM=...) injects pre-generated RP matrices (the reference's
    rM driver argument, R/SHARP.R:541-549): injecting the exact matrices
    the default run would generate reproduces it bit-for-bit, both as a
    stacked array and as a per-member list; a wrong shape fails loud."""
    import jax.numpy as jnp

    from sharp_tpu.config import resolve_config
    from sharp_tpu.ops.rp import ensemble_rp_matrix
    from sharp_tpu.utils.prng import seed_to_key

    X, y = make_tpm_like(n_cells=300, n_genes=400, n_types=4, seed=8)
    kw = dict(rN_seed=11, ensize_K=3, prep=False)
    r0 = sharp(X, **kw)

    cfg = resolve_config(X.shape[0], X.shape[1], **kw)
    R = ensemble_rp_matrix(
        seed_to_key(cfg.rN_seed), cfg.ensize_K, X.shape[1],
        cfg.reduced_ndim, dtype=jnp.dtype(cfg.dtype_compute),
    )
    r1 = sharp(X, rM=np.asarray(R), **kw)
    np.testing.assert_array_equal(r0.pred_clusters, r1.pred_clusters)

    p = cfg.reduced_ndim
    mats = [np.asarray(R)[:, k * p : (k + 1) * p] for k in range(3)]
    r2 = sharp(X, rM=mats, **kw)
    np.testing.assert_array_equal(r0.pred_clusters, r2.pred_clusters)

    with pytest.raises(ValueError, match="rM has shape"):
        sharp(X, rM=np.zeros((X.shape[1], 7), np.float32), **kw)


def test_reference_noop_knobs_accepted():
    """`n.cores` / `flashmark` are reference knobs with no meaning on
    this backend (fork-pool size -> device mesh; hclust impl switch ->
    linkage_backend); they are accepted and ignored for signature parity
    (R/SHARP.R:162-167, R/get_opt_hclust.R:76-83)."""
    X, y = make_tpm_like(n_cells=150, n_genes=300, n_types=3, seed=9)
    r1 = sharp(X, rN_seed=5, ensize_K=3)
    r2 = sharp(X, rN_seed=5, ensize_K=3, n_cores=8, flashmark=True)
    np.testing.assert_array_equal(r1.pred_clusters, r2.pred_clusters)
