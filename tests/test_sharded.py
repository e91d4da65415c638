"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu import sharp
from sharp_tpu.parallel.mesh import make_mesh
from tests.synth import make_tpm_like


def test_mesh_construction():
    mesh = make_mesh(n_data=4, n_ens=2)
    assert mesh.shape == {"data": 4, "ens": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())


def test_sharded_matches_loop():
    """Sharded fold pass must give the same clustering as the host loop."""
    X, y = make_tpm_like(n_cells=900, n_genes=600, n_types=5, seed=13)
    kw = dict(
        rN_seed=5, base_ncells=400, partition_ncells=220, ensize_K=4,
    )
    r_loop = sharp(X, n_devices=1, **kw)
    r_shard = sharp(X, n_devices=4, **kw)
    # identical up to label naming (both deterministic from the same key)
    assert (
        adjusted_rand_score(r_loop.pred_clusters, r_shard.pred_clusters)
        == pytest.approx(1.0)
    )
    ari = adjusted_rand_score(y, r_shard.pred_clusters)
    assert ari >= 0.9, f"sharded large-path ARI {ari:.4f}"


def test_sharded_uneven_folds():
    """T not divisible by the mesh size exercises dummy-fold padding."""
    X, y = make_tpm_like(n_cells=700, n_genes=500, n_types=4, seed=17)
    res = sharp(
        X, rN_seed=3, base_ncells=300, partition_ncells=220,
        ensize_K=3, n_devices=4,
    )
    assert len(res.pred_clusters) == 700
    assert adjusted_rand_score(y, res.pred_clusters) >= 0.9


def test_sharded_rnn_backend():
    """The RNN linkage's while-rounds must compile and run under SPMD
    sharding (vmapped cond -> cross-shard lockstep all-reduce) and give
    exactly the xla backend's clustering."""
    X, y = make_tpm_like(n_cells=700, n_genes=500, n_types=4, seed=19)
    kw = dict(rN_seed=5, base_ncells=400, partition_ncells=160, ensize_K=3)
    r_ref = sharp(X, n_devices=1, linkage_backend="xla", **kw)
    r_rnn = sharp(X, n_devices=4, linkage_backend="rnn", **kw)
    np.testing.assert_array_equal(r_ref.pred_clusters, r_rnn.pred_clusters)


def test_ens_axis_sharding_matches_loop():
    """The ensemble mesh axis must CARRY the K members (R_all
    column-sharded over "ens", one label all-gather per fold) and still
    produce the identical clustering as the single-device host loop."""
    X, y = make_tpm_like(n_cells=900, n_genes=600, n_types=5, seed=13)
    kw = dict(
        rN_seed=5, base_ncells=400, partition_ncells=220, ensize_K=4,
    )
    r_loop = sharp(X, n_devices=1, **kw)
    r_ens = sharp(X, n_devices=8, ensemble_axis=2, **kw)
    np.testing.assert_array_equal(r_loop.pred_clusters, r_ens.pred_clusters)
    assert adjusted_rand_score(y, r_ens.pred_clusters) >= 0.9
