"""Large-path tests: fold partitioning + per-fold wMetaC + global sMetaC.

Follows the reference's own recipe for exercising the partitioned path on
small inputs — force base.ncells/partition.ncells down
(README.md:147-154: `SHARP(scExp, base.ncells=2000, partition.ncells=1000)`).
"""

import jax
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu import sharp
from sharp_tpu.core.large import fold_sizes
from tests.synth import make_tpm_like


def test_fold_sizes_rebalancing():
    # exact partition
    assert fold_sizes(4000, 2000) == [2000, 2000]
    # small remainder is rebalanced across the last two folds
    sizes = fold_sizes(4100, 2000)
    assert sum(sizes) == 4100
    assert len(sizes) == 3
    assert sizes[0] == 2000
    assert abs(sizes[1] - sizes[2]) <= 1
    assert min(sizes) >= 1000
    # single fold
    assert fold_sizes(1500, 2000) == [1500]


def test_large_path_ari():
    X, y = make_tpm_like(n_cells=1200, n_genes=1500, n_types=6, seed=21)
    res = sharp(
        X,
        rN_seed=7,
        base_ncells=500,        # force the large path
        partition_ncells=300,   # -> 4 folds
        ensize_K=5,
        exp_type="TPM",
    )
    assert len(res.pred_clusters) == 1200
    ari = adjusted_rand_score(y, res.pred_clusters)
    assert ari >= 0.9, f"large-path ARI {ari:.4f}"
    assert res.folds is not None and res.folds.max() >= 2
    assert res.viE.shape == (1200, res.paras["reduced_ndim"])
    u = np.unique(res.pred_clusters)
    assert np.array_equal(u, np.arange(1, len(u) + 1))


def test_large_path_reproducible():
    X, y = make_tpm_like(n_cells=900, n_genes=800, n_types=4, seed=33)
    kw = dict(rN_seed=11, base_ncells=400, partition_ncells=250, ensize_K=4)
    r1 = sharp(X, **kw)
    r2 = sharp(X, **kw)
    np.testing.assert_array_equal(r1.pred_clusters, r2.pred_clusters)


def test_fold_program_rnn_backend_matches_xla():
    """The rnn linkage backend (pure XLA, the TPU production path for
    n_pad > 1024) produces the same fold summary as the xla loop."""
    import jax.numpy as jnp

    from sharp_tpu.config import resolve_config
    from sharp_tpu.core.fold import fold_program, fold_static_args
    from sharp_tpu.ops.rp import ensemble_rp_matrix
    from synth import make_tpm_like

    X, y = make_tpm_like(n_cells=200, n_genes=300, n_types=4, seed=11)
    cfg = resolve_config(200, 300, ensize_K=3, reduced_ndim=32,
                         partition_ncells=256, rN_seed=3)
    static = fold_static_args(cfg)
    Xp = jnp.zeros((256, 300), jnp.float32).at[:200].set(X)
    mask = jnp.arange(256) < 200
    R = ensemble_rp_matrix(jax.random.PRNGKey(3), 3, 300, 32)

    outs = {}
    for backend in ("xla", "rnn"):
        st = dict(static, linkage_backend=backend)
        s = fold_program(Xp, mask, jnp.asarray(200), R, jnp.asarray(True),
                         None, has_indN=False, **st)
        outs[backend] = np.asarray(s.finalC)
    np.testing.assert_array_equal(outs["xla"], outs["rnn"])

