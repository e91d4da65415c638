"""Tests for weighted meta-clustering (sharp_tpu/core/wmetac.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu.core.wmetac import wmetac


def _noisy_ensemble(y, K, flip_frac, nc_pad, rng):
    """K labelings of ground truth y with flip_frac of cells scrambled,
    each member using its own random permutation of cluster ids."""
    n = len(y)
    C = y.max() + 1
    cols = []
    for k in range(K):
        perm = rng.permutation(C)
        lab = perm[y]
        nflip = int(flip_frac * n)
        idx = rng.choice(n, nflip, replace=False)
        lab[idx] = rng.integers(0, C, nflip)
        cols.append(lab)
    return np.stack(cols, axis=1).astype(np.int32)


@pytest.mark.parametrize("C,K", [(3, 5), (6, 8)])
def test_consensus_recovers_truth(C, K):
    rng = np.random.default_rng(C * 10 + K)
    n, npad, nc_pad = 90, 128, 16
    y = rng.integers(0, C, n)
    labels = _noisy_ensemble(y, K, flip_frac=0.12, nc_pad=nc_pad, rng=rng)

    lab_p = np.full((npad, K), nc_pad - 1, np.int32)
    lab_p[:n] = labels
    mask = np.zeros(npad, bool)
    mask[:n] = True

    res = wmetac(
        jnp.asarray(lab_p), jnp.asarray(mask), jnp.asarray(n),
        jnp.asarray(40), K=K, nc_pad=nc_pad, allc_pad=128, meta_ncand=15,
    )
    finalC = np.asarray(res.finalC)[:n]
    assert adjusted_rand_score(y, finalC) > 0.95
    assert int(res.n_meta) == C
    assert not bool(res.overflow)
    # pads routed to garbage
    assert np.all(np.asarray(res.finalC)[n:] == nc_pad - 1)


def test_perfect_agreement_is_identity():
    rng = np.random.default_rng(0)
    n, npad, K, nc_pad = 60, 64, 4, 16
    y = rng.integers(0, 4, n)
    labels = np.stack([y] * K, axis=1).astype(np.int32)
    lab_p = np.full((npad, K), nc_pad - 1, np.int32)
    lab_p[:n] = labels
    mask = np.zeros(npad, bool)
    mask[:n] = True
    res = wmetac(
        jnp.asarray(lab_p), jnp.asarray(mask), jnp.asarray(n),
        jnp.asarray(40), K=K, nc_pad=nc_pad, allc_pad=64, meta_ncand=10,
    )
    assert adjusted_rand_score(y, np.asarray(res.finalC)[:n]) == pytest.approx(1.0)


def test_x0_structure():
    rng = np.random.default_rng(1)
    n, npad, K, nc_pad = 50, 64, 5, 16
    y = rng.integers(0, 3, n)
    labels = _noisy_ensemble(y, K, flip_frac=0.1, nc_pad=nc_pad, rng=rng)
    lab_p = np.full((npad, K), nc_pad - 1, np.int32)
    lab_p[:n] = labels
    mask = np.zeros(npad, bool)
    mask[:n] = True
    res = wmetac(
        jnp.asarray(lab_p), jnp.asarray(mask), jnp.asarray(n),
        jnp.asarray(40), K=K, nc_pad=nc_pad, allc_pad=64, meta_ncand=10,
    )
    x0 = np.asarray(res.x0)
    finalC = np.asarray(res.finalC)
    for i in range(n):
        assert x0[i, finalC[i]] == pytest.approx(1.0)
        others = np.delete(x0[i], finalC[i])
        assert np.all(others <= 0.5 + 1e-6)
    assert np.all(x0[n:] == 0.0)
