"""Tests for ternary very-sparse random projection (sharp_tpu/ops/rp.py).

Parity model: entry distribution and scaling of R/ranM.R:17-30 and
R/RPmat.R:32; the JL distance-preservation property the pipeline relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharp_tpu.ops.rp import (
    ternary_rp_matrix,
    ensemble_rp_matrix,
    rp_project,
    rp_project_ensemble,
)


def test_entry_distribution():
    m, p = 4096, 128
    key = jax.random.PRNGKey(0)
    R = np.asarray(ternary_rp_matrix(key, m, p))
    s = np.sqrt(m)
    root_s = np.sqrt(s)
    vals = np.unique(R)
    assert set(np.round(vals, 5)).issubset(
        {np.round(-root_s, 5), 0.0, np.round(root_s, 5)}
    )
    density = np.mean(R != 0)
    expect = 1.0 / s
    assert abs(density - expect) < 0.3 * expect
    # symmetric +/-
    pos = np.mean(R > 0)
    neg = np.mean(R < 0)
    assert abs(pos - neg) < 0.2 * expect
    # unit second moment => JL scaling works
    assert abs(np.mean(R**2) - 1.0) < 0.1


def test_deterministic_regeneration():
    key = jax.random.PRNGKey(7)
    R1 = ternary_rp_matrix(key, 512, 64)
    R2 = ternary_rp_matrix(key, 512, 64)
    np.testing.assert_array_equal(np.asarray(R1), np.asarray(R2))


def test_projection_scaling():
    key = jax.random.PRNGKey(1)
    m, n, p = 300, 50, 64
    X = jax.random.normal(jax.random.PRNGKey(2), (n, m))
    R = ternary_rp_matrix(key, m, p)
    out = rp_project(X, R)
    ref = (np.asarray(X) @ np.asarray(R)) / np.sqrt(p)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_log_fusion():
    key = jax.random.PRNGKey(1)
    m, n, p = 128, 20, 32
    X = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (n, m))) * 10
    R = ternary_rp_matrix(key, m, p)
    out = rp_project(X, R, log_transform=True)
    ref = (np.log2(1 + np.asarray(X)) @ np.asarray(R)) / np.sqrt(p)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_ensemble_matches_members():
    key = jax.random.PRNGKey(9)
    K, m, n, p = 3, 256, 40, 32
    X = jax.random.normal(jax.random.PRNGKey(4), (n, m))
    R_all = ensemble_rp_matrix(key, K, m, p)
    assert R_all.shape == (m, K * p)
    ens = rp_project_ensemble(X, R_all, K=K)
    assert ens.shape == (K, n, p)
    from sharp_tpu.utils.prng import member_key

    for k in range(K):
        Rk = ternary_rp_matrix(member_key(key, k), m, p)
        ref = rp_project(X, Rk)
        np.testing.assert_allclose(
            np.asarray(ens[k]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_jl_distance_preservation():
    """Pairwise distances survive projection within JL tolerance."""
    rng = np.random.default_rng(0)
    m, n, p = 8192, 30, 256
    X = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    R = ternary_rp_matrix(jax.random.PRNGKey(5), m, p)
    Y = np.asarray(rp_project(X, R))
    Xn = np.asarray(X)

    def pdist2(A):
        G = A @ A.T
        d = np.diag(G)
        return d[:, None] + d[None, :] - 2 * G

    dx = pdist2(Xn)
    dy = pdist2(Y)
    iu = np.triu_indices(n, 1)
    ratio = dy[iu] / dx[iu]
    assert abs(np.mean(ratio) - 1.0) < 0.05
    assert np.std(ratio) < 0.25
