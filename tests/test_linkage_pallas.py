"""Pallas single-kernel linkage parity tests (interpret mode on CPU).

On real TPU hardware the same kernel compiles natively; bf16 storage at
n=2048 was validated on-device to give ARI 1.0 clusterings vs the f32
reference path (see ops/linkage_pallas.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharp_tpu.ops.distance import pearson_distance, standardize_rows
from sharp_tpu.ops.linkage import ward_linkage
from sharp_tpu.ops.linkage_pallas import ward_linkage_pallas


def _problem(n, nreal, p, seed):
    rng = np.random.default_rng(seed)
    X = np.zeros((n, p), np.float32)
    X[:nreal] = rng.normal(size=(nreal, p))
    mask = jnp.asarray(np.arange(n) < nreal)
    return pearson_distance(standardize_rows(jnp.asarray(X), mask), mask)


@pytest.mark.parametrize("variant", ["full", "deferred"])
@pytest.mark.parametrize("n,nreal", [(64, 50), (128, 128), (256, 230)])
def test_pallas_matches_reference(n, nreal, variant):
    D = _problem(n, nreal, 24, seed=0)
    r1 = ward_linkage(D)
    r2 = ward_linkage_pallas(D, interpret=True, variant=variant)
    np.testing.assert_array_equal(
        np.asarray(r1.merges)[: nreal - 1], np.asarray(r2.merges)[: nreal - 1]
    )
    np.testing.assert_allclose(
        np.asarray(r1.heights)[: nreal - 1],
        np.asarray(r2.heights)[: nreal - 1],
        rtol=1e-6,
    )


@pytest.mark.parametrize("variant", ["full", "deferred"])
def test_pallas_batched(variant):
    K, n = 3, 96
    rng = np.random.default_rng(1)
    Xb = jnp.asarray(rng.normal(size=(K, n, 16)), jnp.float32)
    mask = jnp.ones(n, bool)
    Db = jax.vmap(lambda x: pearson_distance(standardize_rows(x, mask), mask))(Xb)
    r1 = jax.vmap(ward_linkage)(Db)
    r2 = ward_linkage_pallas(Db, interpret=True, variant=variant)
    np.testing.assert_array_equal(np.asarray(r1.merges), np.asarray(r2.merges))


def test_pallas_bf16_quality():
    """bf16 storage: merge order may flip on ties but clusterings agree."""
    from sklearn.metrics import adjusted_rand_score

    from sharp_tpu.ops.linkage import cutree_multi

    n = 128
    rng = np.random.default_rng(2)
    # well-separated blobs so rounding can't change the k=4 cut
    y = rng.integers(0, 4, n)
    X = (3.0 * np.eye(4)[y] @ rng.normal(size=(4, 16)) +
         0.1 * rng.normal(size=(n, 16))).astype(np.float32)
    mask = jnp.ones(n, bool)
    D = pearson_distance(standardize_rows(jnp.asarray(X), mask), mask)
    r1 = ward_linkage(D)
    r2 = ward_linkage_pallas(D, store_dtype=jnp.bfloat16, interpret=True)
    c1 = cutree_multi(r1.merges, jnp.asarray(n), mask, jnp.asarray(40),
                      minN=4, ncand=1, nc_pad=16)
    c2 = cutree_multi(r2.merges, jnp.asarray(n), mask, jnp.asarray(40),
                      minN=4, ncand=1, nc_pad=16)
    ari = adjusted_rand_score(np.asarray(c1.labels)[0], np.asarray(c2.labels)[0])
    assert ari == pytest.approx(1.0)


@pytest.mark.parametrize("n,nreal", [(64, 50), (128, 128)])
def test_pallas_cutree_matches_xla(n, nreal):
    from sharp_tpu.ops.linkage import cutree_multi
    from sharp_tpu.ops.linkage_pallas import cutree_multi_pallas

    D = _problem(n, nreal, 24, seed=3)
    link = ward_linkage(D)
    mask = jnp.asarray(np.arange(n) < nreal)
    nr = jnp.asarray(nreal)
    maxN = jnp.asarray(40)
    c1 = cutree_multi(link.merges, nr, mask, maxN, minN=2, ncand=13, nc_pad=16)
    c2 = cutree_multi_pallas(
        link.merges, nr, mask, maxN, minN=2, ncand=13, nc_pad=16,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(c1.labels), np.asarray(c2.labels))
    np.testing.assert_array_equal(np.asarray(c1.k), np.asarray(c2.k))
    np.testing.assert_array_equal(np.asarray(c1.valid), np.asarray(c2.valid))


def test_pallas_cutree_batched():
    """vmap over members with an unbatched n_real flattens into the grid."""
    from sharp_tpu.ops.linkage import cutree_multi
    from sharp_tpu.ops.linkage_pallas import cutree_multi_pallas

    K, n = 3, 96
    rng = np.random.default_rng(4)
    Xb = jnp.asarray(rng.normal(size=(K, n, 16)), jnp.float32)
    mask = jnp.ones(n, bool)
    Db = jax.vmap(lambda x: pearson_distance(standardize_rows(x, mask), mask))(Xb)
    links = jax.vmap(ward_linkage)(Db)
    nr = jnp.asarray(n)
    maxN = jnp.asarray(20)

    def xla_one(mg):
        return cutree_multi(mg, nr, mask, maxN, minN=2, ncand=7, nc_pad=16)

    def pl_one(mg):
        return cutree_multi_pallas(
            mg, nr, mask, maxN, minN=2, ncand=7, nc_pad=16, interpret=True
        )

    c1 = jax.vmap(xla_one)(links.merges)
    c2 = jax.vmap(pl_one)(links.merges)
    np.testing.assert_array_equal(np.asarray(c1.labels), np.asarray(c2.labels))
    np.testing.assert_array_equal(np.asarray(c1.k), np.asarray(c2.k))
