"""Batched silhouette and Calinski-Harabasz over candidate cluster counts.

The reference loops k = 2..40 calling `cluster::silhouette` and
`clues::get_CH` per cut on the same n x n distance matrix
(R/get_opt_hclust.R:129-154). Here every candidate cut is evaluated in one
batch: per-cell-per-cluster distance sums are a single (n, n) x (n, nc_pad)
matmul per candidate (MXU), vmapped over the candidate axis; the distance
matrix is computed once and reused.

Conventions matched to the reference:
  * silhouette summary = *median* of per-cell widths (R/get_opt_hclust.R:137)
  * singleton clusters get width 0 (cluster::silhouette convention)
  * CH follows clues::get_CH's "1-corr" variant: between/within dispersions
    measured as (1 - Pearson) of points/centroids to their means
    (R/get_opt_hclust.R:144). clues is an archived CRAN package; the
    closed-form here is the standard CH generalization with that distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def masked_median(x: jax.Array, mask: jax.Array, n_valid: jax.Array) -> jax.Array:
    """Median of x over entries where mask, R-style (mean of two middles)."""
    xs = jnp.sort(jnp.where(mask, x, _INF))
    lo = xs[jnp.maximum((n_valid - 1) // 2, 0)]
    hi = xs[jnp.maximum(n_valid // 2, 0)]
    return 0.5 * (lo + hi)


def _onehot(labels: jax.Array, real_mask: jax.Array, nc_pad: int) -> jax.Array:
    oh = jax.nn.one_hot(labels, nc_pad, dtype=jnp.float32)
    return oh * real_mask[:, None].astype(jnp.float32)


def silhouette_median(
    D_real: jax.Array,
    labels: jax.Array,
    real_mask: jax.Array,
    n_real: jax.Array,
    nc_pad: int,
) -> jax.Array:
    """Median silhouette width of one labelling.

    D_real: (n, n) with pad rows/cols zeroed and zero diagonal.
    labels: (n,) dense ids in [0, k); padded cells at nc_pad-1.
    """
    oh = _onehot(labels, real_mask, nc_pad)          # (n, nc_pad)
    counts = jnp.sum(oh, axis=0)                      # (nc_pad,)
    sums = jnp.dot(D_real, oh, preferred_element_type=jnp.float32)  # (n, nc_pad)

    # own-cluster selections as one-hot contractions — row gathers lower to
    # element-at-a-time loops on TPU and dominate the sweep otherwise
    own = labels
    own_count = jnp.sum(oh * counts[None, :], axis=1)
    own_sum = jnp.sum(oh * sums, axis=1)
    a = own_sum / jnp.maximum(own_count - 1.0, 1.0)

    mean_other = sums / jnp.maximum(counts[None, :], 1.0)
    # exclude own cluster, empty clusters, and the garbage pad slot
    slot = jnp.arange(nc_pad)[None, :]
    excl = (slot == own[:, None]) | (counts[None, :] < 0.5) | (slot == nc_pad - 1)
    b = jnp.min(jnp.where(excl, _INF, mean_other), axis=1)

    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12)
    s = jnp.where(own_count <= 1.5, 0.0, s)           # singleton convention
    s = jnp.where(jnp.isfinite(b), s, 0.0)            # k == 1 edge
    return masked_median(s, real_mask, n_real)


def ch_index(
    feats_unit: jax.Array,
    labels: jax.Array,
    real_mask: jax.Array,
    n_real: jax.Array,
    k: jax.Array,
    nc_pad: int,
) -> jax.Array:
    """Calinski-Harabasz with 1-corr dispersion (clues::get_CH semantics).

    feats_unit: (n, p) rows centered+unit-normalized (so corr = dot).
    """
    rm = real_mask.astype(jnp.float32)
    oh = _onehot(labels, real_mask, nc_pad)           # (n, nc_pad)
    counts = jnp.sum(oh, axis=0)
    cent = jnp.dot(oh.T, feats_unit, preferred_element_type=jnp.float32)
    cent = cent / jnp.maximum(counts[:, None], 1.0)   # (nc_pad, p)

    def unit(v):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        vc = v - mu
        return vc * jax.lax.rsqrt(jnp.sum(vc * vc, axis=-1, keepdims=True) + 1e-12)

    cent_u = unit(cent)
    # within: sum over cells of (1 - corr(x_i, centroid_own)); the row
    # gather cent_u[labels] becomes a (n, p) x (p, nc) matmul + one-hot
    # select (TPU row gathers are element-at-a-time)
    fc = jnp.dot(feats_unit, cent_u.T, preferred_element_type=jnp.float32)
    corr_own = jnp.sum(oh * fc, axis=-1)
    W = jnp.sum(jnp.where(real_mask, 1.0 - corr_own, 0.0))
    # between: sum over clusters of n_c * (1 - corr(centroid_c, global mean))
    g = jnp.sum(feats_unit * rm[:, None], axis=0) / jnp.maximum(n_real, 1)
    g_u = unit(g[None, :])[0]
    corr_cg = jnp.sum(cent_u * g_u[None, :], axis=-1)
    slot_valid = (counts > 0.5) & (jnp.arange(nc_pad) != nc_pad - 1)
    B = jnp.sum(jnp.where(slot_valid, counts * (1.0 - corr_cg), 0.0))

    denom_ok = (k > 1) & (n_real > k)
    ch = (B / jnp.maximum(k - 1.0, 1.0)) / jnp.maximum(
        W / jnp.maximum(n_real - k.astype(jnp.float32), 1.0), 1e-12
    )
    return jnp.where(denom_ok, ch, 0.0)


@functools.partial(jax.jit, static_argnames=("nc_pad",))
def sweep_scores(
    D_real: jax.Array,
    feats_unit: jax.Array,
    labels_all: jax.Array,   # (ncand, n)
    ks: jax.Array,           # (ncand,)
    real_mask: jax.Array,
    n_real: jax.Array,
    *,
    nc_pad: int,
):
    """Median silhouette + CH for every candidate cut. Returns (msil, ch)."""
    def one(labels, k):
        msil = silhouette_median(D_real, labels, real_mask, n_real, nc_pad)
        ch = ch_index(feats_unit, labels, real_mask, n_real, k, nc_pad)
        return msil, ch

    return jax.vmap(one)(labels_all, ks)
