"""Similarity-based meta-clustering (sMetaC) — cross-fold/block fusion.

Fuses fold-level (or block-level) cluster labels into the final global
clustering, following R/sMetaC.R:17-209:

  1. per-cluster centroid in the shared mean-RP feature space (:58-63)
  2. pairwise Pearson correlation of centroids as similarity S (:67-85)
  3. ncells-dependent min/max cluster-range adjustment (:103-119)
  4. opt_hclust on S (:128-129)
  5. quirk kept as-is (it shapes cluster counts on large data): if the
     chosen cut has exactly 2 clusters with silhouette above threshold,
     take the *second-best* silhouette solution instead (:139-147)

Communication shape: this stage only ever touches O(#clusters x p) data —
the property that lets fold workers run with zero cross-talk and the merge
ride a single all-gather of tiny summaries (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sharp_tpu.ops.select import opt_hclust


class SMetaCResult(NamedTuple):
    tf: jax.Array        # (nc_total_pad,) meta label per fold-cluster
    n_final: jax.Array   # () int32
    maxsil: jax.Array
    oind: jax.Array


def smetac_range(n_cells: int, minN: int, maxN: int, n_clusters: int):
    """The ncells-dependent search-range rules (R/sMetaC.R:103-119)."""
    if n_cells < 1e6:
        baseN = min(max(n_cells // 10000, 2), 10)
        if minN == 2 and min(maxN, n_clusters) - baseN >= 3:
            minN = baseN
    else:
        maxN = max(maxN, n_cells // 5000)
        minN = max(minN, n_cells // 50000)
    return int(minN), int(maxN)


@functools.partial(
    jax.jit,
    static_argnames=("minN", "ncand", "meta_nc_pad", "hmethod",
                     "linkage_backend"),
)
def smetac(
    centroids: jax.Array,   # (nc_pad, p) fold-cluster centroids in mean-RP space
    valid: jax.Array,       # (nc_pad,) bool
    n_clusters: jax.Array,  # () traced actual number of fold-clusters
    maxN: jax.Array,        # () traced
    *,
    minN: int,
    ncand: int,
    meta_nc_pad: int,
    sil_thre: float = 0.35,
    height_Ntimes: float = 2.0,
    finalN_cluster: Optional[jax.Array] = None,
    hmethod: str = "ward.D",
    linkage_backend: str = "xla",
) -> SMetaCResult:
    # Pearson correlation of centroids (R/sMetaC.R:67-78): center rows,
    # unit-normalize, one matmul.
    mu = jnp.mean(centroids, axis=-1, keepdims=True)
    Xc = centroids - mu
    U = Xc * jax.lax.rsqrt(jnp.sum(Xc * Xc, axis=-1, keepdims=True) + 1e-12)
    S = jnp.dot(
        U, U.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    nc_pad = centroids.shape[0]
    S = jnp.where(jnp.eye(nc_pad, dtype=bool), 1.0, S)

    res = opt_hclust(
        S, valid, n_clusters, jnp.minimum(maxN, n_clusters - 1),
        symmetric=True, minN=minN, ncand=ncand, nc_pad=meta_nc_pad,
        sil_thre=sil_thre, height_Ntimes=height_Ntimes,
        N_cluster=finalN_cluster,
        hmethod=hmethod, linkage_backend=linkage_backend,
    )

    # --- second-best-silhouette override (R/sMetaC.R:139-147) ------------
    two_clusters = res.k == 2
    # rank only over VALID candidates (the reference sorts the msil vector
    # of real candidates only, R/sMetaC.R:139-147); invalid cuts
    # (k > n_clusters - 1) carry silhouettes of degenerate labelings and
    # must never win the override
    msil_valid = jnp.where(
        res.valid & jnp.isfinite(res.msil), res.msil, -jnp.inf
    )
    # R's sort(partial)[n-1] counts duplicates: the second-largest value
    # including ties, then the first index holding it.
    second_val = jnp.sort(msil_valid)[-2] if ncand > 1 else msil_valid[0]
    second_idx = jnp.argmax(msil_valid == second_val)
    override = (
        (ncand > 1)
        & two_clusters
        & (res.maxsil > sil_thre)
        & jnp.isfinite(second_val)
        & (finalN_cluster is None)
    )
    oind = jnp.where(override, second_idx, res.oind).astype(jnp.int32)
    tf = res.all_labels[oind]

    occ = jnp.zeros((meta_nc_pad,), jnp.int32).at[tf].max(
        valid.astype(jnp.int32)
    )
    occ = occ.at[meta_nc_pad - 1].set(0)
    n_final = jnp.sum(occ)
    return SMetaCResult(tf=tf, n_final=n_final, maxsil=res.maxsil, oind=oind)
