"""The per-fold program: ensemble cluster + wMetaC + centroid summary.

This is the unit of data parallelism. It is a pure jax function —
jittable AND vmappable over a fold axis — so the same code runs:
  * in a host loop on one chip (core/large.py),
  * vmapped + sharded over a `Mesh` fold axis (parallel/sharded.py),
  * inside the streaming driver (parallel/streaming.py).

Everything a fold exports is O(clusters x p) summary data (labels,
centroid sums, counts, x0 votes) — the cross-fold merge traffic the
reference's design guarantees (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sharp_tpu.config import SharpConfig
from sharp_tpu.core.block import cluster_block_ensemble
from sharp_tpu.core.wmetac import wmetac


class FoldSummary(NamedTuple):
    finalC: jax.Array     # (B,) fold-local consensus labels; pads at nc_pad-1
    n_meta: jax.Array     # () int32
    cent_sum: jax.Array   # (nc_pad, p) per-cluster centroid sums in mean-RP space
    counts: jax.Array     # (nc_pad,)
    mean_proj: jax.Array  # (B, p)
    x0: jax.Array         # (B, nc_pad)
    k_per: jax.Array      # (K,)
    maxsil: jax.Array     # (K,)
    overflow: jax.Array   # () bool — wMetaC allc_pad budget exceeded (degraded consensus)


def fold_static_args(cfg: SharpConfig) -> dict:
    maxN = min(cfg.maxN_cluster, 40)
    return dict(
        K=cfg.ensize_K,
        minN=cfg.minN_cluster,
        ncand=maxN - cfg.minN_cluster + 1,
        nc_pad=cfg.nc_pad,
        allc_pad=_allc_pad(cfg),
        sil_thre=cfg.sil_thre,
        height_Ntimes=cfg.height_Ntimes,
        maxN=maxN,
        linkage_backend=cfg.linkage_backend,
        hmethod=cfg.hmethod,
    )


def _allc_pad(cfg: SharpConfig) -> int:
    exact = cfg.ensize_K * min(cfg.maxN_cluster + 1, cfg.nc_pad - 1)
    return min(max(64, ((exact + 63) // 64) * 64), 1024)


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "minN", "ncand", "nc_pad", "allc_pad", "sil_thre",
        "height_Ntimes", "maxN", "has_indN", "linkage_backend", "hmethod",
    ),
)
def fold_program(
    X: jax.Array,            # (B, genes)
    mask: jax.Array,         # (B,)
    n_real: jax.Array,       # ()
    R_all: jax.Array,        # (genes, K*p)
    log_transform: jax.Array,  # () bool
    indN_cluster: Optional[jax.Array] = None,
    *,
    K: int,
    minN: int,
    ncand: int,
    nc_pad: int,
    allc_pad: int,
    sil_thre: float,
    height_Ntimes: float,
    maxN: int,
    has_indN: bool = False,
    linkage_backend: str = "xla",
    hmethod: str = "ward.D",
) -> FoldSummary:
    blk = cluster_block_ensemble(
        X, mask, n_real, R_all, jnp.asarray(maxN), log_transform,
        K=K, minN=minN, ncand=ncand, nc_pad=nc_pad,
        sil_thre=sil_thre, height_Ntimes=height_Ntimes,
        indN_cluster=indN_cluster if has_indN else None,
        linkage_backend=linkage_backend,
        hmethod=hmethod,
    )
    wres = wmetac(
        blk.labels, mask, n_real, jnp.asarray(maxN),
        K=K, nc_pad=nc_pad, allc_pad=allc_pad,
        meta_minN=minN, meta_ncand=ncand,
        sil_thre=0.0, height_Ntimes=height_Ntimes,
        hmethod=hmethod, linkage_backend=linkage_backend,
    )
    oh = jax.nn.one_hot(wres.finalC, nc_pad, dtype=jnp.float32)
    oh = oh * mask[:, None].astype(jnp.float32)
    cent_sum = jnp.dot(
        oh.T, blk.mean_proj, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    counts = jnp.sum(oh, axis=0)
    return FoldSummary(
        finalC=wres.finalC,
        n_meta=wres.n_meta,
        cent_sum=cent_sum,
        counts=counts,
        mean_proj=blk.mean_proj,
        x0=wres.x0,
        k_per=blk.k_per,
        maxsil=blk.maxsil,
        overflow=wres.overflow,
    )
