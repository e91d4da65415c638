"""SHARP-TPU large-data path: fold partitioning + per-fold ensemble +
per-fold wMetaC + global sMetaC.

Mirrors SHARP_large (R/SHARP.R:478-851): random cell reshuffle (skipped at
>= 1e5 cells, :493-507), ~partition.ncells folds with last-two-fold
rebalancing (:513-536), K shared RP matrices (:541-549), per-(k,t)
project+cluster (:554-618), per-fold wMetaC (:692-731), cross-fold sMetaC
over centroids in mean-RP space (:747-773), un-permute + tiny-cluster
merge + relabel (:775-843).

TPU-native structure: the reference's K x T `foreach` fork fan-out becomes
a vmap over K inside one jitted block program, iterated (or sharded, see
sharp_tpu/parallel) over folds; cross-fold communication is exactly the
per-fold summary tensors (labels, centroid stats, mean-RP features) —
O(clusters x p), never O(cells^2).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sharp_tpu.config import SharpConfig, pad_dim
from sharp_tpu.core.smetac import smetac, smetac_range
from sharp_tpu.core.pipeline import resolve_log_transform
from sharp_tpu.ops.rp import ensemble_rp_matrix
from sharp_tpu.types import SharpResult, finalize_labels
from sharp_tpu.utils.prng import shuffle_key
from sharp_tpu.utils.timers import StageTimer, log


def fold_sizes(n: int, partition_ncells: int) -> List[int]:
    """Fold partition with last-two-fold rebalancing (R/SHARP.R:513-536)."""
    if n <= partition_ncells:
        return [n]
    T = int(np.ceil(n / partition_ncells))
    sizes = [partition_ncells] * (T - 1)
    rem = n - partition_ncells * (T - 1)
    if T >= 2 and rem < partition_ncells:
        tot = partition_ncells + rem
        half = tot // 2
        sizes = sizes[:-1] + [tot - half, half]
    else:
        sizes = sizes + [rem]
    assert sum(sizes) == n
    return sizes


def summary_to_host(s, n_fold: int, forview: bool = True) -> dict:
    """Device FoldSummary -> host dict, truncated to real cells.

    `forview=False` skips the mean_proj / x0 planes — the only O(B x p)
    payloads — cutting the device->host traffic per fold from ~2.5 MB to
    ~60 KB. The clustering path needs only the O(clusters x p) summary.
    """
    out = {
        "finalC": np.asarray(s.finalC)[:n_fold],
        "n_meta": int(s.n_meta),
        "cent_sum": np.asarray(s.cent_sum),
        "counts": np.asarray(s.counts),
        "k_per": np.asarray(s.k_per),
        "maxsil": np.asarray(s.maxsil),
        "overflow": bool(np.asarray(s.overflow)),
    }
    if forview:
        out["mean_proj"] = np.asarray(s.mean_proj)[:n_fold]
        out["x0"] = np.asarray(s.x0)[:n_fold]
    return out


def process_fold(
    X_fold: np.ndarray,
    n_fold: int,
    block_pad: int,
    R_all,
    cfg: SharpConfig,
    logf: bool,
):
    """One fold: ensemble cluster + wMetaC. Returns per-fold summaries."""
    from sharp_tpu.core.fold import fold_program, fold_static_args

    genes = X_fold.shape[1]
    Xp = np.zeros((block_pad, genes), np.float32)
    Xp[:n_fold] = X_fold
    mask = np.zeros(block_pad, bool)
    mask[:n_fold] = True

    st = fold_static_args(cfg)
    s = fold_program(
        jnp.asarray(Xp), jnp.asarray(mask), jnp.asarray(n_fold), R_all,
        jnp.asarray(logf),
        (jnp.asarray(cfg.indN_cluster) if cfg.indN_cluster is not None else None),
        has_indN=cfg.indN_cluster is not None,
        **st,
    )
    return summary_to_host(s, n_fold, forview=cfg.forview)


class FuseResult(NamedTuple):
    """Result of the cross-fold sMetaC fuse.

    Width invariant (uniform across fold counts): `labels` index the
    columns of `x0`/rows of `cents`, and the LAST slot (W - 1) is the
    reserved garbage slot — W is `meta_nc_pad` when T > 1 and the fold's
    `nc_pad` when T == 1 (the fold-local consensus IS the block meta
    clustering then).
    """

    labels: np.ndarray        # (n_total,) meta label per cell, fold order
    n_final: int
    x0: Optional[np.ndarray]  # (n_total, W) vis matrix; None when folds carry no x0
    cents: np.ndarray         # (W, p) per-meta-cluster centroid in mean-RP space
    counts: np.ndarray        # (W,) cells per meta cluster


def fuse_folds(
    fold_results: List[dict],
    cfg: SharpConfig,
    n_total: Optional[int] = None,
    finalN_cluster: Optional[int] = None,
) -> FuseResult:
    """Global sMetaC over per-fold cluster summaries (R/SHARP.R:747-773)."""
    n_total = n_total or sum(len(fr["finalC"]) for fr in fold_results)
    T = len(fold_results)
    nc_pad = cfg.nc_pad
    has_x0 = "x0" in fold_results[0]

    n_over = sum(1 for fr in fold_results if fr.get("overflow"))
    if n_over:
        log(
            f"WARNING: wMetaC cluster budget (allc_pad) overflowed in "
            f"{n_over}/{T} folds — consensus is degraded; raise "
            f"maxN_cluster/ensize_K headroom or partition into smaller folds"
        )

    # compact global (fold, cluster) ids on host — counts are tiny
    entries = []  # (t, c) with nonzero membership
    for t, fr in enumerate(fold_results):
        present = np.nonzero(fr["counts"][: nc_pad - 1] > 0)[0]
        entries.extend((t, int(c)) for c in present)
    NC = len(entries)
    p = fold_results[0]["cent_sum"].shape[1]
    if T == 1:
        fr = fold_results[0]
        cents1 = fr["cent_sum"] / np.maximum(fr["counts"], 1.0)[:, None]
        return FuseResult(
            labels=fr["finalC"],
            n_final=fr["n_meta"],
            x0=fr.get("x0"),
            cents=cents1.astype(np.float32),
            counts=fr["counts"].astype(np.float32),
        )

    NC_pad = pad_dim(max(NC, 8))
    cents = np.zeros((NC_pad, p), np.float32)
    valid = np.zeros(NC_pad, bool)
    lut = {}  # (t, c) -> compact id
    for g, (t, c) in enumerate(entries):
        fr = fold_results[t]
        cents[g] = fr["cent_sum"][c] / max(fr["counts"][c], 1.0)
        valid[g] = True
        lut[(t, c)] = g

    minN, maxN = smetac_range(
        cfg.n_cells, cfg.minN_cluster, cfg.maxN_cluster, NC
    )
    maxN = min(maxN, NC - 1) if NC > 1 else 1
    ncand = max(maxN - minN + 1, 1)
    meta_nc_pad = ((min(maxN, NC) + 9) // 8) * 8

    sres = smetac(
        jnp.asarray(cents), jnp.asarray(valid), jnp.asarray(NC),
        jnp.asarray(maxN),
        minN=minN, ncand=ncand, meta_nc_pad=meta_nc_pad,
        sil_thre=cfg.sil_thre, height_Ntimes=cfg.height_Ntimes,
        finalN_cluster=(
            jnp.asarray(finalN_cluster) if finalN_cluster is not None else None
        ),
        hmethod=cfg.hmethod, linkage_backend=cfg.linkage_backend,
    )
    tf = np.asarray(sres.tf)

    # per-meta-cluster centroids: sum the fold-cluster centroid sums by
    # meta label (exact weighted mean, no per-cell pass)
    meta_cent_sum = np.zeros((meta_nc_pad, p), np.float32)
    meta_counts = np.zeros(meta_nc_pad, np.float32)
    for g, (t, c) in enumerate(entries):
        fr = fold_results[t]
        m = tf[g]
        meta_cent_sum[m] += fr["cent_sum"][c]
        meta_counts[m] += fr["counts"][c]
    meta_cents = meta_cent_sum / np.maximum(meta_counts, 1.0)[:, None]

    labels_parts = []
    x0_parts = []
    for t, fr in enumerate(fold_results):
        # map fold-local meta labels through sMetaC
        local_map = np.full(nc_pad, meta_nc_pad - 1, np.int32)
        for c in range(nc_pad - 1):
            if (t, c) in lut:
                local_map[c] = tf[lut[(t, c)]]
        labels_parts.append(local_map[fr["finalC"]])
        if has_x0:
            # x0 columns remapped to global meta clusters (summed)
            M = np.zeros((nc_pad, meta_nc_pad), np.float32)
            for c in range(nc_pad - 1):
                if local_map[c] < meta_nc_pad - 1:
                    M[c, local_map[c]] = 1.0
            x0_parts.append(fr["x0"] @ M)

    labels = np.concatenate(labels_parts)
    x0 = np.concatenate(x0_parts, axis=0) if has_x0 else None
    return FuseResult(
        labels=labels,
        n_final=int(sres.n_final),
        x0=x0,
        cents=meta_cents,
        counts=meta_counts,
    )


def sharp_large(
    X: np.ndarray,
    cfg: SharpConfig,
    key: jax.Array,
    timer: Optional[StageTimer] = None,
) -> SharpResult:
    """Large-data path ~ SHARP_large (R/SHARP.R:478-851). Single-process
    fold loop; the sharded/multi-host variant lives in sharp_tpu/parallel."""
    timer = timer or StageTimer()
    n, genes = X.shape

    with timer.stage("log_decision"):
        logf = resolve_log_transform(X, cfg, key)

    with timer.stage("permute_partition"):
        if n < 1e5:
            perm = np.asarray(
                jax.random.permutation(shuffle_key(key), n, independent=True)
            )
        else:
            perm = np.arange(n)
        sizes = fold_sizes(n, cfg.partition_ncells)
        T = len(sizes)
        block_pad = pad_dim(max(sizes))
        log(f"large path: {n} cells -> {T} folds, block_pad={block_pad}")

    with timer.stage("rp_setup"):
        R_all = ensemble_rp_matrix(
            key, cfg.ensize_K, genes, cfg.reduced_ndim,
            dtype=jnp.dtype(cfg.dtype_compute),
        )

    with timer.stage("fold_ensemble"):
        if cfg.n_devices > 1 and len(jax.devices()) >= cfg.n_devices:
            from sharp_tpu.parallel.mesh import make_mesh
            from sharp_tpu.parallel.sharded import process_folds_sharded

            X_folds = np.zeros((T, block_pad, genes), np.float32)
            off = 0
            for t, sz in enumerate(sizes):
                X_folds[t, :sz] = X[perm[off : off + sz]]
                off += sz
            n_ens = (
                cfg.ensemble_axis
                if cfg.ensemble_axis > 1
                and cfg.ensize_K % cfg.ensemble_axis == 0
                and cfg.n_devices % cfg.ensemble_axis == 0
                else 1
            )
            mesh = make_mesh(n_data=cfg.n_devices // n_ens, n_ens=n_ens)
            fold_results = process_folds_sharded(
                X_folds, np.asarray(sizes), R_all, cfg, logf, mesh
            )
        elif T > 1:
            from sharp_tpu.parallel.sharded import process_folds_grouped

            fold_results = process_folds_grouped(
                X[perm], sizes, block_pad, R_all, cfg, logf,
                group=min(8, T),
            )
        else:
            fold_results = [
                process_fold(X[perm], sizes[0], block_pad, R_all, cfg, logf)
            ]

    with timer.stage("smetac"):
        fres = fuse_folds(
            fold_results, cfg, n_total=n, finalN_cluster=cfg.N_cluster
        )
        raw_labels, n_final, x0 = fres.labels, fres.n_final, fres.x0

    with timer.stage("finalize"):
        # un-permute
        unperm_labels = np.empty(n, np.int32)
        unperm_labels[perm] = raw_labels
        x0_u = None
        if x0 is not None:
            x0_u = np.empty_like(x0)
            x0_u[perm] = x0
        viE = None
        if cfg.forview:
            viE = np.empty((n, cfg.reduced_ndim), np.float32)
            off = 0
            for t, sz in enumerate(sizes):
                viE[perm[off : off + sz]] = fold_results[t]["mean_proj"]
                off += sz
        merge_tiny = cfg.N_cluster is None and n > 1e4
        labels = finalize_labels(unperm_labels, merge_tiny=merge_tiny)
        vals, counts = np.unique(labels, return_counts=True)
        folds_per_cell = np.empty(n, np.int32)
        off = 0
        for t, sz in enumerate(sizes):
            folds_per_cell[perm[off : off + sz]] = t
            off += sz

    return SharpResult(
        pred_clusters=labels,
        N_pred_cluster=len(vals),
        unique_pred_clusters=[int(v) for v in vals],
        distr_pred_clusters={int(v): int(c) for v, c in zip(vals, counts)},
        viE=viE,
        x0=x0_u if cfg.forview else None,
        paras=cfg.as_dict(),
        timing=timer.as_dict(),
        per_member_k=np.stack([fr["k_per"] for fr in fold_results]),
        per_member_maxsil=np.stack([fr["maxsil"] for fr in fold_results]),
        folds=folds_per_cell,
    )
