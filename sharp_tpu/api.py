"""Public API: `sharp`, `sharp_unlimited`, `run_mtimes`.

Mirrors the reference entry points (R/SHARP.R:44, R/SHARP_unlimited*.R,
R/run_Mtimes_SHARP.R) with the same knob names and auto-defaults.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from sharp_tpu.config import SharpConfig, resolve_config
from sharp_tpu.core.pipeline import preprocess, sharp_small
from sharp_tpu.types import SharpResult
from sharp_tpu.utils.prng import seed_to_key
from sharp_tpu.utils.timers import StageTimer


def sharp(
    X: np.ndarray,
    *,
    gene_names: Optional[np.ndarray] = None,
    cell_names: Optional[np.ndarray] = None,
    cells_axis: int = 0,
    rM: Optional[object] = None,
    **knobs,
) -> SharpResult:
    """Cluster a cells-by-genes expression matrix (~ SHARP(), R/SHARP.R:44).

    Accepts the reference knobs as keyword args (`ensize_K`, `reduced_ndim`,
    `base_ncells`, `partition_ncells`, `N_cluster`, `minN_cluster`,
    `maxN_cluster`, `sil_thre`, `height_Ntimes`, `prep`, `logflag`,
    `exp_type`, `rN_seed`, `forview`, ...). Dispatches small/large on
    `base_ncells` exactly like the reference (R/SHARP.R:251-280).

    cells_axis=1 accepts the reference's genes-by-cells orientation.

    `rM` injects pre-generated RP matrices (the reference's rM argument,
    R/SHARP.R:541-549): a list of K (genes, p) matrices or one stacked
    (genes, K * p) array. Callers injecting rM usually also pass
    prep=False so the gene dimension is not altered under the matrices
    (the reference's SHARP_unlimited does exactly that,
    R/SHARP_unlimited.R:135).
    """
    X = np.asarray(X)
    if X.ndim != 2:
        raise ValueError("X must be 2-D (cells x genes)")
    if cells_axis == 1:
        # gene_names/cell_names are semantic (not axis-bound): they name
        # genes and cells regardless of the input orientation
        X = X.T

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    timer = StageTimer()
    n, g = X.shape
    cfg = resolve_config(n, g, **knobs)
    key = seed_to_key(cfg.rN_seed)

    with timer.stage("preprocess"):
        X = preprocess(X, cfg, gene_names=gene_names, cell_names=cell_names)
        cfg = cfg.replace(n_genes=X.shape[1])

    R_all = None
    if rM is not None:
        import jax.numpy as jnp

        R_all = (
            np.concatenate([np.asarray(m) for m in rM], axis=1)
            if isinstance(rM, (list, tuple))
            else np.asarray(rM)
        )
        want = (X.shape[1], cfg.ensize_K * cfg.reduced_ndim)
        if R_all.shape != want:
            raise ValueError(
                f"rM has shape {R_all.shape}, expected {want} "
                "(genes x ensize_K * reduced_ndim, after preprocessing "
                "— pass prep=False to keep the gene dimension fixed)"
            )
        R_all = jnp.asarray(R_all, jnp.dtype(cfg.dtype_compute))

    if cfg.is_small:
        return sharp_small(X, cfg, key, timer, R_all=R_all)
    from sharp_tpu.core.large import sharp_large

    return sharp_large(X, cfg, key, timer, R_all=R_all)


def sharp_unlimited(
    blocks: Union[Sequence[np.ndarray], "str"],
    *,
    n_cells: Optional[int] = None,
    n_genes: Optional[int] = None,
    **knobs,
) -> SharpResult:
    """Blocked / out-of-core path (~ SHARP_unlimited{,3}, R/SHARP_unlimited.R:29).

    `blocks` is a list of cells-by-genes matrices, or a directory of stored
    block files (the out-of-core SHARP_unlimited3 analog,
    R/SHARP_unlimited3.R:59-131).
    """
    from sharp_tpu.parallel.streaming import sharp_unlimited as _impl

    return _impl(blocks, n_cells=n_cells, n_genes=n_genes, **knobs)


def run_mtimes(
    X: np.ndarray,
    mtimes: int = 5,
    k_set: Sequence[int] = (15,),
    **knobs,
) -> List[List[SharpResult]]:
    """Grid-run sharp `mtimes` x len(k_set) times for variance studies
    (~ run_Mtimes_SHARP, R/run_Mtimes_SHARP.R:20-60)."""
    seed = knobs.pop("rN_seed", None)
    out = []
    for K in k_set:
        row = []
        for m in range(mtimes):
            res = sharp(
                X,
                ensize_K=K,
                rN_seed=(None if seed is None else seed + m),
                **knobs,
            )
            row.append(res)
        out.append(row)
    return out


def summarize_mtimes(grid, truth=None) -> dict:
    """Stability summary of a `run_mtimes` grid: per-K cluster-count
    distribution, run-to-run agreement (mean pairwise ARI), and accuracy
    vs `truth` when given — the run_Mtimes evaluation the reference uses
    to characterize ARI variance (R/run_Mtimes_SHARP.R:20-60)."""
    from sharp_tpu.analysis.ari import ari

    summary = {}
    for row in grid:
        K = row[0].paras["ensize_K"]
        ks = [r.N_pred_cluster for r in row]
        pair = [
            ari(row[a].pred_clusters, row[b].pred_clusters)
            for a in range(len(row))
            for b in range(a + 1, len(row))
        ]
        entry = {
            "n_clusters": ks,
            "pairwise_ari_mean": float(np.mean(pair)) if pair else 1.0,
        }
        if truth is not None:
            vals = [ari(truth, r.pred_clusters) for r in row]
            entry["truth_ari_mean"] = float(np.mean(vals))
            entry["truth_ari_std"] = float(np.std(vals))
        summary[int(K)] = entry
    return summary
