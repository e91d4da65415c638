"""Mesh-sharded fold processing: the multi-chip large path.

The reference's K x T `foreach` fork fan-out (R/SHARP.R:554-618) maps to:
  * folds stacked on a leading T axis, sharded over the mesh "data" axis —
    each chip runs its folds' full ensemble+wMetaC with zero cross-chip
    traffic (the fold program is embarrassingly parallel);
  * the K-member ensemble axis optionally sharded over "ens";
  * the only collective is the implicit all-gather of O(clusters x p) fold
    summaries when the host fuses them with sMetaC — exactly the
    communication shape of the reference's sequential gather loops
    (R/SHARP.R:627-635, SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sharp_tpu.config import SharpConfig
from sharp_tpu.core.fold import FoldSummary, fold_program, fold_static_args
from sharp_tpu.core.large import summary_to_host
from sharp_tpu.utils.timers import log


def _batched_fold_fn(static: dict):
    def one(X, mask, n_real, R_all, logf):
        return fold_program(
            X, mask, n_real, R_all, logf, None, has_indN=False, **static
        )

    return jax.vmap(one, in_axes=(0, 0, 0, None, None))


def process_folds_grouped(
    X: np.ndarray,           # (n, genes) permuted cells
    sizes,                   # fold sizes
    block_pad: int,
    R_all: jax.Array,
    cfg: SharpConfig,
    logf: bool,
    group: int = 8,
) -> List[dict]:
    """Single-device fold pass, `group` folds per jit call.

    The linkage loop is latency-bound per step, so batching folds into the
    vmapped fold program amortizes the sequential-step overhead across
    group x K ensemble members.
    """
    T = len(sizes)
    genes = X.shape[1]
    static = fold_static_args(cfg)
    fn = jax.jit(_batched_fold_fn(static))
    results = []
    off = 0
    group = min(group, T)
    for g0 in range(0, T, group):
        gsizes = list(sizes[g0 : g0 + group])
        G = len(gsizes)
        # pad the last group to a fixed width so the jit never recompiles
        pad_sizes = gsizes + [gsizes[0]] * (group - G)
        Xg = np.zeros((group, block_pad, genes), np.float32)
        for gi, sz in enumerate(gsizes):
            Xg[gi, :sz] = X[off : off + sz]
            off += sz
        for gi in range(G, group):
            Xg[gi] = Xg[0]
        masks = np.arange(block_pad)[None, :] < np.asarray(pad_sizes)[:, None]
        out = fn(
            jnp.asarray(Xg),
            jnp.asarray(masks),
            jnp.asarray(np.asarray(pad_sizes, np.int32)),
            R_all,
            jnp.asarray(logf),
        )
        out = jax.block_until_ready(out)
        for gi, sz in enumerate(gsizes):
            s = jax.tree.map(lambda a: a[gi], out)
            results.append(summary_to_host(s, int(sz), forview=cfg.forview))
    return results


def process_folds_sharded(
    X_folds: np.ndarray,     # (T, B, genes)
    n_reals: np.ndarray,     # (T,)
    R_all: jax.Array,        # (genes, K*p)
    cfg: SharpConfig,
    logf: bool,
    mesh: Mesh,
) -> List[dict]:
    """Run all folds data-parallel over `mesh` and gather host summaries."""
    T, B, genes = X_folds.shape
    ndata = mesh.shape["data"]
    Tpad = ((T + ndata - 1) // ndata) * ndata
    if Tpad != T:
        # dummy folds replicate fold 0 (cheap, numerically safe, discarded)
        reps = Tpad - T
        X_folds = np.concatenate(
            [X_folds, np.repeat(X_folds[:1], reps, axis=0)], axis=0
        )
        n_reals = np.concatenate([n_reals, np.repeat(n_reals[:1], reps)])
    masks = (
        np.arange(B)[None, :] < n_reals[:, None]
    )

    static = fold_static_args(cfg)
    fn = _batched_fold_fn(static)
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    jfn = jax.jit(
        fn,
        in_shardings=(data_sh, data_sh, data_sh, repl_sh, repl_sh),
        out_shardings=data_sh,
    )
    out: FoldSummary = jfn(
        jnp.asarray(X_folds),
        jnp.asarray(masks),
        jnp.asarray(n_reals),
        R_all,
        jnp.asarray(logf),
    )
    out = jax.block_until_ready(out)

    results = []
    for t in range(T):
        s = jax.tree.map(lambda a: a[t], out)
        results.append(summary_to_host(s, int(n_reals[t]), forview=cfg.forview))
    log(f"sharded fold pass: {T} folds over {ndata} data shards")
    return results
