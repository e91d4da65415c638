"""Out-of-core / blocked clustering: the SHARP_unlimited family.

Mirrors R/SHARP_unlimited.R:29-242 and the streaming variant
R/SHARP_unlimited3.R:59-131: shared RP matrices across all blocks, one
block resident at a time, per-block full pipeline, then one global sMetaC
over block-cluster centroids; final clusters relabelled by decreasing size
(R/SHARP_unlimited.R:179-183).

Additions beyond the reference (SURVEY.md §5.3-5.4):
  * double-buffered host I/O — the next block loads on a worker thread
    while the device clusters the current one;
  * a per-block completion manifest: each finished block persists its
    summary (labels + cluster centroids, O(n_b + C*p) bytes), so a killed
    multi-hour run resumes at the last finished block.
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import json
import os
from typing import List, Optional, Sequence, Union

import jax
import numpy as np

from sharp_tpu.config import SharpConfig, pad_dim, resolve_config
from sharp_tpu.core.large import (
    fold_sizes,
    process_fold,
)
from sharp_tpu.core.smetac import smetac, smetac_range
from sharp_tpu.io.blocks import BlockStore
from sharp_tpu.ops.rp import ensemble_rp_matrix
from sharp_tpu.types import SharpResult
from sharp_tpu.utils.prng import seed_to_key
from sharp_tpu.utils.timers import StageTimer, log


def _config_fingerprint(cfg: SharpConfig) -> str:
    # forview is part of the fingerprint: a forview=False manifest lacks
    # the x0/viE planes a forview=True resume needs
    keys = (
        "reduced_ndim", "ensize_K", "partition_ncells", "minN_cluster",
        "maxN_cluster", "sil_thre", "height_Ntimes", "rN_seed", "nc_pad",
        "forview",
    )
    payload = json.dumps({k: getattr(cfg, k) for k in keys}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _fold_pass(
    Xb: np.ndarray, cfg: SharpConfig, R_all, logf: bool, mesh=None,
    group: Optional[int] = None, wire_dtype: str = "float32",
):
    """One block's fold pass -> list of per-fold summary dicts.

    With a mesh, the block's folds fan out over the mesh "data" axis —
    the within-host multi-chip story of SURVEY.md §5.8 (the reference's
    K x T fork fan-out, R/SHARP.R:554-618) — otherwise the single-device
    grouped loop runs.
    """
    from sharp_tpu.io.sparse import SparseBlock

    nb = Xb.shape[0]
    sparse = isinstance(Xb, SparseBlock)
    sizes = fold_sizes(nb, cfg.partition_ncells)
    block_pad = pad_dim(max(sizes))
    if len(sizes) == 1 and not sparse:
        return [process_fold(Xb, sizes[0], block_pad, R_all, cfg, logf)]
    if mesh is not None:
        from sharp_tpu.parallel.sharded import process_folds_sharded

        if sparse:
            # the sharded fan-out consumes host-stacked dense folds; the
            # sparse-transfer win is a single-device streaming concern
            Xb = Xb.densify()
        T = len(sizes)
        X_folds = np.zeros((T, block_pad, Xb.shape[1]), np.float32)
        off = 0
        for t, sz in enumerate(sizes):
            X_folds[t, :sz] = Xb[off : off + sz]
            off += sz
        return process_folds_sharded(
            X_folds, np.asarray(sizes, np.int32), R_all, cfg, logf, mesh
        )
    from sharp_tpu.parallel.sharded import process_folds_grouped

    return process_folds_grouped(
        Xb if sparse else np.asarray(Xb, np.float32),
        sizes, block_pad, R_all, cfg, logf,
        group=group, wire_dtype=wire_dtype,
    )


def _block_summary(fres):
    """(labels (nb,), centroids (C, p), sizes (C,), x0c) from a block fuse.

    Block-cluster centroids come straight from the fuse's per-meta
    centroid sums in the shared mean-RP feature space — no per-cell pass.
    `x0c` is the per-cell wMetaC vote matrix with columns COMPACTED to the
    block's live clusters (padding/empty slots carry no real-cell votes),
    or None when the fold pass ran without forview.
    """
    uniq = np.unique(fres.labels)
    cents = fres.cents[uniq]
    counts = fres.counts[uniq]
    pos = np.searchsorted(uniq, fres.labels)  # labels as positions in uniq
    x0c = None
    if fres.x0 is not None:
        x0c = np.ascontiguousarray(fres.x0[:, uniq], dtype=np.float32)
    return pos.astype(np.int32), cents.astype(np.float32), counts, x0c


def _view_rp_matrix(cfg: SharpConfig, key) -> Optional[np.ndarray]:
    """Extra shared RP for view features at scale.

    Mirrors R/SHARP_unlimited.R:216-235: above 1e5 total cells the p-dim
    viE is re-projected to 50 view dimensions with ONE extra ternary RP
    matrix shared by all blocks (deterministic from the run key, so every
    block — and every host — projects identically). Below the threshold
    viE stays in the shared p-dim RP space and no matrix is needed.
    """
    if cfg.n_cells <= 1e5 or cfg.reduced_ndim <= 50:
        return None
    from sharp_tpu.ops.rp import ternary_rp_matrix

    kview = jax.random.fold_in(key, 0x56494557)  # "VIEW"
    R = ternary_rp_matrix(kview, cfg.reduced_ndim, 50)
    return np.asarray(R, np.float32) / np.sqrt(50.0)


def _block_view_features(frs: List[dict], R_view) -> np.ndarray:
    """Per-cell viE for one block (fold order), optionally view-projected."""
    viE = np.concatenate(
        [np.asarray(fr["mean_proj"], np.float32) for fr in frs], axis=0
    )
    return viE @ R_view if R_view is not None else viE


def global_block_fuse(summaries, cfg: SharpConfig):
    """Global sMetaC over block summaries + size-ordered relabelling.

    summaries: list of (centroids (C_b, p) f32, counts (C_b,)) per block,
    in global block order. Mirrors the global fuse + decreasing-size
    relabel of the reference (R/SHARP_unlimited.R:162-183). Deterministic
    given identical summaries, so every host computes the same result.

    Returns (tf, remap, offsets, order, meta_sizes):
      tf        — meta label per global block-cluster id
      remap     — size-ordered final id (1-based) per meta label
      offsets   — per-block starting global cluster id
      order     — meta labels in decreasing size order
      meta_sizes— cell count per meta label
    """
    if len(summaries) == 1:
        # the block consensus IS the final clustering — re-clustering a
        # single block's ~k centroids (one per cluster, near-equidistant)
        # has no replica structure for sMetaC and collapses; the
        # reference degrades single-block inputs to plain SHARP for the
        # same reason (R/SHARP_unlimited.R:39-51)
        counts = summaries[0][1]
        C = len(counts)
        tf = np.arange(C, dtype=np.int32)
        offsets = np.asarray([0, C])
        meta_sizes = counts.astype(np.float64)
        present = np.nonzero(meta_sizes > 0)[0]
        order = present[np.argsort(-meta_sizes[present], kind="stable")]
        remap = np.zeros(max(C, 1), np.int32)
        remap[order] = np.arange(1, len(order) + 1)
        return tf, remap, offsets, order, meta_sizes

    all_cents = np.concatenate([c for c, _ in summaries], axis=0)
    all_counts = np.concatenate([n for _, n in summaries])
    NC = all_cents.shape[0]
    NC_pad = pad_dim(max(NC, 8))
    cents_p = np.zeros((NC_pad, all_cents.shape[1]), np.float32)
    cents_p[:NC] = all_cents
    valid = np.zeros(NC_pad, bool)
    valid[:NC] = True

    minN, maxN = smetac_range(
        cfg.n_cells, cfg.minN_cluster, cfg.maxN_cluster, NC
    )
    maxN = min(maxN, NC - 1) if NC > 1 else 1
    if maxN < minN:  # widened floor exceeds the problem (core/large.py)
        minN = max(2, maxN)
    ncand = max(maxN - minN + 1, 1)
    meta_nc_pad = ((min(maxN, NC) + 9) // 8) * 8
    sres = smetac(
        jax.numpy.asarray(cents_p), jax.numpy.asarray(valid),
        jax.numpy.asarray(NC), jax.numpy.asarray(maxN),
        minN=minN, ncand=ncand, meta_nc_pad=meta_nc_pad,
        sil_thre=cfg.sil_thre, height_Ntimes=cfg.height_Ntimes,
        finalN_cluster=(
            jax.numpy.asarray(cfg.N_cluster)
            if cfg.N_cluster is not None
            else None
        ),
        linkage_backend=cfg.linkage_backend,
    )
    tf = np.asarray(sres.tf)

    # global meta-cluster sizes from the summary counts, then relabel by
    # decreasing size (R/SHARP_unlimited.R:179-183)
    block_ncl = [len(n) for _, n in summaries]
    offsets = np.concatenate([[0], np.cumsum(block_ncl)])
    meta_sizes = np.zeros(int(tf.max()) + 1 if len(tf) else 1)
    np.add.at(meta_sizes, tf[: int(offsets[-1])], all_counts)
    present = np.nonzero(meta_sizes > 0)[0]
    order = present[np.argsort(-meta_sizes[present], kind="stable")]
    remap = np.zeros(len(meta_sizes), np.int32)
    remap[order] = np.arange(1, len(order) + 1)
    return tf, remap, offsets, order, meta_sizes


def sharp_unlimited(
    blocks: Union[Sequence[np.ndarray], str],
    *,
    n_cells: Optional[int] = None,
    n_genes: Optional[int] = None,
    manifest_dir: Optional[str] = None,
    resume: bool = True,
    multihost: bool = False,
    fuse_batch: int = 8,
    sparse_feed: Optional[bool] = None,
    group: Optional[int] = None,
    wire_dtype: str = "float32",
    **knobs,
) -> SharpResult:
    """Blocked / out-of-core clustering ~ SHARP_unlimited{,2,3}.

    With `multihost=True`, each jax process streams a disjoint contiguous
    slice of the blocks (parallel/multihost.py); one all-gather of padded
    O(clusters x p) block summaries precedes the global sMetaC, which
    every host computes identically (shared PRNG => deterministic), so
    meta labels agree everywhere. The returned `pred_clusters` covers
    this host's blocks, in block order; the size-ordered relabelling is
    computed from the GLOBAL summary counts and is identical on all
    hosts. Single process: behaves exactly like multihost=False.

    `fuse_batch` blocks' sMetaC fuses run as one vmapped device call
    (results are invariant to the grouping). `sparse_feed` (default
    auto) ships SBLK/scipy-CSR blocks to the device as CSR triplets and
    densifies on-chip — bit-identical labels, ~6x less host->device
    traffic; pass False to force host densify. `wire_dtype="bfloat16"`
    additionally rounds the triplet VALUES to bf16 on the wire (4 B/nnz
    instead of 6) — an explicit lossy opt-in for link-bound deployments;
    the default f32 wire keeps sparse-fed == dense-fed bit-identity.
    `group` bounds how many
    folds are staged per device call (default: sized from the HBM
    budget, parallel/sharded.auto_group; `SHARP_TPU_HBM_BUDGET` bytes
    overrides the budget).
    """
    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    timer = StageTimer()

    # --- resolve input form ---------------------------------------------
    store: Optional[BlockStore] = None
    if isinstance(blocks, str):
        store = BlockStore(blocks)
        info = store.shape_info()
        files = store.files()
        n_blocks = len(files)
        if info:
            n_cells = n_cells or info["n_cells"]
            n_genes = n_genes or info["n_genes"]
        if manifest_dir is None:
            manifest_dir = os.path.join(blocks, ".sharp_manifest")
    else:
        blocks = list(blocks)
        if len(blocks) == 1:
            from sharp_tpu.api import sharp

            b = blocks[0]
            # scipy sparse -> dense (np.asarray would wrap it 0-d)
            X1 = b.toarray() if hasattr(b, "tocsr") else np.asarray(b)
            return sharp(X1, **knobs)
        n_blocks = len(blocks)
        n_cells = n_cells or sum(b.shape[0] for b in blocks)
        n_genes = n_genes or blocks[0].shape[1]
    if n_cells is None or n_genes is None:
        # one cheap metadata pass over files (header-only for SBLK);
        # explicitly-passed values are kept (n_cells is a legitimate
        # override — e.g. this host sees a slice of a larger dataset)
        tot, gb = 0, None
        for f in files:
            if f.endswith(".sblk"):
                from sharp_tpu.io.native import read_header

                nb, gb, _, _ = read_header(f)
            else:
                b = BlockStore.load(f)
                nb, gb = b.shape
            tot += nb
        n_cells = n_cells or tot
        n_genes = n_genes or gb

    # multihost init must precede ANY jax computation (the distributed
    # runtime can only attach before the backend initializes — even the
    # PRNGKey below would lock it out), so the block assignment is
    # resolved first
    if multihost:
        from sharp_tpu.parallel.multihost import (
            barrier,
            block_slice,
            distributed_init,
        )

        pidx, pcount = distributed_init()
        my_blocks = block_slice(n_blocks, pidx, pcount)
        log(f"multihost: process {pidx}/{pcount} handles blocks {my_blocks}")
        if pcount > 1:
            # establish the Gloo context NOW, while processes are in
            # lockstep — its rendezvous hard-times-out at ~30 s, which
            # compile/compute skew over a long block stream exceeds
            barrier(pcount)
    else:
        pidx, pcount = 0, 1
        my_blocks = list(range(n_blocks))
    lockstep = multihost and pcount > 1
    max_local = (n_blocks + pcount - 1) // pcount

    knobs.setdefault("forview", False)
    cfg = resolve_config(n_cells, n_genes, **knobs)
    # blocks are preprocessed upstream in the reference path
    # (SHARP called with prep=FALSE, logflag=FALSE -> log employed)
    logf = True if cfg.log_transform is None else bool(cfg.log_transform)
    key = seed_to_key(cfg.rN_seed)
    fingerprint = _config_fingerprint(cfg)
    if manifest_dir:
        os.makedirs(manifest_dir, exist_ok=True)

    with timer.stage("rp_setup"):
        R_all = ensemble_rp_matrix(
            key, cfg.ensize_K, n_genes, cfg.reduced_ndim,
            dtype=jax.numpy.dtype(cfg.dtype_compute),
        )

    def load_block(i):
        from sharp_tpu.io.sparse import SparseBlock

        if store is not None:
            f = files[i]
            if sparse_feed is not False and f.endswith(".sblk"):
                return SparseBlock.from_sblk(f)
            return BlockStore.load(f)
        b = blocks[i]
        if hasattr(b, "tocsr"):  # scipy sparse matrix
            sb = SparseBlock.from_scipy(b)
            return sb if sparse_feed is not False else sb.densify()
        return np.asarray(b, np.float32)

    def manifest_path(i):
        return (
            os.path.join(manifest_dir, f"block_{i:05d}_{fingerprint}.npz")
            if manifest_dir
            else None
        )

    # --- per-block pass with prefetch + manifest resume ------------------
    # Fold passes run per block (device); the per-block sMetaC fuses are
    # BATCHED over `fuse_batch` blocks via one vmapped smetac call per
    # shape bucket (core/large.fuse_blocks) — the merge loop is
    # latency-bound, so batching blocks amortizes it, and every block in
    # a bucket shares one compiled program.
    from sharp_tpu.core.large import fuse_blocks
    from sharp_tpu.parallel.mesh import resolve_mesh

    mesh = resolve_mesh(cfg)
    R_view = _view_rp_matrix(cfg, key) if cfg.forview else None
    results_by_block = {}
    pending = []  # (block index, fold summaries) awaiting fuse

    def fuse_pending():
        if not pending:
            return
        fused = fuse_blocks([frs for _, frs in pending], cfg)
        for (i, frs), fres in zip(pending, fused):
            labels, cents, counts, x0c = _block_summary(fres)
            viE_b = (
                _block_view_features(frs, R_view) if cfg.forview else None
            )
            mp = manifest_path(i)
            if mp:
                extra = (
                    {"x0": x0c, "viE": viE_b} if cfg.forview else {}
                )
                np.savez(
                    mp, labels=labels, cents=cents, counts=counts, **extra
                )
            results_by_block[i] = (labels, cents, counts, x0c, viE_b)
            log(f"block {i}: {len(labels)} cells -> {len(counts)} clusters")
        pending.clear()

    with timer.stage("block_pass"):
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            future = None

            def want(i):
                mp = manifest_path(i)
                return not (resume and mp and os.path.exists(mp))

            prefetched_for = None
            for i in my_blocks:
                try:
                    if not want(i):
                        z = np.load(manifest_path(i))
                        results_by_block[i] = (
                            z["labels"], z["cents"], z["counts"],
                            z["x0"] if "x0" in z.files else None,
                            z["viE"] if "viE" in z.files else None,
                        )
                        log(f"block {i}: resumed from manifest")
                        continue
                    if prefetched_for == i and future is not None:
                        Xb = future.result()
                    else:
                        Xb = load_block(i)
                    # prefetch the next needed block
                    nxt = next(
                        (j for j in my_blocks if j > i and want(j)), None
                    )
                    future = (
                        pool.submit(load_block, nxt)
                        if nxt is not None else None
                    )
                    prefetched_for = nxt

                    pending.append(
                        (i, _fold_pass(Xb, cfg, R_all, logf, mesh,
                                       group=group,
                                       wire_dtype=wire_dtype))
                    )
                    if len(pending) >= fuse_batch:
                        fuse_pending()
                finally:
                    if lockstep:
                        # once per block: bounds cross-process skew to
                        # one block so the Gloo ~30 s op window holds at
                        # the end-of-stream all-gather
                        barrier(pcount)
            fuse_pending()
        if lockstep:
            # hosts with one block fewer run matching dummy syncs so the
            # per-block barrier count agrees everywhere
            for _ in range(max_local - len(my_blocks)):
                barrier(pcount)
    block_results = [results_by_block[i] for i in my_blocks]

    # --- gather block summaries (one collective across hosts) ------------
    with timer.stage("summary_gather"):
        p = cfg.reduced_ndim
        if multihost and pcount > 1:
            from sharp_tpu.parallel.multihost import (
                allgather_summaries,
                block_slice as _bslice,
                pad_block_summary,
            )

            # budget must cover the LARGEST cluster count any block can
            # produce: the per-block sMetaC search range is widened by
            # smetac_range at >= 1e6 total cells (maxN -> n/5000,
            # R/sMetaC.R:103-119), so sizing from min(maxN_cluster, 40)
            # would crash the flagship-scale run mid-stream
            _, eff_maxN = smetac_range(
                cfg.n_cells, cfg.minN_cluster, cfg.maxN_cluster, 1 << 30
            )
            bud = ((eff_maxN + 9) // 8) * 8
            max_local = (n_blocks + pcount - 1) // pcount
            payload = np.zeros((max_local, bud, p + 1), np.float32)
            for bi, (_, cents, counts, _x0, _v) in enumerate(block_results):
                cp, cc = pad_block_summary(cents, counts, bud)
                payload[bi, :, :p] = cp
                payload[bi, :, p] = cc
            gathered = allgather_summaries(payload, pcount)
            gathered = gathered.reshape(pcount, max_local, bud, p + 1)
            summaries = []
            for h in range(pcount):
                for bi in range(len(_bslice(n_blocks, h, pcount))):
                    blk = gathered[h, bi]
                    C = int((blk[:, p] > 0).sum())
                    summaries.append((blk[:C, :p], blk[:C, p]))
        else:
            summaries = [(c, n) for _, c, n, _x0, _v in block_results]

    # --- global sMetaC over block-cluster centroids ----------------------
    with timer.stage("global_smetac"):
        tf, remap, offsets, order, meta_sizes = global_block_fuse(
            summaries, cfg
        )

    with timer.stage("finalize"):
        # map this host's cells through their blocks' global offsets
        n_glob = len(order)
        parts = []
        viE_parts = []
        # x0 votes accumulate column-wise straight into ONE preallocated
        # (my_cells, n_glob) array: the per-block (Cb, n_glob) one-hot
        # matmul + concat of earlier rounds materialized every block's
        # dense product twice (~2x the final 1.4 GB at flagship scale,
        # ADVICE r04); column adds touch only the <= Cb live columns
        have_x0 = any(x0c is not None for _, _, _, x0c, _ in block_results)
        x0_all = None
        if have_x0:
            my_cells = sum(len(l) for l, _, _, _, _ in block_results)
            x0_all = np.zeros((my_cells, n_glob), np.float32)
        row0 = 0
        for bi, (labels, _, _, x0c, viE_b) in zip(my_blocks, block_results):
            parts.append(remap[tf[offsets[bi] + labels]])
            if x0c is not None:
                # vote columns (block clusters) summed onto their global
                # size-ordered clusters — the block-level analog of
                # core/large._finish_block's x0 remap
                Cb = x0c.shape[1]
                gcol = remap[tf[offsets[bi] + np.arange(Cb)]] - 1
                rows = slice(row0, row0 + x0c.shape[0])
                for c in range(Cb):
                    x0_all[rows, gcol[c]] += x0c[:, c]
            row0 += len(labels)
            if viE_b is not None:
                viE_parts.append(viE_b)
        final = (
            np.concatenate(parts).astype(np.int32)
            if parts else np.zeros((0,), np.int32)
        )
        viE_all = np.concatenate(viE_parts, axis=0) if viE_parts else None
        vals = np.arange(1, n_glob + 1)  # global ids, size-ordered
        cnts = meta_sizes[order].astype(np.int64)

    return SharpResult(
        pred_clusters=final,
        N_pred_cluster=len(vals),
        unique_pred_clusters=[int(v) for v in vals],
        distr_pred_clusters={int(v): int(c) for v, c in zip(vals, cnts)},
        viE=viE_all,
        x0=x0_all,
        paras=cfg.as_dict(),
        timing=timer.as_dict(),
    )
