"""On-device hardware lane (SHARP_TPU_TESTS=1 on a TPU host).

Production-shape checks that previously lived only in ad-hoc scripts and
bench-day gates — as pytest failures instead (VERDICT r2 item 7). The
round-1 postmortem (TPU matmul precision corrupting every merge sequence
while CPU tests stayed green) is the class of regression this lane
catches. Mirrors the reference's run-on-real-data acceptance convention
(reference README.md:104-116).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    return jax


def _cuts_of(merges, n_real, n_pad, ks):
    """Cluster partition at each k via host replay of the merge sequence."""
    lab = np.arange(n_pad)
    out = {}
    m = np.asarray(merges)
    for t in range(n_pad - 1):
        lab[lab == m[t, 1]] = m[t, 0]
        k_now = n_real - t - 1
        if k_now in ks:
            out[k_now] = lab[:n_real].copy()
    return out


@pytest.mark.parametrize("n_pad,n_real", [(2048, 2000), (1024, 1000)])
def test_linkage_backends_production_shapes(tpu_backend, n_pad, n_real):
    """rnn f32/bf16 (and the serial Pallas kernel at <=1024) must produce
    structurally valid merge sequences on device at the production pads,
    with cuts matching the exact XLA reference loop."""
    jax = tpu_backend
    import jax.numpy as jnp

    from sharp_tpu.analysis.ari import ari
    from sharp_tpu.ops.distance import pearson_distance
    from sharp_tpu.ops.linkage import (
        validate_merge_sequence,
        ward_linkage,
        ward_linkage_rnn,
    )

    rng = np.random.default_rng(0)
    types = rng.integers(0, 12, n_real)
    cents = rng.normal(size=(12, 256)) * 3.0
    X = np.zeros((n_pad, 256), np.float32)
    X[:n_real] = cents[types] + rng.normal(size=(n_real, 256))
    mask = np.arange(n_pad) < n_real
    D = jax.block_until_ready(
        pearson_distance(jnp.asarray(X), jnp.asarray(mask))
    )

    ref = jax.block_until_ready(ward_linkage(D))
    assert not validate_merge_sequence(ref.merges, ref.heights, n_real, n_pad)
    ref_cuts = _cuts_of(ref.merges, n_real, n_pad, {2, 5, 12, 20})

    for tag, st in [("rnn_f32", None), ("rnn_bf16", jnp.bfloat16)]:
        res = jax.block_until_ready(ward_linkage_rnn(D, store_dtype=st))
        errs = validate_merge_sequence(res.merges, res.heights, n_real, n_pad)
        assert not errs, f"{tag}: {errs}"
        cuts = _cuts_of(res.merges, n_real, n_pad, {2, 5, 12, 20})
        for k in (2, 5, 12, 20):
            a = ari(ref_cuts[k], cuts[k])
            if st is jnp.bfloat16 and k > 12:
                # beyond the 12 planted types a cut splits near-duplicate
                # substructure whose margins sit below bf16 store
                # resolution — which split the tree makes is
                # rounding-determined (measured 0.802 at k=20 on the
                # r03, r04 AND r05 ladders; k <= true structure is
                # exactly 1.0). The bf16 backend's contract is
                # ARI-equivalence at structure-level cuts, not
                # bit-equality at super-resolution ones. Gate pinned
                # just under the stable measured value so a genuine
                # fine-cut regression cannot hide (ADVICE r04).
                assert a > 0.78, f"{tag} cut k={k} vs xla (ARI {a})"
            else:
                assert a > 0.999, (
                    f"{tag} cut k={k} diverges from xla (ARI {a})"
                )

    if n_pad == 2048:
        # the fused Pallas round scatter (opt-in round_impl) must stay
        # BIT-identical to the XLA rounds on real hardware — including
        # bf16, where cross-compile argmin tie instability originally
        # broke it (fixed by the deterministic first_argmin; r05)
        rx = jax.block_until_ready(
            ward_linkage_rnn(D, store_dtype=jnp.bfloat16, round_impl="xla")
        )
        rp = jax.block_until_ready(
            ward_linkage_rnn(
                D, store_dtype=jnp.bfloat16, round_impl="pallas"
            )
        )
        assert np.array_equal(np.asarray(rx.merges), np.asarray(rp.merges))
        assert np.array_equal(
            np.asarray(rx.heights), np.asarray(rp.heights)
        )

        # compact_n > 256 (a public knob) must route its tail off the
        # Pallas kernel — its VMEM-budgeted lane chunk falls under the
        # 8-sublane tiling floor there (ADVICE r03; the failure modes
        # are a Mosaic reject or a compile HANG)
        res = jax.block_until_ready(
            ward_linkage_rnn(D, store_dtype=jnp.bfloat16, compact_n=512)
        )
        errs = validate_merge_sequence(res.merges, res.heights, n_real, n_pad)
        assert not errs, f"compact_n=512: {errs}"

    if n_pad <= 1024:
        from sharp_tpu.ops.linkage_pallas import ward_linkage_pallas

        for tag, st in [("pallas_f32", jnp.float32),
                        ("pallas_bf16", jnp.bfloat16)]:
            res = jax.block_until_ready(ward_linkage_pallas(D, store_dtype=st))
            errs = validate_merge_sequence(
                res.merges, res.heights, n_real, n_pad
            )
            assert not errs, f"{tag}: {errs}"
        resf = jax.block_until_ready(ward_linkage_pallas(D))
        # bit-identity over the REAL merges: the trailing structural pad
        # merges are all-tied (equal pad-tier distances) and their order
        # is compile-dependent; they carry no information — every real
        # cut k <= n_real is taken before any pad merge (verified
        # pre-existing on the r03 ladder: rows >= n_real - 1 differ,
        # rows < n_real - 1 bit-equal)
        assert np.array_equal(
            np.asarray(resf.merges)[: n_real - 1],
            np.asarray(ref.merges)[: n_real - 1],
        ), "pallas f32 REAL merges not bit-identical to the xla reference"


def test_mini_end_to_end_sharp(tpu_backend):
    """sharp() large path at n=5000 on the real chip with an ARI gate."""
    import sys

    sys.path.insert(0, "tests")
    from sklearn.metrics import adjusted_rand_score
    from synth import make_tpm_like

    from sharp_tpu import sharp

    X, y = make_tpm_like(n_cells=5000, n_genes=2000, n_types=8, seed=13)
    res = sharp(
        X, rN_seed=7, ensize_K=5, exp_type="TPM", forview=False,
        dtype_compute="bfloat16",
    )
    ari = adjusted_rand_score(y, res.pred_clusters)
    assert ari >= 0.9, f"on-device end-to-end ARI {ari:.4f}"


def test_sparse_device_feed_bit_identical(tpu_backend, tmp_path):
    """CSR triplet transfer + on-device scatter densify == dense feed,
    on the real chip (the production streaming input path)."""
    import sys

    sys.path.insert(0, "tests")
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited
    from sharp_tpu.io.blocks import save_blocks

    X, y = make_tpm_like(n_cells=1000, n_genes=600, n_types=5, seed=41)
    d = str(tmp_path / "sblk")
    save_blocks(d, [X[:400], X[400:700], X[700:]], fmt="sblk")
    kw = dict(rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300,
              dtype_compute="bfloat16", resume=False)
    r_dense = sharp_unlimited(d, sparse_feed=False, **kw)
    r_sparse = sharp_unlimited(d, sparse_feed=True, **kw)
    np.testing.assert_array_equal(r_dense.pred_clusters, r_sparse.pred_clusters)


def test_streaming_hbm_budget_group_sizing(tpu_backend, tmp_path, monkeypatch):
    """Memory-aware fold grouping on the real chip (VERDICT r03 next #2):
    a tight SHARP_TPU_HBM_BUDGET must shrink the staged group, the run
    must complete, labels must be invariant to the group size, and —
    when the backend reports memory stats — the pass must stay inside a
    small multiple of the budget."""
    import sys

    sys.path.insert(0, "tests")
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited
    from sharp_tpu.io.blocks import save_blocks
    from sharp_tpu.parallel.sharded import auto_group

    jax = tpu_backend
    X, y = make_tpm_like(n_cells=4000, n_genes=2000, n_types=6, seed=3)
    d = str(tmp_path / "sblk")
    save_blocks(d, [X[:2000], X[2000:]], fmt="sblk")
    kw = dict(rN_seed=7, ensize_K=4, partition_ncells=500,
              dtype_compute="bfloat16", resume=False)

    r_wide = sharp_unlimited(d, group=8, **kw)

    budget = 48 << 20  # 48 MB: forces a small group at this shape
    monkeypatch.setenv("SHARP_TPU_HBM_BUDGET", str(budget))
    g = auto_group(512, 2000, sparse=True)
    assert g < 8, f"budget did not bind (group={g})"

    dev = jax.local_devices()[0]
    stats0 = dev.memory_stats() or {}
    r_tight = sharp_unlimited(d, **kw)  # group auto-sized from the budget
    np.testing.assert_array_equal(r_wide.pred_clusters, r_tight.pred_clusters)

    stats1 = dev.memory_stats() or {}
    if "bytes_in_use" in stats1 and "bytes_in_use" in stats0:
        # loose envelope: staged groups honor the budget; the fold
        # program's own working set rides on top
        growth = stats1["bytes_in_use"] - stats0["bytes_in_use"]
        assert growth < 8 * budget, f"resident growth {growth / 1e6:.0f} MB"


def test_densify_production_shape_exact(tpu_backend):
    """The sparse device-feed scatter must be bit-exact at PRODUCTION
    shape on the real chip. Regression pin for the round-4 discovery:
    with indices_are_sorted=True the TPU scatter lowering corrupted
    ~98% of nonzeros at 2000 x 27998 / ~4M nnz (while the 600-gene
    small-shape lane test stayed green), silently feeding garbage
    expression to every fold of the API path."""
    import scipy.sparse as sp

    from sharp_tpu.io.sparse import (
        SparseBlock, densify_folds, fold_triplets, nnz_pad,
    )

    rng = np.random.default_rng(5)
    n, genes, keep = 2000, 27998, 2048
    cols = np.sort(
        rng.integers(0, genes, (n, keep), dtype=np.int32), axis=1
    )
    # dedup within rows: bump duplicates onto distinct columns
    for i in range(n):
        u, idx = np.unique(cols[i], return_index=True)
        extra = rng.choice(
            np.setdiff1d(np.arange(genes, dtype=np.int32), u,
                         assume_unique=False),
            keep - len(u), replace=False,
        )
        cols[i] = np.sort(np.concatenate([u, extra.astype(np.int32)]))
    vals = rng.lognormal(2.0, 1.0, (n, keep)).astype(np.float32)
    indptr = np.arange(n + 1, dtype=np.int64) * keep
    sb = SparseBlock(n=n, g=genes, indptr=indptr,
                     indices=cols.ravel(), data=vals.ravel())

    block_pad = 2048
    budget = nnz_pad(n * keep)
    rows_t, cols_t, vals_t = fold_triplets(
        sb, [0], [n], block_pad, budget
    )
    dense = np.asarray(densify_folds(
        rows_t, cols_t, vals_t, block_pad=block_pad, genes=genes
    ))[0]
    ref = np.asarray(sp.csr_matrix(
        (sb.data, sb.indices, sb.indptr), shape=(n, genes)
    ).todense(), np.float32)
    np.testing.assert_array_equal(dense[:n], ref)
    assert not dense[n:].any()

    dlog = np.asarray(densify_folds(
        rows_t, cols_t, vals_t, block_pad=block_pad, genes=genes,
        log2p1=True,
    ))[0]
    import jax.numpy as jnp

    ref_log = np.asarray(jnp.log2(1.0 + jnp.asarray(ref)))
    np.testing.assert_allclose(dlog[:n], ref_log, rtol=0, atol=0)


def test_streaming_forview_on_device(tpu_backend, tmp_path):
    """forview=True through the streaming path ON THE CHIP: the view
    planes ride the selective bulk readback (summaries_to_host) and the
    embedding runs on the blocked result."""
    import sys

    sys.path.insert(0, "tests")
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited
    from sharp_tpu.analysis.embed import visualization_embedding
    from sharp_tpu.io.blocks import save_blocks

    X, y = make_tpm_like(n_cells=1000, n_genes=600, n_types=5, seed=41)
    d = str(tmp_path / "sblk")
    save_blocks(d, [X[:400], X[400:700], X[700:]], fmt="sblk")
    res = sharp_unlimited(
        d, rN_seed=19, ensize_K=4, partition_ncells=250, base_ncells=300,
        dtype_compute="bfloat16", resume=False, forview=True,
    )
    assert res.viE is not None and res.viE.shape[0] == 1000
    assert res.x0 is not None and res.x0.shape == (1000, res.N_pred_cluster)
    emb, idx = visualization_embedding(res, n_iter=50)
    assert emb.shape == (1000, 2) and np.isfinite(emb).all()
