"""Profile fuse_folds at bench shapes: host-loop vs smetac device cost.

Fabricates per-fold summaries (25 folds x ~40 clusters, p=256 — the 50k
block shape of the 1.3M bench) and times fuse_folds end to end, plus the
inner smetac call in isolation, across blocks with jittered cluster
counts (the recompile scenario the bench hits).
"""

import time

import numpy as np


def fake_fold_results(rng, T=25, nclust=40, nc_pad=48, p=256, n_fold=2000):
    frs = []
    for t in range(T):
        k = int(rng.integers(nclust - 3, nclust + 2))
        counts = np.zeros(nc_pad, np.float32)
        counts[:k] = rng.multinomial(n_fold, np.ones(k) / k)
        cents = np.zeros((nc_pad, p), np.float32)
        cents[:k] = rng.normal(size=(k, p)) * 2.0
        cent_sum = cents * counts[:, None]
        finalC = rng.integers(0, k, n_fold).astype(np.int32)
        frs.append({
            "finalC": finalC,
            "n_meta": k,
            "cent_sum": cent_sum,
            "counts": counts,
            "k_per": np.full(5, k, np.int32),
            "maxsil": np.full(5, 0.5, np.float32),
            "overflow": False,
        })
    return frs


def main():
    import jax

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from sharp_tpu.config import resolve_config
    from sharp_tpu.core.large import fuse_folds

    cfg = resolve_config(
        1306127, 27998, ensize_K=5, reduced_ndim=256,
        partition_ncells=2000, rN_seed=7, forview=False,
    )
    rng = np.random.default_rng(0)

    print(f"backend={jax.default_backend()}")
    blocks = [fake_fold_results(rng) for _ in range(6)]

    t0 = time.time()
    fuse_folds(blocks[0], cfg, n_total=50000)
    print(f"block 0 (cold): {time.time() - t0:.3f}s")
    for i, frs in enumerate(blocks):
        t0 = time.time()
        fuse_folds(frs, cfg, n_total=50000)
        print(f"block {i} (warm path): {time.time() - t0:.3f}s")

    # isolate host-side prepare/finish by timing with smetac mocked
    import sharp_tpu.core.large as large_mod

    real_smetac = large_mod.smetac
    cached = {}

    def mock_smetac(cents, valid, NC, maxN, **kw):
        key = tuple(sorted((k, str(v)) for k, v in kw.items() if k in
                           ("minN", "ncand", "meta_nc_pad")))
        if key not in cached:
            cached[key] = real_smetac(cents, valid, NC, maxN, **kw)
        return cached[key]

    large_mod.smetac = mock_smetac
    t0 = time.time()
    for frs in blocks:
        fuse_folds(frs, cfg, n_total=50000)
    host_s = (time.time() - t0) / len(blocks)
    large_mod.smetac = real_smetac
    print(f"host-side prepare+finish per block (smetac cached): {host_s:.3f}s")


if __name__ == "__main__":
    main()
