"""Diagnose where the bench's 12-type structure loses a cluster.

Reproduces the bench's synthetic config at 65k and reports: per-member
chosen k, per-fold wMetaC n_meta, per-fold ARI vs planted types, and the
block-fuse smetac candidate scores around the chosen cut.
"""

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from sharp_tpu.analysis.ari import ari
    from sharp_tpu.config import resolve_config, pad_dim
    from sharp_tpu.core.fold import fold_program, fold_static_args
    from sharp_tpu.core.large import fold_sizes, fuse_folds, summary_to_host
    from sharp_tpu.ops.rp import ensemble_rp_matrix

    n_cells, n_genes, n_types, K, p, fold = 65536, 27998, 12, 5, 256, 2000
    cfg = resolve_config(
        n_cells, n_genes, ensize_K=K, reduced_ndim=p,
        partition_ncells=fold, rN_seed=7, dtype_compute="bfloat16",
        forview=False,
    )
    sizes = fold_sizes(n_cells, cfg.partition_ncells)
    B = pad_dim(max(sizes))
    static = fold_static_args(cfg)

    kroot = jax.random.PRNGKey(123)
    kb, kde, ksign = jax.random.split(kroot, 3)
    base = jnp.exp(1.0 + 1.0 * jax.random.normal(kb, (n_genes,)))
    de_mask = jax.random.uniform(kde, (n_genes,)) < 0.35
    signs = jax.random.choice(
        ksign, jnp.asarray([-1.0, 1.0]), shape=(n_types, n_genes)
    )
    type_means = base[None, :] * jnp.where(
        de_mask[None, :], 2.0 ** (signs * 6.0), 1.0
    )

    def gen_fold(t, n_real):
        kf = jax.random.fold_in(jax.random.PRNGKey(999), t)
        k1, k2, k3 = jax.random.split(kf, 3)
        y = jax.random.randint(k1, (B,), 0, n_types)
        noise = jnp.exp(0.3 * jax.random.normal(k2, (B, n_genes)))
        keep = jax.random.uniform(k3, (B, n_genes)) > 0.2
        X = type_means[y] * noise * keep
        X = X / jnp.maximum(jnp.sum(X, axis=1, keepdims=True), 1e-9) * 1e6
        return X.astype(jnp.float32), y

    R_all = ensemble_rp_matrix(
        jax.random.PRNGKey(7), K, n_genes, p, dtype=jnp.bfloat16
    )

    NFOLD = int(os.environ.get("NFOLD", 6))
    frs, truths = [], []
    for t in range(NFOLD):
        X, y = gen_fold(t, sizes[t])
        mask = jnp.arange(B) < sizes[t]
        s = fold_program(
            X, mask, jnp.asarray(sizes[t]), R_all, jnp.asarray(True),
            None, has_indN=False, **static,
        )
        s = jax.block_until_ready(s)
        fr = summary_to_host(s, sizes[t], forview=False)
        yt = np.asarray(y)[: sizes[t]]
        a = ari(yt, fr["finalC"])
        print(
            f"fold {t}: k_per={fr['k_per'].tolist()} "
            f"maxsil={np.round(fr['maxsil'], 3).tolist()} "
            f"n_meta={fr['n_meta']} fold_ARI={a:.4f}"
        )
        frs.append(fr)
        truths.append(yt)

    fres = fuse_folds(frs, cfg, n_total=sum(sizes[:NFOLD]))
    truth = np.concatenate(truths)
    print(
        f"fuse over {NFOLD} folds: n_final={fres.n_final} "
        f"ARI={ari(truth, fres.labels):.4f}"
    )

    # cross-tab of merged labels vs truth
    import collections

    tab = collections.Counter(zip(truth.tolist(), fres.labels.tolist()))
    types_by_label = collections.defaultdict(set)
    for (ty, lb), c in tab.items():
        if c > 50:
            types_by_label[lb].add(ty)
    for lb, tys in sorted(types_by_label.items()):
        if len(tys) > 1:
            print(f"  fused label {lb} covers planted types {sorted(tys)}")


if __name__ == "__main__" and os.environ.get("DUMP") != "1":
    main()


def dump_cents(outfile="/tmp/fuse_debug.npz"):
    """Variant of main() that also persists the fuse inputs for offline
    selection analysis."""
    # re-run main's fold pass but keep summaries
    import jax
    import jax.numpy as jnp

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from sharp_tpu.analysis.ari import ari  # noqa: F401
    from sharp_tpu.config import resolve_config, pad_dim
    from sharp_tpu.core.fold import fold_program, fold_static_args
    from sharp_tpu.core.large import fold_sizes, summary_to_host
    from sharp_tpu.ops.rp import ensemble_rp_matrix

    n_cells, n_genes, n_types, K, p, fold = 65536, 27998, 12, 5, 256, 2000
    cfg = resolve_config(
        n_cells, n_genes, ensize_K=K, reduced_ndim=p,
        partition_ncells=fold, rN_seed=7, dtype_compute="bfloat16",
        forview=False,
    )
    sizes = fold_sizes(n_cells, cfg.partition_ncells)
    B = pad_dim(max(sizes))
    static = fold_static_args(cfg)
    kroot = jax.random.PRNGKey(123)
    kb, kde, ksign = jax.random.split(kroot, 3)
    base = jnp.exp(1.0 + 1.0 * jax.random.normal(kb, (n_genes,)))
    de_mask = jax.random.uniform(kde, (n_genes,)) < 0.35
    signs = jax.random.choice(
        ksign, jnp.asarray([-1.0, 1.0]), shape=(n_types, n_genes)
    )
    type_means = base[None, :] * jnp.where(
        de_mask[None, :], 2.0 ** (signs * 6.0), 1.0
    )
    R_all = ensemble_rp_matrix(
        jax.random.PRNGKey(7), K, n_genes, p, dtype=jnp.bfloat16
    )
    NFOLD = int(os.environ.get("NFOLD", 6))
    cents, counts, finalC, truth = [], [], [], []
    for t in range(NFOLD):
        kf = jax.random.fold_in(jax.random.PRNGKey(999), t)
        k1, k2, k3 = jax.random.split(kf, 3)
        y = jax.random.randint(k1, (B,), 0, n_types)
        noise = jnp.exp(0.3 * jax.random.normal(k2, (B, n_genes)))
        keep = jax.random.uniform(k3, (B, n_genes)) > 0.2
        X = type_means[y] * noise * keep
        X = (X / jnp.maximum(jnp.sum(X, axis=1, keepdims=True), 1e-9)
             * 1e6).astype(jnp.float32)
        mask = jnp.arange(B) < sizes[t]
        s = fold_program(
            X, mask, jnp.asarray(sizes[t]), R_all, jnp.asarray(True),
            None, has_indN=False, **static,
        )
        fr = summary_to_host(jax.block_until_ready(s), sizes[t],
                             forview=False)
        cents.append(fr["cent_sum"])
        counts.append(fr["counts"])
        finalC.append(fr["finalC"])
        truth.append(np.asarray(y)[: sizes[t]])
    np.savez(
        outfile,
        cent_sum=np.stack(cents), counts=np.stack(counts),
        finalC=np.concatenate(finalC), truth=np.concatenate(truth),
        sizes=np.asarray(sizes[:NFOLD]),
    )
    print("saved", outfile)


if __name__ == "__main__" and os.environ.get("DUMP") == "1":
    dump_cents()
    sys.exit(0)
