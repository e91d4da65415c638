"""Honest per-fold cost on TPU: planted data, on-device gen, readback sync.

Times the vmapped fold program at production shapes (B=2048, K=5, p=256,
27998 genes) for each linkage backend, with every measurement closed by a
real element readback (block_until_ready under-waits on axon).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from sharp_tpu.config import resolve_config
    from sharp_tpu.core.fold import fold_program, fold_static_args
    from sharp_tpu.ops.rp import ensemble_rp_matrix

    import os

    n_cells, n_genes, K, p = 1306127, 27998, 5, 256
    GROUP = int(os.environ.get("SHARP_PROFILE_GROUP", 4))
    B, n_types = 2048, 38
    cfg = resolve_config(
        n_cells, n_genes, ensize_K=K, reduced_ndim=p,
        partition_ncells=2000, rN_seed=7, dtype_compute="bfloat16",
        forview=False,
    )
    R_all = ensemble_rp_matrix(
        jax.random.PRNGKey(7), K, n_genes, p, dtype=jnp.bfloat16
    )

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

    @jax.jit
    def gen_group(t0):
        def gen(t):
            kf = jax.random.fold_in(jax.random.PRNGKey(999), t)
            k1, k2, k3 = jax.random.split(kf, 3)
            y = jax.random.randint(k1, (B,), 0, n_types)
            noise = jnp.exp(0.3 * jax.random.normal(k2, (B, n_genes)))
            keep = jax.random.uniform(k3, (B, n_genes)) > 0.2
            X = type_means[y] * noise * keep
            X = X / jnp.maximum(jnp.sum(X, 1, keepdims=True), 1e-9) * 1e6
            return X.astype(jnp.float32)
        return jax.vmap(gen)(t0 + jnp.arange(GROUP))

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        return o

    masks = jnp.ones((GROUP, B), bool)
    nrs = jnp.full((GROUP,), 2000, jnp.int32)

    for backend in ("rnn", "rnn_bf16"):
        static = dict(fold_static_args(cfg), linkage_backend=backend)

        @jax.jit
        def run_group(Xg):
            def one(X, m, nr):
                return fold_program(
                    X, m, nr, R_all, jnp.asarray(True), None,
                    has_indN=False, **static,
                )
            return jax.vmap(one)(Xg, masks, nrs)

        Xw = sync(gen_group(jnp.asarray(0)))
        t0 = time.time()
        sync(run_group(Xw))
        print(f"{backend}: compile+first {time.time()-t0:.1f}s")
        ts = []
        for g in range(1, 5):
            Xg = sync(gen_group(jnp.asarray(g * GROUP)))
            t0 = time.time()
            sync(run_group(Xg))
            ts.append(time.time() - t0)
        ms = np.mean(ts) * 1000
        print(f"{backend}: {ms:.0f} ms/group = {ms/GROUP:.1f} ms/fold "
              f"(readback-synced, {len(ts)} reps: "
              f"{[round(t*1000) for t in ts]})")


if __name__ == "__main__":
    main()
