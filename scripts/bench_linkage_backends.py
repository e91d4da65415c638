"""Time the linkage backends at production shapes on the real device.

Decides resolve_linkage_backend's defaults: rnn f32 vs bf16 at n=2048
(K=5 vmapped, the fold ensemble shape) and pallas f32 at n<=1024.
"""

import time

import numpy as np


def t(fn, *a, r=5):
    import jax

    fn(*a)  # compile
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(r):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / r


def main():
    import jax
    import jax.numpy as jnp

    from sharp_tpu.ops.distance import pearson_distance
    from sharp_tpu.ops.linkage import ward_linkage_rnn
    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    K = 5
    for n_pad, n_real in [(2048, 2000), (1024, 1000)]:
        types = rng.integers(0, 12, n_real)
        cents = rng.normal(size=(12, 256)) * 3.0
        Xs = np.zeros((K, n_pad, 256), np.float32)
        for k in range(K):
            Xs[k, :n_real] = cents[types] + rng.normal(size=(n_real, 256))
        mask = np.arange(n_pad) < n_real
        D = jax.vmap(lambda x: pearson_distance(x, jnp.asarray(mask)))(
            jnp.asarray(Xs)
        )
        D = jax.block_until_ready(D)

        f32 = jax.jit(jax.vmap(lambda d: ward_linkage_rnn(d)))
        bf16 = jax.jit(
            jax.vmap(lambda d: ward_linkage_rnn(d, store_dtype=jnp.bfloat16))
        )
        print(f"n={n_pad} K={K}: rnn f32 {t(f32, D)*1e3:7.1f} ms   "
              f"rnn bf16 {t(bf16, D)*1e3:7.1f} ms")
        if jax.default_backend() == "tpu":
            from sharp_tpu.ops.linkage_pallas import ward_linkage_pallas

            if n_pad <= 1024:
                pf = jax.jit(
                    lambda d: ward_linkage_pallas(d, store_dtype=jnp.float32)
                )
                print(f"             pallas f32 {t(pf, D)*1e3:7.1f} ms")
            pb = jax.jit(
                lambda d: ward_linkage_pallas(d, store_dtype=jnp.bfloat16)
            )
            print(f"             pallas bf16 {t(pb, D)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
