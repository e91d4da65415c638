"""Measure vmapped smetac over G blocks at bench shapes (NC_pad 1024/1536)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from sharp_tpu.core.smetac import smetac, smetac_range

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    n_cells = 1306127
    minN, eff_maxN = smetac_range(n_cells, 2, max(40, -(-n_cells // 5000)), 1 << 30)
    print(f"minN={minN} eff_maxN={eff_maxN}")

    for NC_pad in (1024, 1536):
        for G in (1, 8):
            NC = NC_pad - 64
            cents = np.zeros((G, NC_pad, 256), np.float32)
            cents[:, :NC] = rng.normal(size=(G, NC, 256)) * 2.0
            valid = np.zeros((G, NC_pad), bool)
            valid[:, :NC] = True
            maxN = min(eff_maxN, NC - 1)
            ncand = max(eff_maxN - minN + 1, 1)
            meta_nc_pad = ((min(eff_maxN, NC_pad) + 9) // 8) * 8

            def one(c, v, n, m):
                return smetac(
                    c, v, n, m, minN=minN, ncand=ncand,
                    meta_nc_pad=meta_nc_pad, sil_thre=0.35,
                    linkage_backend="auto",
                )

            fn = jax.jit(jax.vmap(one)) if G > 1 else jax.jit(one)
            args = (
                jnp.asarray(cents if G > 1 else cents[0]),
                jnp.asarray(valid if G > 1 else valid[0]),
                jnp.full((G,) if G > 1 else (), NC, jnp.int32),
                jnp.full((G,) if G > 1 else (), maxN, jnp.int32),
            )
            t0 = time.time()
            out = jax.block_until_ready(fn(*args))
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
            steady = (time.time() - t0) / reps
            print(
                f"NC_pad={NC_pad} G={G}: compile={compile_s:.1f}s "
                f"steady={steady:.3f}s ({steady / G:.3f}s/block)"
            )


if __name__ == "__main__":
    main()
