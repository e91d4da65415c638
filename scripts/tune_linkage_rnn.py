"""Tune ward_linkage_rnn ladder knobs on TPU at the production shape.

Times the vmapped (GROUP x K) ladder at n_pad=2048 for a grid of
(pair_cap, compact_n, compact_cap) and reports ms/fold with honest
readback sync, plus the round counts the ladder actually runs (host
replica of the mutual-NN round structure).
"""

import itertools
import time

import numpy as np


def host_round_counts(D, pair_cap, compact_n, compact_cap):
    """Replay the ladder's round structure host-side, counting rounds."""
    n = D.shape[0]
    D = D.copy()
    np.fill_diagonal(D, np.inf)
    alive = np.ones(n, bool)
    sizes = np.ones(n)
    rounds = []
    lvl = n
    C = compact_n

    def one_round(P):
        nn = np.argmin(D, axis=1)
        ar = np.arange(len(nn))
        mutual = (nn[nn] == ar) & alive[: len(nn)]
        lead = mutual & (ar < nn)
        pairs = np.nonzero(lead)[0][:P]
        for a in pairs:
            b = nn[a]
            na, nb = sizes[a], sizes[b]
            h = D[a, b]
            nk = sizes
            new = ((na + nk) * D[a] + (nb + nk) * D[b] - nk * h) / (
                na + nb + nk
            )
            D[a, :] = new
            D[:, a] = new
            D[a, a] = np.inf
            D[b, :] = np.inf
            D[:, b] = np.inf
            alive[b] = False
            sizes[a] = na + nb
        return len(pairs)

    while lvl > C:
        nxt = max(lvl // 2, C)
        r = 0
        while alive.sum() > nxt:
            m = one_round(min(pair_cap, lvl // 2))
            r += 1
            if m == 0:
                break
        rounds.append((lvl, r))
        # compact
        surv = np.nonzero(alive)[0][:nxt]
        D = D[np.ix_(surv, surv)].copy()
        sizes = sizes[surv].copy()
        alive = np.ones(len(surv), bool)
        lvl = nxt
    r = 0
    while alive.sum() > 1:
        m = one_round(compact_cap)
        r += 1
        if m == 0:
            break
    rounds.append((lvl, r))
    return rounds


def main():
    import jax
    import jax.numpy as jnp

    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from sharp_tpu.ops.distance import pearson_distance
    from sharp_tpu.ops.linkage import (
        validate_merge_sequence,
        ward_linkage_rnn,
    )

    GROUP, K, B, p = 4, 5, 2048, 256
    n_real = 2000
    rng = np.random.default_rng(5)
    types = rng.integers(0, 12, (GROUP * K, n_real))
    cents = rng.normal(size=(12, p)) * 3.0
    X = np.zeros((GROUP * K, B, p), np.float32)
    for i in range(GROUP * K):
        X[i, :n_real] = cents[types[i]] + rng.normal(size=(n_real, p))
    mask = np.arange(B) < n_real
    Db = jax.vmap(lambda x: pearson_distance(jnp.asarray(x), jnp.asarray(mask)))(
        jnp.asarray(X)
    )
    Db = jax.block_until_ready(Db)

    # host round-count replica on the first problem
    D0 = np.asarray(Db[0], np.float64)
    for pc in (128, 256, 512):
        rc = host_round_counts(D0.copy(), pc, 256, 32)
        print(f"pair_cap={pc}: rounds per level {rc}")

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        return o

    grid = list(
        itertools.product((128, 256, 512), (256, 512), (32, 64))
    )
    for pc, cn, cc in grid:
        fn = jax.jit(
            jax.vmap(
                lambda D: ward_linkage_rnn(
                    D, pair_cap=pc, store_dtype=jnp.bfloat16,
                    compact_n=cn, compact_cap=cc,
                )
            )
        )
        res = sync(fn(Db))  # compile
        errs = validate_merge_sequence(
            np.asarray(res.merges[0]), np.asarray(res.heights[0]), n_real, B
        )
        ts = []
        for _ in range(3):
            t0 = time.time()
            sync(fn(Db))
            ts.append(time.time() - t0)
        ms = min(ts) * 1000
        print(
            f"pair_cap={pc} compact_n={cn} compact_cap={cc}: "
            f"{ms:.1f} ms/batch = {ms / GROUP:.1f} ms/fold "
            f"valid={'yes' if not errs else errs}"
        )


if __name__ == "__main__":
    main()
