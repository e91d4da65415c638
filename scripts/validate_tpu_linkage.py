"""On-device validation of the fast linkage backends at production shapes.

Checks, on the real TPU, that `ward_linkage_rnn` (f32 and bf16 store) and
`ward_linkage_pallas` produce VALID merge sequences at n_pad = 2048/1024:

  * all merge indices in range, no self-merges, no duplicated pairs
  * the sequence replays (each merged j is a live representative)
  * heights non-decreasing after the stable sort
  * cuts agree with the exact XLA reference loop (`ward_linkage`)

Round-1 postmortem: TPU default matmul precision corrupted all of these
(VERDICT.md "What's weak" #1). Run: python scripts/validate_tpu_linkage.py
"""

import sys

import numpy as np


def check_merges(merges, heights, n_real, n_pad, tag):
    """Structural validation of a merge sequence (first n_real-1 real)."""
    from sharp_tpu.ops.linkage import validate_merge_sequence

    errs = validate_merge_sequence(merges, heights, n_real, n_pad)
    status = "OK" if not errs else "FAIL: " + "; ".join(errs)
    print(f"  {tag}: {status}")
    return not errs


def cuts_of(merges, n_real, n_pad, ks):
    """Cluster count + label partition at each k via host replay."""
    lab = np.arange(n_pad)
    out = {}
    m = np.asarray(merges)
    for t in range(n_pad - 1):
        lab[lab == m[t, 1]] = m[t, 0]
        k_now = n_real - t - 1
        if k_now in ks:
            out[k_now] = lab[:n_real].copy()
    return out


def main():
    import jax
    import jax.numpy as jnp

    from sharp_tpu.ops.distance import pearson_distance
    from sharp_tpu.ops.linkage import ward_linkage, ward_linkage_rnn
    from sharp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})")

    rng = np.random.default_rng(0)
    ok = True
    for n_pad, n_real in [(2048, 2000), (1024, 1000)]:
        # synthetic fold: 12 planted types in p=256 RP-like feature space
        types = rng.integers(0, 12, n_real)
        cents = rng.normal(size=(12, 256)) * 3.0
        X = np.zeros((n_pad, 256), np.float32)
        X[:n_real] = cents[types] + rng.normal(size=(n_real, 256))
        mask = np.arange(n_pad) < n_real
        D = jax.block_until_ready(
            pearson_distance(jnp.asarray(X), jnp.asarray(mask))
        )
        print(f"n_pad={n_pad} n_real={n_real}:")

        ref = jax.block_until_ready(ward_linkage(D))
        check_merges(ref.merges, ref.heights, n_real, n_pad, "xla reference")
        ref_cuts = cuts_of(ref.merges, n_real, n_pad, {2, 5, 12, 20})

        for tag, st in [("rnn f32", None), ("rnn bf16", jnp.bfloat16)]:
            res = jax.block_until_ready(ward_linkage_rnn(D, store_dtype=st))
            good = check_merges(res.merges, res.heights, n_real, n_pad, tag)
            ok &= good
            if good:
                cuts = cuts_of(res.merges, n_real, n_pad, {2, 5, 12, 20})
                from sharp_tpu.analysis.ari import ari

                for k in (2, 5, 12, 20):
                    a = ari(ref_cuts[k], cuts[k])
                    flag = "" if a > 0.999 else "  <-- MISMATCH"
                    print(f"    vs xla @k={k}: ARI {a:.4f}{flag}")
                    ok &= a > 0.999

        if n_pad <= 1024 and jax.default_backend() == "tpu":
            from sharp_tpu.ops.linkage_pallas import ward_linkage_pallas

            for tag, st in [
                ("pallas f32", jnp.float32), ("pallas bf16", jnp.bfloat16)
            ]:
                res = jax.block_until_ready(
                    ward_linkage_pallas(D, store_dtype=st)
                )
                good = check_merges(
                    res.merges, res.heights, n_real, n_pad, tag
                )
                ok &= good
                if good and st == jnp.float32:
                    same = np.array_equal(
                        np.asarray(res.merges), np.asarray(ref.merges)
                    )
                    print(f"    bit-identical merges vs xla: {same}")

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
