"""Worker for the 2-process jax.distributed CPU tests (test_multihost.py).

Usage: python mh_worker.py <process_id> <port> <outdir> [mode]
Runs `sharp_unlimited(multihost=True)` on deterministic synthetic blocks
and writes this process's label slice to <outdir>/p<id>.npz.

mode "budget": forces n_cells >= 1e6 so smetac_range widens the per-block
cluster search (minN -> n/50000 = 42 here) and blocks legitimately carry
MORE than min(maxN_cluster, 40) clusters — the summary-padding budget
must be sized from the widened range (streaming.py) or pad_block_summary
raises mid-stream (round-2 fix, previously untested).
"""

import os
import sys


BUDGET_KW = dict(
    rN_seed=3, ensize_K=3, reduced_ndim=48, base_ncells=200,
    partition_ncells=150, n_cells=2_100_000,
)


def budget_blocks(make_tpm_like):
    # 12 folds x ~5 consensus clusters per 1800-cell block => NC ~ 55,
    # comfortably above the forced minN floor of 42 (2.1e6 / 5e4)
    X, _ = make_tpm_like(n_cells=3600, n_genes=400, n_types=8, seed=9)
    return [X[:1800], X[1800:]]


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "basic"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path[:0] = [repo, os.path.join(repo, "tests")]
    import numpy as np
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited

    if mode == "budget":
        blocks = budget_blocks(make_tpm_like)
        r = sharp_unlimited(blocks, multihost=True, **BUDGET_KW)
    else:
        X, _ = make_tpm_like(n_cells=500, n_genes=400, n_types=4, seed=5)
        blocks = [X[:200], X[200:350], X[350:]]
        r = sharp_unlimited(
            blocks, rN_seed=3, ensize_K=3, base_ncells=200,
            partition_ncells=128, multihost=True,
        )
    np.savez(
        os.path.join(outdir, f"p{pid}.npz"),
        labels=r.pred_clusters,
        n=r.N_pred_cluster,
    )


if __name__ == "__main__":
    main()
