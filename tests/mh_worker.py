"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Usage: python mh_worker.py <process_id> <port> <outdir>
Runs `sharp_unlimited(multihost=True)` on deterministic synthetic blocks
and writes this process's label slice to <outdir>/p<id>.npz.
"""

import os
import sys


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
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
