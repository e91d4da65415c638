"""26-block 2-process multihost streaming run at the flagship block count.

VERDICT r03 next #6: the 2-process gloo tests (tests/test_multihost.py)
exercise 2-3 blocks; the reference's flagship run is 26 blocks
(25 x 50,000 + 56,127, reference README.md:287-303). This script proves,
at the REAL block count (genes kept small so it runs on CPU in minutes):

  * the contiguous block-slice assignment (13 blocks per process),
  * the widened >= 1e6-cell allgather summary budget
    (smetac_range's maxN -> n/5000 floor, R/sMetaC.R:103-119) holding
    across all 26 block summaries,
  * manifest resume at the flagship block count: a second 2-process run
    resumes every block from its manifest and reproduces identical labels,
  * combined 2-process labels == single-process labels, bit-exact.

Writes scripts/out/multihost_26block.json (committed as the run record).

Usage: python scripts/multihost_26block.py            # driver
       python scripts/multihost_26block.py worker ... # internal
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 26 blocks x 2,000 cells; n_cells DECLARED at the reference's 1,306,127
# so the >= 1e6 smetac_range widening is live (the explicit n_cells
# override is the documented "this host sees a slice" hook,
# sharp_tpu/parallel/streaming.py). Genes kept small for CPU wall clock.
N_BLOCKS = 26
BLOCK_CELLS = 2000
N_GENES = 400
DECLARED_CELLS = 1_306_127
KW = dict(
    rN_seed=3, ensize_K=3, reduced_ndim=48, base_ncells=200,
    partition_ncells=250, n_cells=DECLARED_CELLS,
)


def make_dataset(d):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synth import make_tpm_like

    from sharp_tpu.io.blocks import save_blocks

    X, y = make_tpm_like(
        n_cells=N_BLOCKS * BLOCK_CELLS, n_genes=N_GENES, n_types=10, seed=26
    )
    blocks = [
        X[i * BLOCK_CELLS : (i + 1) * BLOCK_CELLS] for i in range(N_BLOCKS)
    ]
    save_blocks(d, blocks, fmt="sblk")
    return y


def worker():
    pid, port, ddir, out = sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = pid

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np

    from sharp_tpu import sharp_unlimited

    t0 = time.time()
    r = sharp_unlimited(ddir, multihost=True, **KW)
    np.savez(
        out, labels=r.pred_clusters, n=r.N_pred_cluster,
        seconds=time.time() - t0,
    )


def run_pair(ddir, outdir, tag):
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(pid),
             str(port), ddir, os.path.join(outdir, f"{tag}_p{pid}.npz")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    for pr in procs:
        out, err = pr.communicate(timeout=1800)
        if pr.returncode != 0:
            raise RuntimeError(f"worker failed:\n{err[-3000:]}")
    import numpy as np

    return [
        np.load(os.path.join(outdir, f"{tag}_p{pid}.npz"))
        for pid in range(2)
    ]


def main():
    import numpy as np

    sys.path.insert(0, REPO)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    work = tempfile.mkdtemp(prefix="sharp_mh26_")
    ddir = os.path.join(work, "blocks")
    print(f"generating {N_BLOCKS} SBLK blocks in {ddir} ...")
    y = make_dataset(ddir)

    print("pass 1: 2-process cold run over 26 blocks ...")
    t0 = time.time()
    p0, p1 = run_pair(ddir, work, "cold")
    cold_s = time.time() - t0
    combined = np.concatenate([p0["labels"], p1["labels"]])
    assert int(p0["n"]) == int(p1["n"]), "hosts disagree on cluster count"

    manifest = os.path.join(ddir, ".sharp_manifest")
    n_manifests = len(os.listdir(manifest))
    assert n_manifests == N_BLOCKS, (n_manifests, N_BLOCKS)

    print("pass 2: 2-process resume run (all blocks from manifest) ...")
    t0 = time.time()
    q0, q1 = run_pair(ddir, work, "resume")
    resume_s = time.time() - t0
    resumed = np.concatenate([q0["labels"], q1["labels"]])
    np.testing.assert_array_equal(combined, resumed)

    print("single-process reference ...")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sharp_tpu import sharp_unlimited
    from sklearn.metrics import adjusted_rand_score

    ref = sharp_unlimited(ddir, multihost=False, resume=False, **KW)
    np.testing.assert_array_equal(ref.pred_clusters, combined)
    ari = float(adjusted_rand_score(y, combined))

    rec = {
        "n_blocks": N_BLOCKS,
        "cells_per_block": BLOCK_CELLS,
        "declared_n_cells": DECLARED_CELLS,
        "n_clusters": int(p0["n"]),
        "ari_vs_planted": round(ari, 4),
        "ari_note": (
            "declaring 1.3M cells forces the >= 1e6 smetac_range minN "
            "floor (26) above the 10 planted types — the widened-range "
            "over-clustering is the exercised reference behavior "
            "(R/sMetaC.R:103-119), so a low ARI here is by design; this "
            "script proves multihost mechanics, not clustering quality"
        ),
        "two_process_equals_single_process": True,
        "resume_equals_cold": True,
        "manifests_written": n_manifests,
        "cold_seconds": round(cold_s, 1),
        "resume_seconds": round(resume_s, 1),
        "worker_seconds": [float(p0["seconds"]), float(p1["seconds"])],
    }
    outdir = os.path.join(REPO, "scripts", "out")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "multihost_26block.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker()
    else:
        main()
