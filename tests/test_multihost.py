"""Multi-host orchestration: block assignment + summary wire format.

True multi-process runs need a pod; these tests pin the deterministic
pieces (contiguous slices, padding, single-process degenerate path) that
make every host compute the identical global sMetaC.
"""

import numpy as np
import pytest

from sharp_tpu.parallel.multihost import (
    allgather_summaries,
    block_slice,
    distributed_init,
    pad_block_summary,
)


def test_block_slice_partition():
    for n_blocks in [1, 5, 26, 27]:
        for pc in [1, 2, 4, 8]:
            slices = [block_slice(n_blocks, h, pc) for h in range(pc)]
            flat = [b for s in slices for b in s]
            assert flat == list(range(n_blocks))  # disjoint, ordered
            lens = [len(s) for s in slices]
            assert max(lens) - min(lens) <= 1    # balanced


def test_pad_block_summary_roundtrip():
    cents = np.arange(12, dtype=np.float32).reshape(3, 4)
    counts = np.asarray([5.0, 2.0, 1.0], np.float32)
    cp, cc = pad_block_summary(cents, counts, budget=8)
    assert cp.shape == (8, 4) and cc.shape == (8,)
    C = int((cc > 0).sum())
    np.testing.assert_array_equal(cp[:C], cents)
    np.testing.assert_array_equal(cc[:C], counts)
    with pytest.raises(ValueError):
        pad_block_summary(cents, counts, budget=2)


def test_single_process_degenerate():
    assert distributed_init() == (0, 1)
    x = np.ones((3, 4), np.float32)
    np.testing.assert_array_equal(allgather_summaries(x), x)


def test_sharp_unlimited_multihost_single_process_identical():
    import sys

    sys.path.insert(0, "tests")
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited

    X, y = make_tpm_like(n_cells=500, n_genes=400, n_types=4, seed=5)
    blocks = [X[:200], X[200:350], X[350:]]
    r1 = sharp_unlimited(blocks, rN_seed=3, ensize_K=3, base_ncells=200,
                         partition_ncells=128, multihost=False)
    r2 = sharp_unlimited(blocks, rN_seed=3, ensize_K=3, base_ncells=200,
                         partition_ncells=128, multihost=True)
    np.testing.assert_array_equal(r1.pred_clusters, r2.pred_clusters)
    assert r1.N_pred_cluster == r2.N_pred_cluster


def _run_two_process(tmp_path, mode="basic"):
    import os
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path),
             mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    for pr in procs:
        try:
            out, err = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            raise
        assert pr.returncode == 0, err[-3000:]
    return np.load(tmp_path / "p0.npz"), np.load(tmp_path / "p1.npz")


def test_sharp_unlimited_two_process_identical(tmp_path):
    """True 2-process jax.distributed exercise of the streaming path:
    each process clusters a disjoint block slice, the summary all-gather
    runs with process_count == 2 (gloo CPU collectives), and the
    concatenated per-process label slices must equal the single-process
    result exactly."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited

    p0, p1 = _run_two_process(tmp_path)

    X, _ = make_tpm_like(n_cells=500, n_genes=400, n_types=4, seed=5)
    blocks = [X[:200], X[200:350], X[350:]]
    ref = sharp_unlimited(
        blocks, rN_seed=3, ensize_K=3, base_ncells=200,
        partition_ncells=128, multihost=False,
    )
    combined = np.concatenate([p0["labels"], p1["labels"]])
    np.testing.assert_array_equal(ref.pred_clusters, combined)
    assert int(p0["n"]) == int(p1["n"]) == ref.N_pred_cluster


def test_sharp_unlimited_two_process_megacell_budget(tmp_path):
    """2-process multihost with n_cells forced >= 1e6: smetac_range
    widens the per-block search (minN -> 42 here), every block carries
    > min(maxN_cluster, 40) clusters, and the all-gather summary budget
    must cover it (streaming.py sizes it from the widened range — the
    round-2 fix this test pins; sized from 40 it raises mid-stream)."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from mh_worker import BUDGET_KW, budget_blocks
    from synth import make_tpm_like

    from sharp_tpu import sharp_unlimited

    p0, p1 = _run_two_process(tmp_path, mode="budget")

    ref = sharp_unlimited(
        budget_blocks(make_tpm_like), multihost=False, **BUDGET_KW
    )
    # the widened range actually bit: the >= 1e6 minN floor (42) forces
    # more clusters than the pre-fix budget of 40 could ship
    assert ref.N_pred_cluster >= 42, ref.N_pred_cluster
    combined = np.concatenate([p0["labels"], p1["labels"]])
    np.testing.assert_array_equal(ref.pred_clusters, combined)
    assert int(p0["n"]) == int(p1["n"]) == ref.N_pred_cluster
