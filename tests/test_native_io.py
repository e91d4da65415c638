"""Native SBLK codec tests: roundtrip, fallback parity, BlockStore use."""

import numpy as np
import pytest
import scipy.sparse as sp

from sharp_tpu.io import native
from sharp_tpu.io.blocks import BlockStore


def _random_sparse(n, g, density, seed, ints=False):
    rng = np.random.default_rng(seed)
    M = sp.random(
        n, g, density=density, format="csr", random_state=seed,
        data_rvs=lambda k: (
            rng.integers(1, 500, k).astype(np.float64)
            if ints
            else rng.lognormal(1, 1, k)
        ),
    )
    return M


@pytest.mark.parametrize("ints", [False, True])
def test_sblk_roundtrip(tmp_path, ints):
    M = _random_sparse(123, 456, 0.05, seed=0, ints=ints)
    path = str(tmp_path / "b.sblk")
    native.write_sblk(path, M)
    n, g, nnz, dt = native.read_header(path)
    assert (n, g) == (123, 456)
    assert nnz == M.nnz
    assert dt == (1 if ints else 0)
    out = native.densify(path)
    ref = np.asarray(M.todense(), np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_sblk_native_matches_python_fallback(tmp_path):
    M = _random_sparse(200, 300, 0.03, seed=1)
    path = str(tmp_path / "b.sblk")
    native.write_sblk(path, M)
    ref = native._py_densify(path)
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    out = native.densify(path)
    np.testing.assert_array_equal(out, ref)


def test_sblk_dense_input(tmp_path):
    rng = np.random.default_rng(2)
    X = (rng.random((50, 80)) > 0.7) * rng.lognormal(0, 1, (50, 80))
    path = str(tmp_path / "d.sblk")
    native.write_sblk(path, X.astype(np.float32))
    np.testing.assert_allclose(
        native.densify(path), X.astype(np.float32), rtol=1e-6
    )


def test_blockstore_sblk_format(tmp_path):
    rng = np.random.default_rng(3)
    blocks = [
        (rng.random((40, 60)) > 0.5) * rng.integers(0, 100, (40, 60))
        for _ in range(3)
    ]
    blocks = [b.astype(np.float32) for b in blocks]
    d = str(tmp_path / "store")
    store = BlockStore(d)
    store.write(blocks, fmt="sblk")
    files = store.files()
    assert len(files) == 3
    assert all(f.endswith(".sblk") for f in files)
    for f, b in zip(files, blocks):
        np.testing.assert_allclose(BlockStore.load(f), b, rtol=1e-6)
    info = store.shape_info()
    assert info["n_cells"] == 120
