"""CLI round-trip + plotting smoke tests."""

import json

import numpy as np
import pytest

from sharp_tpu.cli import main as cli_main
from tests.synth import make_tpm_like


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    X, y = make_tpm_like(n_cells=200, n_genes=400, n_types=4, seed=8)
    xpath = str(d / "X.npz")
    np.savez(xpath, X=X, gene_names=np.array([f"G{i}" for i in range(400)]))
    return d, xpath, X, y


def test_cli_cluster_markers_embed(dataset):
    d, xpath, X, y = dataset
    rpath = str(d / "res.npz")
    assert cli_main(["cluster", xpath, "--out", rpath, "--rN-seed", "3",
                     "--ensize-K", "4"]) == 0
    with np.load(rpath, allow_pickle=True) as z:
        labels = z["pred_clusters"]
        paras = json.loads(str(z["paras"]))
    assert len(labels) == 200
    assert paras["ensize_K"] == 4

    mpath = str(d / "markers.npz")
    mplot = str(d / "markers.png")
    assert cli_main(["markers", xpath, rpath, "--out", mpath,
                     "--plot", mplot]) == 0
    with np.load(mpath, allow_pickle=True) as z:
        assert len(z["mg_gene"]) >= 1
    assert (d / "markers.png").exists()

    epath = str(d / "emb.npz")
    eplot = str(d / "emb.png")
    assert cli_main(["embed", rpath, "--out", epath, "--plot", eplot]) == 0
    with np.load(epath) as z:
        assert z["embedding"].shape == (200, 2)
    assert (d / "emb.png").exists()
