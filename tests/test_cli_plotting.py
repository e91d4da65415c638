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


def test_cli_cluster_npz_roundtrip_fields(dataset):
    """Every persisted result field survives the npz round-trip with the
    documented schema (pred_clusters, x0, viE, paras, timing)."""
    d, xpath, X, y = dataset
    rpath = str(d / "res_rt.npz")
    assert cli_main(["cluster", xpath, "--out", rpath, "--rN-seed", "3",
                     "--ensize-K", "4"]) == 0
    with np.load(rpath, allow_pickle=True) as z:
        assert set(z.files) >= {"pred_clusters", "x0", "viE", "paras",
                                "timing"}
        labels = z["pred_clusters"]
        x0 = z["x0"]
        viE = z["viE"]
        paras = json.loads(str(z["paras"]))
        timing = json.loads(str(z["timing"]))
    assert labels.min() == 1
    assert x0.shape[0] == 200 and viE.shape[0] == 200
    assert viE.shape[1] == paras["reduced_ndim"]
    assert timing  # per-stage entries present (structure checked loosely)
    # labels must be reproducible through the CLI (same seed)
    rpath2 = str(d / "res_rt2.npz")
    assert cli_main(["cluster", xpath, "--out", rpath2, "--rN-seed", "3",
                     "--ensize-K", "4"]) == 0
    with np.load(rpath2, allow_pickle=True) as z:
        np.testing.assert_array_equal(labels, z["pred_clusters"])


def test_cli_cluster_large_path(dataset):
    """Forcing base/partition knobs through the CLI reaches the fold +
    sMetaC large path (reference README.md:147-154 recipe)."""
    from sklearn.metrics import adjusted_rand_score

    d, xpath, X, y = dataset
    rpath = str(d / "res_large.npz")
    assert cli_main([
        "cluster", xpath, "--out", rpath, "--rN-seed", "7",
        "--ensize-K", "4", "--base-ncells", "100",
        "--partition-ncells", "64",
    ]) == 0
    with np.load(rpath, allow_pickle=True) as z:
        labels = z["pred_clusters"]
        paras = json.loads(str(z["paras"]))
    assert paras["base_ncells"] == 100
    # 64-cell folds of a 200-cell/4-type matrix: a path smoke test, not
    # a quality gate (those run at realistic shapes elsewhere)
    assert adjusted_rand_score(y, labels) >= 0.8


def test_cli_unlimited_blocks_and_resume(dataset, tmp_path):
    """unlimited over a block directory; a rerun resumes from the
    manifest and returns identical labels."""
    from sharp_tpu.io.blocks import BlockStore

    d, xpath, X, y = dataset
    bdir = tmp_path / "blocks"
    BlockStore(str(bdir)).write([X[:80], X[80:150], X[150:]])
    rpath = str(tmp_path / "res_u.npz")
    assert cli_main(["unlimited", str(bdir), "--out", rpath,
                     "--rN-seed", "3", "--ensize-K", "3",
                     "--base-ncells", "100",
                     "--partition-ncells", "64"]) == 0
    assert (bdir / ".sharp_manifest").exists()
    manifests = list((bdir / ".sharp_manifest").glob("block_*.npz"))
    assert len(manifests) == 3
    with np.load(rpath, allow_pickle=True) as z:
        labels1 = z["pred_clusters"]
    assert len(labels1) == 200

    rpath2 = str(tmp_path / "res_u2.npz")
    assert cli_main(["unlimited", str(bdir), "--out", rpath2,
                     "--rN-seed", "3", "--ensize-K", "3",
                     "--base-ncells", "100",
                     "--partition-ncells", "64"]) == 0
    with np.load(rpath2, allow_pickle=True) as z:
        np.testing.assert_array_equal(labels1, z["pred_clusters"])


def test_cli_markers_columns_and_plot_bytes(dataset):
    d, xpath, X, y = dataset
    rpath = str(d / "res.npz")
    mpath = str(d / "markers2.npz")
    mplot = str(d / "markers2.png")
    assert cli_main(["markers", xpath, rpath, "--out", mpath,
                     "--plot", mplot]) == 0
    with np.load(mpath, allow_pickle=True) as z:
        cols = set(z.files)
        assert cols >= {
            "mg_gene", "mg_gene_index", "mg_cluster", "mg_sparsity",
            "mg_auc", "mg_pvalue", "mg_p_adj", "mg_fold_change",
        }
        # every found cluster keeps at least one marker (adaptive AUC)
        assert set(np.unique(z["mg_cluster"])) == set(
            np.unique(np.load(rpath, allow_pickle=True)["pred_clusters"])
        )
        assert np.all(z["mg_auc"] >= 0) and np.all(z["mg_auc"] <= 1)
        assert np.all((z["mg_p_adj"] >= 0) & (z["mg_p_adj"] <= 1))
    import os

    assert os.path.getsize(mplot) > 1000  # a real PNG, not a stub


def test_cli_error_paths(tmp_path):
    """Bad invocations fail loudly: argparse exit 2, missing files raise."""
    with pytest.raises(SystemExit) as e:
        cli_main(["cluster"])  # missing required args
    assert e.value.code == 2
    with pytest.raises(FileNotFoundError):
        cli_main(["cluster", str(tmp_path / "nope.npz"),
                  "--out", str(tmp_path / "o.npz")])
    with pytest.raises(SystemExit):
        cli_main([])  # no subcommand


def test_cli_unlimited_forview_embed(tmp_path):
    """unlimited --forview carries viE/x0 into the result npz and `embed`
    runs on it (the reference keeps per-block viE exactly so its
    visualization works on unlimited results, R/SHARP_unlimited.R:216-235)."""
    from sharp_tpu.io.blocks import save_blocks

    X, y = make_tpm_like(n_cells=600, n_genes=400, n_types=4, seed=6)
    bdir = str(tmp_path / "blocks")
    save_blocks(bdir, [X[:200], X[200:400], X[400:]], fmt="sblk")
    rpath = str(tmp_path / "res_u.npz")
    assert cli_main([
        "unlimited", bdir, "--out", rpath, "--rN-seed", "3",
        "--ensize-K", "4", "--base-ncells", "150",
        "--partition-ncells", "128", "--forview",
    ]) == 0
    with np.load(rpath, allow_pickle=True) as z:
        assert z["viE"].shape[0] == 600
        assert z["x0"].shape[0] == 600
    epath = str(tmp_path / "emb.npz")
    assert cli_main(["embed", rpath, "--out", epath]) == 0
    with np.load(epath) as z:
        assert z["embedding"].shape == (600, 2)

    # a result WITHOUT view planes fails loud in embed (not KeyError)
    r2 = str(tmp_path / "res_nv.npz")
    assert cli_main([
        "unlimited", bdir, "--out", r2, "--rN-seed", "3",
        "--ensize-K", "4", "--base-ncells", "150",
        "--partition-ncells", "128", "--no-resume",
    ]) == 0
    with pytest.raises(ValueError, match="forview"):
        cli_main(["embed", r2, "--out", str(tmp_path / "e2.npz")])
