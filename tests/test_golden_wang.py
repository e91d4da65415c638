"""Golden gate on the REAL Wang-pancreas class structure.

The reference's de-facto acceptance test is ARI >= 0.92 on the Wang
pancreas TPM matrix vs the bundled 479-cell ground truth
(reference README.md:104-116). The TPM matrix itself is a stripped large
blob in this mount (.MISSING_LARGE_BLOBS), so the closest reproducible
fixture is: the REAL label vector — parsed from the reference's
`data/label.RData` binary, with its true class imbalance (alpha 196,
beta 118, tiny 'duplicate'/'mesenchyme' groups) — paired with synthetic
TPM expression generated AT those labels, scored with sklearn's
independently-validated ARI. Same ensemble defaults (K=15) and seed
convention (rN.seed=2103) as the reference walkthrough.
"""

import os

import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from sharp_tpu import sharp
from tests.synth import make_tpm_like

REF_LABEL = "/root/reference/data/label.RData"

# The real expression matrix, the moment someone supplies it: set
# SHARP_WANG_TPM to a Wang_Pancreas_TPM.RData (or leave it at the
# reference's bundled path, stripped in this mount) and the TRUE
# reference acceptance gate below runs unmodified.
WANG_TPM = os.environ.get(
    "SHARP_WANG_TPM", "/root/reference/data/Wang_Pancreas_TPM.RData"
)


def _load_wang_tpm():
    """(genes x cells) matrix from the RData blob, cells-by-genes out."""
    from sharp_tpu.io.rdata import read_rdata

    obj = read_rdata(WANG_TPM)
    mat = next(iter(obj.values()))
    X = np.asarray(getattr(mat, "values", mat), np.float32)
    # reference orientation is genes x cells (R/SHARP.R:52-61)
    return X.T


@pytest.mark.skipif(
    not (os.path.exists(WANG_TPM) and os.path.getsize(WANG_TPM) > 1024),
    reason="Wang_Pancreas_TPM.RData not supplied (set SHARP_WANG_TPM)",
)
def test_wang_pancreas_real_matrix_ari():
    """THE reference acceptance test (README.md:104-116): ARI >= 0.92 on
    the real Wang pancreas TPM matrix vs the bundled 479-cell labels."""
    from sharp_tpu.io.rdata import read_rdata

    lab = read_rdata(REF_LABEL)["label"]
    codes = np.asarray(lab.codes, int) - 1
    X = _load_wang_tpm()
    assert X.shape[0] == 479
    res = sharp(X, rN_seed=2103, exp_type="TPM")
    ari = adjusted_rand_score(codes, res.pred_clusters)
    assert ari >= 0.92, f"Wang pancreas ARI {ari:.4f} below golden gate"


@pytest.mark.skipif(
    not os.path.exists(REF_LABEL), reason="reference not mounted"
)
def test_wang_pancreas_label_structure_ari():
    from sharp_tpu.io.rdata import read_rdata

    lab = read_rdata(REF_LABEL)["label"]
    codes = np.asarray(lab.codes, int) - 1  # R factor codes are 1-based
    n_types = len(lab.levels)
    assert len(codes) == 479

    X, y = make_tpm_like(
        n_cells=479, n_genes=2000, n_types=n_types, seed=3, labels=codes
    )
    res = sharp(X, rN_seed=2103, exp_type="TPM")
    ari = adjusted_rand_score(y, res.pred_clusters)
    # reference walkthrough: HA = 0.9201827 (README.md:104-108)
    assert ari >= 0.92, f"Wang-structure ARI {ari:.4f} below golden gate"

    # our 5-metric Rand family must agree with sklearn on this result
    from sharp_tpu.analysis.ari import rand_metrics

    m = rand_metrics(y, res.pred_clusters)
    assert m["HA"] == pytest.approx(ari, abs=1e-9)
