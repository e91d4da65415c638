"""RData/RDS reader tests against the reference's bundled artifact."""

import os

import numpy as np
import pytest

from sharp_tpu.io.rdata import RFactor, read_rdata

REF_LABEL = "/root/reference/data/label.RData"


@pytest.mark.skipif(not os.path.exists(REF_LABEL), reason="reference not mounted")
def test_read_reference_label_factor():
    d = read_rdata(REF_LABEL)
    assert list(d) == ["label"]
    lab = d["label"]
    assert isinstance(lab, RFactor)
    assert len(lab) == 479
    assert lab.levels == [
        "acinar", "alpha", "beta", "delta", "duct",
        "duplicate", "mesenchyme", "pp",
    ]
    s = lab.as_strings().astype(str)
    vals, counts = np.unique(s, return_counts=True)
    dist = dict(zip(vals, counts))
    # spot-check the two dominant Wang-pancreas populations
    assert dist["alpha"] == 196
    assert dist["beta"] == 118
    assert sum(dist.values()) == 479
