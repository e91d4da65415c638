"""Synthetic single-cell expression generators for tests and benchmarks.

The bundled Wang-pancreas TPM matrix is a stripped blob in this mount
(/root/reference/.MISSING_LARGE_BLOBS), so golden tests run on synthetic
TPM-like data with known cluster structure of the same shape class
(479 cells x ~20k genes x 7 types for the small-path gate).
"""

import numpy as np


def make_tpm_like(
    n_cells=479,
    n_genes=2000,
    n_types=7,
    seed=0,
    de_frac=0.35,
    lfc=6.0,
    noise_sigma=0.3,
    dropout=0.2,
    base_sigma=1.0,
    libsize=1e6,
    labels=None,
):
    """Log-normal TPM-style matrix with per-type differentially-expressed
    gene programs. Returns (X cells x genes f32, y labels).

    `labels`: optional fixed per-cell type vector (ints in [0, n_types))
    — e.g. the REAL class distribution parsed from the reference's
    bundled ground-truth — overriding the random uneven split."""
    rng = np.random.default_rng(seed)
    base = rng.lognormal(mean=1.0, sigma=base_sigma, size=n_genes)
    if labels is not None:
        y = np.asarray(labels, int)
        assert len(y) == n_cells and y.max() < n_types
    else:
        # cluster sizes ~ uneven like real data
        props = rng.dirichlet(np.ones(n_types) * 2.0)
        counts = np.maximum((props * n_cells).astype(int), 5)
        while counts.sum() < n_cells:
            counts[np.argmax(props)] += 1
        while counts.sum() > n_cells:
            counts[np.argmax(counts)] -= 1
        y = np.repeat(np.arange(n_types), counts)
        rng.shuffle(y)

    # one common DE gene set with independent per-type up/down signs:
    # makes all type pairs roughly equidistant (no accidental "supertype"
    # hierarchy), like well-separated real cell types
    n_de = int(de_frac * n_genes)
    de_idx = rng.choice(n_genes, n_de, replace=False)
    type_means = np.tile(base, (n_types, 1))
    for t in range(n_types):
        signs = rng.choice([-1.0, 1.0], n_de)
        type_means[t, de_idx] *= 2.0 ** (signs * lfc)

    X = np.empty((n_cells, n_genes), np.float32)
    for i in range(n_cells):
        mu = type_means[y[i]]
        noise = rng.lognormal(mean=0.0, sigma=noise_sigma, size=n_genes)
        x = mu * noise
        # dropout typical of scRNA-seq
        keep = rng.random(n_genes) > dropout
        x = x * keep
        x = x / max(x.sum(), 1e-9) * libsize
        X[i] = x
    return X, y
