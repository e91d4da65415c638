"""Device-mesh construction for the SHARP-TPU parallel axes.

The framework's two parallel axes replace the reference's fork-pool
(R/SHARP.R:167, `foreach(k) %:% foreach(t) %dopar%`):

  * "data" — cell folds/blocks (the reference's T axis); scales across
    chips/hosts; the central axis (SURVEY.md §2.2).
  * "ens"  — the K-member RP ensemble (the reference's K axis); a second
    mesh dimension when chips outnumber folds.

RP matrices are *regenerated* from the shared PRNGKey on every host
instead of broadcast (sharp_tpu/utils/prng.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: Optional[int] = None,
    n_ens: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("data", "ens") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    nd = len(devices)
    if n_data is None:
        n_data = nd // n_ens
    if n_data * n_ens > nd:
        raise ValueError(
            f"mesh {n_data}x{n_ens} needs {n_data * n_ens} devices, have {nd}"
        )
    grid = np.asarray(devices[: n_data * n_ens]).reshape(n_data, n_ens)
    return Mesh(grid, ("data", "ens"))
