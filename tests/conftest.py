"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the driver
separately dry-runs the multichip path on real meshes); kernels are
unit-tested against scipy/sklearn on CPU.

Note: in this environment jax is pre-imported at interpreter startup with
the real-TPU 'axon' platform preset, so JAX_PLATFORMS env alone is not
enough — we must switch platforms through the config API before any backend
initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
