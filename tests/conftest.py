"""Test configuration: virtual 8-device CPU mesh, plus an on-device lane.

Default: force an 8-device virtual CPU platform. Multi-chip sharding is
validated on the virtual mesh (the driver separately dry-runs the
multichip path); kernels are unit-tested against scipy/sklearn on CPU.

`SHARP_TPU_TESTS=1` flips the suite into the HARDWARE lane: the real TPU
backend stays active, only tests marked `tpu` run (production-shape
linkage parity, a mini end-to-end clustering, the sparse device feed) —
one command turns hardware regressions into test failures:

    SHARP_TPU_TESTS=1 python -m pytest tests/ -q

Note: in this environment jax is pre-imported at interpreter startup with
the real-TPU 'axon' platform preset, so JAX_PLATFORMS env alone is not
enough — we must switch platforms through the config API before any
backend initializes.
"""

import os

import pytest

TPU_LANE = os.environ.get("SHARP_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: runs on real TPU hardware only (enable with SHARP_TPU_TESTS=1)",
    )


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="hardware lane off (set SHARP_TPU_TESTS=1 on a TPU host)"
    )
    skip_cpu = pytest.mark.skip(
        reason="hardware lane on — CPU-mesh tests are skipped"
    )
    for item in items:
        is_tpu = "tpu" in item.keywords
        if TPU_LANE and not is_tpu:
            item.add_marker(skip_cpu)
        elif not TPU_LANE and is_tpu:
            item.add_marker(skip_tpu)
