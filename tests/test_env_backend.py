"""Guard: unit tests must run on the virtual CPU platform with >=8 devices."""
import os
import jax


def test_backend_is_cpu():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8
