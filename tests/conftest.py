"""Test env: force CPU with 8 fake devices so sharding logic is testable
without TPUs (SURVEY.md section 4 implication).

Note: this machine's sitecustomize registers the 'axon' TPU backend and
force-sets ``jax_platforms='axon,cpu'`` at interpreter start, so the env var
alone is not enough — we must override jax.config before any backend
initialization.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
