"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip sharding tests run against an 8-device CPU mesh
(xla_force_host_platform_device_count) exactly as the driver's dryrun does;
kernel-correctness tests run the Pallas interpreter on CPU. Real-TPU execution
is exercised by bench.py, not by the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The environment may pre-select an accelerator platform (e.g. a tunneled TPU);
# the env var alone does not always win, so force CPU through the config too.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
