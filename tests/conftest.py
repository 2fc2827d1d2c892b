"""Test configuration: force the CPU backend with 8 virtual devices so the
whole suite (including multi-chip sharding tests) runs offline on any host
(SURVEY.md §7.4). Must run before jax initializes its backend."""

import os
import pathlib
import sys

# Make the suite runnable without an installed package (fresh environments).
_src = str(pathlib.Path(__file__).resolve().parent.parent / "src")
if _src not in sys.path:
    sys.path.insert(0, _src)

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: this environment's axon site-module overrides JAX_PLATFORMS at import
# time, so the env var alone does not stick — the config update below does.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic


@pytest.fixture(scope="session")
def fixture_data():
    """Tiny offline corpus: n=2048, d=32, clustered (SURVEY §7.4)."""
    spec = SyntheticSpec(n_base=2048, n_query=128, dim=32, n_clusters=32, seed=7)
    data = make_synthetic(spec)
    return data["base"], data["query"]


@pytest.fixture(scope="session")
def fixture_gt(fixture_data):
    base, query = fixture_data
    # numpy oracle ground truth, independent of the device kernels
    d2 = ((query[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :100].astype(np.int32)
