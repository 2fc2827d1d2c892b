"""sizing.py — the single source of truth for resident-HBM estimates.

The critical property: every formula matches the ALLOCATING code exactly
(the round-4 guard under-admitted OOMs by diverging from
pack_hop_payload's 4 KB-tile row padding — ADVICE r4 high)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from gbnns_tpu.search import sizing
from gbnns_tpu.search.walker_pallas import _ROW_WORDS, pack_hop_payload


def test_row_words_matches_packer_constant():
    assert sizing.ROW_WORDS == _ROW_WORDS


@pytest.mark.parametrize("K,d_lo,vec_dtype", [
    (8, 16, "bfloat16"), (32, 32, "bfloat16"), (32, 128, "bfloat16"),
    (32, 96, "bfloat16"), (8, 16, "float32"), (16, 96, "float32"),
])
def test_payload_row_bytes_matches_packed_allocation(K, d_lo, vec_dtype):
    rng = np.random.default_rng(0)
    n = 64
    base = rng.standard_normal((n, d_lo)).astype(np.float32)
    graph = rng.integers(0, n, (n, K)).astype(np.int32)
    hp = pack_hop_payload(graph, base, vec_dtype=vec_dtype)
    actual_row_bytes = int(np.prod(hp.data.shape[1:])) * 4
    assert sizing.payload_row_bytes(K, d_lo, vec_dtype=vec_dtype) \
        == actual_row_bytes


def test_bf16_parity_raises():
    with pytest.raises(ValueError, match="even"):
        sizing.payload_row_bytes(3, 15, vec_dtype="bfloat16")


def test_gist_shape_sizing_story():
    """The measured round-4 OOM and its sharded remedy, in numbers:
    single-chip GIST (1M x 960 -> 128, K=32) must NOT fit a v5e;
    the same config sharded 1M/8 must fit with room to spare."""
    single = sizing.graph_index_hbm(1_000_000, 960, 128, 32)
    assert single.payload_bytes == 12 * 1024 * 1_000_000  # 12 KB rows
    assert not single.fits(16e9)
    shard = sizing.sharded_per_chip_hbm(1_000_000, 8, 960, 128, 32)
    assert shard.fits(16e9)
    assert shard.total_bytes * 6 < single.total_bytes  # >6x headroom


def test_sharded_deep10m_fits_v5e():
    """Config 5's graph engine at 10M/8 per shard fits a v5e at K=32 —
    the sizing row the 10M artifact carries."""
    b = sizing.sharded_per_chip_hbm(10_000_000, 8, 96, 32, 32,
                                    engine="graph_pallas")
    assert b.fits(16e9), b.as_dict()
    f = sizing.sharded_per_chip_hbm(10_000_000, 8, 96, 32, 32,
                                    engine="fused")
    assert f.fits(16e9)
    assert f.total_bytes < b.total_bytes  # scan carries no payload


def test_cli_size_subcommand():
    import os
    import pathlib

    env = dict(os.environ)
    src = str(pathlib.Path(__file__).resolve().parents[1] / "src")
    env["PYTHONPATH"] = src + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-m", "gbnns_tpu.cli", "size", "--engine",
         "graph_pallas", "--n", "1000000", "--d", "960", "--d-lo", "128",
         "--K", "32"],
        capture_output=True, text=True, check=True, env=env)
    # tolerate the trailing advisory line after the JSON block
    payload = json.loads(out.stdout[out.stdout.index("{"):
                                    out.stdout.rindex("}") + 1])
    assert payload["fits_v5e_16gb"] is False
    assert payload["payload_bytes"] == 12 * 1024 * 1_000_000
