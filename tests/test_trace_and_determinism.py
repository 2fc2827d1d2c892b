"""SURVEY §5.1/§5.2: profiling hooks work offline; training is NaN-free
under jax_debug_nans; search is bit-deterministic across runs."""

import jax
import jax.numpy as jnp
import numpy as np

from gbnns_tpu.eval.trace import cost_analysis, memory_analysis
from gbnns_tpu.kernels.distance import pairwise_dists


def test_cost_analysis_reports_flops():
    q = jnp.zeros((64, 32))
    x = jnp.zeros((128, 32))
    rep = cost_analysis(pairwise_dists, q, x)
    # 2*64*128*32 matmul flops plus epilogue; cost model must see the matmul
    assert rep["flops"] >= 2 * 64 * 128 * 32


def test_memory_analysis_runs():
    q = jnp.zeros((64, 32))
    x = jnp.zeros((128, 32))
    rep = memory_analysis(pairwise_dists, q, x)
    assert rep["argument_size_in_bytes"] is None or \
        rep["argument_size_in_bytes"] > 0


def test_training_nan_free_under_debug_nans(fixture_data):
    from gbnns_tpu.dimred.train import TrainConfig, train_projection
    from gbnns_tpu.eval.recall import exact_ground_truth

    base, _ = fixture_data
    nbrs = exact_ground_truth(base[:256], base, k=6, chunk=1024)[:, 1:]
    with jax.debug_nans(True):
        trained = train_projection(
            base[:256], nbrs,
            TrainConfig(d_out=8, steps=30, batch_size=64, k_pos=5))
    assert np.isfinite(trained["losses"]).all()


def test_projection_training_deterministic(fixture_data):
    from gbnns_tpu.dimred.train import TrainConfig, train_projection
    from gbnns_tpu.eval.recall import exact_ground_truth

    base, _ = fixture_data
    nbrs = exact_ground_truth(base[:256], base, k=6, chunk=1024)[:, 1:]
    cfg = TrainConfig(d_out=8, steps=20, batch_size=64, k_pos=5, seed=3)
    a = train_projection(base[:256], nbrs, cfg)
    b = train_projection(base[:256], nbrs, cfg)
    np.testing.assert_array_equal(a["losses"], b["losses"])
    leaves_a = jax.tree_util.tree_leaves(a["params"])
    leaves_b = jax.tree_util.tree_leaves(b["params"])
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_plot_sweeps_writes_png(tmp_path):
    from gbnns_tpu.eval.plot import plot_sweeps

    curves = {
        "flat": [{"qps": 100000, "recall_at_10": 0.98},
                 {"qps": 50000, "recall_at_10": 0.995}],
        "graph": [{"qps": 15000, "recall_at_10": 0.93},
                  {"qps": 7000, "recall_at_10": 0.95}],
    }
    out = str(tmp_path / "curve.png")
    plot_sweeps(curves, out)
    import os
    assert os.path.getsize(out) > 10_000
