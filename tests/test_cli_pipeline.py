import json
import os

import numpy as np
import pytest

from gbnns_tpu.cli import main as cli_main
from gbnns_tpu.config import ExperimentConfig
from gbnns_tpu.io.vecs import read_fvecs, read_ivecs, write_fvecs
from gbnns_tpu.pipeline import run_pipeline


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory, fixture_data):
    d = tmp_path_factory.mktemp("cli_data")
    base, query = fixture_data
    write_fvecs(str(d / "base.fvecs"), base)
    write_fvecs(str(d / "query.fvecs"), query)
    return d


def test_cli_gt_build_search_roundtrip(data_dir, fixture_gt, tmp_path):
    base_p = str(data_dir / "base.fvecs")
    query_p = str(data_dir / "query.fvecs")
    gt_p = str(tmp_path / "gt.ivecs")
    graph_p = str(tmp_path / "graph.npy")

    cli_main(["gt", "--base", base_p, "--query", query_p, "--k", "10",
              "--out", gt_p])
    gt = read_ivecs(gt_p)
    assert gt.shape == (128, 10)
    # CLI ground truth must agree with the numpy oracle (top-1 ids)
    agree = (np.asarray(gt)[:, 0] == fixture_gt[:, 0]).mean()
    assert agree > 0.99

    cli_main(["build", "--base", base_p, "--k", "8",
              "--chunk", "1024", "--node-chunk", "1024", "--out", graph_p])
    g = np.load(graph_p)
    assert g.shape == (2048, 8)

    out_p = str(tmp_path / "ids.ivecs")
    cli_main(["search", "--base", base_p, "--query", query_p,
              "--graph", graph_p, "--gt", gt_p, "--ef", "64",
              "--out", out_p])
    ids = read_ivecs(out_p)
    assert ids.shape == (128, 10)


def test_cli_train_pca(data_dir, tmp_path):
    out_dir = str(tmp_path / "proj")
    cli_main(["train", "--base", str(data_dir / "base.fvecs"),
              "--query", str(data_dir / "query.fvecs"),
              "--method", "pca", "--d-out", "8", "--out", out_dir])
    base_lo = read_fvecs(os.path.join(out_dir, "base_lo.fvecs"))
    assert base_lo.shape == (2048, 8)


def test_pipeline_end_to_end(tmp_path):
    cfg = ExperimentConfig.from_json({
        "name": "fixture_e2e", "dataset": "fixture", "scale": 1.0,
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024},
        "dimred": {"method": "linear", "d_out": 8, "steps": 300,
                   "batch_size": 256, "k_pos": 5},
        "search": {"k": 10, "efs": [16, 64], "num_entries": 16},
    })
    out = run_pipeline(cfg)
    s = out["summary"]
    # plumbing smoke test: 32d->8d projection is intentionally lossy, so the
    # bar is "search works and rerank recovers most of it", not parity
    assert s["results"][-1]["recall_at_10"] > 0.6
    assert s["build_time_s"] > 0
    saved = json.load(open(out["out_path"]))
    assert saved["name"] == "fixture_e2e"
    assert len(saved["pareto"]) >= 1


def test_pipeline_sharded(tmp_path):
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = ExperimentConfig.from_json({
        "name": "fixture_sharded", "dataset": "fixture", "n_devices": 4,
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024},
        "dimred": {"method": "none"},
        "search": {"k": 10, "efs": [32], "num_entries": 16},
    })
    out = run_pipeline(cfg)
    assert out["summary"]["results"][0]["recall_at_10"] > 0.85


def test_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(name="x", dataset="glove", metric="angular")
    p = str(tmp_path / "c.json")
    cfg.save(p)
    loaded = ExperimentConfig.load(p)
    assert loaded == cfg


def test_checked_in_configs_parse():
    import glob
    paths = glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "*.json"))
    assert len(paths) == 5
    for p in paths:
        cfg = ExperimentConfig.load(p)
        assert cfg.dataset in ("sift1m", "gist1m", "glove", "deep10m")


def test_pipeline_angular_metric(tmp_path):
    """GloVe-config path: angular metric end to end (normalized projection,
    IP distances, flat + graph agreement)."""
    cfg = ExperimentConfig.from_json({
        "name": "fixture_angular", "dataset": "fixture", "metric": "angular",
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024},
        "dimred": {"method": "linear", "d_out": 8, "steps": 200,
                   "batch_size": 256, "k_pos": 5},
        "search": {"k": 10, "efs": [32], "num_entries": 16},
    })
    out = run_pipeline(cfg)
    assert out["summary"]["results"][0]["recall_at_10"] > 0.5


def test_pipeline_flat_index(tmp_path):
    cfg = ExperimentConfig.from_json({
        "name": "fixture_flat", "dataset": "fixture",
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024},
        "dimred": {"method": "pca", "d_out": 8},
        "search": {"index": "flat", "k": 10, "efs": [16, 64]},
    })
    out = run_pipeline(cfg)
    rs = out["summary"]["results"]
    assert rs[-1]["recall_at_10"] > 0.85
    assert rs[0]["extra"]["index"] == "flat"


def test_pipeline_reduced_space_graph(tmp_path):
    """graph.space='reduced': the walker's graph is built in the projected
    geometry (the GIST-config fix, VERDICT round 1 item 4)."""
    cfg = ExperimentConfig.from_json({
        "name": "fixture_redspace", "dataset": "fixture",
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024,
                  "space": "reduced"},
        "dimred": {"method": "pca", "d_out": 8},
        "search": {"k": 10, "efs": [64], "num_entries": 16},
    })
    out = run_pipeline(cfg)
    assert out["summary"]["results"][0]["recall_at_10"] > 0.7

    # reduced space without a projection must fail loudly
    import pytest
    from gbnns_tpu.pipeline import build_graph
    bad = ExperimentConfig.from_json({
        "name": "x", "dataset": "fixture",
        "graph": {"space": "reduced"}, "dimred": {"method": "none"},
    })
    with pytest.raises(ValueError):
        build_graph(bad, np.zeros((64, 8), np.float32), None)


def test_pipeline_neg_ranks(tmp_path):
    """dimred.neg_ranks round-trips through config JSON and trains."""
    cfg = ExperimentConfig.from_json({
        "name": "fixture_negranks", "dataset": "fixture",
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024},
        "dimred": {"method": "linear", "d_out": 8, "steps": 50,
                   "batch_size": 128, "k_pos": 5, "neg_ranks": [10, 40]},
        "search": {"index": "flat", "k": 10, "efs": [32]},
    })
    assert cfg.dimred.neg_ranks == (10, 40)
    out = run_pipeline(cfg)
    assert out["summary"]["results"][0]["recall_at_10"] > 0.7


@pytest.mark.slow  # ~170 s: full pipeline with interpret-mode DMA walker
def test_pipeline_pallas_walker(tmp_path):
    """search.walker='pallas' + centroid entries through the pipeline
    (the round-2 graph-engine recipe, CPU-interpreted)."""
    cfg = ExperimentConfig.from_json({
        "name": "fixture_pallas", "dataset": "fixture",
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024,
                  "space": "reduced", "backend": "fused"},
        "dimred": {"method": "pca", "d_out": 8},
        "search": {"k": 10, "efs": [32], "num_entries": 8,
                   "walker": "pallas", "centroid_entries": 64,
                   "max_hops": 64},
    })
    out = run_pipeline(cfg)
    r = out["summary"]["results"][0]
    assert r["recall_at_10"] > 0.85
    assert r["extra"]["walker"] == "pallas"


def test_pipeline_eval_every_selection(tmp_path):
    """dimred.eval_every round-trips through config JSON and the staged
    projection is the validation-selected checkpoint (>= its init on the
    held-out ordering metric — the round-5 recipe-A/B finding)."""
    cfg = ExperimentConfig.from_json({
        "name": "fixture_sel", "dataset": "fixture",
        "out_dir": str(tmp_path),
        "graph": {"k": 8, "chunk": 1024, "node_chunk": 1024},
        "dimred": {"method": "linear", "d_out": 8, "steps": 60,
                   "batch_size": 128, "k_pos": 5, "eval_every": 20},
        "search": {"index": "flat", "k": 10, "efs": [32]},
    })
    assert cfg.dimred.eval_every == 20
    out = run_pipeline(cfg)
    assert out["summary"]["results"][0]["recall_at_10"] > 0.7


def test_cli_train_eval_every(data_dir, tmp_path):
    """gbnns train --eval-every exposes checkpoint selection."""
    cli_main(["train", "--base", str(data_dir / "base.fvecs"),
              "--query", str(data_dir / "query.fvecs"),
              "--method", "linear", "--d-out", "8", "--steps", "40",
              "--batch-size", "128", "--k-pos", "5",
              "--eval-every", "20", "--out", str(tmp_path)])
    lo = read_fvecs(str(tmp_path / "base_lo.fvecs"))
    assert lo.shape == (2048, 8)
