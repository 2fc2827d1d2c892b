import numpy as np
import pytest

from gbnns_tpu.io import vecs
from gbnns_tpu.io.datasets import DATASETS, load_dataset
from gbnns_tpu.io.synthetic import SyntheticSpec, make_synthetic


def test_fvecs_roundtrip(tmp_path):
    arr = np.random.default_rng(0).standard_normal((100, 33)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    vecs.write_fvecs(p, arr)
    assert vecs.vecs_dim(p) == 33
    assert vecs.vecs_count(p) == 100
    np.testing.assert_array_equal(vecs.read_fvecs(p), arr)
    np.testing.assert_array_equal(vecs.read_fvecs(p, mmap=False), arr)


def test_ivecs_roundtrip(tmp_path):
    arr = np.random.default_rng(1).integers(0, 1 << 20, size=(64, 10)).astype(np.int32)
    p = str(tmp_path / "gt.ivecs")
    vecs.write_ivecs(p, arr)
    np.testing.assert_array_equal(vecs.read_ivecs(p), arr)


def test_bvecs_roundtrip(tmp_path):
    arr = np.random.default_rng(2).integers(0, 256, size=(17, 96)).astype(np.uint8)
    p = str(tmp_path / "x.bvecs")
    vecs.write_vecs(p, arr)
    np.testing.assert_array_equal(vecs.read_bvecs(p), arr)


def test_offset_count_streaming(tmp_path):
    arr = np.arange(50 * 4, dtype=np.float32).reshape(50, 4)
    p = str(tmp_path / "x.fvecs")
    vecs.write_fvecs(p, arr)
    np.testing.assert_array_equal(vecs.read_vecs(p, offset=10, count=5), arr[10:15])
    chunks = list(vecs.iter_vecs(p, chunk=16))
    assert [c.shape[0] for c in chunks] == [16, 16, 16, 2]
    np.testing.assert_array_equal(np.vstack(chunks), arr)


def test_bad_extension(tmp_path):
    with pytest.raises(ValueError):
        vecs.read_vecs(str(tmp_path / "x.npy"))


def test_truncated_file_rejected(tmp_path):
    p = str(tmp_path / "x.fvecs")
    vecs.write_fvecs(p, np.ones((3, 8), dtype=np.float32))
    with open(p, "ab") as f:
        f.write(b"\x01\x02")
    with pytest.raises(ValueError):
        vecs.vecs_count(p)


def test_synthetic_shapes_and_determinism():
    spec = SyntheticSpec(n_base=500, n_query=20, dim=16, n_clusters=8, seed=3)
    a = make_synthetic(spec)
    b = make_synthetic(spec)
    assert a["base"].shape == (500, 16) and a["base"].dtype == np.float32
    assert a["query"].shape == (20, 16)
    np.testing.assert_array_equal(a["base"], b["base"])


def test_synthetic_angular_normalized():
    spec = SyntheticSpec(n_base=200, n_query=10, dim=16, metric="angular", seed=4)
    d = make_synthetic(spec)
    np.testing.assert_allclose(np.linalg.norm(d["base"], axis=1), 1.0, atol=1e-5)


def test_dataset_registry_synthetic_fallback():
    ds = load_dataset("sift1m", scale=0.001)
    assert ds.source == "synthetic"
    assert ds.base.shape[1] == DATASETS["sift1m"].dim
    assert ds.base.shape[0] == 1000


def test_dataset_registry_real_files(tmp_path, monkeypatch):
    monkeypatch.setenv("GBNNS_DATA_DIR", str(tmp_path))
    root = tmp_path / "fixture"
    root.mkdir()
    base = np.random.default_rng(0).standard_normal((64, 32)).astype(np.float32)
    query = base[:8] + 0.01
    vecs.write_fvecs(str(root / "base.fvecs"), base)
    vecs.write_fvecs(str(root / "query.fvecs"), query)
    ds = load_dataset("fixture")
    assert ds.source == "files"
    np.testing.assert_array_equal(ds.base, base)


def test_top_level_api_exports():
    """`from gbnns_tpu import <X>` works for the whole public surface."""
    import gbnns_tpu as g

    for name in g.__all__:
        assert getattr(g, name) is not None
    assert "FusedScanIndex" in dir(g) and "sharded_search" in dir(g)
