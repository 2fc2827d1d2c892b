import numpy as np
import pytest

from gbnns_tpu.dimred.pca import pca_fit, pca_transform
from gbnns_tpu.dimred.train import (
    TrainConfig, load_projection, project, save_projection, train_projection,
)
from gbnns_tpu.eval.recall import exact_ground_truth, recall_at_k


def test_pca_recovers_signal_subspace():
    rng = np.random.default_rng(0)
    # data with 4 high-variance dims embedded in 16
    lo = rng.standard_normal((2000, 4)) * np.array([10, 8, 6, 4.0])
    basis = np.linalg.qr(rng.standard_normal((16, 16)))[0][:, :4]
    x = (lo @ basis.T + 0.1 * rng.standard_normal((2000, 16))).astype(np.float32)
    m = pca_fit(x, 4)
    # projected variance should capture almost everything
    y = pca_transform(m, x)
    assert y.shape == (2000, 4)
    total_var = x.var(0).sum()
    kept_var = y.var(0).sum()
    assert kept_var / total_var > 0.98
    assert (np.diff(m.explained_variance) <= 1e-4).all()  # descending


def test_pca_matches_numpy_svd():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 12)).astype(np.float32)
    m = pca_fit(x, 3)
    xc = x - x.mean(0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    # compare subspaces (signs/order may differ): projection matrices equal
    p_ref = vt[:3].T @ vt[:3]
    p_got = m.components @ m.components.T
    np.testing.assert_allclose(p_got, p_ref, atol=1e-3)


@pytest.fixture(scope="module")
def trained_fixture(fixture_data, fixture_gt):
    base, _ = fixture_data
    gt_self = exact_ground_truth(base[:2048], base, k=11, chunk=1024)
    # drop self column
    nbrs = gt_self[:, 1:]
    # orthogonal init so the loss-decrease assertion tests the optimizer,
    # not the strength of the PCA warm start
    cfg = TrainConfig(d_out=8, steps=300, batch_size=256, k_pos=10, seed=0,
                      init="orthogonal")
    return train_projection(base, nbrs, cfg), nbrs


def test_triplet_training_reduces_loss(trained_fixture):
    trained, _ = trained_fixture
    losses = trained["losses"]
    assert losses[-50:].mean() < losses[:50].mean() * 0.9


def test_trained_projection_beats_nothing(fixture_data, fixture_gt, trained_fixture):
    """Search-space sanity: true NNs should mostly survive projection —
    recall of low-d brute force against full-d GT well above chance."""
    base, query = fixture_data
    trained, _ = trained_fixture
    base_lo = project(trained, base)
    q_lo = project(trained, query)
    assert base_lo.shape == (base.shape[0], 8)
    pred = exact_ground_truth(q_lo, base_lo, k=10, chunk=1024)
    r10 = recall_at_k(pred, fixture_gt, 10)
    assert r10 > 0.5, r10  # 32d -> 8d on clustered data


def test_projection_checkpoint_roundtrip(tmp_path, fixture_data, trained_fixture):
    base, _ = fixture_data
    trained, _ = trained_fixture
    p = str(tmp_path / "proj.npz")
    save_projection(p, trained)
    loaded = load_projection(p)
    np.testing.assert_allclose(project(trained, base[:64]),
                               project(loaded, base[:64]), rtol=1e-6)
    assert loaded["cfg"] == trained["cfg"]


def test_mlp_projection_trains(fixture_data):
    base, _ = fixture_data
    gt_self = exact_ground_truth(base[:512], base, k=6, chunk=1024)
    cfg = TrainConfig(d_out=8, model="mlp", hidden=64, steps=100,
                      batch_size=128, k_pos=5, seed=1)
    trained = train_projection(base[:512], gt_self[:, 1:], cfg)
    assert trained["losses"][-20:].mean() < trained["losses"][:20].mean()
    y = project(trained, base[:100])
    assert y.shape == (100, 8)


def test_angular_projection_normalized(fixture_data):
    base, _ = fixture_data
    gt_self = exact_ground_truth(base[:512], base, k=6, chunk=1024)
    cfg = TrainConfig(d_out=8, metric="angular", steps=50, batch_size=128,
                      k_pos=5)
    trained = train_projection(base[:512], gt_self[:, 1:], cfg)
    y = project(trained, base[:100])
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, atol=1e-5)


def test_neg_ranks_graph_mined_negatives(fixture_data, fixture_gt):
    """Graph-mined negatives (TrainConfig.neg_ranks) train and validate."""
    from gbnns_tpu.dimred.train import TrainConfig, train_projection
    import numpy as np
    import pytest

    base, _ = fixture_data
    nbrs = fixture_gt[: base.shape[0], 1:51] if fixture_gt.shape[0] >= base.shape[0] else None
    # fixture_gt is query-vs-base; build base-vs-base rows instead
    d2 = ((base[:256, None, :] - base[None, :256, :]) ** 2).sum(-1)
    nbrs = np.argsort(d2, axis=1, kind="stable")[:, 1:51].astype(np.int32)
    cfg = TrainConfig(d_out=8, steps=30, batch_size=64, k_pos=5,
                      neg_ranks=(10, 50))
    out = train_projection(base[:256], nbrs, cfg)
    assert np.isfinite(out["losses"]).all()

    # too-narrow neighbor rows must fail loudly
    with pytest.raises(ValueError):
        train_projection(base[:256], nbrs[:, :20],
                         TrainConfig(d_out=8, steps=2, batch_size=16,
                                     k_pos=5, neg_ranks=(10, 50)))
    # invalid rank window must fail loudly
    with pytest.raises(ValueError):
        train_projection(base[:256], nbrs,
                         TrainConfig(d_out=8, steps=2, batch_size=16,
                                     k_pos=5, neg_ranks=(2, 50)))


def test_checkpoint_selection_never_below_init(fixture_data):
    """eval_every > 0: the returned params are the best validation
    checkpoint INCLUDING the step-0 init — a destructive recipe (huge lr)
    must come back as the init, not the wrecked final step (the round-5
    finding that the hinge recipe can train below its own PCA init)."""
    base, _ = fixture_data
    nbrs = exact_ground_truth(base[:1024], base, k=11, chunk=1024)[:, 1:]
    base = base  # full corpus; queries drawn from its first rows
    cfg = TrainConfig(d_out=8, steps=60, batch_size=128, k_pos=10,
                      lr=5.0, eval_every=20, val_queries=128, val_c=16,
                      seed=0)
    trained = train_projection(base[:1024], nbrs, cfg)
    hist = trained["val_history"]
    assert len(hist) == 4                       # init + 3 segments
    assert trained["best_val"] == hist.max()
    assert trained["best_val"] >= hist[0]
    # lr=5.0 wrecks the projection: init must win and be returned
    assert trained["best_step"] == 0
    from gbnns_tpu.dimred.pca import pca_fit
    pca = pca_fit(np.asarray(base[:1024]), 8)
    np.testing.assert_allclose(
        np.asarray(trained["params"]["params"]["proj"]["kernel"]),
        pca.components, rtol=1e-5, atol=1e-6)


def test_checkpoint_selection_tracks_training(fixture_data):
    """With a sane lr the selected checkpoint is >= init on the val
    metric and the losses vector still spans all steps."""
    base, _ = fixture_data
    nbrs = exact_ground_truth(base[:1024], base, k=11, chunk=1024)[:, 1:]
    cfg = TrainConfig(d_out=8, steps=50, batch_size=128, k_pos=10,
                      eval_every=25, val_queries=64, val_c=8, seed=1)
    trained = train_projection(base[:1024], nbrs, cfg)
    assert trained["losses"].shape == (50,)
    assert trained["best_val"] >= trained["val_history"][0]


def test_checkpoint_selection_angular_metric(fixture_data):
    """val_score's angular branch: normalized projections, dot-product
    ordering — selection must run and never return below-init params."""
    base, _ = fixture_data
    b = base[:1024] / np.maximum(
        np.linalg.norm(base[:1024], axis=1, keepdims=True), 1e-12)
    nbrs = exact_ground_truth(b, b, k=11, chunk=1024,
                              metric="angular")[:, 1:]
    cfg = TrainConfig(d_out=8, steps=40, batch_size=128, k_pos=10,
                      metric="angular", eval_every=20, val_queries=64,
                      val_c=8, seed=2)
    trained = train_projection(b, nbrs, cfg)
    assert trained["best_val"] >= trained["val_history"][0]
    assert np.isfinite(trained["losses"]).all()
