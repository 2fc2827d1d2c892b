from gbnns_tpu.dimred.models import LinearProjection, MLPProjection, init_model, apply_model
from gbnns_tpu.dimred.pca import pca_fit, pca_transform, PCAModel
from gbnns_tpu.dimred.train import TrainConfig, train_projection, project, save_projection, load_projection

__all__ = [
    "LinearProjection", "MLPProjection", "init_model", "apply_model",
    "pca_fit", "pca_transform", "PCAModel",
    "TrainConfig", "train_projection", "project",
    "save_projection", "load_projection",
]
