"""Name → constructor registries.

The reference resolves model/estimator/loss names with ``eval(string)``
(reference: code/src/utils/trainer_utils.py:28,45,69,99,132,174-175 and
code/src/losses.py:124). Here every stringly-dispatched object lives in an
explicit registry; the reference's spelling is accepted as an alias.
"""

from __future__ import annotations

from clearvae_tpu.models.cnn import LAMCNN, LAMCNN64, SimpleCNN, SimpleCNN64
from clearvae_tpu.models.mi_estimators import MI_ESTIMATORS
from clearvae_tpu.models.vae import VAE, VAE64
from clearvae_tpu.ops.losses import CONTRASTIVE_LOSSES, SIM_FNS

MODELS = {
    "vae28": VAE,
    "vae64": VAE64,
    "simple_cnn": SimpleCNN,
    "simple_cnn64": SimpleCNN64,
    "lam_cnn": LAMCNN,
    "lam_cnn64": LAMCNN64,
    # reference spellings (trainer_utils.py arch strings)
    "VAE": VAE,
    "VAE64": VAE64,
    "SimpleCNNClassifier": SimpleCNN,
    "SimpleCNN64Classifier": SimpleCNN64,
    "LAMCNNClassifier": LAMCNN,
    "LAMCNN64Classifier": LAMCNN64,
}

__all__ = ["MODELS", "MI_ESTIMATORS", "SIM_FNS", "CONTRASTIVE_LOSSES"]
