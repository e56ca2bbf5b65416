"""Training recipes and dataset builders for the learned receivers."""

from ldpc_sims_tpu.training.data import (  # noqa: F401
    make_joint_dataset,
    make_llr_dataset,
)
from ldpc_sims_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    train_joint,
    train_llr,
    decoded_ber_probe,
    train_minsum_weights,
    train_neural_bp,
)
