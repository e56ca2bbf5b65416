"""Flax models: neural LLR estimators, joint LLR→BP model.

(The neural-BP decoder itself is weight pytrees over ops/bp.py — see
``ldpc_sims_tpu.ops.bp.init_neural_bp_weights``.)
"""

from ldpc_sims_tpu.models.llr import (  # noqa: F401
    LLRestimator,
    LLRestimatorTanh,
    LLRestimatorWithSNR,
)
from ldpc_sims_tpu.models.joint import Joint  # noqa: F401
