"""Utilities: checkpoints, metrics, configs."""

from ldpc_sims_tpu.utils.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_checkpoint,
    load_decoder_weights,
    save_checkpoint,
)
from ldpc_sims_tpu.utils.metrics import (  # noqa: F401
    MetricsLogger,
    PhaseTimer,
    enable_compilation_cache,
    profile_trace,
    stable_fold_in,
)
