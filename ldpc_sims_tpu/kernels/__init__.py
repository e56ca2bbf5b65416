"""Pallas TPU kernels for the hot decode path."""

from ldpc_sims_tpu.kernels.minsum_qc import (  # noqa: F401
    bp_qc_pallas,
    bp_qc_requeue,
    default_tile,
    minsum_qc_pallas,
)
