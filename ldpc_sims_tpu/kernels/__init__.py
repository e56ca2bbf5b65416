"""Pallas TPU kernels for the hot decode path."""

from ldpc_sims_tpu.kernels.minsum_qc import minsum_qc_pallas  # noqa: F401
