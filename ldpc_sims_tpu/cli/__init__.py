"""CLI entry points (``python -m ldpc_sims_tpu …``)."""

from ldpc_sims_tpu.cli.main import PRESETS, build_parser, main  # noqa: F401
