"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
batch splitting (``ofdm/ofdm_functions.py:141-145`` and 10 other sites).
The TPU-native replacement: a ``jax.sharding.Mesh`` with a ``batch``
axis (Monte-Carlo codewords) and an optional ``snr`` axis (grid points),
``NamedSharding`` annotations on the jitted sweep step, and XLA-inserted
collectives for the error counters. Multi-host attaches via
``jax.distributed.initialize`` — no hand-written comm backend (SURVEY.md
§2.2).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "maybe_distributed_init",
    "local_batch_multiple",
]


def maybe_distributed_init() -> None:
    """Initialize multi-host JAX if launched under a cluster env.

    Safe no-op on a single host. Uses the standard coordinator env vars
    (``JAX_COORDINATOR_ADDRESS`` etc.) — the framework itself never
    speaks NCCL/MPI; cross-host traffic is XLA collectives over ICI/DCN.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(
    snr_axis: int = 1, devices: list | None = None
) -> Mesh:
    """Mesh over all devices: ``('snr', 'batch')``.

    ``snr_axis`` devices are assigned to the SNR-grid axis (1 = shard
    only over batch). Codeword batches ride the ``batch`` axis; a sweep
    can optionally parallelize grid points over ``snr``.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    if devs.size % snr_axis:
        raise ValueError(f"{devs.size} devices not divisible by {snr_axis}")
    return Mesh(devs.reshape(snr_axis, -1), ("snr", "batch"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading axis over every mesh axis (flat data-parallel)."""
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def local_batch_multiple(mesh: Mesh) -> int:
    """Batch sizes must be a multiple of the total mesh size."""
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
