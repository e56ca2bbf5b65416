"""Mesh/sharding helpers and the sharded Monte-Carlo sweep engine."""

from ldpc_sims_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    local_batch_multiple,
    make_mesh,
    maybe_distributed_init,
    replicated,
)
from ldpc_sims_tpu.parallel.mc import (  # noqa: F401
    SweepConfig,
    SweepResult,
    mc_step,
    run_grid,
    run_sweep,
    scaling_probe,
)
