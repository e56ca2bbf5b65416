"""Sharded, resumable Monte-Carlo BER/BLER sweep engine.

Replaces the reference's serial evaluation drivers (``evaluate_snr.py:81``
loops SNR points in Python, batches codewords in a host loop at
``:102-109``, and loses everything on a crash): here one jitted,
mesh-sharded step simulates a whole codeword block per call, points stop
adaptively on a frame-error target, and every point's accumulated counts
persist to a JSON manifest so an interrupted sweep resumes exactly where
it stopped (SURVEY.md §5.3 — the reference has no failure recovery).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.ops.chain import LinkConfig, link_step
from ldpc_sims_tpu.parallel.mesh import (
    batch_sharding,
    local_batch_multiple,
    make_mesh,
)

__all__ = ["SweepConfig", "SweepResult", "run_sweep", "mc_step", "run_grid"]


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Adaptive-stopping sweep over an SNR grid.

    A point stops when ``target_frame_errors`` frames have failed (the
    usual ±10% relative-confidence rule at 100 errors) or
    ``max_info_bits`` have been simulated — whichever first.
    """

    snrdb: tuple[float, ...] = tuple(float(s) for s in range(0, 11))
    batch_cw: int = 4096  # codewords per jitted step (global)
    target_frame_errors: int = 100
    max_info_bits: float = 1e8
    min_info_bits: float = 1e5
    seed: int = 0


@dataclasses.dataclass
class SweepResult:
    snrdb: list[float]
    uncoded_ber: list[float]
    coded_ber: list[float]
    coded_bler: list[float]
    info_bits: list[float]
    frames: list[float]
    wall_s: list[float]

    def as_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


_COUNT_KEYS = (
    "uncoded_bit_errors",
    "coded_bit_errors",
    "frame_errors",
    "uncoded_bits",
    "info_bits",
    "frames",
)


def mc_step(
    code: LdpcCode,
    cfg: LinkConfig,
    batch_cw: int,
    mesh=None,
    weights: Any | None = None,
) -> Callable:
    """Build the jitted sharded Monte-Carlo step: (key, snrdb) → counts.

    The key is split over mesh devices; each shard simulates its slice of
    the batch fully on-device and the scalar counters reduce with
    XLA-inserted collectives (the ``psum`` of SURVEY.md §5.7 — emitted by
    the compiler from the sharding annotations, not hand-written).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = local_batch_multiple(mesh)
    if batch_cw % n_dev:
        raise ValueError(f"batch_cw={batch_cw} not divisible by {n_dev} devices")
    per_dev = batch_cw // n_dev
    shard = batch_sharding(mesh)

    def step(keys: jax.Array, snrdb: jax.Array):
        outs = jax.vmap(
            lambda k: link_step(k, snrdb, code, cfg, per_dev, weights=weights)
        )(keys)
        return {k: jnp.sum(outs[k]) for k in _COUNT_KEYS}

    jitted = jax.jit(
        step,
        in_shardings=(shard, None),
        out_shardings=None,
    )

    def run(key: jax.Array, snrdb: float):
        keys = jax.random.split(key, n_dev)
        return jitted(keys, jnp.asarray(snrdb, jnp.float32))

    return run


def run_sweep(
    code: LdpcCode,
    link_cfg: LinkConfig,
    sweep: SweepConfig,
    mesh=None,
    weights: Any | None = None,
    manifest_path: str | None = None,
    log: Callable[[str], None] | None = print,
) -> SweepResult:
    """Run (or resume) a BER/BLER sweep; returns per-point rates.

    ``manifest_path``: JSON file holding accumulated counts per SNR point
    — an interrupted sweep resumes from it (idempotent; finished points
    are skipped). This replaces the reference's pickle-registry provenance
    chain (``outputs/results`` timestamp pointers, SURVEY.md §C15) with an
    explicit, restartable manifest.
    """
    step = mc_step(code, link_cfg, sweep.batch_cw, mesh, weights)

    state: dict[str, Any] = {"points": {}}
    if manifest_path and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            state = json.load(f)

    def save():
        if manifest_path:
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f, indent=1)
            os.replace(tmp, manifest_path)

    result = SweepResult([], [], [], [], [], [], [])
    master = jax.random.key(sweep.seed)

    for i, snrdb in enumerate(sweep.snrdb):
        pkey = f"{snrdb:g}"
        acc = state["points"].get(
            pkey, {k: 0.0 for k in _COUNT_KEYS} | {"steps": 0, "wall_s": 0.0}
        )
        point_key = jax.random.fold_in(master, i)

        while not _point_done(acc, sweep):
            skey = jax.random.fold_in(point_key, int(acc["steps"]))
            t0 = time.perf_counter()
            counts = step(skey, snrdb)
            counts = {k: float(v) for k, v in counts.items()}
            acc["wall_s"] += time.perf_counter() - t0
            for k in _COUNT_KEYS:
                acc[k] += counts[k]
            acc["steps"] += 1
            state["points"][pkey] = acc
            save()

        result.snrdb.append(float(snrdb))
        result.uncoded_ber.append(acc["uncoded_bit_errors"] / acc["uncoded_bits"])
        result.coded_ber.append(acc["coded_bit_errors"] / acc["info_bits"])
        result.coded_bler.append(acc["frame_errors"] / acc["frames"])
        result.info_bits.append(acc["info_bits"])
        result.frames.append(acc["frames"])
        result.wall_s.append(acc["wall_s"])
        if log:
            log(
                f"snr={snrdb:5.2f} dB  BER={result.coded_ber[-1]:.3e}  "
                f"BLER={result.coded_bler[-1]:.3e}  "
                f"({acc['info_bits']:.2e} info bits, {acc['wall_s']:.1f}s)"
            )
    return result


def run_grid(
    code: LdpcCode,
    cfg: LinkConfig,
    snrdb_grid: tuple[float, ...],
    cw_per_point: int,
    mesh=None,
    weights: Any | None = None,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Fixed-work sweep with the SNR grid as a *sharded mesh axis*.

    The whole (snr × batch) grid runs as ONE jitted step: SNR points are
    laid out over the mesh's ``snr`` axis and codeword batches over its
    ``batch`` axis (the serial SNR ``for`` loop of ``evaluate_snr.py:81``
    turned into a parallel device axis — SURVEY.md §5.7). Grid length
    must be a multiple of the mesh's snr dimension and ``cw_per_point`` a
    multiple of its batch dimension. Returns per-point count arrays.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = make_mesh()
    s_dim = mesh.shape["snr"]
    b_dim = mesh.shape["batch"]
    S = len(snrdb_grid)
    if S % s_dim:
        raise ValueError(f"grid size {S} not divisible by snr axis {s_dim}")
    if cw_per_point % b_dim:
        raise ValueError(
            f"cw_per_point {cw_per_point} not divisible by batch axis "
            f"{b_dim}"
        )
    per_shard_cw = cw_per_point // b_dim

    def grid_step(keys, snrs):
        # one flat vmap over the (S·b_dim) shards, each with its own SNR
        # (nested vmap trips an XLA-CPU FFT layout RET_CHECK)
        outs = jax.vmap(
            lambda k, s: link_step(
                k, s, code, cfg, per_shard_cw, weights=weights
            )
        )(keys, snrs)
        return {
            k: jnp.sum(outs[k].reshape(S, b_dim), axis=1)
            for k in _COUNT_KEYS
        }

    jitted = jax.jit(
        grid_step,
        in_shardings=(
            NamedSharding(mesh, P(("snr", "batch"))),
            NamedSharding(mesh, P(("snr", "batch"))),
        ),
    )
    master = jax.random.key(seed)
    keys = jax.random.split(master, S * b_dim)
    snrs = jnp.repeat(jnp.asarray(snrdb_grid, jnp.float32), b_dim)
    with mesh:
        counts = jitted(keys, snrs)
    return {k: np.asarray(v) for k, v in counts.items()}


def _point_done(acc: dict[str, float], sweep: SweepConfig) -> bool:
    if acc["info_bits"] < sweep.min_info_bits:
        return False
    if acc["info_bits"] >= sweep.max_info_bits:
        return True
    return acc["frame_errors"] >= sweep.target_frame_errors
