"""Kernel tuning sweep: measure bp_qc_pallas across tile sizes / dtypes.

Small utility behind ``python -m ldpc_sims_tpu.kernels.tune`` — times the
decode kernel on the current device for a grid of (tile, dtype,
schedule) choices and prints one JSON line per point. Its output feeds
the dispatch table ``kernels.minsum_qc._TILE_TABLE`` (consumed through
``default_tile`` by ``bp_decode``); re-run when libtpu/Mosaic versions
move and record the result under ``docs/artifacts/`` (latest:
``20260821_kernel_tune_r4.jsonl`` — tile=128/f32 fastest everywhere
across flooding/layered × {f32, int8} × tiles {128, 256, 512}, so the
table holds no overrides). int8 message storage measures 15-32% slower
than f32 at every tile (the lift/quantize casts outweigh the VMEM
saving, same mechanism as bf16) — it is the *capability* of
hardware-real quantized message storage at quarter VMEM, not a speed
lever; int8/tile-512 flooding fails TPU compile (server-side
tpu_compile_helper crash). Per-edge weighted flooding-20 runs at 10.4%
over the unweighted kernel (40.8 vs 36.9 ms/step at batch 32k — within
the 15% budget of VERDICT r3 #2). Known envelope on v5e: f32 tiles
≤ 512 and bf16 tiles ≤ 256 compile; beyond that Mosaic's scoped-VMEM
request exceeds the chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def time_config(code, batch, iterations, tile, dtype, steps=6,
                method="min-sum", schedule="flooding"):
    from ldpc_sims_tpu.kernels.minsum_qc import bp_qc_pallas

    @jax.jit
    def step(key):
        llr = jax.random.normal(key, (batch, code.n), jnp.float32) * 2 - 4
        bits = bp_qc_pallas(
            llr, code.qc, iterations=iterations, method=method,
            schedule=schedule, tile=tile, dtype=dtype,
        )
        return jnp.sum(bits.astype(jnp.int32))

    key = jax.random.key(0)
    t0 = time.perf_counter()
    float(step(key))
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(steps):
        t0 = time.perf_counter()
        float(step(jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    return {
        "tile": tile, "dtype": jnp.dtype(dtype).name,
        "schedule": schedule, "ms_per_step": dt * 1e3,
        "info_bits_per_s": batch * code.k / dt, "compile_s": compile_s,
    }


def main() -> None:
    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    code = get_code(os.environ.get("TUNE_CODE", "wifi1944"))
    batch = int(os.environ.get("TUNE_BATCH", "32768"))
    iters = int(os.environ.get("TUNE_ITERS", "20"))
    tiles = [int(t) for t in
             os.environ.get("TUNE_TILES", "128,256,512").split(",")]
    dtypes = os.environ.get("TUNE_DTYPES", "float32,bfloat16").split(",")
    schedules = os.environ.get("TUNE_SCHEDULES", "flooding").split(",")
    for sched in schedules:
        for tile in tiles:
            for dt in dtypes:
                try:
                    r = time_config(code, batch, iters, tile, dt,
                                    schedule=sched)
                except Exception as e:  # VMEM overflow etc.: report, go on
                    r = {"tile": tile, "dtype": dt, "schedule": sched,
                         "error": str(e)[:200]}
                print(json.dumps(r), flush=True)


if __name__ == "__main__":
    sys.exit(main())
