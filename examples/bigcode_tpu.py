#!/usr/bin/env python
"""Scale envelope: 5G-class QC codes (n = 8448 / 12288) on one chip.

VERDICT r4 #6 asked whether the VMEM-resident kernel's all-planes plan
survives past n~2k. It does, further than expected: at z=256 (n=8448,
rate 17/33) the f32 message state is ~12 MB and at z=512 (n=12288,
rate 1/2) ~18 MB — both inside the 120 MB scoped-VMEM cap at tile 128
with the posterior + double-buffered io blocks included. bf16/int8
message storage halves/quarters the message share — the headroom that
would carry a denser (higher-dc) base at this z, and the first place
the sub-f32 storage modes buy anything real.

This script measures, per code, the device-resident pipeline rate
(bench.py's shape) for flooding-20 and layered-10 at each storage dtype
plus a paired-noise BER spot check near the waterfall (the DE threshold
table, examples/de_thresholds.py, anchors where that is), and writes
docs/artifacts/<stamp>_bigcode.json. Acceptance: >= 5e7 decoded info
bits/s/chip (the BASELINE north-star rate, set for n=1944 — these codes
are 4-6x larger).

Run:  python examples/bigcode_tpu.py        (TPU; ~10 min)
Env:  BIG_CODES, BIG_BATCH (16384), BIG_PIPE (16), BIG_SNRS.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.ops.bp import bp_decode
from ldpc_sims_tpu.utils import enable_compilation_cache

CODES = [
    c for c in os.environ.get(
        "BIG_CODES", "qc8448_r12,qc12288_r12"
    ).split(",") if c
]
BATCH = int(os.environ.get("BIG_BATCH", "16384"))
PIPE = int(os.environ.get("BIG_PIPE", "16"))
SNRS = tuple(
    float(x) for x in os.environ.get("BIG_SNRS", "1.75,2.25").split(",")
)
ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"cache: {enable_compilation_cache()}")
    log(f"device: {jax.devices()[0]}")
    out = {"batch": BATCH, "pipe": PIPE, "codes": {}}
    for name in CODES:
        code = get_code(name)
        ent = {"n": code.n, "k": code.k, "rate": code.rate}
        log(f"{name}: n={code.n} k={code.k}")

        def pipe_rate(tag, **kw):
            @jax.jit
            def pipe(key):
                def body(i, acc):
                    k = jax.random.fold_in(key, i)
                    llr = (
                        jax.random.normal(k, (BATCH, code.n), jnp.float32)
                        * 2.0 - 4.0
                    )
                    bits = bp_decode(llr, code, method="min-sum",
                                     output="hard", backend="pallas",
                                     **kw)
                    return acc + jnp.sum(bits.astype(jnp.int32))

                return jax.lax.fori_loop(0, PIPE, body, jnp.int32(0))

            try:
                t0 = time.perf_counter()
                float(pipe(jax.random.key(999)))
                compile_s = time.perf_counter() - t0
                ts = []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(pipe(jax.random.key(i)))
                    ts.append(time.perf_counter() - t0)
                dt = sorted(ts)[len(ts) // 2]
                rate = BATCH * code.k * PIPE / dt
                log(f"  {tag}: {dt * 1e3 / PIPE:.2f} ms/step, "
                    f"{rate:.3e} info bits/s (compile {compile_s:.0f}s)")
                return {"ms_per_step": dt * 1e3 / PIPE,
                        "bits_per_s": rate, "compile_s": compile_s}
            except Exception as e:  # record, keep going
                log(f"  {tag}: FAILED {str(e)[:160]}")
                return {"error": str(e)[:300]}

        ent["flooding-20 f32"] = pipe_rate("flooding-20 f32",
                                           iterations=20)
        ent["layered-10 f32"] = pipe_rate("layered-10 f32",
                                          iterations=10,
                                          schedule="layered")
        ent["layered-10 bf16"] = pipe_rate("layered-10 bf16",
                                           iterations=10,
                                           schedule="layered",
                                           dtype=jnp.bfloat16)
        ent["layered-10 int8"] = pipe_rate("layered-10 int8",
                                           iterations=10,
                                           schedule="layered",
                                           dtype=jnp.int8,
                                           msg_qclip=24.0)

        # paired-noise BER spot check: layered-10 must track flooding-20
        # near the waterfall (same keys per point)
        @functools.partial(jax.jit, static_argnames=("iters", "sched"))
        def errs(key, snr_db, iters, sched):
            snr = 10.0 ** (snr_db / 10.0)
            sigma = jax.lax.rsqrt(snr)
            r = 1.0 + sigma * jax.random.normal(key, (BATCH, code.n))
            llr = -2.0 * r / (sigma * sigma)
            bits = bp_decode(llr, code, iterations=iters,
                             method="min-sum", schedule=sched,
                             backend="pallas")
            return jnp.sum(bits.astype(jnp.int32))

        ber = {}
        for snr in SNRS:
            e_f = e_l = 0
            for i in range(8):
                k = jax.random.fold_in(
                    jax.random.fold_in(jax.random.key(33), int(snr * 100)),
                    i,
                )
                e_f += int(errs(k, jnp.asarray(snr), 20, "flooding"))
                e_l += int(errs(k, jnp.asarray(snr), 10, "layered"))
            nb_ = 8 * BATCH * code.n
            ber[str(snr)] = {
                "flooding20": e_f / nb_, "layered10": e_l / nb_,
                "errs": [e_f, e_l],
            }
            log(f"  BER @{snr}: flooding-20 {e_f / nb_:.3e}  "
                f"layered-10 {e_l / nb_:.3e}")
        ent["ber"] = ber
        out["codes"][name] = ent

    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(ART_DIR, f"{stamp}_bigcode.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"artifact -> {path}")


if __name__ == "__main__":
    main()
