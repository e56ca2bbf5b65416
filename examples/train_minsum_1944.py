#!/usr/bin/env python
"""Train per-iteration (α, β) min-sum weights for (1944,972) layered-10
on the TPU chip, freeze them into the Pallas fast path, and measure BER
at 1e9 information bits per SNR point (the BASELINE config-5 scale:
"learned BP ... Monte-Carlo at 1e9 bits/point").

Produces docs/artifacts/<stamp>_minsum_trained.json with:
  * the trained schedule (α_t, β_t),
  * paired-noise BER at several Es/N0 points for plain min-sum,
    trained min-sum, and sum-product (the quality ceiling), all at
    layered-10, plus flooding-20 plain (the throughput-headline anchor),
  * ms/step timings proving the SMEM-table weighted decode runs at the
    same throughput as the unweighted kernel.

Run:  python examples/train_minsum_1944.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.ops.bp import bp_decode, freeze_minsum_weights
from ldpc_sims_tpu.training import TrainConfig, train_minsum_weights
from ldpc_sims_tpu.utils import enable_compilation_cache

ITERS = int(os.environ.get("MS_ITERS", 10))
SCHEDULE = os.environ.get("MS_SCHEDULE", "layered")
TRAIN_SNR = (1.25, 2.5)  # Es/N0 dB, waterfall region
EVAL_SNRS = (1.5, 1.75, 2.0)
BITS_PER_POINT = float(os.environ.get("MS_BITS_PER_POINT", 1e9))
BATCH = int(os.environ.get("MS_EVAL_BATCH", 32768))
TRAIN_STEPS = int(os.environ.get("MS_TRAIN_STEPS", 120))
TRAIN_BATCH = int(os.environ.get("MS_TRAIN_BATCH", 256))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"cache: {enable_compilation_cache()}")
    code = get_code("wifi1944")
    log(f"device {jax.devices()[0]}, code {code.name}")

    t0 = time.time()
    cfg = TrainConfig(optimizer="adam", learning_rate=0.02, seed=0)
    ms, info = train_minsum_weights(
        code, cfg, iterations=ITERS, schedule=SCHEDULE,
        snr_db=TRAIN_SNR, steps=TRAIN_STEPS, batch=TRAIN_BATCH, log=log,
    )
    alpha, beta = freeze_minsum_weights(ms)
    log(f"trained in {time.time() - t0:.0f}s")
    log("alpha: " + ",".join(f"{a:.4f}" for a in alpha))
    log("beta:  " + ",".join(f"{b:.4f}" for b in beta))

    # ---- paired-noise BER at 1e9 info bits/point ----------------------
    def make_step(**kw):
        @jax.jit
        def f(key, snr_db):
            snr = 10.0 ** (snr_db / 10.0)
            sigma = jax.lax.rsqrt(snr)
            r = 1.0 + sigma * jax.random.normal(key, (BATCH, code.n))
            llr = -2.0 * r / (sigma * sigma)
            bits = bp_decode(llr, code, method="min-sum",
                             backend="pallas", **kw)
            # info-bit errors (systematic prefix), all-zero codeword
            return jnp.sum(bits[:, : code.k].astype(jnp.int32))

        return f

    arms = {
        "minsum_plain_layered10": make_step(
            iterations=ITERS, schedule=SCHEDULE),
        "minsum_trained_layered10": make_step(
            iterations=ITERS, schedule=SCHEDULE, alpha=alpha, beta=beta),
        "sumproduct_layered10": dict(),  # built below (method differs)
        "minsum_plain_flooding20": make_step(iterations=20),
    }

    @jax.jit
    def sp_step(key, snr_db):
        snr = 10.0 ** (snr_db / 10.0)
        sigma = jax.lax.rsqrt(snr)
        r = 1.0 + sigma * jax.random.normal(key, (BATCH, code.n))
        llr = -2.0 * r / (sigma * sigma)
        bits = bp_decode(llr, code, iterations=ITERS,
                         method="sum-product", schedule=SCHEDULE,
                         backend="pallas")
        return jnp.sum(bits[:, : code.k].astype(jnp.int32))

    arms["sumproduct_layered10"] = sp_step

    steps_per_point = max(int(BITS_PER_POINT / (BATCH * code.k)), 1)
    key = jax.random.key(42)
    ber = {name: {} for name in arms}
    for snr_db in EVAL_SNRS:
        for name, step in arms.items():
            t0 = time.time()
            errs = 0
            for i in range(steps_per_point):
                k = jax.random.fold_in(
                    jax.random.fold_in(key, int(snr_db * 100)), i
                )  # paired noise across arms
                errs += int(step(k, jnp.asarray(snr_db)))
            nbits = steps_per_point * BATCH * code.k
            ber[name][str(snr_db)] = errs / nbits
            log(f"{name} @{snr_db} dB: BER {errs / nbits:.3e} "
                f"({errs} errs / {nbits:.1e} bits, {time.time() - t0:.0f}s)")

    # ---- throughput: trained SMEM-table decode vs plain ---------------
    times = {}
    for name in ("minsum_plain_layered10", "minsum_trained_layered10"):
        step = arms[name]
        float(step(key, jnp.asarray(2.0)))
        ts = []
        for i in range(6):
            t0 = time.time()
            float(step(jax.random.fold_in(key, 9000 + i),
                       jnp.asarray(2.0)))
            ts.append(time.time() - t0)
        dt = sorted(ts)[len(ts) // 2]
        times[name] = {
            "ms_per_step": dt * 1e3,
            "info_bits_per_s": BATCH * code.k / dt,
        }
        log(f"{name}: {dt * 1e3:.2f} ms/step, "
            f"{BATCH * code.k / dt:.3e} info bits/s")

    stamp = time.strftime("%Y%m%d")
    out = {
        "what": (
            "Trained per-iteration normalized/offset min-sum "
            f"(layered-{ITERS}) on (1944,972); BER at "
            f"{BITS_PER_POINT:.0e} info bits/point (BASELINE config-5 "
            "scale), paired noise across arms, all-zero codeword "
            "(symmetry argument: min-sum is sign-symmetric)."
        ),
        "train": {
            "snr_db": list(TRAIN_SNR), "steps": TRAIN_STEPS,
            "batch": TRAIN_BATCH, "loss_first": info["loss"][0],
            "loss_last": info["loss"][-1],
        },
        "alpha": list(alpha),
        "beta": list(beta),
        "eval_batch": BATCH,
        "bits_per_point": steps_per_point * BATCH * code.k,
        "ber": ber,
        "throughput": times,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "artifacts",
        f"{stamp}_minsum_trained_{SCHEDULE}{ITERS}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(path)


if __name__ == "__main__":
    main()
