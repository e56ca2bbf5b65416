#!/usr/bin/env python
"""Per-edge neural-BP x LAYERED schedule at (1944,972) — the round-5
headline experiment.

Round 4 left the repo's two strongest BER levers unstackable: trained
per-edge weights ran only under a flooding unroll, and the layered
(serial-C) schedule only with the 2-scalar (alpha, beta) family — whose
trained layered-6/7 schedules FLOOR at 2.5-3.5 dB (registry:
docs/artifacts/minsum_trained_schedules.json). This script trains the
composed decoder the round-5 kernel/backend work enables:

  1. train edge-flavor weights for a layered-K min-sum decode by BCE
     through the differentiable roll backend (weighted serial-C sweeps,
     ops/bp_roll.py:_decode_layered), all-zero-codeword AWGN batches on
     device, WIDE SNR window (default 1.25-3.5 dB — the narrow-window
     recipe is what floored the alpha/beta family), with in-loop
     decoded-BER probes at fixed SNR points (floor early warning);
  2. evaluate on the Pallas fast path (weight tables in VMEM,
     kernels/minsum_qc.py weighted layered sweeps): paired-noise BER
     vs plain layered-K, trained-alpha/beta layered-8 (the current
     headline schedule) and the flooding-20 control at waterfall AND
     near-floor points;
  3. time the weighted layered-K decode in the device-resident pipeline
     shape (the bench.py headline configuration);
  4. save the weight pytree (npz) + JSON artifact and register it under
     registry["wifi1944"]["edge_layered"][K] for bench.py / the
     error-floor campaign.

Reference capability being scaled: the trainable per-iteration VC
layers, /root/reference/pytorch/bp/bp_vc.py:101-107 + bp/bp.py:33-34.

Run:  python examples/train_edge_layered_1944.py     (TPU; ~15-30 min)
Env:  EL_K (6), EL_STEPS (1500), EL_BATCH (192), EL_LR (2e-3),
      EL_SNR ("1.25,3.5"), EL_EVAL_STEPS (31), EL_FLOOR_STEPS (31),
      EL_WARM (path to npz to continue training from).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.ops.bp import bp_decode, init_neural_bp_weights
from ldpc_sims_tpu.utils import enable_compilation_cache

K = int(os.environ.get("EL_K", "6"))
STEPS = int(os.environ.get("EL_STEPS", "1500"))
BATCH = int(os.environ.get("EL_BATCH", "192"))
LR = float(os.environ.get("EL_LR", "2e-3"))
MS_LR = float(os.environ.get("EL_MS_LR", "0.01"))
JOINT = os.environ.get("EL_JOINT", "1") == "1"
SNR_LO, SNR_HI = (
    float(x) for x in os.environ.get("EL_SNR", "1.25,3.5").split(",")
)
EVAL_BATCH = int(os.environ.get("EL_EVAL_BATCH", "32768"))
EVAL_STEPS = int(os.environ.get("EL_EVAL_STEPS", "31"))
FLOOR_STEPS = int(os.environ.get("EL_FLOOR_STEPS", "31"))
GUARD_SNRS = (1.75, 2.25)
FLOOR_SNRS = (2.75, 3.25)
PROBE_SNRS = (2.0, 2.5, 3.0)
PROBE_BATCH = int(os.environ.get("EL_PROBE_BATCH", "16384"))

ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)
REG_PATH = os.path.join(ART_DIR, "minsum_trained_schedules.json")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"cache: {enable_compilation_cache()}")
    code = get_code("wifi1944")
    log(f"device {jax.devices()[0]}, code {code.name}, layered K={K}")

    weights = init_neural_bp_weights(code, K, flavor="edge")
    if JOINT:
        # jointly train per-iteration (alpha, beta) with the edge
        # weights: the multiplicative per-edge family cannot express an
        # OFFSET, which is the trained alpha/beta family's main lever
        # (measured: plain per-edge layered-6 loses to alpha/beta-8 by
        # 50x at 2.25 dB, 20260821-102413_edge_layered1944_K6.json)
        from ldpc_sims_tpu.ops.bp import init_minsum_weights

        weights = {**weights, **init_minsum_weights(K)}
    warm = os.environ.get("EL_WARM")
    if warm:
        z = np.load(warm)
        weights = {k: jnp.asarray(z[k]) for k in weights}
        log(f"warm start from {warm}")
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(weights))
    log(f"weights ({'joint' if JOINT else 'edge'}): {n_params} parameters")
    opt = optax.multi_transform(
        {"ms": optax.adam(MS_LR), "edge": optax.adam(LR)},
        lambda tree: {k: ("ms" if k.startswith("ms_") else "edge")
                      for k in tree},
    )
    opt_state = opt.init(weights)

    @jax.jit
    def step(weights, opt_state, key):
        ks, kn = jax.random.split(key)
        snr = 10.0 ** (
            jax.random.uniform(ks, (BATCH, 1), minval=SNR_LO,
                               maxval=SNR_HI) / 10.0
        )
        sigma = jax.lax.rsqrt(snr)
        r = 1.0 + sigma * jax.random.normal(kn, (BATCH, code.n))
        llr = -2.0 * r / (sigma * sigma)

        def loss_fn(w):
            p1 = bp_decode(
                llr, code, iterations=K, method="min-sum", weights=w,
                schedule="layered", output="soft", backend="roll",
            )
            return -jnp.mean(jnp.log(1.0 - p1 + 1e-7))

        loss, grads = jax.value_and_grad(loss_fn)(weights)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(weights, updates), opt_state, loss

    # in-loop decoded-BER probe on the INFERENCE path (pallas weighted
    # layered) — a floor announces itself here before any campaign
    @jax.jit
    def probe(weights, key):
        out = []
        for i, s in enumerate(PROBE_SNRS):
            k = jax.random.fold_in(key, i)
            snr = 10.0 ** (s / 10.0)
            sigma = snr ** -0.5
            r = 1.0 + sigma * jax.random.normal(k, (PROBE_BATCH, code.n))
            llr = -2.0 * r / (sigma * sigma)
            bits = bp_decode(llr, code, iterations=K, method="min-sum",
                             weights=weights, schedule="layered",
                             output="hard",
                             backend="roll" if JOINT else "pallas")
            out.append(jnp.sum(bits.astype(jnp.int32)))
        return jnp.stack(out)

    key = jax.random.key(11)
    losses, probes = [], []
    t0 = time.time()
    for i in range(STEPS):
        weights, opt_state, loss = step(
            weights, opt_state, jax.random.fold_in(key, i)
        )
        losses.append(float(loss))
        if i % max(STEPS // 10, 1) == 0 or i == STEPS - 1:
            pb = np.asarray(probe(weights, jax.random.fold_in(key, 10**6 + i)))
            bers = {
                str(s): float(e) / (PROBE_BATCH * code.n)
                for s, e in zip(PROBE_SNRS, pb)
            }
            probes.append({"step": i, "ber": bers})
            log(
                f"[{i + 1}/{STEPS}] BCE {losses[-1]:.5f} probe "
                + " ".join(f"{s}dB:{v:.2e}" for s, v in bers.items())
                + f" ({time.time() - t0:.0f}s)"
            )

    # ---- paired BER guard + floor mini-probe on the fast path --------
    def ber(tag, snrs, steps, **kw):
        @jax.jit
        def f(key, snr_db):
            snr = 10.0 ** (snr_db / 10.0)
            sigma = jax.lax.rsqrt(snr)
            r = 1.0 + sigma * jax.random.normal(key, (EVAL_BATCH, code.n))
            llr = -2.0 * r / (sigma * sigma)
            bits = bp_decode(llr, code, method="min-sum",
                             backend="pallas", **kw)
            return jnp.sum(bits.astype(jnp.int32))

        out = {}
        for snr_db in snrs:
            errs = 0
            for i in range(steps):
                k = jax.random.fold_in(
                    jax.random.fold_in(jax.random.key(55),
                                       int(snr_db * 100)), i,
                )
                errs += int(f(k, jnp.asarray(snr_db)))
            nbits = steps * EVAL_BATCH * code.n
            out[str(snr_db)] = {"ber": errs / nbits, "errs": errs,
                                "coded_bits": nbits}
            log(f"{tag} @{snr_db} dB: BER {errs / nbits:.3e} ({errs} errs)")
        return out

    reg = json.load(open(REG_PATH)) if os.path.exists(REG_PATH) else {}
    t8 = reg.get("wifi1944", {}).get("layered", {}).get("8", {})
    edge_w = {k: v for k, v in weights.items() if k.startswith("w_")}
    if JOINT:
        from ldpc_sims_tpu.ops.bp import freeze_minsum_weights

        al_t, be_t = freeze_minsum_weights(weights)
        trained_kw = dict(iterations=K, schedule="layered",
                          alpha=al_t, beta=be_t, weights=edge_w)
        log("frozen alpha: " + ",".join(f"{a:.3f}" for a in al_t))
        log("frozen beta:  " + ",".join(f"{b:.3f}" for b in be_t))
    else:
        trained_kw = dict(iterations=K, schedule="layered",
                          weights=edge_w)
    configs = {
        "flooding-20": dict(iterations=20),
        f"layered-{K} plain": dict(iterations=K, schedule="layered"),
        f"layered-{K} per-edge": trained_kw,
    }
    if t8:
        configs["trained-layered-8"] = dict(
            iterations=8, schedule="layered",
            alpha=tuple(float(x) for x in t8["alpha"]),
            beta=tuple(float(x) for x in t8["beta"]),
        )
    res_ber = {}
    for tag, kw in configs.items():
        res_ber[tag] = ber(tag, GUARD_SNRS, EVAL_STEPS, **kw)
        res_ber[tag].update(ber(tag, FLOOR_SNRS, FLOOR_STEPS, **kw))

    # ---- pipeline throughput (bench.py's headline shape) -------------
    def pipe_rate(tag, **kw):
        PIPE_S = 32

        @jax.jit
        def pipe(key):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                llr = (
                    jax.random.normal(k, (EVAL_BATCH, code.n), jnp.float32)
                    * 2.0 - 4.0
                )
                bits = bp_decode(llr, code, method="min-sum",
                                 output="hard", backend="pallas", **kw)
                return acc + jnp.sum(bits.astype(jnp.int32))

            return jax.lax.fori_loop(0, PIPE_S, body, jnp.int32(0))

        float(pipe(jax.random.key(999)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(pipe(jax.random.key(i)))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        rate = EVAL_BATCH * code.k * PIPE_S / dt
        log(f"{tag}: {dt * 1e3 / PIPE_S:.2f} ms/step, {rate:.3e} bits/s")
        return rate

    rates = {
        f"layered-{K} plain": pipe_rate(
            f"layered-{K} plain", iterations=K, schedule="layered"),
        f"layered-{K} per-edge": pipe_rate(
            f"layered-{K} per-edge", **trained_kw),
    }

    # parity verdict vs the paired flooding-20 control at every point
    ctrl = res_ber["flooding-20"]
    verdict = {}
    for snr, c in ctrl.items():
        e = res_ber[f"layered-{K} per-edge"][snr]
        ok = e["errs"] <= c["errs"] * 1.15 + 5.0 * (c["errs"] ** 0.5) + 20
        verdict[snr] = bool(ok)
        log(f"per-edge layered-{K} @{snr} dB: {e['ber']:.3e} vs control "
            f"{c['ber']:.3e} -> {'OK' if ok else 'WORSE'}")

    stamp = time.strftime("%Y%m%d-%H%M%S")
    npz_name = f"edge_layered_1944_K{K}.npz"
    np.savez(os.path.join(ART_DIR, npz_name),
             **{k: np.asarray(v) for k, v in weights.items()})
    res = {
        "what": (
            "per-edge neural-BP composed with the layered schedule at "
            "(1944,972) (round-5 headline experiment); trained on the "
            "roll backend, evaluated on the Pallas fast path"
        ),
        "K": K, "steps": STEPS, "batch": BATCH, "lr": LR,
        "train_snr_db": [SNR_LO, SNR_HI], "params": n_params,
        "bce": [losses[0], losses[-1]], "probes": probes,
        "ber": res_ber, "pipe_bits_per_s": rates,
        "parity_vs_flooding20": verdict,
        "weights_npz": npz_name,
    }
    path = os.path.join(ART_DIR, f"{stamp}_edge_layered1944_K{K}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    log(f"artifact -> {path}")

    entry = {
        "weights_npz": npz_name,
        "parity_ok": all(verdict.get(str(s), False) for s in GUARD_SNRS),
        "guard_verdict": verdict,
        "artifact": os.path.basename(path),
        # floor_ok is set only by the full error-floor campaign
    }
    if JOINT:
        entry["alpha"] = list(al_t)
        entry["beta"] = list(be_t)
    reg.setdefault("wifi1944", {}).setdefault("edge_layered", {})[str(K)] = (
        entry
    )
    with open(REG_PATH, "w") as f:
        json.dump(reg, f, indent=1)
    log(f"registry updated: {REG_PATH}")


if __name__ == "__main__":
    main()
