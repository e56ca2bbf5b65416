#!/usr/bin/env python
"""Per-edge neural-BP at scale: train on (1944,972), infer on the kernel.

The reference's flagship idea is the *trainable* BP decoder (per-edge
weights on every VC layer, ``bp/bp_vc.py:101-107``) — but its dense
E×E formulation caps it at toy codes. Here the full loop runs at
802.11n scale:

  1. train edge-flavor weights (w_msg/w_llr per iteration + final
     marginalization) for a SHORT flooding-K min-sum decode by BCE
     through the differentiable roll backend (all-zero-codeword AWGN
     batches generated on device, cf. train_minsum_weights);
  2. evaluate the trained pytree ON THE PALLAS FAST PATH (the weight
     tables ride along in VMEM, ~10% overhead — kernels/minsum_qc.py)
     with a paired-noise BER comparison against plain flooding-K and
     flooding-20;
  3. commit docs/artifacts/<stamp>_edge1944.json.

Run:  python examples/train_edge_1944.py      (TPU; ~10 min)
Env:  EDGE_K (default 12), EDGE_STEPS (300), EDGE_BATCH (192),
      EDGE_SNR ("1.25,3.0"), EDGE_EVAL_STEPS (31).
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

K = int(os.environ.get("EDGE_K", "12"))
STEPS = int(os.environ.get("EDGE_STEPS", "300"))
BATCH = int(os.environ.get("EDGE_BATCH", "192"))
SNR_LO, SNR_HI = (
    float(x) for x in os.environ.get("EDGE_SNR", "1.25,3.0").split(",")
)
EVAL_BATCH = 32768
EVAL_STEPS = int(os.environ.get("EDGE_EVAL_STEPS", "31"))
GUARD_SNRS = (1.75, 2.25)

ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"cache: {enable_compilation_cache()}")
    code = get_code("wifi1944")
    log(f"device {jax.devices()[0]}, code {code.name}, K={K}")

    weights = init_neural_bp_weights(code, K, flavor="edge")
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(weights))
    log(f"edge-flavor weights: {n_params} parameters")
    opt = optax.adam(float(os.environ.get("EDGE_LR", "0.003")))
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
                output="soft", backend="roll",
            )
            return -jnp.mean(jnp.log(1.0 - p1 + 1e-7))

        loss, grads = jax.value_and_grad(loss_fn)(weights)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(weights, updates), opt_state, loss

    key = jax.random.key(4)
    losses = []
    t0 = time.time()
    for i in range(STEPS):
        weights, opt_state, loss = step(
            weights, opt_state, jax.random.fold_in(key, i)
        )
        losses.append(float(loss))
        if i % max(STEPS // 10, 1) == 0 or i == STEPS - 1:
            log(f"[{i + 1}/{STEPS}] BCE {losses[-1]:.5f} "
                f"({time.time() - t0:.0f}s)")

    # paired BER guard on the FAST PATH (pallas kernel with weight
    # tables) vs plain flooding-K and flooding-20
    def ber(tag, **kw):
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
        for snr_db in GUARD_SNRS:
            errs = 0
            for i in range(EVAL_STEPS):
                k = jax.random.fold_in(
                    jax.random.fold_in(jax.random.key(99),
                                       int(snr_db * 100)), i,
                )
                errs += int(f(k, jnp.asarray(snr_db)))
            nbits = EVAL_STEPS * EVAL_BATCH * code.n
            out[str(snr_db)] = errs / nbits
            log(f"{tag} @{snr_db} dB: BER {errs / nbits:.3e}")
        return out

    res = {
        "what": (
            "per-edge neural-BP trained at (1944,972) scale, evaluated "
            "on the Pallas fast path (VERDICT r3 #2); paired noise"
        ),
        "K": K, "steps": STEPS, "batch": BATCH,
        "train_snr_db": [SNR_LO, SNR_HI], "params": n_params,
        "bce": [losses[0], losses[-1]],
        "ber": {
            f"flooding-{K} plain": ber(f"flooding-{K} plain",
                                       iterations=K),
            f"flooding-{K} per-edge": ber(
                f"flooding-{K} per-edge", iterations=K, weights=weights
            ),
            "flooding-20 plain": ber("flooding-20 plain", iterations=20),
        },
    }
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(ART_DIR, f"{stamp}_edge1944.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    log(f"artifact -> {path}")


if __name__ == "__main__":
    main()
