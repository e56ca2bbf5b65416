#!/usr/bin/env python
"""Tanh experiment family end-to-end: train + evaluate + compare.

The reference's tanh recipe is aspirational — ``unquantized_tanh.py``
still calls ``train_nn_withSNR`` and ``train_nn_tanh`` crashes on
imports (``ofdm/ofdm_nn.py:411``, ``nn/llr.py:77,94`` — SURVEY §2.3).
This script runs the recipe the reference intended, working:

  1. one shared quantized-ADC data config (qbits=$TANH_QBITS, per-symbol
     random SNR in [$TANH_SNR_LO, $TANH_SNR_HI] dB, (64,32) reference
     chain) generates paired training sets — plain-LLR targets and
     tanh(llr) targets (``ofdm/ofdm_nn.py:447``);
  2. LLRestimatorWithSNR trains on the plain targets (weighted MSE),
     LLRestimatorTanh on the squashed ones;
  3. both evaluate on identical noise with ``evaluate_sweep`` — coded
     BER through the BP decoder, WMSE, and for the tanh model the
     flipped-position WMSE metric (``evaluate_quantized_tanh.py:163-170``,
     atanh inversion at ``:157``);
  4. the comparison lands in docs/artifacts/<stamp>_tanh_family.json
     plus registry entries.

Run:  python examples/tanh_family.py     (CPU-friendly; TPU faster)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.evaluate import EvalConfig, evaluate_sweep
from ldpc_sims_tpu.models import LLRestimatorTanh, LLRestimatorWithSNR
from ldpc_sims_tpu.ops.chain import LinkConfig
from ldpc_sims_tpu.training import TrainConfig, make_llr_dataset, train_llr
from ldpc_sims_tpu.utils import enable_compilation_cache
from ldpc_sims_tpu.utils.registry import record_run

QBITS = int(os.environ.get("TANH_QBITS", "3"))
SNR_LO = float(os.environ.get("TANH_SNR_LO", "0"))
SNR_HI = float(os.environ.get("TANH_SNR_HI", "10"))
NUM_CW = int(os.environ.get("TANH_NUM_CW", "16384"))
EPOCHS = int(os.environ.get("TANH_EPOCHS", "600"))
OUT = os.environ.get("TANH_OUT", "outputs")
# SGD like the reference (weighted-MSE's 1/(|target|+eps) weights blow
# up Adam at these scales — measured: adam/0.01 diverges on both arms);
# the tanh arm's squashed targets need a smaller step
LR_PLAIN = float(os.environ.get("TANH_LR_PLAIN", "0.02"))
LR_TANH = float(os.environ.get("TANH_LR_TANH", "0.005"))

ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    log(f"cache: {enable_compilation_cache()}")
    code = get_code("ref6432")
    link = LinkConfig(
        bp_iterations=3, bp_method="sum-product-ref", clamp=20.0,
        qbits=QBITS, snr_per_symbol=True, snrdb_low=SNR_LO,
        snrdb_high=SNR_HI, agc="per-symbol",
    )
    key = jax.random.key(20260821)
    arms = {}
    stamp = time.strftime("%Y%m%d-%H%M%S")

    for tag, tanh, model in (
        ("plain", False, LLRestimatorWithSNR(32)),
        ("tanh", True, LLRestimatorTanh(32)),
    ):
        tc = TrainConfig(
            learning_rate=LR_TANH if tanh else LR_PLAIN,
            num_epochs=EPOCHS, batch_size=512, seed=3, optimizer="sgd",
        )
        t0 = time.time()
        x, y = make_llr_dataset(
            key, code, link, NUM_CW, with_snr_feature=True,
            tanh_targets=tanh,
        )
        ckpt = os.path.join(OUT, "model", f"{stamp}_{tag}_q{QBITS}")
        params, info = train_llr(
            model, x, y, tc, ckpt_dir=ckpt,
            manifest={"model": type(model).__name__, "tanh": tanh,
                      "qbits": QBITS, "code": code.name},
            log=None,
        )
        tl = [float(v) for v in info["train_loss"]]
        log(f"{tag}: trained {EPOCHS} epochs in {time.time() - t0:.0f}s "
            f"(loss {tl[0]:.4f} -> {tl[-1]:.4f})")
        curves = evaluate_sweep(
            code, link,
            EvalConfig(
                snrdb=tuple(float(s) for s in range(0, 11, 2)),
                num_codewords=4096, with_snr_feature=True,
                tanh_model=tanh, seed=11,
            ),
            model=model, params=params, log=log,
        )
        arms[tag] = {
            "model": type(model).__name__,
            "final_train_loss": tl[-1],
            "ckpt": ckpt,
            "curves": curves,
        }
        record_run("tanh-family", OUT, arm=tag, ckpt=ckpt,
                   qbits=QBITS, code=code.name)

    path = os.path.join(ART_DIR, f"{stamp}_tanh_family.json")
    with open(path, "w") as f:
        json.dump({
            "what": (
                "tanh-target vs plain-target LLR estimator family on the "
                "quantized (64,32) chain: the reference's broken "
                "train_nn_tanh recipe, working (SURVEY 2.3); identical "
                "noise, flipped-WMSE metric for the tanh arm"
            ),
            "qbits": QBITS, "snr_db": [SNR_LO, SNR_HI],
            "num_codewords": NUM_CW, "epochs": EPOCHS,
            "arms": arms,
        }, f, indent=1)
    log(f"artifact -> {path}")


if __name__ == "__main__":
    main()
