"""End-to-end reproduction of the reference's core experiment, small scale.

The study of the original codebase (SURVEY.md §0): train an MLP to
regress exact LLRs from coarsely-quantized (3-bit ADC) time-domain OFDM
samples, then compare three receivers on identical bits —

* Traditional: analytic LLRs from the clean signal + BP,
* Quantized:  analytic LLRs computed from the quantized signal + BP,
* NN:         the trained LLR net on quantized samples + BP,

reproducing the qualitative finding of the reference's
unquantized.py → quantized.py → evaluate_quantized.py pipeline in one
script. Runs on CPU in a few minutes (scale up num_codewords / epochs on
TPU):

    PYTHONPATH=. JAX_PLATFORMS=cpu python examples/quantized_llr_study.py

Measured checkpoint (CPU, 4096 codewords, 300 epochs, SGD lr 0.02): at
the 5 dB training point the NN receiver reaches coded BER ≈ 4.5e-2 —
already at the level of the reference's fully-trained NN (5.2e-2 stored
in its 2019 curve, BASELINE.md table A); training longer and per-SNR
models (as the reference does) close the remaining gap to the
quantized-LLR baseline.
"""

import jax
import jax.numpy as jnp

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.evaluate import EvalConfig, evaluate_sweep
from ldpc_sims_tpu.models import LLRestimator
from ldpc_sims_tpu.ops.chain import LinkConfig
from ldpc_sims_tpu.plotting import plot_ber_curves, plot_wmse
from ldpc_sims_tpu.training import TrainConfig, make_llr_dataset, train_llr


def main(
    num_codewords: int = 8192,
    epochs: int = 1000,
    snrdb_train: float = 5.0,
    qbits: int = 3,
    out_prefix: str = "/tmp/quantized_llr_study",
):
    code = get_code("ref6432")
    # per-symbol AGC quantization (the quantized_snr.py recipe — its
    # fixed agc_clip keeps the reference's legacy clip bound benign)
    link_train = LinkConfig(
        bp_iterations=1, qbits=qbits, agc="per-symbol", agc_clip=10.0
    )

    print(f"generating {num_codewords} codewords @ {snrdb_train} dB ...")
    x, y = make_llr_dataset(
        jax.random.key(0), code, link_train, num_codewords,
        snrdb=snrdb_train,
    )

    model = LLRestimator(ofdm_size=32)
    print("training LLR estimator on quantized inputs ...")
    params, info = train_llr(
        model, x, y,
        TrainConfig(learning_rate=0.02, num_epochs=epochs, batch_size=1024),
    )

    link_eval = LinkConfig(
        bp_iterations=3, bp_method="sum-product-ref", clamp=20.0,
        qbits=qbits, agc="per-symbol", agc_clip=10.0,
    )
    print("evaluating Traditional / Quantized / NN curves ...")
    curves = evaluate_sweep(
        code, link_eval,
        EvalConfig(snrdb=tuple(float(s) for s in range(0, 11, 2)),
                   num_codewords=4096),
        model=model, params=params,
    )
    ber_png = plot_ber_curves(curves, f"{out_prefix}_ber.png",
                              title=f"(64,32) QPSK/OFDM, {qbits}-bit ADC")
    wmse_png = plot_wmse(curves, f"{out_prefix}_wmse.png")
    print(f"figures: {ber_png}  {wmse_png}")
    return curves


if __name__ == "__main__":
    main()
