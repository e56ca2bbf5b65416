"""Evaluate the reference's *stored* NN checkpoints on this framework's chain.

The strongest end-to-end parity check available: take the exact per-SNR
quantized LLR-estimator weights the reference trained in 2019 (the 11
checkpoints named in its results registry
``outputs/results/20191203-191640_tx=20191203-162534_quantized.pkl`` —
the models behind BASELINE.md table A's ``coded_ber_nn`` column), port
them into this framework's flax :class:`LLRestimator`, and run the
jitted evaluation sweep. If the resulting NN coded-BER curve lands on
table A, then the *entire* chain — TX, AWGN, global-AGC 3-bit quantizer
(``gen_qdata``, ``ofdm_functions.py:118-128``), NN inference, 3-iter
sum-product BP, BER bookkeeping — is behaviorally identical to the
reference; any residual training-side gap is attributable to the
reference's unreproducible training data (its tx pickle is absent from
the snapshot and its stored train losses are inconsistent with the
current-generation ``gen_data`` scale — see docs/parity_report.md).

Weight-port details (cited to the reference):

* Architecture map (``nn/llr.py:7-52``): ``fft_layer`` (64x64 linear,
  no bias) -> tanh(``hidden3``) -> tanh(``hidden4``) -> tanh(``hidden5``)
  -> ``final``; the constructed-but-unused ``hidden1``/``hidden2``/
  ``scalar`` parameters are dropped.
* Input layout: the reference feeds **interleaved** re/im samples —
  ``concatenate((rx.real.T, rx.imag.T), axis=1).reshape(-1, 2N)`` on a
  ``(1, total)`` row vector interleaves to ``[re0, im0, re1, im1, ...]``
  (``evaluate_quantized.py:100-101``), matching its ``DFTreal`` init.
  This framework's chain feeds the block layout ``[re*, im*]``, so the
  first-layer weight rows are permuted accordingly (an exactly
  equivalent function).
* Output layout: ``rx_llrs.reshape(-1, 2N)`` is the codeword's 64 coded
  bits in natural order on both sides — no output permutation.

Run (needs torch, baked into the image, and the reference snapshot):

    python examples/reference_weight_port.py [--batch 65536] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REF = os.environ.get("LDPC_REFERENCE", "/root/reference/pytorch")
REGISTRY = "20191203-191640_tx=20191203-162534_quantized.pkl"


def load_reference_params(pth_path: str, ofdm_size: int, template):
    """Port a reference LLRestimator state dict into flax params."""
    import torch

    ck = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = {
        k.removeprefix("module."): v.detach().numpy()
        for k, v in ck["model_state_dict"].items()
    }
    n = ofdm_size
    # block position b <- interleaved index (re of sample b at 2b,
    # im of sample b-N at 2(b-N)+1)
    idx = np.array(
        [2 * b if b < n else 2 * (b - n) + 1 for b in range(2 * n)]
    )
    p = {k: dict(v) for k, v in template["params"].items()}
    p["fft_layer"]["kernel"] = np.ascontiguousarray(
        sd["fft_layer.weight"].T[idx]
    )
    for name in ("hidden3", "hidden4", "hidden5", "final"):
        p[name]["kernel"] = np.ascontiguousarray(sd[f"{name}.weight"].T)
        p[name]["bias"] = sd[f"{name}.bias"]
    return {"params": p}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--qbits", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="outputs/reference_weight_port.json")
    args = ap.parse_args()

    import jax

    from ldpc_sims_tpu.codes import get_code
    from ldpc_sims_tpu.evaluate import EvalConfig, evaluate_sweep
    from ldpc_sims_tpu.models import LLRestimator
    from ldpc_sims_tpu.ops.chain import LinkConfig

    reg_path = os.path.join(REF, "outputs", "results", REGISTRY)
    if not os.path.isfile(reg_path):
        sys.exit(f"reference registry not found: {reg_path}")
    with open(reg_path, "rb") as f:
        reg = pickle.load(f)

    code = get_code("ref6432")
    model = LLRestimator(32)
    template = model.init(
        jax.random.key(0), np.zeros((2, 64), np.float32)
    )
    # the stored curve's eval config (evaluate_quantized.py:14-24):
    # qbits=3, clip_ratio=1 (clipdb=0), 3-iter BP, clamp 20
    link = LinkConfig(
        ofdm_size=32, bp_iterations=args.iters,
        bp_method="sum-product-ref", clamp=20.0,
        qbits=args.qbits, clip_ratio=1.0,
    )

    curves: dict[str, list] = {"snrdb": [], "coded_ber_nn": [],
                               "coded_bler_nn": [], "wmse_nn": [],
                               "coded_ber": [], "coded_ber_qllr": []}
    for snrdb, fname in zip(reg["snrdb"], reg["filenames"]):
        params = load_reference_params(
            os.path.join(REF, "outputs", "model", fname), 32, template
        )
        ec = EvalConfig(snrdb=(float(snrdb),), num_codewords=args.batch,
                        seed=args.seed)
        c = evaluate_sweep(code, link, ec, model=model, params=params,
                           log=None)
        for k in curves:
            curves[k].append(c[k][0] if k != "snrdb" else float(snrdb))
        print(
            f"snr={snrdb:5.1f}  nn={c['coded_ber_nn'][0]:.3e}  "
            f"wmse={c['wmse_nn'][0]:.3f}  trad={c['coded_ber'][0]:.3e}",
            flush=True,
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"source": "reference checkpoints (weight port)",
                   "registry": REGISTRY, "num_codewords": args.batch,
                   **curves}, f, indent=1)
    print(f"curves -> {args.out}")


if __name__ == "__main__":
    main()
