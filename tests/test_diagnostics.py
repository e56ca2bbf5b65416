"""Diagnostics tests: noise-study grid + joint cross-check."""

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes import reference_6432
from ldpc_sims_tpu.diagnostics import evaluate_joint, quantization_noise_study
from ldpc_sims_tpu.models import Joint
from ldpc_sims_tpu.ops.chain import LinkConfig


def test_noise_study_grid_and_moments():
    code = reference_6432()
    recs = quantization_noise_study(
        jax.random.key(0), code,
        snrdb_grid=(5.0,), qbits_grid=(1, 5), clip_ratio_grid=(1.0,),
        num_codewords=128,
    )
    assert len(recs) == 2
    r1 = next(r for r in recs if r["qbits"] == 1)
    r5 = next(r for r in recs if r["qbits"] == 5)
    # more ADC bits → lower combined-noise std (q−tx, the reference's
    # noise_test.py:44 quantity: channel noise + ADC error)
    assert r5["std"] < r1["std"]
    # the ADC-only error (q−rx) is a strict subset of the combined error
    assert r5["std_adc"] < r5["std"]
    assert sum(r1["hist"]) > 0


def test_evaluate_joint_cross_check():
    code = reference_6432()
    link = LinkConfig(bp_iterations=2, qbits=3)
    model = Joint(code_name="ref6432", iterations=2)
    params = model.init(jax.random.key(0), jnp.zeros((2, 64), jnp.float32))
    curves = evaluate_joint(
        model, params, code, link, snrdb_grid=(2.0, 6.0),
        num_codewords=256, log=None,
    )
    for key in ["ber_classic", "ber_quantized", "ber_joint",
                "bler_classic"]:
        assert key in curves and len(curves[key]) == 2
    # classic BER improves with SNR; joint (untrained net) is worse than
    # classic at 6 dB
    assert curves["ber_classic"][1] < curves["ber_classic"][0]
    assert curves["ber_joint"][1] >= curves["ber_classic"][1]


def test_cli_noise_study(tmp_path):
    from ldpc_sims_tpu.cli.main import main

    main([
        "noise-study", "--code", "ref6432", "--snr", "5",
        "--qbits-grid", "3", "--batch", "64", "--out", str(tmp_path),
    ])
    import os
    assert any(
        f.endswith("_noise_study.json") for f in os.listdir(tmp_path)
    )
