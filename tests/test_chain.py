"""End-to-end link tests: noiseless decode, BER monotonicity, quantized
paths, and golden parity against the reference's stored BER curve
(BASELINE.md table A — SURVEY.md §4 "golden-value tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.codes import get_code, reference_6432
from ldpc_sims_tpu.ops.chain import LinkConfig, link_step


def _rates(out):
    return (
        float(out["uncoded_bit_errors"]) / float(out["uncoded_bits"]),
        float(out["coded_bit_errors"]) / float(out["info_bits"]),
        float(out["frame_errors"]) / float(out["frames"]),
    )


def test_noiseless_chain_decodes_exactly():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    out = link_step(jax.random.key(0), jnp.asarray(60.0), code, cfg, 64)
    assert int(out["coded_bit_errors"]) == 0
    assert int(out["uncoded_bit_errors"]) == 0


def test_ber_monotonic_in_snr():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3)
    step = jax.jit(
        lambda k, s: link_step(k, s, code, cfg, 1024),
        static_argnames=(),
    )
    bers = []
    for i, snr in enumerate([0.0, 3.0, 6.0]):
        out = step(jax.random.key(i), jnp.asarray(snr))
        bers.append(_rates(out)[1])
    assert bers[0] > bers[1] > bers[2]


def test_coded_beats_uncoded_at_moderate_snr():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=5)
    out = link_step(jax.random.key(1), jnp.asarray(4.0), code, cfg, 2048)
    unc, coded, _ = _rates(out)
    assert coded < unc / 3


GOLDEN = {  # snrdb: (uncoded, coded, bler, batch) from the ref pickle;
    # batch grows toward the high-SNR floor so the expected error count
    # stays resolvable — the ±(1−1e−7) clamp arithmetic only bites there
    2.0: (1.040e-1, 2.450e-2, 5.136e-1, 4096),
    4.0: (5.647e-2, 4.457e-3, 1.276e-1, 4096),
    6.0: (2.295e-2, 3.419e-4, 1.086e-2, 8192),
    8.0: (5.950e-3, 8.106e-6, 2.747e-4, 65536),
}


@pytest.mark.parametrize("snrdb", sorted(GOLDEN))
def test_golden_parity_with_reference_curve(snrdb):
    """Reference stored run: (64,32), QPSK/OFDM-32/AWGN, 3-iter sum-product,
    clamp 20 (`outputs/ber/20191203-191640_..._quantized.pkl`, produced by
    evaluate_quantized.py:14-24). Monte-Carlo tolerance: ±4σ + 10%."""
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3, bp_method="sum-product-ref", clamp=20.0)
    exp_unc, exp_coded, exp_bler, B = GOLDEN[snrdb]
    out = link_step(jax.random.key(42), jnp.asarray(snrdb), code, cfg, B)
    unc, coded, bler = _rates(out)
    for got, exp, denom in [
        (unc, exp_unc, B * 64),
        (coded, exp_coded, B * 32),
        (bler, exp_bler, B),
    ]:
        sigma = np.sqrt(exp * (1 - exp) / denom)
        assert abs(got - exp) < 4 * sigma + 0.1 * exp, (got, exp)


# full stored reference curve (BASELINE.md table A, uncoded/coded/bler)
FULL_CURVE = {
    0.0: (1.589e-1, 7.271e-2, 8.776e-1),
    1.0: (1.310e-1, 4.467e-2, 7.269e-1),
    2.0: (1.040e-1, 2.450e-2, 5.136e-1),
    3.0: (7.875e-2, 1.142e-2, 2.926e-1),
    4.0: (5.647e-2, 4.457e-3, 1.276e-1),
    5.0: (3.750e-2, 1.411e-3, 4.373e-2),
    6.0: (2.295e-2, 3.419e-4, 1.086e-2),
    7.0: (1.258e-2, 6.151e-5, 1.953e-3),
    8.0: (5.950e-3, 8.106e-6, 2.747e-4),
    9.0: (2.400e-3, 9.537e-7, 3.052e-5),
}


@pytest.mark.slow
def test_full_curve_parity_slow():
    """Re-runnable full-curve parity (the docs/parity_report.md claim as
    a test): every stored reference point 0–9 dB within ±4σ + 10%.
    Batch per point sized for ≥4 expected coded errors (9 dB needs 2^19
    codewords). Run with `pytest -m slow`."""
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3, bp_method="sum-product-ref", clamp=20.0)
    step = jax.jit(
        lambda k, s, b: link_step(k, s, code, cfg, b),
        static_argnames=("b",),
    )
    for i, (snrdb, (exp_unc, exp_coded, exp_bler)) in enumerate(
        sorted(FULL_CURVE.items())
    ):
        B = int(min(max(4 / (exp_coded * 32), 4096), 2**19))
        B = ((B + 4095) // 4096) * 4096
        unc = coded = bler = 0.0
        chunks = max(B // 65536, 1)
        Bc = B // chunks
        for c in range(chunks):
            out = step(
                jax.random.fold_in(jax.random.key(100 + i), c),
                jnp.asarray(snrdb), Bc,
            )
            unc += float(out["uncoded_bit_errors"])
            coded += float(out["coded_bit_errors"])
            bler += float(out["frame_errors"])
        unc, coded, bler = unc / (B * 64), coded / (B * 32), bler / B
        for got, exp, denom in [
            (unc, exp_unc, B * 64),
            (coded, exp_coded, B * 32),
            (bler, exp_bler, B),
        ]:
            sigma = np.sqrt(exp * (1 - exp) / denom)
            assert abs(got - exp) < 4 * sigma + 0.1 * exp, (
                snrdb, got, exp,
            )


def test_msg_quantized_decode_golden():
    """Message-quantized min-sum regression: 5-bit messages (step ≈ 1.0
    over ±16) cost little at moderate SNR; 2-bit messages visibly
    degrade (deterministic seed, count-level band)."""
    code = get_code("wifi648")
    base = dict(modulation="qpsk", ofdm_size=32, bp_iterations=10,
                bp_method="min-sum", clamp=None)
    outs = {}
    for qb in (None, 5, 2):
        cfg = LinkConfig(**base, msg_qbits=qb, msg_qclip=16.0)
        out = link_step(jax.random.key(9), jnp.asarray(2.2), code, cfg, 512)
        outs[qb] = float(out["coded_bit_errors"]) / float(out["info_bits"])
    assert outs[5] <= 3 * outs[None] + 1e-4
    assert outs[2] > outs[5]


def test_quantized_global_agc_path():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3, qbits=3, clip_ratio=1.0, agc="global")
    out = link_step(jax.random.key(2), jnp.asarray(6.0), code, cfg, 1024)
    _, coded_q, _ = _rates(out)
    cfg_clean = LinkConfig(bp_iterations=3)
    out_c = link_step(jax.random.key(2), jnp.asarray(6.0), code, cfg_clean, 1024)
    _, coded, _ = _rates(out_c)
    # 3-bit ADC degrades but does not destroy decoding (ref: 3.36e-2 vs
    # 3.42e-4 at 6 dB, BASELINE.md table A)
    assert coded <= coded_q < 0.2


def test_quantized_per_symbol_agc_path():
    code = reference_6432()
    cfg = LinkConfig(
        bp_iterations=3, qbits=3, agc="per-symbol", agc_clip=10.0,
        snr_per_symbol=True, snrdb_low=3.0, snrdb_high=7.0,
    )
    out = link_step(jax.random.key(3), jnp.asarray(0.0), code, cfg, 512)
    assert 0 < float(out["coded_bit_errors"]) < 0.2 * float(out["info_bits"])


def test_per_symbol_snr_mode():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3, snr_per_symbol=True, snrdb_low=0.0,
                     snrdb_high=10.0)
    out = link_step(jax.random.key(4), jnp.asarray(0.0), code, cfg, 512)
    unc, coded, _ = _rates(out)
    assert 0 < coded < unc


@pytest.mark.parametrize("mod", ["bpsk", "qpsk", "qam16"])
def test_modulations_run_and_decode(mod):
    code = get_code("peg128_64")
    cfg = LinkConfig(modulation=mod, ofdm_size=32, bp_iterations=5,
                     bp_method="min-sum")
    out = link_step(jax.random.key(5), jnp.asarray(30.0), code, cfg, 64)
    assert int(out["coded_bit_errors"]) == 0


def test_return_arrays_shapes():
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=1, qbits=3)
    out = link_step(jax.random.key(6), jnp.asarray(5.0), code, cfg, 32,
                    return_arrays=True)
    assert out["llrs"].shape == (32, 64)
    assert out["qllrs"].shape == (32, 64)
    assert out["coded"].shape == (32, 64)


def test_cyclic_prefix_chain():
    """CP framing: exact decode noiselessly; arrays come back stripped."""
    code = reference_6432()
    cfg = LinkConfig(bp_iterations=3, cyclic_prefix=8)
    out = link_step(jax.random.key(11), jnp.asarray(60.0), code, cfg, 128,
                    return_arrays=True)
    assert int(out["coded_bit_errors"]) == 0
    assert out["rx_time"].shape[-1] == 32  # CP removed from arrays
    out2 = link_step(jax.random.key(12), jnp.asarray(6.0), code, cfg, 2048)
    ber = float(out2["coded_bit_errors"]) / float(out2["info_bits"])
    assert 0 < ber < 2e-3  # same statistics as the CP-free chain


def test_larger_code_chain_minsum():
    code = get_code("wifi648")
    cfg = LinkConfig(bp_iterations=10, bp_method="min-sum", clamp=None,
                     ofdm_size=32)
    out = link_step(jax.random.key(7), jnp.asarray(3.0), code, cfg, 128)
    unc, coded, _ = _rates(out)
    assert coded < unc / 5
