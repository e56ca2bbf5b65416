"""PHY op tests: closed-form LLRs, quantizer levels, OFDM roundtrip
(SURVEY.md §4: "quantizer levels; LLR formula vs closed form")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_sims_tpu.ops import phy


def test_qpsk_map_exact():
    bits = jnp.asarray([[0, 0, 0, 1, 1, 0, 1, 1]])
    sym = np.array(phy.modulate_qpsk(bits))
    s = 1 / np.sqrt(2)
    expect = np.array([[s + 1j * s, s - 1j * s, -s + 1j * s, -s - 1j * s]])
    np.testing.assert_allclose(sym, expect, atol=1e-7)


def test_qpsk_llr_closed_form(rng):
    """((r−a)²−(r+a)²)/(2σ²) = −2·a·r/σ² with a=1/√2, σ²=1/(2snr)."""
    snr = 10 ** (0.5)
    sym = jnp.asarray(rng.normal(size=(2, 16)) + 1j * rng.normal(size=(2, 16)))
    llr = np.array(phy.demodulate_qpsk_llr(sym, snr))
    a = 1 / np.sqrt(2)
    sigma2 = 0.5 / snr
    r = np.array(sym)
    expect = np.stack(
        [-2 * a * r.real / sigma2, -2 * a * r.imag / sigma2], axis=-1
    ).reshape(2, -1)
    np.testing.assert_allclose(llr, expect, rtol=1e-4, atol=1e-4)


def test_ofdm_roundtrip(rng):
    sym = jnp.asarray(rng.normal(size=(3, 128)) + 1j * rng.normal(size=(3, 128)))
    time = phy.ofdm_modulate(sym, 32)
    back = phy.ofdm_demodulate(time)
    np.testing.assert_allclose(np.array(back), np.array(sym), atol=1e-5)
    # unitary: average power preserved
    np.testing.assert_allclose(
        float(jnp.mean(jnp.abs(time) ** 2)),
        float(jnp.mean(jnp.abs(sym) ** 2)),
        rtol=1e-5,
    )


def test_cyclic_prefix_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 32)) + 0j)
    y = phy.add_cyclic_prefix(x, 8)
    assert y.shape == (2, 4, 40)
    np.testing.assert_array_equal(
        np.array(phy.remove_cyclic_prefix(y, 8)), np.array(x)
    )
    np.testing.assert_array_equal(np.array(y[..., :8]), np.array(x[..., -8:]))


def test_awgn_statistics():
    key = jax.random.key(0)
    x = jnp.zeros((4, 64, 32), jnp.complex64)
    snr = 4.0
    y = phy.awgn(key, x, snr)
    var = float(jnp.mean(jnp.real(y) ** 2))
    # per-component variance = 1/(2 snr)
    np.testing.assert_allclose(var, 1 / (2 * snr), rtol=0.05)


def test_quantizer_levels():
    """b bits (clean mode) → 2^b − 1 distinct mid-tread levels, uniformly
    spaced by step, all within ±clip."""
    x = jnp.asarray(np.linspace(-3, 3, 1001)[None, :] + 0j)
    q = np.array(phy.quantize_complex(x, 3, 2.0, legacy_clip=False)).real
    levels = np.unique(q)
    step = 2 * 2.0 / (2**3 - 1)
    assert len(levels) == 2**3 - 1
    diffs = np.diff(levels)
    np.testing.assert_allclose(diffs, step, rtol=1e-5)
    assert np.abs(q).max() <= 2.0 + 1e-6
    assert 0.0 in levels  # mid-tread


def test_quantizer_legacy_clip_quirk():
    """The reference clips at ±((2^{b−1})·step − 1) (ofdm_functions.py:44-45)
    — for clip=2.5, b=3: step=5/7, bound = 4·5/7 − 1 ≈ 1.857 < 2.5."""
    x = jnp.asarray([[10.0 + 0j]])
    q = np.array(phy.quantize_complex(x, 3, 2.5, legacy_clip=True)).real
    step = 2 * 2.5 / 7
    np.testing.assert_allclose(q[0, 0], 4 * step - 1, rtol=1e-6)


def test_qam16_roundtrip_hard_decision(rng):
    bits = jnp.asarray(rng.integers(0, 2, (2, 64)))
    sym = phy.modulate_qam16(bits)
    # unit average energy
    np.testing.assert_allclose(
        float(jnp.mean(jnp.abs(sym) ** 2)), 1.0, rtol=0.15
    )
    llr = phy.qam16_llr(sym, 1e4)
    hard = (np.array(llr) > 0).astype(int)
    np.testing.assert_array_equal(hard, np.array(bits))


def test_bpsk_llr_sign(rng):
    bits = jnp.asarray(rng.integers(0, 2, (1, 32)))
    sym = phy.modulate_bpsk(bits)
    llr = phy.bpsk_llr(sym, 100.0)
    np.testing.assert_array_equal((np.array(llr) > 0).astype(int), np.array(bits))


def test_weighted_mse_formula(rng):
    est = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    llr = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    got = float(phy.weighted_mse(est, llr, 0.001))
    expect = np.mean(
        (np.array(est) - np.array(llr)) ** 2 / (np.abs(np.array(llr)) + 0.001)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_agc_global_complex_std(rng):
    x = jnp.asarray(rng.normal(size=(1, 256)) + 1j * rng.normal(size=(1, 256)))
    got = float(phy.agc_global(x))
    np.testing.assert_allclose(got, np.std(np.array(x)), rtol=1e-5)


def test_agc_per_symbol_formula():
    snr = jnp.asarray([[1.0, 4.0]])
    f = np.array(phy.agc_per_symbol(snr, agc_clip=10.0, clip_ratio=1.0))
    sigma = 0.5 * (1 + 1 / np.array([[1.0, 4.0]]))
    np.testing.assert_allclose(f, 10.0 / sigma, rtol=1e-6)
