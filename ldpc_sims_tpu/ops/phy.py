"""The OFDM PHY chain as fused JAX device ops.

TPU-native redesign of the reference's NumPy DSP toolbox
(``ofdm/ofdm_functions.py:8-128``): every stage is a pure jittable
function of PRNG keys and arrays, so the whole TX → channel → RX chain
fuses into one XLA program and runs on-device — no host round trips, no
dense DFT-matrix matmuls (the reference builds an N×N complex DFT in a
double Python loop, ``ofdm_functions.py:86-93``; here it's the XLA FFT
with the same unitary normalization).

Shapes: bits and LLR streams are flat per-batch rows like the reference's
``(1, num)`` streams, but batched: ``(batch, num)``. OFDM symbol blocks
are ``(batch, n_sym, ofdm_size)``.

Conventions replicated exactly (these shape the BER curves):
* QPSK Gray map bit pair (b0,b1) → ((1−2 b0) + j(1−2 b1))/√2
  (``ofdm_functions.py:17-22``);
* AWGN with per-complex-component σ² = 1/(2·snr) — snr is *symbol* SNR in
  linear units (``ofdm_functions.py:30-33``);
* exact per-bit Gaussian LLRs in log(Pr1/Pr0) convention
  (``ofdm_functions.py:63-78``);
* mid-rise uniform ADC quantizer with the reference's asymmetric clip
  quirk ±((2^{b−1})·step − 1) (``ofdm_functions.py:44-45``) behind
  ``legacy_clip=True`` (set False for a clean symmetric quantizer);
* AGC variants: batch-global (``gen_qdata``, ``ofdm_functions.py:118-128``)
  and per-symbol (``quantized_snr.py:88-104``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "random_bits",
    "modulate_qpsk",
    "demodulate_qpsk_llr",
    "modulate_bpsk",
    "bpsk_llr",
    "modulate_qam16",
    "qam16_llr",
    "ofdm_modulate",
    "awgn",
    "ofdm_demodulate",
    "quantize_complex",
    "agc_global",
    "agc_per_symbol",
    "weighted_mse",
    "bit_errors",
    "ebn0db_to_snrdb",
    "snrdb_to_ebn0db",
    "add_cyclic_prefix",
    "remove_cyclic_prefix",
]

_INV_SQRT2 = 0.7071067811865476


def random_bits(key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
    """Uniform random bits (``create_bits``, ``ofdm_functions.py:8-9``)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8)


# --- constellations -----------------------------------------------------


def modulate_qpsk(bits: jnp.ndarray) -> jnp.ndarray:
    """(batch, 2S) bits → (batch, S) QPSK symbols.

    Bit pair (b0, b1) → ((1−2b0) + j(1−2b1))/√2 (``ofdm_functions.py:17-22``).
    """
    b = bits.reshape(bits.shape[0], -1, 2).astype(jnp.float32)
    re = (1.0 - 2.0 * b[..., 0]) * _INV_SQRT2
    im = (1.0 - 2.0 * b[..., 1]) * _INV_SQRT2
    return jax.lax.complex(re, im)


def demodulate_qpsk_llr(sym: jnp.ndarray, snr: jnp.ndarray) -> jnp.ndarray:
    """Exact per-bit Gaussian LLRs, log(Pr1/Pr0).

    ((r∓1/√2)² − (r±1/√2)²)/(2σ²) with σ² = 1/(2 snr) per component
    (``ofdm_functions.py:63-78``). Simplifies to −(2/√2)·r·(2 snr), kept in
    the expanded form to match reference arithmetic. snr broadcasts over
    symbols (per-symbol-SNR mode passes a (batch, S) array).
    """
    noise_power = 0.5 * (1.0 / snr)
    re, im = jnp.real(sym), jnp.imag(sym)
    llr0 = ((re - _INV_SQRT2) ** 2 - (re + _INV_SQRT2) ** 2) / (
        2.0 * noise_power
    )
    llr1 = ((im - _INV_SQRT2) ** 2 - (im + _INV_SQRT2) ** 2) / (
        2.0 * noise_power
    )
    return jnp.stack([llr0, llr1], axis=-1).reshape(sym.shape[0], -1)


def modulate_bpsk(bits: jnp.ndarray) -> jnp.ndarray:
    """bits → ±1 real symbols as complex (0→+1, 1→−1)."""
    b = bits.astype(jnp.float32)
    return jax.lax.complex(1.0 - 2.0 * b, jnp.zeros_like(b))


def bpsk_llr(sym: jnp.ndarray, snr: jnp.ndarray) -> jnp.ndarray:
    """BPSK LLRs log(Pr1/Pr0) for unit-energy ±1, σ² = 1/(2 snr)/comp."""
    noise_power = 0.5 * (1.0 / snr)
    re = jnp.real(sym)
    return ((re - 1.0) ** 2 - (re + 1.0) ** 2) / (2.0 * noise_power)


def modulate_qam16(bits: jnp.ndarray) -> jnp.ndarray:
    """(batch, 4S) bits → (batch, S) Gray-mapped 16-QAM, unit energy.

    Per axis, bits (s, m): level = (1−2s)·(3−2m)/√10 — the standard Gray
    mapping (s = sign bit, m = magnitude bit). Extends the reference's
    QPSK-only chain to the 16-QAM benchmark config.
    """
    b = bits.reshape(bits.shape[0], -1, 4).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(10.0)
    re = (1.0 - 2.0 * b[..., 0]) * (3.0 - 2.0 * b[..., 1]) * scale
    im = (1.0 - 2.0 * b[..., 2]) * (3.0 - 2.0 * b[..., 3]) * scale
    return jax.lax.complex(re, im)


def qam16_llr(sym: jnp.ndarray, snr: jnp.ndarray) -> jnp.ndarray:
    """Exact max-log-free 16-QAM LLRs, log(Pr1/Pr0), per the QPSK σ² model.

    Computed by full enumeration over the 4 levels per axis (exact
    log-sum-exp, not max-log), matching the exact-LLR philosophy of the
    reference's QPSK demodulator.
    """
    snr = jnp.broadcast_to(jnp.asarray(snr, jnp.float32), sym.shape)
    noise_power = 0.5 * (1.0 / snr)
    scale = 1.0 / jnp.sqrt(10.0)
    levels = jnp.asarray([-3.0, -1.0, 1.0, 3.0]) * scale
    # bits for each level under the Gray map: level = (1−2s)(3−2m)/√10,
    # so -3: s=1,m=0; -1: s=1,m=1; +1: s=0,m=1; +3: s=0,m=0
    s_bit = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    m_bit = jnp.asarray([0.0, 1.0, 1.0, 0.0])

    def axis_llrs(r):
        # r: (..., S); metric (..., S, 4)
        d = -((r[..., None] - levels) ** 2) / (2.0 * noise_power[..., None])
        lse = jax.nn.logsumexp

        def bit_llr(bit_of_level):
            on = jnp.where(bit_of_level == 1.0, 0.0, -jnp.inf)
            off = jnp.where(bit_of_level == 0.0, 0.0, -jnp.inf)
            return lse(d + on, axis=-1) - lse(d + off, axis=-1)

        return bit_llr(s_bit), bit_llr(m_bit)

    l0, l1 = axis_llrs(jnp.real(sym))
    l2, l3 = axis_llrs(jnp.imag(sym))
    return jnp.stack([l0, l1, l2, l3], axis=-1).reshape(sym.shape[0], -1)


# --- OFDM ----------------------------------------------------------------


def ofdm_modulate(symbols: jnp.ndarray, ofdm_size: int) -> jnp.ndarray:
    """Frequency-domain symbols → time-domain OFDM samples.

    (batch, S) → (batch, S//ofdm_size, ofdm_size). Unitary IDFT: the
    reference multiplies by ``DFT(N).conj().T`` with 1/√N normalization
    (``ofdm_functions.py:25-29``) ≡ ``ifft · √N``.
    """
    blocks = symbols.reshape(symbols.shape[0], -1, ofdm_size)
    return jnp.fft.ifft(blocks, axis=-1) * jnp.sqrt(
        jnp.asarray(ofdm_size, jnp.float32)
    )


def ofdm_demodulate(samples: jnp.ndarray) -> jnp.ndarray:
    """Time-domain blocks → frequency-domain symbols (unitary DFT)."""
    n = samples.shape[-1]
    out = jnp.fft.fft(samples, axis=-1) / jnp.sqrt(
        jnp.asarray(n, jnp.float32)
    )
    return out.reshape(samples.shape[0], -1)


def add_cyclic_prefix(blocks: jnp.ndarray, cp: int) -> jnp.ndarray:
    """(batch, S, N) → (batch, S, cp+N); the reference has no CP — this
    supports the standard OFDM framing for the extended configs."""
    return jnp.concatenate([blocks[..., -cp:], blocks], axis=-1)


def remove_cyclic_prefix(blocks: jnp.ndarray, cp: int) -> jnp.ndarray:
    return blocks[..., cp:]


def awgn(
    key: jax.Array, samples: jnp.ndarray, snr: jnp.ndarray
) -> jnp.ndarray:
    """Complex AWGN, per-component σ = 1/√(2 snr) (``ofdm_functions.py:30-33``).

    ``snr`` (linear) must broadcast against ``samples``: a scalar for the
    fixed-SNR mode, a (batch, n_sym, 1) array for the per-OFDM-symbol
    random-SNR mode of ``unquantized_snr.py:36-46``.
    """
    kr, ki = jax.random.split(key)
    shape = samples.shape
    sigma = 1.0 / jnp.sqrt(2.0 * jnp.asarray(snr, jnp.float32))
    noise = jax.lax.complex(
        jax.random.normal(kr, shape), jax.random.normal(ki, shape)
    )
    return samples + sigma * noise


# --- quantizer / AGC -----------------------------------------------------


def quantize_complex(
    x: jnp.ndarray,
    num_bits: int,
    clip_value: jnp.ndarray,
    legacy_clip: bool = True,
) -> jnp.ndarray:
    """Uniform mid-rise ADC quantizer on I and Q independently.

    2^b nominal levels, step = 2·clip/(2^b − 1), index = round(x/step)
    (``ofdm_functions.py:37-51``). ``legacy_clip=True`` reproduces the
    reference's clip bound ±((2^{b−1})·step − 1) — note the “− 1” is
    *outside* the product (a reference quirk that matters at small clip
    values); False clips the *index* to ±(2^{b−1} − 1), i.e. a clean
    symmetric mid-tread quantizer with 2^b − 1 on-grid levels inside
    ±clip.
    """
    levels = 2**num_bits
    step = 2.0 * clip_value / (levels - 1)
    re = jnp.floor(jnp.real(x) / step + 0.5) * step
    im = jnp.floor(jnp.imag(x) / step + 0.5) * step
    if legacy_clip:
        hi = (levels / 2) * step - 1.0
        lo = -(levels / 2) * step + 1.0
    else:
        hi = (levels / 2 - 1) * step
        lo = -hi
    return jax.lax.complex(jnp.clip(re, lo, hi), jnp.clip(im, lo, hi))


def agc_global(rx: jnp.ndarray) -> jnp.ndarray:
    """Batch-global AGC statistic: std of the complex stream.

    The reference uses ``np.max(np.std(rx_signal))`` over the whole stream
    (``ofdm_functions.py:121``); NumPy's complex std is
    √E[|x − E[x]|²]. Under sharding this is the one cross-device reduction
    of the quantized path — computed here with plain means so XLA can psum
    it when the batch axis is sharded.
    """
    mu = jnp.mean(rx)
    return jnp.sqrt(jnp.mean(jnp.abs(rx - mu) ** 2))


def agc_per_symbol(
    snr: jnp.ndarray, agc_clip: float = 10.0, clip_ratio: jnp.ndarray = 1.0
) -> jnp.ndarray:
    """Per-OFDM-symbol AGC scale factor of ``quantized_snr.py:88-104``:
    σ_rx = 0.5·(1 + 1/snr) (an analytic amplitude proxy), factor =
    agc_clip/σ_rx·clip_ratio. Returns the factor; caller scales, quantizes
    with fixed ``agc_clip``, then rescales by 1/factor.
    """
    sigma_rx = 0.5 * (1.0 + 1.0 / snr)
    return agc_clip / sigma_rx * clip_ratio


# --- metrics ------------------------------------------------------------


def ebn0db_to_snrdb(
    ebn0_db: jnp.ndarray, rate: float, bits_per_symbol: int
) -> jnp.ndarray:
    """Eb/N0 (dB) → symbol SNR Es/N0 (dB): Es = Eb · rate · bits/symbol.

    The reference works in symbol SNR throughout
    (``ofdm_functions.py:30-33``); the benchmark targets are stated in
    Eb/N0, so sweeps accept either unit via this conversion.
    """
    return ebn0_db + 10.0 * jnp.log10(rate * bits_per_symbol)


def snrdb_to_ebn0db(
    snrdb: jnp.ndarray, rate: float, bits_per_symbol: int
) -> jnp.ndarray:
    return snrdb - 10.0 * jnp.log10(rate * bits_per_symbol)


def weighted_mse(
    llr_est: jnp.ndarray, llr: jnp.ndarray, epsilon: float = 0.001
) -> jnp.ndarray:
    """mean((est − llr)² / (|llr| + ε)) (``ofdm_functions.py:80-81``)."""
    return jnp.mean((llr_est - llr) ** 2 / (jnp.abs(llr) + epsilon))


def bit_errors(bits_est: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Total differing bits (``compute_ber`` numerator,
    ``ofdm_functions.py:83-84``)."""
    return jnp.sum(jnp.abs(bits_est.astype(jnp.int32) - bits.astype(jnp.int32)))
