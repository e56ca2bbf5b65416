"""The fused end-to-end link: bits → encode → OFDM → AWGN → LLR → BP → BER.

One pure function of a PRNG key = one Monte-Carlo block. The whole chain
(the reference spreads it over ``generate_data.py``, ``gen_data``/
``gen_qdata`` (``ofdm/ofdm_functions.py:109-128``) and per-script glue,
with pickles in between) compiles to a single XLA program: data never
leaves the device, and the Monte-Carlo engine shards it over the mesh by
vmapping/sharding the key and SNR axes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.ops import phy
from ldpc_sims_tpu.ops.bp import bp_decode
from ldpc_sims_tpu.ops.encode import encode

__all__ = ["LinkConfig", "link_step", "BITS_PER_SYMBOL"]

BITS_PER_SYMBOL = {"bpsk": 1, "qpsk": 2, "qam16": 4}


@dataclasses.dataclass(frozen=True)
class LinkConfig:
    """Static configuration of the link chain (hashable → jit-static).

    Defaults replicate the reference experiment family: QPSK over
    32-subcarrier OFDM, analytic LLRs, sum-product BP with clamp 20
    (``evaluate_snr.py:14-22``).
    """

    ofdm_size: int = 32
    modulation: str = "qpsk"
    cyclic_prefix: int = 0
    # decoder
    bp_iterations: int = 3
    bp_method: str = "sum-product-ref"
    bp_schedule: str = "flooding"  # 'layered' = serial-C (QC codes only)
    bp_layered_group: int = 1  # rows per serial group (pallas layered)
    clamp: float | None = 20.0
    # scalar, or a per-iteration tuple (a frozen weighted-min-sum
    # schedule from training.train_minsum_weights)
    alpha: float | tuple[float, ...] = 1.0
    beta: float | tuple[float, ...] = 0.0
    early_stop: bool = False
    # 'requeue' = ES probe + pack stragglers; 'probe' = FIXED fast probe
    # (optionally a trained schedule) + fused in-kernel syndrome +
    # packed full-budget requeue (kernels.minsum_qc.bp_qc_probe_requeue,
    # pallas); 'auto' = run_sweep times fixed-vs-probe on each point's
    # first chunks and sticks with the winner (driver-level dispatch —
    # bp_decode itself rejects 'auto').
    es_mode: str = "freeze"
    es_check_every: int = 1  # syndrome-check stride (pallas)
    es_probe_iters: int = 4  # probe budget for es_mode requeue/probe
    # probe-pass schedule for es_mode='probe' (None = alpha/beta)
    es_probe_alpha: float | tuple[float, ...] | None = None
    es_probe_beta: float | tuple[float, ...] | None = None
    msg_qbits: int | None = None
    msg_qclip: float = 20.0
    # quantized-ADC path (None = ideal ADC)
    qbits: int | None = None
    clip_ratio: float = 1.0
    agc: str = "global"  # 'global' (gen_qdata) | 'per-symbol' (quantized_snr)
    agc_clip: float = 10.0
    legacy_clip: bool = True
    # per-OFDM-symbol random SNR (the *_snr.py experiment family)
    snr_per_symbol: bool = False
    snrdb_low: float = 0.0
    snrdb_high: float = 0.0

    def bits_per_codeword_symbols(self, n: int) -> int:
        return n // BITS_PER_SYMBOL[self.modulation]


def _modulate(cfg: LinkConfig, bits: jnp.ndarray) -> jnp.ndarray:
    return {
        "bpsk": phy.modulate_bpsk,
        "qpsk": phy.modulate_qpsk,
        "qam16": phy.modulate_qam16,
    }[cfg.modulation](bits)


def _llr(cfg: LinkConfig, sym: jnp.ndarray, snr: jnp.ndarray) -> jnp.ndarray:
    if cfg.modulation == "bpsk":
        return phy.bpsk_llr(sym, snr)
    if cfg.modulation == "qpsk":
        return phy.demodulate_qpsk_llr(sym, snr)
    return phy.qam16_llr(sym, snr)


def _llr_snr_axis(
    cfg: LinkConfig, snr_sym: jnp.ndarray, n_sub: int
) -> jnp.ndarray:
    """Expand a per-OFDM-symbol SNR (B, S) to per-constellation-symbol."""
    return jnp.repeat(snr_sym, n_sub, axis=1)


def link_step(
    key: jax.Array,
    snrdb: jnp.ndarray,
    code: LdpcCode,
    cfg: LinkConfig,
    batch_cw: int,
    weights: Any | None = None,
    return_arrays: bool = False,
) -> dict[str, jnp.ndarray]:
    """Simulate ``batch_cw`` codewords through the full chain at ``snrdb``.

    Returns raw error *counts* and denominators (scalars, ready for
    collective accumulation): uncoded/coded bit errors and frame errors —
    the curve families of ``evaluate_snr.py:119-133``. With
    ``return_arrays=True`` also returns the per-codeword arrays (llrs,
    quantized llrs, coded bits) for dataset generation / NN training —
    the jitted successor of ``gen_data``/``gen_qdata``.
    """
    n, k = code.n, code.k
    bps = BITS_PER_SYMBOL[cfg.modulation]
    sym_per_cw = n // bps
    # the reference modulates the coded stream as one flat sequence
    # (transmit_symbols, ofdm_functions.py:25-26): OFDM blocks need not
    # align to codeword boundaries. Group the minimal number of codewords
    # per row so rows tile the OFDM size (keeps the batch axis shardable).
    g = math.lcm(sym_per_cw, cfg.ofdm_size) // sym_per_cw
    if batch_cw % g:
        raise ValueError(
            f"batch_cw must be a multiple of {g} for n={n}, "
            f"{cfg.modulation}, ofdm_size={cfg.ofdm_size}"
        )
    rows = batch_cw // g

    k_bits, k_chan, k_snr = jax.random.split(key, 3)

    info = phy.random_bits(k_bits, (batch_cw, k))
    coded = encode(info, code)
    tx_sym = _modulate(cfg, coded)  # (B, S)

    blocks = tx_sym.reshape(rows, -1, cfg.ofdm_size)
    n_ofdm = blocks.shape[1]
    tx_time = jnp.fft.ifft(blocks, axis=-1) * jnp.sqrt(
        jnp.asarray(cfg.ofdm_size, jnp.float32)
    )
    if cfg.cyclic_prefix:
        # standard OFDM framing (the reference has no CP); the channel
        # and the ADC see the CP samples, the receiver strips them
        tx_time = phy.add_cyclic_prefix(tx_time, cfg.cyclic_prefix)

    if cfg.snr_per_symbol:
        snrdb_sym = jax.random.uniform(
            k_snr,
            (rows, n_ofdm),
            minval=cfg.snrdb_low,
            maxval=cfg.snrdb_high,
        )
        snr = 10.0 ** (snrdb_sym / 10.0)  # (rows, n_ofdm)
        snr_bc = snr[..., None]
    else:
        snr = 10.0 ** (jnp.asarray(snrdb, jnp.float32) / 10.0)
        snr_bc = snr

    rx_time = phy.awgn(k_chan, tx_time, snr_bc)

    def demod_and_llr(time_samples):
        if cfg.cyclic_prefix:
            time_samples = phy.remove_cyclic_prefix(
                time_samples, cfg.cyclic_prefix
            )
        rx_sym = phy.ofdm_demodulate(time_samples)  # (rows, g·S)
        if cfg.snr_per_symbol:
            snr_sym = _llr_snr_axis(cfg, snr, cfg.ofdm_size)
            out = _llr(cfg, rx_sym, snr_sym)
        else:
            out = _llr(cfg, rx_sym, snr)
        return out.reshape(batch_cw, n)  # back to per-codeword rows

    llrs = demod_and_llr(rx_time)

    out: dict[str, jnp.ndarray] = {}

    # quantized-ADC branch (gen_qdata / quantized_snr semantics)
    if cfg.qbits is not None:
        if cfg.agc == "global":
            sigma = phy.agc_global(rx_time)
            agc_clip = sigma * cfg.clip_ratio
            q_time = phy.quantize_complex(
                rx_time, cfg.qbits, agc_clip, cfg.legacy_clip
            )
        else:  # per-symbol AGC, quantized_snr.py:88-104
            factor = phy.agc_per_symbol(
                snr if cfg.snr_per_symbol else jnp.broadcast_to(
                    snr, (rows, n_ofdm)
                ),
                cfg.agc_clip,
                cfg.clip_ratio,
            )[..., None]
            scaled = rx_time * factor
            q = phy.quantize_complex(
                scaled, cfg.qbits, jnp.asarray(cfg.agc_clip), cfg.legacy_clip
            )
            q_time = q / factor
        qllrs = demod_and_llr(q_time)
        if return_arrays:
            out["qllrs"] = qllrs
        decode_llrs = qllrs
    else:
        decode_llrs = llrs

    bits_est = bp_decode(
        decode_llrs,
        code,
        iterations=cfg.bp_iterations,
        method=cfg.bp_method,
        alpha=cfg.alpha,
        beta=cfg.beta,
        clamp=cfg.clamp,
        early_stop=cfg.early_stop,
        es_mode=cfg.es_mode,
        es_check_every=cfg.es_check_every,
        es_probe_iters=cfg.es_probe_iters,
        es_probe_alpha=cfg.es_probe_alpha,
        es_probe_beta=cfg.es_probe_beta,
        layered_group=cfg.bp_layered_group,
        msg_qbits=cfg.msg_qbits,
        msg_qclip=cfg.msg_qclip,
        weights=weights,
        output="hard",
        schedule=cfg.bp_schedule,
    )

    uncoded_est = (llrs > 0).astype(jnp.int8)
    info_err = jnp.sum(
        (bits_est[:, :k] != coded[:, :k]).astype(jnp.int32), axis=1
    )
    # reference conventions: coded BER on info bits [:, 0:k], BLER on the
    # FULL codeword (evaluate_quantized.py:140-141)
    frame_err = jnp.any(bits_est != coded, axis=1)
    # int32 counters: per-call counts stay far below 2³¹ (the sweep engine
    # accumulates across calls in Python floats)
    out.update(
        uncoded_bit_errors=jnp.sum((uncoded_est != coded).astype(jnp.int32)),
        coded_bit_errors=jnp.sum(info_err),
        frame_errors=jnp.sum(frame_err.astype(jnp.int32)),
        uncoded_bits=jnp.int32(batch_cw * n),
        info_bits=jnp.int32(batch_cw * k),
        frames=jnp.int32(batch_cw),
    )
    if return_arrays:
        def strip(t):
            return (
                phy.remove_cyclic_prefix(t, cfg.cyclic_prefix)
                if cfg.cyclic_prefix
                else t
            )

        out["llrs"] = llrs
        out["coded"] = coded
        out["rx_time"] = strip(rx_time)
        out["tx_time"] = strip(tx_time)  # noise_test.py compares q−tx
        out["snr_sym"] = jnp.broadcast_to(snr, (rows, n_ofdm)) if not (
            cfg.snr_per_symbol
        ) else snr
        if cfg.qbits is not None:
            out["q_time"] = strip(q_time)
    return out
