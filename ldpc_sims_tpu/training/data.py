"""Training-set generation for the neural LLR / joint experiments.

On-device, jitted successor of the reference's dataset plumbing, which
pickles a TX stream (``generate_data.py``), regenerates channel data per
script (``gen_data``/``gen_qdata``, ``ofdm/ofdm_functions.py:109-128``,
or inline vectorized copies, ``unquantized_snr.py:36-61``,
``quantized_snr.py:47-127``), and hand-assembles input matrices. One call
here produces the same (input_samples, output_samples) pairs:

* inputs: per-OFDM-symbol time-domain samples, ``concat(re, im)``
  (``unquantized.py:43-44``), from the quantized signal when qbits is
  set (rescaled per-symbol-AGC semantics of ``quantized_snr.py:120-127``),
  optionally ⊕ linear SNR feature (``quantized_snr.py:135-139``);
* targets: the *clean* analytic LLRs (the reference always regresses
  quantized inputs onto unquantized-LLR targets, ``quantized.py:48-75``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.ops.chain import LinkConfig, link_step

__all__ = ["make_llr_dataset", "make_joint_dataset"]


def _symbol_inputs(time_signal: jnp.ndarray) -> jnp.ndarray:
    """(rows, n_ofdm, N) complex → (rows·n_ofdm, 2N) concat(re, im)."""
    flat = time_signal.reshape(-1, time_signal.shape[-1])
    return jnp.concatenate([jnp.real(flat), jnp.imag(flat)], axis=1)


def make_llr_dataset(
    key: jax.Array,
    code: LdpcCode,
    cfg: LinkConfig,
    num_codewords: int,
    snrdb: float = 0.0,
    with_snr_feature: bool = False,
    tanh_targets: bool = False,
):
    """Returns (input_samples, output_samples) as numpy arrays.

    ``cfg`` selects the channel variant: ``qbits`` for the quantized-ADC
    path, ``snr_per_symbol`` + ``snrdb_low/high`` for the random-SNR
    family; ``snrdb`` is used in fixed-SNR mode.
    """
    # jit the whole chain: eager per-op dispatch through a remote-TPU
    # tunnel costs minutes; compiled it is one round trip
    step = jax.jit(
        lambda k, s: link_step(k, s, code, cfg, num_codewords,
                               return_arrays=True)
    )
    out = step(key, jnp.asarray(snrdb, jnp.float32))
    sig = out["q_time"] if cfg.qbits is not None else out["rx_time"]
    x = _symbol_inputs(sig)
    if with_snr_feature:
        snr = out["snr_sym"].reshape(-1, 1)
        x = jnp.concatenate([x, snr], axis=1)
    y = out["llrs"].reshape(x.shape[0], -1)  # (S, 2N) clean LLR targets
    if tanh_targets:
        y = jnp.tanh(y)  # train_nn_tanh recipe (ofdm/ofdm_nn.py:447)
    return np.asarray(x), np.asarray(y)


def make_joint_dataset(
    key: jax.Array,
    code: LdpcCode,
    cfg: LinkConfig,
    num_codewords: int,
    snrdb: float = 5.0,
):
    """Inputs for the joint model + transmitted coded bits as BCE targets
    (the ``joint_train.py`` setup: fixed SNR, quantized input)."""
    step = jax.jit(
        lambda k, s: link_step(k, s, code, cfg, num_codewords,
                               return_arrays=True)
    )
    out = step(key, jnp.asarray(snrdb, jnp.float32))
    sig = out["q_time"] if cfg.qbits is not None else out["rx_time"]
    x = _symbol_inputs(sig)
    bits = out["coded"]  # (num_codewords, n)
    return np.asarray(x), np.asarray(bits)
