"""Neural LLR estimators (flax.linen).

Re-designs of the reference MLPs (``nn/llr.py``) that regress exact
per-bit LLRs from (possibly coarsely quantized) time-domain OFDM samples:

* :class:`LLRestimator` — fixed-SNR model (``nn/llr.py:7-52``): linear
  "FFT layer" initialized to the DFT, then 3 tanh hidden layers of width
  16N, linear output of 2N LLRs.
* :class:`LLRestimatorWithSNR` — SNR-conditioned (``nn/llr.py:54-73``):
  input is 2N samples ⊕ linear SNR, 3×16N tanh MLP.
* :class:`LLRestimatorTanh` — tanh-squashed output variant. The
  reference's version is broken twice (``nn/llr.py:77`` wrong ``super``
  target, ``:94`` instantiates ``nn.Tanh`` with a tensor); this is the
  working version it intended.

Design deltas from the reference (documented, deliberate):
* Input layout is the block form ``concat(re*, im*)`` per OFDM symbol
  with the matching block-form DFT init ``[[Re W, −Im W], [Im W, Re W]]``.
  The reference feeds *interleaved* re/im samples — its
  ``concatenate((rx.real.T, rx.imag.T), axis=1).reshape(-1, 2N)`` on a
  ``(1, total)`` row vector interleaves (``unquantized.py:43-44``,
  ``evaluate_quantized.py:100-101``) — matching its ``DFTreal`` init
  (``ofdm_functions.py:95-107``). The two layouts are the same function
  class up to a fixed input permutation; the weight-port tool
  (``examples/reference_weight_port.py``) applies that permutation when
  loading reference checkpoints.
* The reference's dead parameters (``hidden1``/``hidden2``/``scalar``,
  constructed but skipped in ``forward``, ``nn/llr.py:19-20,36``) are
  not replicated.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["LLRestimator", "LLRestimatorWithSNR", "LLRestimatorTanh"]


def _block_dft(n: int) -> np.ndarray:
    """Real 2N×2N matrix computing the unitary DFT on concat(re, im).

    y = [[Re W, −Im W], [Im W, Re W]] @ [re; im] ⇔ Y = W (re + j·im),
    with W the unitary DFT matrix (the layout-consistent analogue of the
    reference's ``DFTreal``).
    """
    k = np.arange(n)
    W = np.exp(-2j * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    top = np.concatenate([W.real, -W.imag], axis=1)
    bot = np.concatenate([W.imag, W.real], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


class LLRestimator(nn.Module):
    """Fixed-SNR LLR estimator: trainable DFT layer + 3×16N tanh MLP."""

    ofdm_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n2 = 2 * self.ofdm_size
        dft0 = _block_dft(self.ofdm_size)
        x = nn.Dense(
            n2,
            use_bias=False,
            kernel_init=lambda *_: jnp.asarray(dft0.T),
            name="fft_layer",
        )(x)
        for i in range(3):
            x = jnp.tanh(nn.Dense(8 * n2, name=f"hidden{i + 3}")(x))
        return nn.Dense(n2, name="final")(x)


class LLRestimatorWithSNR(nn.Module):
    """SNR-conditioned estimator: input (2N samples ⊕ linear SNR)."""

    ofdm_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n2 = 2 * self.ofdm_size
        for i in range(3):
            x = jnp.tanh(nn.Dense(8 * n2, name=f"hidden{i + 1}")(x))
        return nn.Dense(n2, name="final")(x)


class LLRestimatorTanh(nn.Module):
    """SNR-conditioned estimator with tanh-squashed outputs.

    Trains against ``tanh(llr)`` targets (the ``train_nn_tanh`` recipe,
    ``ofdm/ofdm_nn.py:398-520``); invert with ``atanh`` at evaluation
    (``evaluate_quantized_tanh.py:157``).
    """

    ofdm_size: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n2 = 2 * self.ofdm_size
        for i in range(3):
            x = jnp.tanh(nn.Dense(8 * n2, name=f"hidden{i + 1}")(x))
        return jnp.tanh(nn.Dense(n2, name="final")(x))
