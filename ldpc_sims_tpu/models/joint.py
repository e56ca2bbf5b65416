"""Joint model: neural LLR estimator → differentiable BP decoder.

The reference composes ``LLRestimator`` with its unrolled
``BeliefPropagation`` so BCE gradients on decoded bits flow back into the
LLR net (``nn/joint_connected.py:13-25``; the 2-arg ``nn/joint.py``
generation is broken as-is — SURVEY.md §2.3). Here the decoder is the
pure-JAX BP from ops/bp.py, so the composite is one flax module whose
parameters are {LLR-net weights} ∪ {per-iteration neural-BP weights};
autodiff replaces the reference's two hand-written backward passes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.models.llr import LLRestimator, LLRestimatorWithSNR
from ldpc_sims_tpu.ops.bp import bp_decode

__all__ = ["Joint"]


class Joint(nn.Module):
    """signal (per-OFDM-symbol inputs) → Pr(bit=1) per codeword bit.

    Args (static):
      code_name: registry name of the LDPC code.
      ofdm_size: subcarriers per OFDM symbol.
      iterations: unrolled BP iterations.
      method: BP check-node rule ('sum-product' for smooth gradients —
        the reference trains through its tanh/atanh sum-product too).
      clamp: per-iteration message clamp (reference: 20).
      snr_conditioned: use the withSNR estimator (input 2N+1).
      trainable_bp: include per-iteration neural-BP weights as params
        (the reference's trainable VC layers, ``bp/bp_vc.py:101-107``).

    Input: (num_symbols, 2N[+1]); 2N·num_symbols must tile the codeword
    length. Output: (num_codewords, n) soft bits on the reference's
    sigmoid-of-half-LLR scale (``bp/bp.py:51``).
    """

    code_name: str = "ref6432"
    ofdm_size: int = 32
    iterations: int = 3
    method: str = "sum-product"
    clamp: float = 20.0
    snr_conditioned: bool = False
    trainable_bp: bool = True

    @nn.compact
    def __call__(self, signal: jnp.ndarray) -> jnp.ndarray:
        code = get_code(self.code_name)
        est_cls = (
            LLRestimatorWithSNR if self.snr_conditioned else LLRestimator
        )
        llr_sym = est_cls(self.ofdm_size, name="LLRest")(signal)
        llr = llr_sym.reshape(-1, code.n)

        weights = None
        if self.trainable_bp:
            g = code.graph
            ones = nn.initializers.ones
            weights = {
                "w_msg": self.param(
                    "bp_w_msg", ones, (self.iterations, g.n_vars, g.dv)
                ),
                "w_llr": self.param(
                    "bp_w_llr", ones, (self.iterations, g.n_vars)
                ),
                "w_msg_final": self.param(
                    "bp_w_msg_final", ones, (g.n_vars, g.dv)
                ),
                "w_llr_final": self.param(
                    "bp_w_llr_final", ones, (g.n_vars,)
                ),
            }

        return bp_decode(
            llr,
            code,
            iterations=self.iterations,
            method=self.method,
            clamp=self.clamp,
            weights=weights,
            output="soft",
        )
