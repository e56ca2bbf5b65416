"""Systematic LDPC encoding on device.

The reference encodes on the host with a float matmul + mod-2
(``ofdm/ofdm_functions.py:11-15``). Here encoding is an int8 MXU matmul
with a bitwise-and — mod-2 arithmetic via integer accumulate, no floats —
and runs inside the same jitted program as the channel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode

__all__ = ["encode"]


def encode(u: jnp.ndarray, code: LdpcCode) -> jnp.ndarray:
    """(batch, k) info bits → (batch, n) codewords.

    ``c[perm] = G·u mod 2`` with G the systematic generator
    (:func:`ldpc_sims_tpu.codes.gf2.generator_from_H`); int8 matmul with
    int32 accumulation on the MXU, parity via ``& 1``. For all library
    codes the info bits land in positions 0..k−1, matching the reference's
    ``G = [I ; P]`` layout (``bp/parity.py:44``).
    """
    Gt = jnp.asarray(code.G.T, dtype=jnp.int8)  # (k, n)
    cp = jax.lax.dot_general(
        u.astype(jnp.int8),
        Gt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    cp = (cp & 1).astype(jnp.int8)
    return jnp.take(cp, jnp.asarray(code.inv_perm), axis=1)
