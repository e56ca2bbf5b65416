"""ldpc_sims_tpu — a TPU-native LDPC / OFDM link-simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
reference research codebase ``realjwin/ldpc-sims`` (PyTorch/NumPy, see
``/root/reference``): an end-to-end OFDM link with LDPC channel coding,
quantized-ADC studies, Monte-Carlo BER/BLER sweeps, and learned (neural-BP /
neural-LLR) receivers — built TPU-first:

* the whole TX → channel → RX → decode chain is fused device code under
  ``jax.jit`` (no per-codeword Python loops),
* belief propagation runs over an edge-list Tanner graph in padded
  ``(node, slot, batch)`` layout (O(E) state — not the reference's dense
  E×E mask matmuls, ``bp/masking.py`` / ``bp/bp_vc.py``),
* Monte-Carlo sweeps shard codeword batches and SNR grid points over a
  ``jax.sharding.Mesh`` with ``psum`` error accumulation,
* the hot min-sum decode path has a Pallas TPU kernel.

Subpackages
-----------
codes      LDPC code library: reference (64,32) PEG code, regular PEG
           construction, IEEE 802.11n QC-LDPC, alist I/O, GF(2) linear
           algebra, Tanner-graph edge compiler.
ops        Pure-JAX compute ops: BP decoding (min-sum / sum-product /
           reference-parity), the OFDM PHY chain, quantizers, LLRs, metrics.
kernels    Pallas TPU kernels for the hot decode loop.
models     Flax models: LLR estimators, neural-BP decoder, joint model.
training   Trainers replicating the reference training recipes on optax.
parallel   Mesh/sharding helpers and the sharded Monte-Carlo engine.
utils      Configs, artifact registry, metrics logging, checkpoints.
"""

__version__ = "0.1.0"

from ldpc_sims_tpu.codes import LdpcCode, TannerGraph  # noqa: F401
