"""Pallas TPU kernel: QC-LDPC min-sum BP with VMEM-resident messages.

The XLA roll-backend decoder (ops/bp_roll.py) round-trips every message
plane through HBM several times per iteration (rolls, stacks and
reductions each materialize); at (1944,972)×20 iterations that is ~9 GB
of HBM traffic per 4k-codeword batch — the throughput ceiling. This
kernel keeps the *entire* message state in VMEM across all iterations:

* grid over batch tiles (lane axis, default 128 lanes);
* scratch: c2v and v2c message planes in check-padded layout
  ``(mb, dc_max, z, tile)`` — for wifi1944 ≈ 4 MB each in f32;
* per-iteration: variable update as an unrolled sweep over the nb
  variable blocks (cyclic-shift ``pltpu.roll`` per circulant, running
  sums, exclusive subtraction), then ONE vectorized two-minima min-sum
  over the dc_max axis for all checks at once;
* HBM traffic: LLRs in once, posteriors out once. Everything else VPU.

Semantics identical to ``bp_decode(..., method='min-sum',
backend='roll')`` with ``weights=None`` (verified by equivalence tests in
interpret mode and on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_sims_tpu.codes.library import QcStructure
from ldpc_sims_tpu.ops.bp_roll import qc_plan

__all__ = ["minsum_qc_pallas", "bp_qc_pallas"]

_BIG = 1e30


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Static cyclic shift along axis 0 (z axis) of a (z, tile) plane."""
    if shift % x.shape[0] == 0:
        return x
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _build_kernel(qc: QcStructure, iterations: int, alpha: float,
                  beta: float, method: str = "min-sum",
                  clamp: float | None = None):
    planes, group_c, group_v = qc_plan(qc)
    mb, nb, z = qc.mb, qc.nb, qc.z
    dc_max = max(len(g) for g in group_c)
    # plane p -> (check row i, slot k within row); var block j -> its
    # (i, k, shift) triples in check-sorted order
    slot_of_plane: list[tuple[int, int]] = [None] * len(planes)
    for i, ps in enumerate(group_c):
        for k, p in enumerate(ps):
            slot_of_plane[p] = (i, k)
    var_slots: list[list[tuple[int, int, int]]] = []
    for j in range(nb):
        var_slots.append(
            [(*slot_of_plane[p], planes[p][2]) for p in group_v[j]]
        )

    # pad slots (check rows with degree < dc_max): kept at +_BIG so they
    # are inert in the vectorized min-sum; re-stamped after every check
    # update (a handful of per-slot stores — Pallas kernels cannot close
    # over array constants, so no dense mask)
    pad_slots = [
        (i, k)
        for i, ps in enumerate(group_c)
        for k in range(len(ps), dc_max)
    ]

    def kernel(llr_ref, out_ref, msg_ref):
        # llr_ref/out_ref: (nb, z, T); msg_ref: (mb, dc_max, z, T).
        # ONE message buffer: each slot (i, k) belongs to exactly one
        # variable block, so the variable update reads c2v from a slot
        # and writes v2c back to the same slot in place. Padding slots
        # (check rows of degree < dc_max) are forced back to +_BIG after
        # every check update so they stay inert for min-sum.
        msg_ref[...] = jnp.zeros_like(msg_ref)

        def stamp_pads():
            for (i, k) in pad_slots:
                msg_ref[i, k] = jnp.full(
                    (msg_ref.shape[2], msg_ref.shape[3]), _BIG,
                    dtype=msg_ref.dtype,
                )

        stamp_pads()

        def one_iteration(_, carry):
            # -- variable update: per variable block, in place --------
            for j in range(nb):
                rolled = []
                acc = llr_ref[j]
                for (i, k, s) in var_slots[j]:
                    r = _roll(msg_ref[i, k], s)  # var orientation
                    rolled.append(r)
                    acc = acc + r
                for (i, k, s), r in zip(var_slots[j], rolled):
                    msg_ref[i, k] = _roll(acc - r, -s)
            # -- check update: all checks at once ---------------------
            v = msg_ref[...]
            a = jnp.abs(v)
            neg = (v < 0).astype(jnp.int32)
            # sign product as sum-of-sign-bits parity (reduce_prod has no
            # Pallas TPU lowering): exclusive parity = (Σ neg − neg) mod 2
            nneg = jnp.sum(neg, axis=1, keepdims=True)
            exneg = (nneg - neg) & 1
            exsign = 1.0 - 2.0 * exneg.astype(jnp.float32)
            if method == "min-sum":
                min1 = jnp.min(a, axis=1, keepdims=True)
                idx = jnp.argmin(a, axis=1)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                    == idx[:, None]
                )
                min2 = jnp.min(jnp.where(onehot, _BIG, a), axis=1,
                               keepdims=True)
                exmin = jnp.where(onehot, min2, min1)
                mag = jnp.maximum(exmin - beta, 0.0) if beta else exmin
                out = exsign * mag
                if alpha != 1.0:
                    out = out * alpha
            else:  # stable log-domain sum-product (ops/bp.py semantics:
                # expm1-based pole handling; naive 1−1e-12 guards are f32
                # no-ops and NaN-cascade on TPU)
                ac = jnp.minimum(jnp.maximum(a, 1e-12), 80.0)
                lt = (
                    jnp.log(-jnp.expm1(-ac)) - jnp.log1p(jnp.exp(-ac))
                )
                s = jnp.minimum(
                    jnp.sum(lt, axis=1, keepdims=True) - lt, -1e-12
                )
                out = exsign * (
                    jnp.log1p(jnp.exp(s)) - jnp.log(-jnp.expm1(s))
                )
            if clamp is not None:
                out = jnp.clip(out, -clamp, clamp)
            msg_ref[...] = out
            stamp_pads()
            return carry

        jax.lax.fori_loop(0, iterations, one_iteration, 0)

        # -- posterior ------------------------------------------------
        for j in range(nb):
            acc = llr_ref[j]
            for (i, k, s) in var_slots[j]:
                acc = acc + _roll(msg_ref[i, k], s)
            out_ref[j] = acc

    return kernel, (mb, dc_max, nb, z)


@functools.partial(
    jax.jit,
    static_argnames=("qc", "iterations", "method", "alpha", "beta",
                     "clamp", "tile", "output", "interpret"),
)
def bp_qc_pallas(
    llr: jnp.ndarray,
    qc: QcStructure,
    iterations: int = 20,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    tile: int = 128,
    output: str = "hard",
    interpret: bool = False,
):
    """(batch, n) channel LLRs (log Pr1/Pr0) → hard bits / posterior.

    ``method``: 'min-sum' or 'sum-product' (stable log-domain). batch
    must be a multiple of ``tile`` (lane-axis tile, default 128).
    """
    if method not in ("min-sum", "sum-product"):
        raise ValueError(f"unsupported kernel method {method!r}")
    B, n = llr.shape
    z, nb = qc.z, qc.nb
    if n != nb * z:
        raise ValueError("llr width does not match the QC code")
    if B % tile:
        raise ValueError(f"batch {B} not a multiple of tile {tile}")

    kernel, (mb, dc_max, nb, z) = _build_kernel(
        qc, iterations, alpha, beta, method, clamp
    )

    # internal convention log(Pr0/Pr1), variable-block-major planes
    lv = (-llr.T).reshape(nb, z, B).astype(jnp.float32)

    # scratch (mb·dc_max·z·tile f32) + double-buffered in/out blocks exceed
    # the 16 MB default scoped-vmem budget even at tile=128 on (1944,972);
    # raise the cap toward the chip's physical VMEM (v5e: 128 MB).
    vmem_bytes = 4 * (
        2 * 2 * nb * z * tile  # in + out blocks, double-buffered
        + mb * dc_max * z * tile  # message scratch
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=min(max(32 * 2**20, 2 * vmem_bytes), 100 * 2**20),
    )
    post = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((nb, z, tile), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, z, tile), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, z, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((mb, dc_max, z, tile), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(lv)

    if output == "posterior":
        return (-post).reshape(n, B).T
    return (post.reshape(n, B) < 0).astype(jnp.int8).T


def minsum_qc_pallas(llr, qc, iterations=20, alpha=1.0, beta=0.0,
                     tile=128, output="hard", interpret=False):
    """Back-compat alias for :func:`bp_qc_pallas` with min-sum."""
    return bp_qc_pallas(
        llr, qc, iterations=iterations, method="min-sum", alpha=alpha,
        beta=beta, tile=tile, output=output, interpret=interpret,
    )
