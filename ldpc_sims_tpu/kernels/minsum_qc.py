"""Pallas TPU kernel: QC-LDPC BP decode with VMEM-resident messages.

The XLA roll-backend decoder (ops/bp_roll.py) round-trips every message
plane through HBM several times per iteration (rolls, stacks and
reductions each materialize); at (1944,972)×20 iterations that is ~9 GB
of HBM traffic per 4k-codeword batch — the throughput ceiling. This
kernel keeps the *entire* message state in VMEM across all iterations:

* grid over batch tiles (lane axis, default 128 lanes);
* scratch: one message plane in check-padded layout
  ``(mb, dc_max, z, tile)`` (each slot holds c2v or v2c depending on
  phase — a slot belongs to exactly one variable block, so the variable
  update is in place) plus a posterior plane ``(nb, z, tile)``;
* per-iteration: posterior sweep over the nb variable blocks
  (cyclic-shift ``pltpu.roll`` per circulant, running sums), in-place
  exclusive subtraction, then ONE vectorized two-minima min-sum over
  the dc_max axis for all checks at once;
* HBM traffic: LLRs in once, posteriors out once. Everything else VPU.

Feature coverage: **per-codeword early termination** — each lane
(codeword) freezes at its first syndrome-satisfying state (checked
every ``es_check_every`` iterations) and the whole tile exits once all
lanes are done; **straggler requeue** (:func:`bp_qc_requeue`) — cheap
probe pass, pack unconverged codewords into dense tiles, re-decode only
those (fully-converged tiles skip at entry via ``done_in``);
**message quantization** (``msg_qbits``/``msg_qclip``, the
quantized-min-sum decoder study); **bf16 message storage** (halves VMEM;
measured storage-only — casts make it 5-15% slower than f32, see
docs/artifacts/20260820_kernel_tile_r3.jsonl); **layered (serial-C)
schedule** — per-row exclusive updates folded straight into the
VMEM-resident posterior, half the sweeps at the same BER (the headline:
layered-10 == flooding-20 BER at ~1.4x throughput), generalized by
``layered_group`` to group-serial (G rows per step; G=mb == flooding,
pinned by tests). Semantics identical to
``bp_decode(..., backend='roll')`` with ``weights=None`` (equivalence
tests in interpret mode and on device).
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

__all__ = [
    "minsum_qc_pallas",
    "bp_qc_pallas",
    "bp_qc_requeue",
    "bp_qc_probe_requeue",
    "default_tile",
]

_BIG = 1e30


def _log1mexp(a: jnp.ndarray) -> jnp.ndarray:
    """``log(1 − exp(−a))`` for ``a > 0`` without ``expm1`` (no Mosaic
    TPU lowering for it). For a > 0.2 the direct form has no
    cancellation; below, ``−expm1(−a)`` is a 6-term Horner series
    (truncation < 2e-8 relative at the 0.2 switch point). The 1e-30
    floors only guard the untaken branch against log(0) → NaN in the
    ``where`` (both lanes are always evaluated on the VPU)."""
    em_direct = jnp.maximum(1.0 - jnp.exp(-a), 1e-30)
    em_series = a * (
        1.0 - a / 2 * (
            1.0 - a / 3 * (
                1.0 - a / 4 * (1.0 - a / 5 * (1.0 - a / 6))
            )
        )
    )
    em = jnp.where(a > 0.2, em_direct, jnp.maximum(em_series, 1e-30))
    return jnp.log(em)

# Lane-tile dispatch table, derived from measured sweeps on a v5e chip
# (kernels/tune.py → docs/artifacts/*_kernel_tune.jsonl). Key: (z·nb
# rounded to the nearest code size, dtype name, schedule); value: lanes
# per tile. Measured on (1944,972): f32/128 = 513e6 bits/s beats every
# 256-lane and bf16 config (bf16 pays a lift-to-f32 cast per load, and
# 256 lanes doubles VMEM residency for no VPU gain — the 8×128 vregs
# are already full at 128 lanes). Entries exist only where a non-default
# choice measured faster; default_tile falls back to 128.
_TILE_TABLE: dict[tuple[int, str, str], int] = {}


def default_tile(qc: QcStructure, dtype, schedule: str = "flooding") -> int:
    """Measured-best lane tile for this (code, dtype, schedule)."""
    return _TILE_TABLE.get(
        (qc.nb * qc.z, jnp.dtype(dtype).name, schedule), 128
    )


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Static cyclic shift along axis 0 (z axis) of a (z, tile) plane.

    Mosaic's rotate supports 32-bit data only ("Rotate with non-32-bit
    data" — observed on v5e); bf16 planes roll through an f32 view
    (exact: bf16 ⊂ f32, and the cast is one VPU op either side while
    the *storage* stays bf16 — the VMEM saving is what matters).
    """
    if shift % x.shape[0] == 0:
        return x
    if x.dtype.itemsize < 4:
        return pltpu.roll(
            x.astype(jnp.float32), shift=shift % x.shape[0], axis=0
        ).astype(x.dtype)
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _build_kernel(qc: QcStructure, iterations: int, alpha: float,
                  beta: float, method: str = "min-sum",
                  clamp: float | None = None,
                  early_stop: bool = False,
                  es_check_every: int = 1,
                  with_done_in: bool = False,
                  with_ab: bool = False,
                  with_weights: bool = False,
                  with_unsat: bool = False,
                  msg_qbits: int | None = None,
                  msg_qclip: float = 20.0,
                  schedule: str = "flooding",
                  layered_group: int = 1,
                  dtype=jnp.float32):
    dtype = jnp.dtype(dtype)
    is_int = dtype == jnp.dtype(jnp.int8)
    # int8 stores messages on the 255-level grid over +-msg_qclip; the
    # posterior plane (and in/out blocks) stay f32
    pdtype = jnp.float32 if is_int else dtype
    qstep = 2.0 * msg_qclip / 255.0
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
    # layered sweep order: row i's slots as (slot k, var block j, shift)
    row_slots: list[list[tuple[int, int, int]]] = [
        [(k, planes[p][1], planes[p][2]) for k, p in enumerate(ps)]
        for ps in group_c
    ]

    # pad slots (check rows with degree < dc_max): kept at +_BIG so they
    # are inert in the vectorized min-sum; re-stamped after every check
    # update (a handful of per-slot stores — Pallas kernels cannot close
    # over array constants, so no dense mask)
    pad_slots = [
        (i, k)
        for i, ps in enumerate(group_c)
        for k in range(len(ps), dc_max)
    ]

    def kernel(llr_ref, *rest):
        if with_done_in:
            done_ref, *rest = rest
        if with_ab:
            # (iterations, 2) SMEM table of per-iteration (α, β) — the
            # frozen weighted-min-sum schedule (bp.freeze_minsum_weights);
            # read per iteration as two scalars, so the weighted decode
            # costs two extra VPU broadcasts per iteration
            ab_ref, *rest = rest
        if with_weights:
            # per-edge neural-BP weight tables (the reference's trainable
            # VC capacity, bp/bp_vc.py:101-107, in Nachmani per-edge
            # form), packed host-side by _pack_edge_weights: z on the
            # sublane axis, one lane column per (check row, slot) —
            # width-1 lane slices broadcast against the (z, tile)
            # message planes with no transposes. Row `iterations` holds
            # the final-marginalization weights.
            #   wm_ref: (iterations+1, z, mb*dc_max)  message weights,
            #           pre-rolled to check orientation;
            #   wl_ref: (iterations+1, z, nb)         LLR weights.
            wm_ref, wl_ref, *rest = rest
        if early_stop:
            out_ref, iters_ref, msg_ref, post_ref = rest
        elif with_unsat:
            # fused syndrome epilogue: the probe pass emits per-lane
            # unsatisfied-check counts straight from the VMEM-resident
            # posterior, replacing the separate MXU syndrome pass (and
            # its HBM round trip) between the probe and the requeue
            out_ref, unsat_ref, msg_ref, post_ref = rest
        else:
            out_ref, msg_ref, post_ref = rest
        # llr_ref/out_ref/post_ref: (nb, z, T); msg_ref: (mb, dc_max, z, T)
        tile = llr_ref.shape[-1]

        def stamp_pads():
            pad_val = 127.0 if is_int else _BIG
            for (i, k) in pad_slots:
                msg_ref[i, k] = jnp.full(
                    (msg_ref.shape[2], msg_ref.shape[3]), pad_val,
                    dtype=msg_ref.dtype,
                )

        # sub-32-bit dtypes are *storage only*: Mosaic on v5e lacks
        # bf16 lowerings for rotate/compare/reduce-index, so every load
        # lifts to f32 (one VPU cast) and every store truncates back.
        # The VMEM saving — the reason to run bf16/int8 — is unaffected.
        # int8 stores messages as round(v/qstep) in [-127, 127] (the
        # message-quantized decoder made real in hardware storage:
        # quarter the VMEM of f32); the posterior plane stays f32.
        f32 = jnp.float32

        def ld(x):
            if is_int and x.dtype == jnp.int8:
                return x.astype(f32) * qstep
            return x.astype(f32) if x.dtype != f32 else x

        def st(v):
            """f32 compute value → message storage dtype."""
            if is_int:
                return jnp.clip(
                    jnp.round(v * (1.0 / qstep)), -127.0, 127.0
                ).astype(jnp.int8)
            return v.astype(dtype)

        def unpad(x):
            """Re-stamp pad slots of a LOADED full message tensor with
            the inert magnitude (int8 storage holds 127 ~ qclip there,
            which could tie with a real clipped message in the min).
            Scatter has no Mosaic lowering, so this is an iota-mask
            select over the (row, slot) axes — one compare per pad."""
            if not is_int or not pad_slots:
                return x
            ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            lin = ii * dc_max + kk
            mask = None
            for (i, k) in pad_slots:
                m = lin == (i * dc_max + k)
                mask = m if mask is None else (mask | m)
            return jnp.where(mask, _BIG, x)

        def write_posterior():
            """post_ref[j] = llr_j + Σ c2v messages (variable orientation).

            Also the first half of the variable update: the exclusive sum
            for slot (i,k,s) of block j is roll(post[j], −s) − msg[i,k].
            """
            for j in range(nb):
                acc = ld(llr_ref[j])
                for (i, k, s) in var_slots[j]:
                    acc = acc + _roll(ld(msg_ref[i, k]), s)
                post_ref[j] = acc.astype(pdtype)

        def write_posterior_w(row):
            """Neural-BP weighted posterior using weight-table row ``row``
            (iteration index, or ``iterations`` for the final
            marginalization weights). The weighted exclusive sum for slot
            (i,k,s) then telescopes exactly like the plain one:
            v2c = roll(post_w[j], −s) − wm[row,i,k] ⊙ msg[i,k].
            """
            wm_t = wm_ref[row]  # (z, mb*dc_max)
            wl_t = wl_ref[row]  # (z, nb)
            for j in range(nb):
                acc = ld(llr_ref[j]) * wl_t[:, j:j + 1]
                for (i, k, s) in var_slots[j]:
                    c = i * dc_max + k
                    acc = acc + _roll(
                        wm_t[:, c:c + 1] * ld(msg_ref[i, k]), s
                    )
                post_ref[j] = acc.astype(pdtype)

        def syndrome_unsat():
            """Per-lane count of unsatisfied checks, shape (1, tile)."""
            bits = [
                (ld(post_ref[j]) < 0).astype(jnp.int32) for j in range(nb)
            ]
            unsat = jnp.zeros((1, tile), jnp.int32)
            for i in range(mb):
                par = None
                for p in group_c[i]:
                    _, j, s = planes[p]
                    # check i·z+r sees variable j·z+(r+s): roll by −s
                    b = _roll(bits[j], -s)
                    par = b if par is None else par + b
                unsat = unsat + jnp.sum(par & 1, axis=0, keepdims=True)
            return unsat

        def check_excl(v, axis, it=0):
            """Exclusive check update along ``axis`` (f32 in/out).

            Applies the min-sum two-minima trick or the stable log-domain
            sum-product, then clamp + message quantization. ``it`` picks
            the iteration's (α, β) row from the SMEM table when the
            weighted schedule is on (``with_ab``).
            """
            a = jnp.abs(v)
            neg = (v < 0).astype(jnp.int32)
            # sign product as sum-of-sign-bits parity (reduce_prod has no
            # Pallas TPU lowering): exclusive parity = (Σ neg − neg) mod 2
            nneg = jnp.sum(neg, axis=axis, keepdims=True)
            exneg = (nneg - neg) & 1
            exsign = 1.0 - 2.0 * exneg.astype(f32)
            if method == "min-sum":
                min1 = jnp.min(a, axis=axis, keepdims=True)
                idx = jnp.argmin(a, axis=axis)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
                    == jnp.expand_dims(idx, axis)
                )
                min2 = jnp.min(jnp.where(onehot, _BIG, a), axis=axis,
                               keepdims=True)
                exmin = jnp.where(onehot, min2, min1)
                if with_ab:
                    out = (
                        exsign
                        * jnp.maximum(exmin - ab_ref[it, 1], 0.0)
                        * ab_ref[it, 0]
                    )
                else:
                    mag = (
                        jnp.maximum(exmin - beta, 0.0) if beta else exmin
                    )
                    out = exsign * mag
                    if alpha != 1.0:
                        out = out * alpha
            else:  # stable log-domain sum-product (ops/bp.py semantics;
                # naive 1−1e-12 guards are f32 no-ops and NaN-cascade on
                # TPU). Mosaic has no expm1 lowering (observed on v5e:
                # "Unimplemented primitive ... expm1"), so the pole
                # handling uses _log1mexp — a series/direct switch that
                # matches the expm1 form to ~1e-7 relative.
                ac = jnp.minimum(jnp.maximum(a, 1e-12), 80.0)
                lt = _log1mexp(ac) - jnp.log(1.0 + jnp.exp(-ac))
                s = jnp.minimum(
                    jnp.sum(lt, axis=axis, keepdims=True) - lt, -1e-12
                )
                out = exsign * (
                    jnp.log(1.0 + jnp.exp(s)) - _log1mexp(-s)
                )
            if clamp is not None:
                out = jnp.clip(out, -clamp, clamp)
            if msg_qbits is not None:
                step = 2.0 * msg_qclip / (2**msg_qbits - 1)
                q = jnp.round(out / step) * step
                out = jnp.clip(q, -msg_qclip, msg_qclip)
            return out

        def update(done, it=0):
            """One flooding iteration; done≠0 lanes keep their messages."""
            keep = None if done is None else (done > 0)
            wm_t = wm_ref[it] if with_weights else None
            # -- variable update, in place (reads post_ref) ------------
            for j in range(nb):
                for (i, k, s) in var_slots[j]:
                    m = ld(msg_ref[i, k])
                    if with_weights:
                        c = i * dc_max + k
                        m = m * wm_t[:, c:c + 1]
                    new = st(_roll(ld(post_ref[j]), -s) - m)
                    if keep is not None:
                        new = jnp.where(keep, msg_ref[i, k], new)
                    msg_ref[i, k] = new
            # -- check update: all checks at once ----------------------
            out = st(check_excl(unpad(ld(msg_ref[...])), 1, it))
            if keep is not None:
                out = jnp.where(keep[None, None], msg_ref[...], out)
            msg_ref[...] = out
            stamp_pads()

        def layered_sweep(done, it=0):
            """One group-serial sweep (serial-C generalized over row
            groups): groups of ``layered_group`` consecutive check
            block-rows update together flooding-style from the *current*
            posterior, groups are serial — later groups inside the same
            sweep see earlier groups' improvements. ``layered_group=1``
            is the classic serial-C layered schedule (``_decode_layered``
            semantics in ops/bp_roll.py); ``layered_group=mb`` is
            arithmetically identical to one flooding iteration (the
            posterior delta update telescopes). Intermediate sizes trade
            convergence speed for fewer, larger VPU ops — the per-row
            check update on a (dc, z, tile) tensor is op-scheduling-
            bound, not element-bound. Pad slots inside a group are
            filled with +_BIG at build time (inert in both check rules;
            never written back).
            """
            keep = None if done is None else (done > 0)
            # per-edge neural-BP weights: the posterior carries THIS
            # sweep's weight row (re-based between sweeps by bp_iter),
            # so the weighted exclusive v2c is roll(post_w, −s) − w⊙msg
            # and the posterior delta is w⊙(new − old) — wm_tab columns
            # are pre-rolled to check orientation (_pack_edge_weights)
            wm_t = wm_ref[it] if with_weights else None
            for g0 in range(0, mb, layered_group):
                rows = list(
                    enumerate(row_slots[g0:g0 + layered_group], g0)
                )
                # v2c for the group's rows from the current posterior,
                # padded to dc_max so one check_excl serves all rows
                planes = []
                for i, slots in rows:
                    for (k, j, s) in slots:
                        m = ld(msg_ref[i, k])
                        if with_weights:
                            c = i * dc_max + k
                            m = m * wm_t[:, c:c + 1]
                        planes.append(_roll(ld(post_ref[j]), -s) - m)
                    for _ in range(dc_max - len(slots)):
                        planes.append(
                            jnp.full(planes[-1].shape, _BIG, f32)
                        )
                xs = jnp.stack(planes).reshape(
                    len(rows), dc_max, *planes[0].shape
                )
                y = check_excl(xs, 1, it)
                for gi, (i, slots) in enumerate(rows):
                    for (k, j, s) in slots:
                        old = ld(msg_ref[i, k])
                        new = y[gi, k]
                        if keep is not None:
                            new = jnp.where(keep, old, new)
                        if is_int:
                            # quantize FIRST so the posterior delta is
                            # exactly what the stored message changes by
                            newq = st(new)
                            delta = ld(newq) - old
                        else:
                            newq = new.astype(dtype)
                            delta = new - old
                        if with_weights:
                            delta = delta * wm_t[:, i * dc_max + k:
                                                 i * dc_max + k + 1]
                        post_ref[j] = (
                            ld(post_ref[j]) + _roll(delta, s)
                        ).astype(pdtype)
                        msg_ref[i, k] = newq

        def bp_iter(done, it=0):
            if schedule == "layered":
                layered_sweep(done, it)  # maintains post_ref incrementally
                if with_weights:
                    # weight tables change per sweep: re-base the
                    # posterior onto row it+1 (after the last sweep that
                    # row holds the final-marginalization weights)
                    write_posterior_w(it + 1)
            else:
                update(done, it)
                if with_weights:
                    # row it+1: next iteration's weights, or (after the
                    # last iteration) the final-marginalization row
                    write_posterior_w(it + 1)
                else:
                    write_posterior()

        def run():
            msg_ref[...] = jnp.zeros_like(msg_ref)
            if schedule != "layered":  # layered never reads pad slots
                stamp_pads()
            # posterior of the zero-message state = (weighted) LLRs
            if with_weights:
                write_posterior_w(0)
            else:
                write_posterior()

            if early_stop:
                # per-lane termination: a lane freezes at its first
                # syndrome-satisfying state (checked every
                # ``es_check_every`` iterations); the tile exits when all
                # lanes are done. iters[lane] = BP iterations applied at
                # the lane's first *checked* satisfying state.
                K = es_check_every
                rounds = iterations // K
                if with_done_in:
                    # caller-vetted entry states (requeue pass 2): lanes
                    # flagged done froze in an earlier pass; the rest are
                    # known unconverged — skip the entry syndrome.
                    done0 = (ld(done_ref[...]) > 0).astype(jnp.int32)
                else:
                    done0 = (syndrome_unsat() == 0).astype(jnp.int32)
                iters0 = jnp.where(done0 > 0, 0, iterations).astype(
                    jnp.int32
                )

                def cond(carry):
                    r, done, _ = carry
                    return jnp.logical_and(
                        r < rounds, jnp.sum(done) < tile
                    )

                def body(carry):
                    r, done, iters = carry
                    for kk in range(K):
                        bp_iter(done, r * K + kk)
                    newly = jnp.logical_and(
                        syndrome_unsat() == 0, done == 0
                    )
                    iters = jnp.where(newly, (r + 1) * K, iters)
                    done = jnp.where(newly, 1, done)
                    return r + 1, done, iters

                _, _, iters = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), done0, iters0)
                )
                iters_ref[...] = iters
            else:
                def one_iteration(i, carry):
                    bp_iter(None, i)
                    return carry

                jax.lax.fori_loop(0, iterations, one_iteration, 0)
                if with_unsat:
                    unsat_ref[...] = syndrome_unsat()

            for j in range(nb):
                out_ref[j] = post_ref[j]

        if with_done_in:
            # a tile whose lanes are all pre-converged skips everything
            # (its output block is never read by the requeue caller)
            @pl.when(jnp.sum(done_ref[...]) < done_ref.shape[-1])
            def _():
                run()
        else:
            run()

    return kernel, (mb, dc_max, nb, z)


def _pack_edge_weights(weights, qc: QcStructure, iterations: int,
                       dc_max: int):
    """Edge-flavor neural-BP pytree → kernel weight tables.

    Input layout is the backend-shared one (``bp.init_neural_bp_weights``
    / ``bp_roll.decode_roll:wslice``): ``w_msg`` (iterations, n, dv) in
    variable space with check-sorted slots, ``w_llr`` (iterations, n),
    plus the ``*_final`` marginalization weights.

    Returns ``(wm_tab, wl_tab)``: (iterations+1, z, mb*dc_max) and
    (iterations+1, z, nb) float32 with z on the SUBLANE axis and one
    lane column per (check row, slot) / per variable block — so the
    kernel reads width-1 lane slices that broadcast against the
    (z, tile) message planes with no transposes. Message weights are
    pre-rolled from variable to check orientation (roll −s):
    ``roll(w ⊙ roll(msg, s), −s) == roll(w, −s) ⊙ msg``. Row
    ``iterations`` holds the final weights; pad columns are 1.
    Traced-safe (jnp ops only) so trained weight arrays can flow through
    jit into the kernel operands.
    """
    planes, group_c, group_v = qc_plan(qc)
    mb, nb, z = qc.mb, qc.nb, qc.z
    n = nb * z
    wm = jnp.asarray(weights["w_msg"], jnp.float32)
    dv = wm.shape[-1]
    if wm.shape != (iterations, n, dv):
        raise ValueError(
            f"w_msg shape {wm.shape} != ({iterations}, {n}, dv)"
        )
    wm = wm.reshape(iterations, nb, z, dv)
    wmf = jnp.asarray(weights["w_msg_final"], jnp.float32)
    if wmf.shape != (n, dv):
        raise ValueError(f"w_msg_final shape {wmf.shape} != ({n}, {dv})")
    wmf = wmf.reshape(nb, z, dv)
    wl = jnp.asarray(weights["w_llr"], jnp.float32)
    if wl.shape != (iterations, n):
        raise ValueError(f"w_llr shape {wl.shape} != ({iterations}, {n})")
    wl = wl.reshape(iterations, nb, z)
    wlf = jnp.asarray(weights["w_llr_final"], jnp.float32).reshape(nb, z)

    kv_of_plane: dict[int, int] = {}
    for j in range(nb):
        for kv, p in enumerate(group_v[j]):
            kv_of_plane[p] = kv
    cols: dict[int, jnp.ndarray] = {}
    for i, ps in enumerate(group_c):
        for k, p in enumerate(ps):
            _, j, s = planes[p]
            kv = kv_of_plane[p]
            w_all = jnp.concatenate(
                [wm[:, j, :, kv], wmf[j, :, kv][None]], axis=0
            )  # (iterations+1, z), variable orientation
            cols[i * dc_max + k] = jnp.roll(w_all, -s, axis=1)
    ones = jnp.ones((iterations + 1, z), jnp.float32)
    wm_tab = jnp.stack(
        [cols.get(c, ones) for c in range(mb * dc_max)], axis=2
    )
    wl_tab = jnp.transpose(
        jnp.concatenate([wl, wlf[None]], axis=0), (0, 2, 1)
    )  # (iterations+1, z, nb)
    return wm_tab, wl_tab


@functools.partial(
    jax.jit,
    static_argnames=("qc", "iterations", "method", "alpha", "beta",
                     "clamp", "early_stop", "es_check_every", "msg_qbits",
                     "msg_qclip", "schedule", "layered_group", "tile",
                     "output", "dtype", "interpret"),
)
def bp_qc_pallas(
    llr: jnp.ndarray,
    qc: QcStructure,
    iterations: int = 20,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    early_stop: bool = False,
    es_check_every: int = 1,
    done_in: jnp.ndarray | None = None,
    msg_qbits: int | None = None,
    msg_qclip: float = 20.0,
    schedule: str = "flooding",
    layered_group: int = 1,
    weights=None,
    tile: int = 128,
    output: str = "hard",
    dtype=jnp.float32,
    interpret: bool = False,
):
    """(batch, n) channel LLRs (log Pr1/Pr0) → hard bits / posterior.

    ``method``: 'min-sum' or 'sum-product' (stable log-domain). batch
    must be a multiple of ``tile`` (lane-axis tile, default 128).
    ``early_stop``: per-codeword syndrome termination (lane freeze +
    whole-tile exit); with ``output='hard_iters'`` returns
    ``(bits, iters)`` where ``iters[b]`` is the number of BP iterations
    codeword ``b`` actually ran. ``es_check_every``: check syndromes
    every K iterations instead of every one (the check costs ~one
    iteration's VPU work, so K>1 trades a coarser exit for much cheaper
    iterations; must divide ``iterations``). ``done_in``: optional
    (batch,) lane mask of already-converged codewords (requeue pass 2):
    a tile whose lanes are ALL flagged skips every compute — **its
    output block is garbage**, the caller must keep the earlier pass's
    result for flagged lanes. ``schedule``: 'flooding' (one big
    vectorized check update) or 'layered' (serial-C sweep over the mb
    block rows — ~2x fewer iterations at the same BER; one "iteration"
    = one full sweep). ``dtype``: message storage dtype (float32 or
    bfloat16 — bf16 halves VMEM residency). ``alpha``/``beta`` may be
    length-``iterations`` tuples — a frozen weighted-min-sum schedule
    (``bp.freeze_minsum_weights``), applied per iteration from an SMEM
    table at ~zero throughput cost. ``weights``: an edge-flavor
    neural-BP pytree (``bp.init_neural_bp_weights(..., flavor='edge')``)
    — trained per-edge decoders run on the fast path as ~1 MB of VMEM
    weight tables under BOTH schedules — weighted layered re-bases the
    posterior onto each sweep's weight row — (no early stop; bit-exact vs
    the roll backend's weighted decode).
    """
    if method not in ("min-sum", "sum-product"):
        raise ValueError(f"unsupported kernel method {method!r}")
    with_ab = isinstance(alpha, tuple) or isinstance(beta, tuple)
    if with_ab:
        if method != "min-sum":
            raise ValueError("per-iteration alpha/beta require min-sum")
        a_t = alpha if isinstance(alpha, tuple) else (alpha,) * iterations
        b_t = beta if isinstance(beta, tuple) else (beta,) * iterations
        if len(a_t) != iterations or len(b_t) != iterations:
            raise ValueError(
                "per-iteration alpha/beta must have length == iterations"
            )
        ab_tab = np.stack(
            [np.asarray(a_t, np.float32), np.asarray(b_t, np.float32)],
            axis=1,
        )  # (iterations, 2)
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if output == "hard_iters" and not early_stop:
        raise ValueError("output='hard_iters' requires early_stop=True")
    if output == "hard_unsat" and early_stop:
        raise ValueError(
            "output='hard_unsat' is the fixed-decode fused-syndrome "
            "path; early_stop computes syndromes already"
        )
    if es_check_every < 1 or iterations % es_check_every:
        raise ValueError(
            f"es_check_every={es_check_every} must divide "
            f"iterations={iterations}"
        )
    # done_in without early_stop is allowed: plain fixed-iteration decode
    # with whole-tile skip — the probe-requeue fast path (no per-lane
    # freeze masks, no in-kernel syndrome sweeps, static unroll)
    B, n = llr.shape
    z, nb = qc.z, qc.nb
    if n != nb * z:
        raise ValueError("llr width does not match the QC code")
    if B % tile:
        raise ValueError(f"batch {B} not a multiple of tile {tile}")
    dtype = jnp.dtype(dtype)

    if layered_group < 1 or (layered_group > 1 and schedule != "layered"):
        raise ValueError("layered_group needs schedule='layered'")
    if weights is not None:
        if early_stop or done_in is not None:
            raise ValueError("neural-BP weights with early stop is "
                             "unsupported")
        missing = {"w_msg", "w_llr", "w_msg_final", "w_llr_final"} - set(
            weights
        )
        if missing or "w_pair" in weights:
            raise ValueError(
                "kernel weights must be the edge flavor "
                f"(missing {missing or 'nothing'}; w_pair unsupported)"
            )
    with_unsat = output == "hard_unsat"
    kernel, (mb, dc_max, nb, z) = _build_kernel(
        qc, iterations, alpha, beta, method, clamp,
        early_stop=early_stop, es_check_every=es_check_every,
        with_done_in=done_in is not None, with_ab=with_ab,
        with_weights=weights is not None, with_unsat=with_unsat,
        msg_qbits=msg_qbits, msg_qclip=msg_qclip,
        schedule=schedule, layered_group=layered_group, dtype=dtype,
    )

    is_int = dtype == jnp.dtype(jnp.int8)
    pdtype = jnp.dtype(jnp.float32) if is_int else dtype
    # internal convention log(Pr0/Pr1), variable-block-major planes
    # (channel LLRs and posteriors are never int8-quantized — only the
    # c2v message storage is)
    lv = (-llr.T).reshape(nb, z, B).astype(pdtype)

    # scratch (msg + posterior planes) + double-buffered in/out blocks
    # exceed the 16 MB default scoped-vmem budget at tile=128 on
    # (1944,972); raise the cap toward the chip's physical VMEM
    # (v5e: 128 MB). The 2x factor covers Mosaic's internal temporaries,
    # plus a fixed 8 MB margin (measured: tile=256 f32 on (1944,972)
    # needs 37.04 MB vs 34.17 MB from the bare 2x formula).
    lane_pad = lambda d: -(-d // 128) * 128  # noqa: E731
    vmem_bytes = (
        pdtype.itemsize * (2 * 2 + 1) * nb * z * tile  # in/out + post
        + dtype.itemsize * mb * dc_max * z * tile      # messages
    )
    if weights is not None:
        # f32 weight tables, lane-padded to 128 columns
        vmem_bytes += (
            4 * (iterations + 1) * z
            * (lane_pad(mb * dc_max) + lane_pad(nb))
        )
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=min(
            max(32 * 2**20, 2 * vmem_bytes + 8 * 2**20), 120 * 2**20
        ),
    )
    in_specs = [
        pl.BlockSpec((nb, z, tile), lambda b: (0, 0, b),
                     memory_space=pltpu.VMEM),
    ]
    operands = [lv]
    if done_in is not None:
        in_specs.append(
            pl.BlockSpec((1, tile), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        )
        operands.append(done_in.reshape(1, B).astype(jnp.int32))
    if with_ab:
        in_specs.append(
            pl.BlockSpec((iterations, 2), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        operands.append(jnp.asarray(ab_tab))
    if weights is not None:
        wm_tab, wl_tab = _pack_edge_weights(weights, qc, iterations, dc_max)
        in_specs.append(
            pl.BlockSpec((iterations + 1, z, mb * dc_max),
                         lambda b: (0, 0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(wm_tab)
        in_specs.append(
            pl.BlockSpec((iterations + 1, z, nb), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(wl_tab)
    out_shape = [jax.ShapeDtypeStruct((nb, z, B), pdtype)]
    out_specs = [
        pl.BlockSpec((nb, z, tile), lambda b: (0, 0, b),
                     memory_space=pltpu.VMEM),
    ]
    two_outs = early_stop or with_unsat
    if two_outs:
        out_shape.append(jax.ShapeDtypeStruct((1, B), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, tile), lambda b: (0, b),
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if two_outs else out_specs[0],
        out_shape=tuple(out_shape) if two_outs else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((mb, dc_max, z, tile), dtype),
            pltpu.VMEM((nb, z, tile), pdtype),
        ],
        compiler_params=params,
        interpret=interpret,
    )(*operands)

    post = outs[0] if two_outs else outs
    aux = outs[1][0] if two_outs else None  # (B,) int32

    if output == "posterior":
        return (-post).reshape(n, B).T.astype(jnp.float32)
    bits = (post.reshape(n, B) < 0).astype(jnp.int8).T
    if output in ("hard_iters", "hard_unsat"):
        return bits, aux
    return bits


@functools.partial(
    jax.jit,
    static_argnames=("qc", "iterations", "probe_iters", "method", "alpha",
                     "beta", "clamp", "es_check_every", "msg_qbits",
                     "msg_qclip", "schedule", "layered_group", "tile",
                     "output", "dtype", "interpret"),
)
def bp_qc_requeue(
    llr: jnp.ndarray,
    qc: QcStructure,
    iterations: int = 20,
    probe_iters: int = 4,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    es_check_every: int = 2,
    msg_qbits: int | None = None,
    msg_qclip: float = 20.0,
    schedule: str = "flooding",
    layered_group: int = 1,
    tile: int = 128,
    output: str = "hard",
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Early-stop decode as probe + straggler-requeue (two kernel passes).

    The single-pass early-stop kernel exits a tile only when *all*
    ``tile`` lanes are done — the tile trip count is the max, not the
    mean, of its lanes (measured at 2.5 dB on (1944,972): mean 3.27
    iterations, per-tile max ≈ 6, so a third of the win is forfeit —
    and the per-iteration syndrome check costs ~one extra iteration of
    VPU work on top). This driver restores mean-iterations scaling:

    1. **probe pass** — every codeword gets a cheap fixed budget of
       ``probe_iters`` iterations (early-stop, syndromes checked every
       ``es_check_every``); ≥97% of codewords converge here at the
       operating point;
    2. **pack** — codewords are sorted converged-first (a static
       argsort; measured: sorting packs stragglers essentially ideally,
       sum-of-tile-max 212 vs 209 ideal vs 326 unsorted);
    3. **requeue pass** — the sorted batch re-enters the kernel with
       the converged mask as ``done_in``: fully-converged tiles skip
       all compute at entry, only the few straggler tiles decode, with
       the full ``iterations`` budget (a fresh start with budget N ≥
       continuing the probe state for N−probe more — BER can only
       match or beat fixed-N).

    Returns bits, or ``(bits, iters)`` for ``output='hard_iters'``
    where iters counts total BP iterations applied to each codeword
    (probe + requeue for stragglers).
    """
    if output not in ("hard", "hard_iters"):
        raise ValueError("bp_qc_requeue outputs hard bits only")
    B = llr.shape[0]
    # a frozen per-iteration schedule: the probe pass runs its prefix
    a_probe = alpha[:probe_iters] if isinstance(alpha, tuple) else alpha
    b_probe = beta[:probe_iters] if isinstance(beta, tuple) else beta
    bits1, iters1 = bp_qc_pallas(
        llr, qc, iterations=probe_iters, method=method, alpha=a_probe,
        beta=b_probe, clamp=clamp, early_stop=True,
        es_check_every=es_check_every, msg_qbits=msg_qbits,
        msg_qclip=msg_qclip, schedule=schedule,
        layered_group=layered_group, tile=tile,
        output="hard_iters", dtype=dtype, interpret=interpret,
    )
    # converged := finished under budget at a checked state; lanes that
    # report the full budget may have converged exactly there, but
    # re-decoding them is merely redundant, never wrong
    done = iters1 < probe_iters
    order = jnp.argsort(done.astype(jnp.int32), descending=True,
                        stable=True)
    inv = jnp.zeros((B,), jnp.int32).at[order].set(
        jnp.arange(B, dtype=jnp.int32)
    )
    bits2, iters2 = bp_qc_pallas(
        llr[order], qc, iterations=iterations, method=method, alpha=alpha,
        beta=beta, clamp=clamp, early_stop=True,
        es_check_every=es_check_every,
        done_in=done[order], msg_qbits=msg_qbits, msg_qclip=msg_qclip,
        schedule=schedule, layered_group=layered_group, tile=tile,
        output="hard_iters", dtype=dtype, interpret=interpret,
    )
    bits = jnp.where(done[:, None], bits1, bits2[inv])
    if output == "hard_iters":
        iters = jnp.where(done, iters1, probe_iters + iters2[inv])
        return bits, iters
    return bits


@functools.partial(
    jax.jit,
    static_argnames=("qc", "iterations", "probe_iters", "method",
                     "alpha", "beta", "probe_alpha", "probe_beta",
                     "clamp", "msg_qbits", "msg_qclip",
                     "schedule", "layered_group", "tile", "output",
                     "dtype", "interpret"),
)
def bp_qc_probe_requeue(
    llr: jnp.ndarray,
    qc: QcStructure,
    iterations: int = 20,
    probe_iters: int = 6,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    probe_alpha=None,
    probe_beta=None,
    clamp: float | None = None,
    msg_qbits: int | None = None,
    msg_qclip: float = 20.0,
    schedule: str = "layered",
    layered_group: int = 1,
    tile: int = 128,
    output: str = "hard",
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Adaptive decode: FIXED fast probe + packed straggler requeue.

    The earlier adaptive modes lost to the fixed pipeline (BENCH_r03:
    es-freeze 5.4e8, es-requeue 6.5e8 vs 1.5e9 bits/s for fixed
    layered-10) because the probe itself ran with the early-stop
    machinery — per-iteration in-kernel syndrome sweeps, lane-freeze
    masks, and a ``while_loop`` that defeats Mosaic's static unroll.
    This driver removes all of it from the common path:

    1. **probe** — every codeword gets ``probe_iters`` iterations of the
       PLAIN fixed kernel (optionally with a trained per-iteration
       (α, β) schedule via ``probe_alpha``/``probe_beta``) at full
       pipeline speed;
    2. **syndrome** — ONE batched check outside the kernel,
       ``bits @ Hᵀ & 1`` on the MXU (int8) — microseconds;
    3. **requeue** — codewords sorted converged-first re-enter the
       PLAIN fixed kernel with ``done_in``: converged tiles skip all
       compute at entry, the few straggler tiles decode with the full
       ``iterations`` budget from scratch — still no ES machinery
       anywhere (measured on chip: the ES-kernel requeue pass cost ~7
       ms/step of freeze-mask + while_loop overhead at (1944,972)
       batch 32k even with every tile skipped).

    BER note: stragglers get a fresh full-budget decode, so the FINAL
    error rate is that of the full-budget schedule (+ the probe's rare
    *undetected* errors, i.e. miscorrections to valid codewords) — an
    aggressive probe schedule that floors on its own (e.g. trained
    layered-6, docs/artifacts/20260821-014434_error_floor.json) is
    rescued: its floor events are syndrome-detectable and re-decoded.

    Batching note: the overflow fallback is a data-dependent
    ``lax.cond``. Called unbatched (or per-shard under ``shard_map`` —
    how the MC engine runs it) the predicate is a scalar and only one
    branch executes. Under ``vmap`` the cond lowers to ``select`` and
    BOTH branches run every call — results stay exact but the
    full-batch overflow decode erases the adaptive win; don't vmap this.
    """
    if output not in ("hard", "hard_iters"):
        raise ValueError("bp_qc_probe_requeue outputs hard bits only")
    B = llr.shape[0]
    # a frozen per-iteration (α, β) schedule: the probe pass runs its
    # prefix when no dedicated probe schedule is given
    pa = alpha if probe_alpha is None else probe_alpha
    pb = beta if probe_beta is None else probe_beta
    if isinstance(pa, tuple) and len(pa) != probe_iters:
        pa = pa[:probe_iters]
    if isinstance(pb, tuple) and len(pb) != probe_iters:
        pb = pb[:probe_iters]
    for t, nm in ((pa, "es_probe_alpha"), (pb, "es_probe_beta")):
        if isinstance(t, tuple) and len(t) != probe_iters:
            raise ValueError(
                f"{nm} has {len(t)} entries for probe_iters={probe_iters}"
            )
    # fused syndrome: the probe kernel's epilogue emits per-lane
    # unsatisfied-check counts straight from its VMEM-resident posterior
    # (round-5; previously a separate MXU syndrome matmul between the
    # passes cost an extra dispatch + a 64 MB bits1 HBM read at
    # batch 32k — part of the 5-7 ms/step inter-pass overhead diagnosed
    # in docs/artifacts/20260821_es_probe_note.md)
    bits1, unsat = bp_qc_pallas(
        llr, qc, iterations=probe_iters, method=method, alpha=pa,
        beta=pb, clamp=clamp, msg_qbits=msg_qbits, msg_qclip=msg_qclip,
        schedule=schedule, layered_group=layered_group, tile=tile,
        output="hard_unsat", dtype=dtype, interpret=interpret,
    )
    done = unsat == 0  # (B,)
    # Compact requeue: gathering/re-decoding the FULL sorted batch costs
    # ~10 ms/step at (1944,972) batch 32k (measured: 4.6 ms for the
    # 255 MB llr gather + 5.4 ms of whole-grid DMA/dispatch even with
    # every tile skipped). Only the straggler TAIL matters: a static
    # capacity of ~B/4 lanes (covers frame-error rates far beyond any
    # operating point) is gathered and decoded; on the (measure-zero)
    # overflow the whole batch re-decodes at the full budget, keeping
    # the result exact for every input.
    C = min(B, max(tile, -(-B // (4 * tile)) * tile))
    # stable partition via cumsums instead of argsort (~4x cheaper on
    # TPU): done lanes pack to the front, stragglers to the back
    d32 = done.astype(jnp.int32)
    n_done = jnp.sum(d32)
    rank_done = jnp.cumsum(d32) - d32            # exclusive prefix
    rank_strag = jnp.cumsum(1 - d32) - (1 - d32)
    dest = jnp.where(done, rank_done, n_done + rank_strag)
    order = jnp.zeros((B,), jnp.int32).at[dest].set(
        jnp.arange(B, dtype=jnp.int32)
    )
    idx = order[B - C:]
    n_strag = B - n_done

    kw2 = dict(
        iterations=iterations, method=method, alpha=alpha, beta=beta,
        clamp=clamp, msg_qbits=msg_qbits, msg_qclip=msg_qclip,
        schedule=schedule, layered_group=layered_group, tile=tile,
        output="hard", dtype=dtype, interpret=interpret,
    )

    def compact(_):
        # native-dtype gather: keeps the straggler re-decode bit-exact
        # vs the fixed full-budget decode (a bf16 round-trip here saved
        # ~0.5 ms/step at batch 32k but made marginal frames decode
        # differently — advisor finding, round 4)
        llr_c = jnp.take(llr, idx, axis=0)
        bits2 = bp_qc_pallas(llr_c, qc, done_in=done[idx], **kw2)
        merged = jnp.where(
            done[idx][:, None], jnp.take(bits1, idx, axis=0), bits2
        )
        return bits1.at[idx].set(merged)

    def overflow(_):
        return bp_qc_pallas(llr, qc, **kw2)

    overflowed = n_strag > C
    bits = jax.lax.cond(overflowed, overflow, compact, None)
    if output == "hard_iters":
        # stragglers run the full fixed budget (no in-kernel counting);
        # on overflow the WHOLE batch re-decoded at the full budget
        iters = jnp.where(
            jnp.logical_and(done, jnp.logical_not(overflowed)),
            probe_iters,
            probe_iters + iterations,
        )
        return bits, iters
    return bits


def minsum_qc_pallas(llr, qc, iterations=20, alpha=1.0, beta=0.0,
                     tile=128, output="hard", interpret=False):
    """Back-compat alias for :func:`bp_qc_pallas` with min-sum."""
    return bp_qc_pallas(
        llr, qc, iterations=iterations, method="min-sum", alpha=alpha,
        beta=beta, tile=tile, output=output, interpret=interpret,
    )
