"""Roll-based BP decoding for quasi-cyclic LDPC codes (the TPU fast path).

For a QC code, H is an (mb × nb) grid of z×z circulants with shifts
s_ij. Every Tanner-graph edge lives in exactly one nonzero block, and the
check-side ↔ variable-side reindexing *within a block* is a cyclic shift
of the z axis by s_ij. So BP needs **no gather/scatter at all**: messages
are kept as one plane of shape (z, batch) per nonzero block, and moving a
plane between check orientation and variable orientation is
``jnp.roll(plane, ±s, axis=0)`` — a static pair of slices that XLA/Mosaic
tile perfectly. All reductions run over tiny static plane-group axes.

This replaces both the reference's dense E×E mask matmuls
(``bp/bp_vc.py:16-32``, O(B·E²)) and the generic edge-gather formulation
(ops/bp.py) on TPU, where constant-index gathers inside the decode loop
currently crash the XLA TPU fusion pass (tpu_instruction_fusion
``main_instruction != nullptr`` — observed on v5e, jax 0.9 remote
compile); rolls sidestep the bug *and* are faster.

Plane convention (check orientation): for block (i, j) with shift s,
``plane[r, b]`` is the message on the edge between check ``i·z + r`` and
variable ``j·z + (r + s) mod z``. Variable orientation is
``roll(plane, s)`` (row q ↔ variable j·z+q); the inverse is
``roll(·, −s)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import QcStructure

__all__ = ["decode_roll", "qc_plan"]

_BIG = 1e30
_REF_PROD_EPS = 1e-7


def qc_plan(qc: QcStructure):
    """Static decode plan: plane list + per-check/per-var groupings.

    Planes are ordered block-row-major (sorted by (i, j)); a variable
    block's planes are listed sorted by check-block row i — the same
    check-sorted slot order as ``TannerGraph`` variable slots, so neural
    BP weight pytrees index identically across backends.
    """
    planes: list[tuple[int, int, int]] = []  # (i, j, shift)
    for i, row in enumerate(qc.base):
        for j, s in enumerate(row):
            if s >= 0:
                planes.append((i, j, int(s)))
    group_c: list[list[int]] = [[] for _ in range(qc.mb)]
    group_v: list[list[int]] = [[] for _ in range(qc.nb)]
    for p, (i, j, _s) in enumerate(planes):
        group_c[i].append(p)
        group_v[j].append(p)
    # planes are (i, j)-sorted so group_c entries are j-sorted and
    # group_v entries are i-sorted already
    return planes, group_c, group_v


def _signs(x):
    return jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)


def _exclusive_sign(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive sign product over axis 0 as a negative-count parity.

    Additive reduction instead of a multiplicative one — cheaper on the
    VPU and avoids a TPU compiler SIGSEGV seen when sign-`prod` reduces
    fuse with the decode loop's gathers (see ops/bp.py:_exclusive_sign).
    """
    neg = (x < 0).astype(x.dtype)
    ex = jnp.sum(neg, axis=0, keepdims=True) - neg
    return 1.0 - 2.0 * (ex % 2.0)


def _static_eq(v, const: float) -> bool:
    """True iff ``v`` is a Python scalar equal to ``const`` (traced
    values — per-iteration weighted-min-sum α/β — always return False
    so the op is emitted)."""
    return isinstance(v, (int, float)) and float(v) == const


def _minsum_excl(x: jnp.ndarray, alpha, beta) -> jnp.ndarray:
    """Exclusive min-sum over axis 0 of (d, z, B) via two-minima.

    ``alpha``/``beta`` are the normalized/offset min-sum parameters —
    Python floats (static, folded when 1/0) or traced scalars (the
    weighted-min-sum training path differentiates through them)."""
    a = jnp.abs(x)
    min1 = jnp.min(a, axis=0, keepdims=True)
    idx = jnp.argmin(a, axis=0)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == idx[None]
    )
    min2 = jnp.min(jnp.where(onehot, _BIG, a), axis=0, keepdims=True)
    exmin = jnp.where(onehot, min2, min1)
    exsign = _exclusive_sign(x)
    mag = exmin if _static_eq(beta, 0.0) else jnp.maximum(exmin - beta, 0.0)
    out = exsign * mag
    return out if _static_eq(alpha, 1.0) else out * alpha


def _sumproduct_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Stable exclusive sum-product over axis 0.

    expm1-based pole handling — see ops/bp.py:_check_update_sumproduct
    for why naive ``1 − 1e-12`` guards are f32 no-ops (TPU NaN cascade).
    """
    a = jnp.maximum(jnp.abs(x), 1e-12)
    lt = jnp.log(-jnp.expm1(-a)) - jnp.log1p(jnp.exp(-a))
    s = jnp.minimum(jnp.sum(lt, axis=0, keepdims=True) - lt, -1e-12)
    mag = jnp.log1p(jnp.exp(s)) - jnp.log(-jnp.expm1(s))
    return _exclusive_sign(x) * mag


def _ref_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Reference-arithmetic sum-product over axis 0 (``bp/bp_cv.py``):
    tanh of half-messages, exclusive product, ±(1−1e−7) clamp, 2·atanh."""
    t = jnp.tanh(x * 0.5)
    total = jnp.prod(t, axis=0, keepdims=True)
    # exclusive product via prefix/suffix (no division)
    d = x.shape[0]
    ones = jnp.ones_like(t[:1])
    left = jnp.concatenate([ones, jnp.cumprod(t, axis=0)[: d - 1]], axis=0)
    rev = jnp.flip(t, axis=0)
    right = jnp.flip(jnp.cumprod(rev, axis=0), axis=0)
    right = jnp.concatenate([right[1:], ones], axis=0)
    del total
    p = jnp.clip(left * right, -(1 - _REF_PROD_EPS), 1 - _REF_PROD_EPS)
    return jnp.log((1.0 + p) / (1.0 - p))


def decode_roll(
    llr: jnp.ndarray,
    qc: QcStructure,
    *,
    iterations: int = 20,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    early_stop: bool = False,
    msg_qbits: int | None = None,
    msg_qclip: float = 20.0,
    weights: dict[str, Any] | None = None,
    ms_weights: dict[str, Any] | None = None,
    output: str = "hard",
    schedule: str = "flooding",
    dtype=jnp.float32,
):
    """QC-LDPC BP decode; same contract as :func:`ldpc_sims_tpu.ops.bp.bp_decode`.

    llr: (batch, n) channel LLRs, log(Pr1/Pr0) convention.

    ``schedule='layered'`` (serial-C / row-layered scheduling): check block
    rows update sequentially within one iteration, each reading the
    *current* posterior — converges in roughly half the iterations of
    flooding for the same BER (standard LDPC result; the reference only
    has flooding). QC structure makes each layer a static set of rolls.

    ``alpha``/``beta`` may be length-``iterations`` tuples (a static
    per-iteration normalization/offset schedule). ``ms_weights`` is the
    *differentiable* form: ``{'alpha': (iterations,), 'beta':
    (iterations,)}`` traced arrays (see ``bp.init_minsum_weights``) —
    the weighted-min-sum training path, gradients flow through the
    unrolled decode. Mutually exclusive with tuple alpha/beta.
    """
    z, nb, mb = qc.z, qc.nb, qc.mb
    planes, group_c, group_v = qc_plan(qc)
    P = len(planes)
    B = llr.shape[0]
    n = nb * z

    # internal convention log(Pr0/Pr1), variable-block layout (nb, z, B)
    Lv = (-llr.T).astype(dtype).reshape(nb, z, B)

    if weights is not None:
        weights = jax.tree.map(lambda x: jnp.asarray(x, dtype), weights)

    # per-iteration α/β: traced arrays (ms_weights) or static tuples.
    # ms_unroll=True forces a Python-unrolled iteration loop so autodiff
    # sees per-iteration parameters (mirrors the neural-BP weights path).
    ms_a = ms_b = None
    ms_unroll = False
    if ms_weights is not None:
        if isinstance(alpha, (tuple, list)) or isinstance(beta, (tuple, list)):
            raise ValueError("pass tuple alpha/beta OR ms_weights, not both")
        if method != "min-sum":
            raise ValueError("ms_weights require method='min-sum'")
        ms_a = jnp.asarray(ms_weights["alpha"], dtype)
        ms_b = jnp.asarray(ms_weights["beta"], dtype)
        ms_unroll = True
    else:
        if isinstance(alpha, (tuple, list)):
            ms_a = jnp.asarray(alpha, dtype)
        if isinstance(beta, (tuple, list)):
            ms_b = jnp.asarray(beta, dtype)
        if (ms_a is not None or ms_b is not None) and method != "min-sum":
            raise ValueError("per-iteration alpha/beta require min-sum")
    for arr, name in ((ms_a, "alpha"), (ms_b, "beta")):
        if arr is not None and arr.shape != (iterations,):
            raise ValueError(
                f"per-iteration {name} must have shape ({iterations},), "
                f"got {arr.shape}"
            )

    def ab_at(it):
        """(α, β) for iteration ``it`` (static int or traced index)."""
        a = alpha if ms_a is None else ms_a[it]
        b = beta if ms_b is None else ms_b[it]
        return a, b

    def wslice(w_msg, w_llr):
        """Split flat weight arrays into per-plane / per-block views.

        w_msg: (n, dv) variable-space slot weights (dv = padded max var
        degree, slots check-sorted — matches group_v order); w_llr: (n,).
        """
        wm = w_msg.reshape(nb, z, -1)
        wl = w_llr.reshape(nb, z)
        per_plane = [None] * P
        for j in range(nb):
            for k, p in enumerate(group_v[j]):
                per_plane[p] = wm[j, :, k][:, None]  # (z, 1), var orient
        return per_plane, wl

    def excl_update(x: jnp.ndarray, it=0) -> jnp.ndarray:
        """Exclusive check update over axis 0 + clamp/quantize postlude."""
        if method == "min-sum":
            a, b = ab_at(it)
            y = _minsum_excl(x, a, b)
        elif method == "sum-product":
            y = _sumproduct_excl(x)
        else:
            y = _ref_excl(x)
        if clamp is not None:
            y = jnp.clip(y, -clamp, clamp)
        if msg_qbits is not None:
            step = 2.0 * msg_qclip / (2**msg_qbits - 1)
            y = jnp.clip(jnp.round(y / step) * step, -msg_qclip, msg_qclip)
        return y

    def check_update(v2c_planes: list, it=0) -> list:
        out: list = [None] * P
        for i in range(mb):
            ps = group_c[i]
            y = excl_update(jnp.stack([v2c_planes[p] for p in ps]), it)
            for k, p in enumerate(ps):
                out[p] = y[k]
        return out

    def var_update(c2v_planes: list, w_it=None) -> list:
        """c2v (check orient) → v2c (check orient)."""
        wp, wl = (None, None)
        if w_it is not None:
            wp, wl = w_it
        out: list = [None] * P
        for j in range(nb):
            ps = group_v[j]
            xs = []
            for p in ps:
                v = jnp.roll(c2v_planes[p], planes[p][2], axis=0)
                if wp is not None:
                    v = v * wp[p]
                xs.append(v)
            x = jnp.stack(xs)  # (d, z, B) var orientation
            lv = Lv[j] if wl is None else wl[j][:, None] * Lv[j]
            total = lv + jnp.sum(x, axis=0)
            v2c_var = total[None] - x
            for k, p in enumerate(ps):
                out[p] = jnp.roll(v2c_var[k], -planes[p][2], axis=0)
        return out

    def posterior(c2v_planes: list, final=True) -> jnp.ndarray:
        """(nb, z, B) internal posterior log(Pr0/Pr1)."""
        if weights is not None and final:
            wp, wl = wslice(weights["w_msg_final"], weights["w_llr_final"])
        else:
            wp, wl = None, None
        rows = []
        for j in range(nb):
            acc = Lv[j] if wl is None else wl[j][:, None] * Lv[j]
            for p in group_v[j]:
                v = jnp.roll(c2v_planes[p], planes[p][2], axis=0)
                if wp is not None:
                    v = v * wp[p]
                acc = acc + v
            rows.append(acc)
        return jnp.stack(rows)  # (nb, z, B)

    def hard_bits(c2v_planes: list) -> jnp.ndarray:
        return (posterior(c2v_planes) < 0).astype(jnp.int8)

    def syndrome_lanes(c2v_planes: list) -> jnp.ndarray:
        """(B,) bool: True where the codeword satisfies every check."""
        bits = hard_bits(c2v_planes).astype(jnp.int32)  # (nb, z, B)
        ok = jnp.ones((B,), bool)
        for i in range(mb):
            acc = 0
            for p in group_c[i]:
                _, j, s = planes[p]
                # check i·z+r sees variable j·z+(r+s): roll bits by −s
                acc = acc + jnp.roll(bits[j], -s, axis=0)
            ok = jnp.logical_and(ok, jnp.all(acc % 2 == 0, axis=0))
        return ok

    zero = [jnp.zeros((z, B), dtype) for _ in range(P)]

    def one_iter(c2v_planes: list, w_it=None, it=0) -> list:
        return check_update(var_update(c2v_planes, w_it), it)

    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if schedule == "layered":
        w_layers = None
        if weights is not None:
            if early_stop:
                raise ValueError(
                    "early_stop with neural-BP weights is unsupported"
                )
            # per-iteration per-edge weights, PRE-ROLLED to check
            # orientation: for plane p = (i, j, s),
            # roll(w ⊙ roll(msg, s), −s) == roll(w, −s) ⊙ msg — so the
            # layered sweep multiplies messages in place, no transposes.
            # Entry `iterations` holds the final-marginalization weights.
            def roll_cols(per_plane):
                return [
                    jnp.roll(per_plane[p], -planes[p][2], axis=0)
                    for p in range(P)
                ]

            w_layers = [
                (roll_cols(wp), wl)
                for wp, wl in (
                    wslice(weights["w_msg"][it], weights["w_llr"][it])
                    for it in range(iterations)
                )
            ]
            wp_f, wl_f = wslice(
                weights["w_msg_final"], weights["w_llr_final"]
            )
            w_layers.append((roll_cols(wp_f), wl_f))
        post, iters_run = _decode_layered(
            Lv, planes, group_c, group_v, excl_update, mb, nb, z, B,
            iterations=iterations, early_stop=early_stop, dtype=dtype,
            unroll=ms_unroll or weights is not None, w_layers=w_layers,
        )
        return _emit(post, iters_run, output, n, B)

    if weights is not None:
        w_planes = []  # per-iteration static weight views
        for it in range(iterations):
            w_planes.append(
                wslice(weights["w_msg"][it], weights["w_llr"][it])
            )

    if early_stop:
        # per-codeword termination: a lane freezes (messages stop
        # updating) at its first syndrome-satisfying state; the loop
        # exits only when every lane is done. iters[b] = BP iterations
        # codeword b actually ran (0 if the channel decisions already
        # satisfy H). Whole-batch exit — the old form — forfeit the
        # saving to one stubborn codeword at realistic batch sizes.
        done0 = syndrome_lanes(zero)
        iters0 = jnp.where(done0, 0, iterations).astype(jnp.int32)

        def cond(state):
            it, _, done, _ = state
            return jnp.logical_and(
                it < iterations, jnp.logical_not(jnp.all(done))
            )

        def body(state):
            it, c2v, done, iters = state
            new = one_iter(c2v, it=it)  # edge weights unsupported w/ es
            dmask = done[None, :]
            c2v = [jnp.where(dmask, o, n) for o, n in zip(c2v, new)]
            newly = jnp.logical_and(
                syndrome_lanes(c2v), jnp.logical_not(done)
            )
            iters = jnp.where(newly, it + 1, iters)
            return it + 1, c2v, jnp.logical_or(done, newly), iters

        _, c2v, _, iters_run = jax.lax.while_loop(
            cond, body, (jnp.int32(0), zero, done0, iters0)
        )
    elif weights is not None or ms_unroll:
        c2v = zero
        for it in range(iterations):  # per-iteration weights are static
            c2v = one_iter(
                c2v, w_planes[it] if weights is not None else None, it
            )
        iters_run = jnp.full((B,), iterations, jnp.int32)
    else:
        c2v = jax.lax.fori_loop(
            0, iterations, lambda i, x: one_iter(x, it=i), zero
        )
        iters_run = jnp.full((B,), iterations, jnp.int32)

    return _emit(posterior(c2v), iters_run, output, n, B)


def _emit(post: jnp.ndarray, iters_run, output: str, n: int, B: int):
    """(nb, z, B) internal posterior log(Pr0/Pr1) → requested output.

    ``iters_run``: (B,) int32 per-codeword iteration counts (constant
    ``iterations`` when early stop is off).
    """
    if output == "posterior":
        return (-post).reshape(n, B).T
    if output == "soft":
        return jax.nn.sigmoid(-0.5 * post).reshape(n, B).T
    bits = (post < 0).astype(jnp.int8).reshape(n, B).T
    if output == "hard_iters":
        return bits, iters_run
    return bits


def _decode_layered(
    Lv: jnp.ndarray,
    planes: list,
    group_c: list,
    group_v: list,
    excl_update,
    mb: int,
    nb: int,
    z: int,
    B: int,
    *,
    iterations: int,
    early_stop: bool,
    dtype,
    unroll: bool = False,
    w_layers: list | None = None,
):
    """Serial-C (row-layered) BP over the QC block rows.

    State: per-variable-block posterior planes ``L`` (variable
    orientation) and per-plane c2v messages (check orientation). Each
    layer i recomputes its v2c messages from the *current* posterior
    (``v2c = roll(L_j, −s) − c2v_p``), applies the exclusive check
    update, and folds the message delta back into the posterior — so
    later layers inside the same sweep already see the improvement.
    One "iteration" = one sweep over all ``mb`` layers. ``unroll``
    replaces the fori_loop with a Python loop so reverse-mode autodiff
    works (the weighted-min-sum / neural-BP training paths).

    ``w_layers``: optional per-edge neural-BP weights — entry ``it`` is
    ``(w_cols, wl)`` with ``w_cols[p]`` the (z, 1) weight column of
    plane ``p`` pre-rolled to CHECK orientation and ``wl`` the (nb, z)
    LLR weights; entry ``iterations`` holds the final-marginalization
    weights. Sweep ``it`` forms its v2c messages as
    ``roll(L_w, −s) − w⊙c2v`` against a posterior carrying that
    iteration's weights (``L_w = wl⊙Lv + Σ w⊙roll(c2v, s)``), which the
    sweep maintains incrementally; the posterior is re-based between
    iterations because the weight tables change (the layered
    generalization of the reference's per-iteration trainable VC
    layers, ``bp/bp.py:33-34`` + ``bp/bp_vc.py:101-107``).
    """
    P = len(planes)

    def w_at(it):
        if w_layers is None:
            return None, None
        return w_layers[it]

    def sweep(state, it=0):
        L, c2v = list(state[0]), list(state[1])
        wcols, _ = w_at(it)
        for i in range(mb):
            ps = group_c[i]
            xs = [
                jnp.roll(L[planes[p][1]], -planes[p][2], axis=0)
                - (c2v[p] if wcols is None else wcols[p] * c2v[p])
                for p in ps
            ]
            y = excl_update(jnp.stack(xs), it)
            for k, p in enumerate(ps):
                _, j, s = planes[p]
                d = y[k] - c2v[p] if wcols is None else (
                    wcols[p] * (y[k] - c2v[p])
                )
                L[j] = L[j] + jnp.roll(d, s, axis=0)
                c2v[p] = y[k]
        return tuple(L), tuple(c2v)

    def rebase(c2v, it):
        """Posterior under weight-table row ``it`` (or the final row)."""
        wcols, wl = w_at(it)
        out = []
        for j in range(nb):
            acc = Lv[j] if wl is None else wl[j][:, None] * Lv[j]
            for p in group_v[j]:
                v = c2v[p] if wcols is None else wcols[p] * c2v[p]
                acc = acc + jnp.roll(v, planes[p][2], axis=0)
            out.append(acc)
        return tuple(out)

    L0 = tuple(Lv[j] for j in range(nb)) if w_layers is None else rebase(
        tuple(jnp.zeros((z, B), dtype) for _ in range(P)), 0
    )
    c2v0 = tuple(jnp.zeros((z, B), dtype) for _ in range(P))

    if early_stop:

        def syndrome_lanes(L):
            bits = [(l < 0).astype(jnp.int32) for l in L]
            ok = jnp.ones((B,), bool)
            for i in range(mb):
                acc = 0
                for p in group_c[i]:
                    _, j, s = planes[p]
                    acc = acc + jnp.roll(bits[j], -s, axis=0)
                ok = jnp.logical_and(ok, jnp.all(acc % 2 == 0, axis=0))
            return ok

        done0 = syndrome_lanes(L0)
        iters0 = jnp.where(done0, 0, iterations).astype(jnp.int32)

        def cond(state):
            it, _, _, done, _ = state
            return jnp.logical_and(
                it < iterations, jnp.logical_not(jnp.all(done))
            )

        def body(state):
            it, L, c2v, done, iters = state
            # per-codeword freeze (same semantics as the flooding path)
            Ln, c2vn = sweep((L, c2v), it)
            dmask = done[None, :]
            L = tuple(jnp.where(dmask, o, n) for o, n in zip(L, Ln))
            c2v = tuple(
                jnp.where(dmask, o, n) for o, n in zip(c2v, c2vn)
            )
            newly = jnp.logical_and(
                syndrome_lanes(L), jnp.logical_not(done)
            )
            iters = jnp.where(newly, it + 1, iters)
            return it + 1, L, c2v, jnp.logical_or(done, newly), iters

        _, L, _, _, iters_run = jax.lax.while_loop(
            cond, body, (jnp.int32(0), L0, c2v0, done0, iters0)
        )
    elif unroll:
        L, c2v = L0, c2v0
        for it in range(iterations):
            L, c2v = sweep((L, c2v), it)
            if w_layers is not None:
                # next sweep's (or, after the last sweep, the final
                # marginalization's) weight tables differ — re-base the
                # incrementally-maintained posterior onto them
                L = rebase(c2v, it + 1)
        iters_run = jnp.full((B,), iterations, jnp.int32)
    else:
        L, _ = jax.lax.fori_loop(
            0, iterations, lambda i, st: sweep(st, i), (L0, c2v0)
        )
        iters_run = jnp.full((B,), iterations, jnp.int32)
    return jnp.stack(L), iters_run
