"""Belief-propagation LDPC decoding, TPU-native.

Replaces the reference decode stack (``bp/bp.py``, ``bp/bp_vc.py``,
``bp/bp_cv.py``, ``ofdm/ofdm_functions.py:131-163``) — dense E×E mask
matmuls over the *whole* edge set, an O(B·E³) hand-written backward, and a
per-batch Python loop — with three jit-compiled backends behind one API:

``roll``    for quasi-cyclic codes (802.11n family): message permutations
            are static cyclic rolls per circulant block — **zero gathers**,
            the TPU fast path (see ops/bp_roll.py). Selected automatically
            when the code carries QC structure.
``dense``   for small codes: the variable update is two MXU matmuls with
            0/1 routing constants (TannerGraph.dense_routing); check update
            runs on the padded (n_checks, dc, batch) reshape. O(B·E²) but
            E is tiny (96 for the reference code).
``gather``  the general O(E) edge-slot formulation using row gathers —
            used on CPU and for large non-QC codes. Note: on current TPU
            toolchains, constant-index gathers chained through the decode
            loop crash the XLA fusion pass (tpu_instruction_fusion
            ``main_instruction != nullptr``); on TPU prefer roll/dense.

Iteration control is ``lax.fori_loop`` (or ``lax.while_loop`` with batched
syndrome early exit); gradients come from JAX autodiff through the pure
functional update — no custom VJP needed (the reference required two
hand-written ``autograd.Function`` backwards). Optional per-iteration
weight pytrees turn any backend into a neural-BP decoder (the reference's
trainable-VC construction, ``bp/bp_vc.py:101-107``, in Nachmani-style
per-edge form).

Three check-node methods:

``min-sum``          two-minima rule with optional normalization ``alpha``
                     and offset ``beta`` — the throughput kernel.
``sum-product``      numerically stable log-domain sum-product.
``sum-product-ref``  arithmetic replica of the reference decoder: tanh of
                     half-messages, exclusive products, product clamp at
                     ±(1−1e−7) (``bp/bp_cv.py:44-50``), per-iteration
                     message clamp (``bp/bp.py:47``). Used for BER-parity
                     regression against the reference curves.

LLR sign convention: the public API takes channel LLRs as
``log(Pr(bit=1)/Pr(bit=0))`` — the reference's convention
(``ofdm/ofdm_functions.py:70-74``); internally messages use the standard
``log(Pr0/Pr1)`` (the reference does the same negation at ``bp/bp.py:47``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.codes.library import LdpcCode
from ldpc_sims_tpu.codes.tanner import TannerGraph

__all__ = [
    "bp_decode",
    "decode_to_bits",
    "syndrome",
    "init_neural_bp_weights",
    "init_minsum_weights",
    "freeze_minsum_weights",
]

_BIG = 1e30  # inert magnitude for padding slots
_REF_PROD_EPS = 1e-7  # product clamp of the reference CV (bp/bp_cv.py:44)
_DENSE_MAX_PADDED_EDGES = 1024  # beyond this the E² matmuls stop being free
# factored dense routing (L_exp @ (M_fin @ x + lv) − x): cap on n·Ec
# elements per rectangular routing matrix (256 MB f32) — covers every
# named code and any plausible alist import; beyond it, decode on CPU
# (gather backend)
_FACTORED_MAX_ELEMS = 1 << 26


def _dot_split(A: jnp.ndarray, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """One-hot routing matmul at ~f32 accuracy in two bf16 MXU passes.

    Matmul precision matters here: XLA's DEFAULT f32 dot runs ONE bf16
    MXU pass (~1e-2 relative error on the routed messages — measured,
    and it shifts hard decode bits), while exact HIGHEST costs six
    passes. Because the 0/1 routing matrix is bf16-exact, splitting the
    message operand as ``x = hi + lo`` with ``hi = bf16(x)`` makes each
    single-pass product exact in ``A`` and ``hi``; only ``lo``'s own
    bf16 rounding survives, leaving ~2^-18 relative error — below
    HIGH's three-pass error at two thirds of its cost. This is the
    throughput lever of the factored large-code TPU path.
    """
    hi = x.astype(jnp.bfloat16).astype(dtype)
    lo = x - hi
    return (
        jnp.dot(A, hi, preferred_element_type=dtype)
        + jnp.dot(A, lo, preferred_element_type=dtype)
    )


def _take0(flat: jnp.ndarray, idx: np.ndarray, fill: float) -> jnp.ndarray:
    """Row gather along axis 0 with out-of-range → fill."""
    return jnp.take(flat, idx, axis=0, mode="fill", fill_value=fill)


def _exclusive_prod(t: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exclusive product along a small axis via prefix×suffix cumprods.

    Matches the masked-product semantics of the reference CV layer
    (``bp/bp_cv.py:29-42``) without ever dividing (stable at zeros).
    """
    ones = jnp.ones_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis))
    left = jnp.cumprod(t, axis=axis)
    left = jnp.concatenate(
        [ones, jax.lax.slice_in_dim(left, 0, t.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    rev = jnp.flip(t, axis=axis)
    right = jnp.flip(jnp.cumprod(rev, axis=axis), axis=axis)
    right = jnp.concatenate(
        [jax.lax.slice_in_dim(right, 1, t.shape[axis], axis=axis), ones],
        axis=axis,
    )
    return left * right


def _exclusive_sum(t: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exclusive sum along a small axis (prefix+suffix, no cancellation)."""
    zeros = jnp.zeros_like(jax.lax.slice_in_dim(t, 0, 1, axis=axis))
    left = jnp.cumsum(t, axis=axis)
    left = jnp.concatenate(
        [zeros, jax.lax.slice_in_dim(left, 0, t.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    rev = jnp.flip(t, axis=axis)
    right = jnp.flip(jnp.cumsum(rev, axis=axis), axis=axis)
    right = jnp.concatenate(
        [jax.lax.slice_in_dim(right, 1, t.shape[axis], axis=axis), zeros],
        axis=axis,
    )
    return left + right


def _signs(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x < 0, -1.0, 1.0).astype(x.dtype)


def _exclusive_sign(v2c: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Exclusive product of message signs, as a parity of negative counts.

    prod(±1) == 1 − 2·(#negatives mod 2), so the multiplicative reduce
    becomes an additive one — cheaper on the VPU, and it sidesteps a TPU
    compiler crash (SIGSEGV in tpu_compile_helper) observed when a sign
    `prod` reduction fuses with the edge gathers inside the decode loop.
    Padding slots arrive as +_BIG → count as positive, contributing the
    multiplicative identity.
    """
    neg = (v2c < 0).astype(v2c.dtype)
    ex = jnp.sum(neg, axis=axis, keepdims=True) - neg
    return 1.0 - 2.0 * (ex % 2.0)


def _static_eq(v, const: float) -> bool:
    """True iff ``v`` is a Python scalar equal to ``const`` (traced
    per-iteration α/β always emit the op)."""
    return isinstance(v, (int, float)) and float(v) == const


def _check_update_minsum(v2c: jnp.ndarray, alpha, beta) -> jnp.ndarray:
    """Two-minima min-sum check update over the dc axis (axis 1).

    Padding slots arrive as +_BIG (sign +1, magnitude never the minimum).
    ``alpha``/``beta`` are Python floats or traced scalars (the
    weighted-min-sum path, ``init_minsum_weights``).
    """
    a = jnp.abs(v2c)
    min1 = jnp.min(a, axis=1, keepdims=True)
    idx = jnp.argmin(a, axis=1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, v2c.shape, 1) == idx[:, None, :]
    )
    min2 = jnp.min(jnp.where(onehot, _BIG, a), axis=1, keepdims=True)
    exmin = jnp.where(onehot, min2, min1)
    exsign = _exclusive_sign(v2c, axis=1)
    mag = exmin if _static_eq(beta, 0.0) else jnp.maximum(exmin - beta, 0.0)
    out = exsign * mag
    return out if _static_eq(alpha, 1.0) else out * alpha


def _check_update_sumproduct(v2c: jnp.ndarray) -> jnp.ndarray:
    """Stable log-domain sum-product check update (dc axis = 1).

    Both poles are handled with exact ``expm1`` identities — naive
    ``1 − exp(·)`` guards like ``min(p, 1 − 1e-12)`` are no-ops in f32
    (1 − 1e-12 rounds to 1.0) and produced Inf→NaN cascades after ~8
    saturated iterations on TPU, whose faster-saturating transcendental
    approximations reach exp(s) == 1.0 sooner than CPU's:

    * log tanh(a/2) = log(−expm1(−a)) − log1p(exp(−a)), with a floored
      at 1e-12 (⇒ lt ≥ −28.3, finite);
    * 2·atanh(e^s) = log1p(e^s) − log(−expm1(s)), with s capped at
      −1e-12 (⇒ magnitude ≤ 28.3 — the same cap the product-form
      reference clamp ±(1−1e-7) implies).
    """
    a = jnp.maximum(jnp.abs(v2c), 1e-12)
    lt = jnp.log(-jnp.expm1(-a)) - jnp.log1p(jnp.exp(-a))
    s = jnp.minimum(_exclusive_sum(lt, axis=1), -1e-12)
    mag = jnp.log1p(jnp.exp(s)) - jnp.log(-jnp.expm1(s))
    return _exclusive_sign(v2c, axis=1) * mag


def _check_update_ref(v2c: jnp.ndarray, c_mask_b: jnp.ndarray) -> jnp.ndarray:
    """Reference-arithmetic sum-product check update.

    Replicates ``bp/bp_cv.py:22-50``: tanh is applied to *half* messages
    upstream (here: tanh(v2c/2)), padding slots contribute the
    multiplicative identity (the reference's ``inverse_mask``), the product
    is clamped to ±(1−1e−7), and the output is log((1+p)/(1−p)).
    """
    t = jnp.tanh(v2c * 0.5)
    t = jnp.where(c_mask_b, t, 1.0)
    p = _exclusive_prod(t, axis=1)
    p = jnp.clip(p, -(1.0 - _REF_PROD_EPS), 1.0 - _REF_PROD_EPS)
    return jnp.log((1.0 + p) / (1.0 - p))


def _quantize_messages(x: jnp.ndarray, bits: int, clip: float) -> jnp.ndarray:
    """Uniform symmetric message quantizer (decoder-side study).

    2^bits levels over ±clip, same step rule as the reference ADC quantizer
    (``ofdm/ofdm_functions.py:37-51``) applied to BP messages — the
    "quantized min-sum decoder" benchmark config.
    """
    levels = 2**bits
    step = 2.0 * clip / (levels - 1)
    q = jnp.round(x / step) * step
    return jnp.clip(q, -clip, clip)


def init_neural_bp_weights(
    graph: TannerGraph | LdpcCode,
    iterations: int,
    flavor: str = "edge",
    dtype=jnp.float32,
) -> dict[str, jnp.ndarray]:
    """All-ones neural-BP weight pytree (= classic BP).

    ``flavor='edge'`` (default) — Nachmani-style: one weight per
    (iteration, edge) on the c2v message entering the variable update,
    stored in variable-space ``(n_vars, dv)`` slots, plus
    per-(iteration, variable) LLR weights. Supported by every backend.

    ``flavor='pair'`` — the reference's *full* trainable capacity: its VC
    layers carry an E×E masked weight matrix (``bp/bp_vc.py:101-107``),
    i.e. an independent weight for every (outgoing edge, incoming edge)
    pair sharing a variable. Here that is the compact equivalent
    ``w_pair`` of shape (iterations, n_vars, dv, dv) — entry
    [t, v, j, i] scales incoming slot i's message inside outgoing slot
    j's exclusive sum (the j==i diagonal is structurally ignored, like
    the reference's mask zeros). Gather backend only.

    The layout is backend-independent (variable slots are check-sorted in
    every backend).
    """
    if isinstance(graph, LdpcCode):
        graph = graph.graph
    it = iterations
    w = {
        "w_llr": jnp.ones((it, graph.n_vars), dtype=dtype),
        "w_msg_final": jnp.ones((graph.n_vars, graph.dv), dtype=dtype),
        "w_llr_final": jnp.ones((graph.n_vars,), dtype=dtype),
    }
    if flavor == "pair":
        w["w_pair"] = jnp.ones(
            (it, graph.n_vars, graph.dv, graph.dv), dtype=dtype
        )
        w["w_msg"] = jnp.ones((it, graph.n_vars, graph.dv), dtype=dtype)
    elif flavor == "edge":
        w["w_msg"] = jnp.ones((it, graph.n_vars, graph.dv), dtype=dtype)
    else:
        raise ValueError(f"unknown flavor {flavor!r}")
    return w


def init_minsum_weights(iterations: int, dtype=jnp.float32) -> dict:
    """Identity weighted-min-sum parameter pytree: per-iteration
    normalization ``ms_alpha`` (init 1 = plain min-sum) and offset
    ``ms_beta`` (init 0).

    The cheapest trainable-decoder family (normalized/offset min-sum,
    Nachmani-style learning restricted to two scalars per iteration):
    pass as ``weights=`` to :func:`bp_decode` and differentiate through
    the unrolled decode (roll/dense/gather backends), then
    :func:`freeze_minsum_weights` the trained schedule into static
    tuples that run on the Pallas fast path at zero throughput cost
    (two VPU scalar ops per iteration). Composable with the per-edge
    neural-BP keys (:func:`init_neural_bp_weights`) in one dict.
    """
    return {
        "ms_alpha": jnp.ones((iterations,), dtype=dtype),
        "ms_beta": jnp.zeros((iterations,), dtype=dtype),
    }


def freeze_minsum_weights(weights: dict) -> tuple[tuple, tuple]:
    """Trained ms pytree → static ``(alpha, beta)`` tuples for
    ``bp_decode(alpha=..., beta=...)`` (Pallas-kernel-compatible)."""
    import numpy as _np

    return (
        tuple(float(x) for x in _np.asarray(weights["ms_alpha"])),
        tuple(float(x) for x in _np.asarray(weights["ms_beta"])),
    )


def _edge_flavor(weights) -> bool:
    """True iff ``weights`` is exactly the edge-flavor neural-BP pytree
    (the kind the Pallas kernel can take as VMEM weight tables)."""
    return (
        isinstance(weights, dict)
        and {"w_msg", "w_llr", "w_msg_final", "w_llr_final"}
        <= set(weights)
        and not ({"w_pair", "ms_alpha", "ms_beta", "alpha", "beta"}
                 & set(weights))
    )


def _pallas_eligible(
    method: str,
    early_stop: bool,
    msg_qbits: int | None,
    weights,
    output: str,
    auto: bool = False,
) -> bool:
    """Whether the VMEM-resident Pallas kernel can serve this decode.

    The kernel covers min-sum / sum-product with clamp, per-codeword
    early stop, message quantization, bf16 storage, and — for inference
    — edge-flavor neural-BP weight pytrees (packed into ~1 MB of VMEM
    weight tables; flooding or layered schedule, no early stop). Traced
    ms pytrees and pair-flavor weights stay on the roll/gather backends.
    Auto-selection additionally requires a hard-decision output (the
    kernel carries no gradient; hard bits carry none anyway) and a real
    TPU default backend — explicit ``backend='pallas'`` also accepts
    posterior/soft outputs for inference sweeps.
    """
    if method not in ("min-sum", "sum-product"):
        return False
    if weights is not None and not (
        _edge_flavor(weights) and not early_stop
    ):
        return False
    if output == "hard_iters" and not early_stop:
        return False
    allowed = (
        ("hard", "hard_iters")
        if auto
        else ("hard", "hard_iters", "posterior", "soft")
    )
    if output not in allowed:
        return False
    if auto:
        try:
            if jax.default_backend() not in ("tpu", "axon"):
                return False
        except Exception:
            return False
    return True


def bp_decode(
    llr: jnp.ndarray,
    code: LdpcCode | TannerGraph,
    *,
    iterations: int = 20,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    early_stop: bool = False,
    es_mode: str = "freeze",
    es_check_every: int = 1,
    es_probe_iters: int = 4,
    es_probe_alpha=None,
    es_probe_beta=None,
    msg_qbits: int | None = None,
    msg_qclip: float = 20.0,
    weights: dict[str, Any] | None = None,
    output: str = "hard",
    backend: str = "auto",
    schedule: str = "flooding",
    layered_group: int = 1,
    tile: int | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray | tuple:
    """Decode a batch of codewords with iterative BP.

    Args:
      llr: (batch, n_vars) channel LLRs, convention log(Pr1/Pr0).
      code: an :class:`LdpcCode` (preferred — enables the QC roll backend)
        or a bare :class:`TannerGraph`.
      iterations: BP iterations (fixed trip count unless early_stop).
      method: 'min-sum' | 'sum-product' | 'sum-product-ref'.
      alpha, beta: normalization / offset for min-sum.
      clamp: per-iteration c2v message clamp (the reference uses 20,
        ``bp/bp.py:47`` via ``evaluate_snr.py``); None = no clamp.
      early_stop: per-codeword syndrome termination: each codeword
        freezes (its messages stop updating) at its first
        syndrome-satisfying state; the ``lax.while_loop`` exits once
        every codeword is done. Not combinable with ``weights``.
      es_mode: 'freeze' (default, semantics above) or 'requeue'
        (pallas/QC only): a cheap ``es_probe_iters``-budget probe pass
        decodes everything, then only unconverged codewords — packed
        into dense lane tiles — re-decode with the full budget. At
        operating SNRs this approaches mean-iterations scaling instead
        of per-tile-max scaling (see ``kernels.minsum_qc.bp_qc_requeue``).
      es_check_every: check syndromes every K iterations instead of
        every iteration (pallas backend only; the check costs about one
        iteration of VPU work). Must divide ``iterations``.
      es_probe_iters: probe-pass budget for ``es_mode='requeue'``.
      msg_qbits/msg_qclip: optional uniform quantization of c2v messages
        each iteration (quantized-decoder study).
      weights: optional neural-BP weight pytree from
        :func:`init_neural_bp_weights` (differentiable).
      output: 'hard' → (batch, n) int8 bits; 'soft' → (batch, n) Pr(bit=1)
        on the reference's sigmoid-of-half-LLR scale (``bp/bp.py:36-51``);
        'posterior' → (batch, n) posterior log(Pr1/Pr0); 'hard_iters' →
        (bits, iters) with iters (batch,) int32 per-codeword iteration
        counts (constant ``iterations`` unless ``early_stop``).
      backend: 'auto' | 'pallas' | 'roll' | 'dense' | 'gather' (see module
        docs). 'pallas' is the VMEM-resident QC kernel
        (:mod:`ldpc_sims_tpu.kernels.minsum_qc`); auto picks it on TPU for
        QC codes on the plain inference path (hard output, no weights /
        early-stop / message quantization).
      schedule: 'flooding' (all checks in parallel, the reference's
        schedule) | 'layered' (serial-C row-layered — converges in ~half
        the iterations; QC codes only, roll or pallas backend).
      layered_group: rows per serial group of the layered schedule
        (pallas only): 1 = classic serial-C; mb = arithmetically one
        flooding iteration; intermediate sizes trade convergence speed
        for fewer, larger VPU ops.
      tile: pallas lane-tile override; None = measured per-(code, dtype,
        schedule) default (``kernels.minsum_qc.default_tile``). Ignored
        by non-pallas backends.
    """
    if method not in ("min-sum", "sum-product", "sum-product-ref"):
        raise ValueError(f"unknown method {method!r}")
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if schedule == "layered":
        if not (isinstance(code, LdpcCode) and code.qc is not None):
            raise ValueError(
                "layered schedule requires a quasi-cyclic LdpcCode "
                "(roll or pallas backend)"
            )
        if backend not in ("auto", "roll", "pallas"):
            raise ValueError(
                "layered schedule is QC-only (roll-backend or pallas)"
            )
    if early_stop and weights is not None:
        raise ValueError("early_stop with neural-BP weights is unsupported")
    if es_mode not in ("freeze", "requeue", "probe"):
        hint = (
            " (es_mode='auto' is a sweep-driver dispatch — run_sweep "
            "times fixed vs probe per SNR point; the decoder itself "
            "only takes concrete modes)"
            if es_mode == "auto"
            else ""
        )
        raise ValueError(f"unknown es_mode {es_mode!r}{hint}")
    # per-iteration weighted min-sum: static tuple alpha/beta (inference,
    # every backend incl. pallas) or the differentiable ms_alpha/ms_beta
    # pytree keys (training; roll/dense/gather, unrolled)
    if isinstance(alpha, list):
        alpha = tuple(alpha)
    if isinstance(beta, list):
        beta = tuple(beta)
    ms_w = None
    if weights is not None and (
        "ms_alpha" in weights or "ms_beta" in weights
    ):
        weights = dict(weights)
        it_ = iterations
        ms_w = {
            "alpha": weights.pop("ms_alpha", jnp.ones((it_,))),
            "beta": weights.pop("ms_beta", jnp.zeros((it_,))),
        }
        for nm in ("alpha", "beta"):
            if ms_w[nm].shape != (it_,):
                raise ValueError(
                    f"ms_{nm} must have shape ({it_},) to match "
                    f"iterations={it_}, got {ms_w[nm].shape}"
                )
        if not weights:
            weights = None
        if isinstance(alpha, tuple) or isinstance(beta, tuple):
            raise ValueError(
                "pass tuple alpha/beta OR ms_alpha/ms_beta weights, "
                "not both"
            )
    if (
        isinstance(alpha, tuple) or isinstance(beta, tuple)
        or ms_w is not None
    ) and method != "min-sum":
        raise ValueError("per-iteration alpha/beta require method='min-sum'")
    for v, nm in ((alpha, "alpha"), (beta, "beta")):
        if isinstance(v, tuple) and len(v) != iterations:
            raise ValueError(
                f"per-iteration {nm} needs length {iterations}, "
                f"got {len(v)}"
            )
    if weights is not None and "w_pair" in weights and backend != "gather":
        if backend != "auto":
            raise ValueError("pair-flavor weights need backend='gather'")
        backend = "gather"

    qc = code.qc if isinstance(code, LdpcCode) else None
    g = code.graph if isinstance(code, LdpcCode) else code

    # features only the pallas kernel implements: auto-select it for
    # them on any platform (interpret mode serves CPU), not just on TPU
    needs_pallas = layered_group != 1 or (
        early_stop and (es_mode != "freeze" or es_check_every != 1)
    )
    # traced ms weights can't bake into the (static-arg) pallas kernel
    # (static tuples can); edge-flavor weight pytrees ride along as VMEM
    # operands under both the flooding and the layered schedule
    w_elig = ms_w if ms_w is not None else weights
    if backend == "auto":
        if qc is not None and (
            needs_pallas
            and _pallas_eligible(method, early_stop, msg_qbits, w_elig,
                                 output)
            or _pallas_eligible(method, early_stop, msg_qbits, w_elig,
                                output, auto=True)
        ):
            backend = "pallas"
        elif qc is not None:
            backend = "roll"
        elif g.n_checks * g.dc <= _DENSE_MAX_PADDED_EDGES:
            backend = "dense"
        else:
            # large non-QC codes: the gather backend crashes the XLA
            # TPU fusion pass (module docs), so on TPU route through
            # the factored dense path (rectangular MXU matmuls)
            try:
                on_tpu = jax.default_backend() in ("tpu", "axon")
            except Exception:
                on_tpu = False
            if (
                on_tpu
                and g.n_vars * g.n_checks * g.dc <= _FACTORED_MAX_ELEMS
            ):
                backend = "dense"
            else:
                backend = "gather"
    if layered_group != 1 and backend != "pallas":
        raise ValueError("layered_group is pallas-only; pass backend='pallas'")
    if early_stop and (es_mode != "freeze" or es_check_every != 1):
        if backend != "pallas":
            raise ValueError(
                "es_mode='requeue' / es_check_every>1 are pallas-only "
                f"(resolved backend: {backend!r}); pass backend='pallas' "
                "(interpret mode runs it off-TPU)"
            )
        if es_mode in ("requeue", "probe") and output not in (
            "hard", "hard_iters"
        ):
            raise ValueError(
                f"es_mode={es_mode!r} supports output='hard'/'hard_iters'"
                " only"
            )
        if es_mode == "probe" and es_check_every != 1:
            # probe mode has no in-kernel syndrome sweeps at all (one
            # batched MXU syndrome between the passes) — a configured
            # check stride would be silently inert
            raise ValueError(
                "es_check_every has no effect under es_mode='probe' "
                "(syndromes are checked once, outside the kernel); "
                "leave it at 1"
            )
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8) and backend != "pallas":
        raise ValueError(
            "int8 message storage is a Pallas-kernel feature (messages "
            "live on a 255-level grid over ±msg_qclip in VMEM); pass "
            "backend='pallas'"
        )
    if backend == "pallas":
        if qc is None:
            raise ValueError("pallas backend requires a quasi-cyclic LdpcCode")
        if not _pallas_eligible(method, early_stop, msg_qbits, w_elig,
                                output):
            raise ValueError(
                "pallas backend supports method in (min-sum, sum-product), "
                "weights either edge-flavor pytrees (without early stop) "
                "or frozen static tuple alpha/beta "
                "(freeze_minsum_weights), output in (hard, hard_iters, "
                "posterior, soft)"
            )
        from ldpc_sims_tpu.kernels.minsum_qc import (
            bp_qc_pallas,
            bp_qc_probe_requeue,
            bp_qc_requeue,
            default_tile,
        )

        B = llr.shape[0]
        if tile is None:
            tile = default_tile(qc, dtype, schedule)
        pad = (-B) % tile
        if pad:
            # padding lanes carry zero LLRs → posterior 0 → hard bits 0
            # (all-zero codeword): syndrome-satisfied at entry, so they
            # are inert under early stop and stripped before return
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, llr.shape[1]), llr.dtype)], axis=0
            )
        interp = jax.default_backend() not in ("tpu", "axon")
        kw = dict(
            iterations=iterations, method=method, alpha=alpha,
            beta=beta, clamp=clamp, msg_qbits=msg_qbits,
            msg_qclip=msg_qclip, schedule=schedule,
            layered_group=layered_group, tile=tile,
            output="posterior" if output in ("posterior", "soft") else output,
            dtype=dtype,
            # off-TPU (tests, CPU meshes) the kernel runs in interpret mode
            interpret=interp,
        )
        if early_stop and es_mode == "probe":
            # weights is always None here (early_stop excludes it above)
            out = bp_qc_probe_requeue(
                llr, qc, probe_iters=es_probe_iters,
                probe_alpha=es_probe_alpha, probe_beta=es_probe_beta,
                **kw,
            )
        elif early_stop and es_mode == "requeue":
            # weights is always None here (early_stop excludes it above)
            out = bp_qc_requeue(
                llr, qc, probe_iters=es_probe_iters,
                es_check_every=es_check_every, **kw,
            )
        else:
            out = bp_qc_pallas(
                llr, qc, early_stop=early_stop, weights=weights,
                es_check_every=es_check_every if early_stop else 1, **kw,
            )
        if output == "hard_iters":
            bits, iters = out
            return (bits[:B], iters[:B]) if pad else (bits, iters)
        if pad:
            out = out[:B]
        if output == "soft":
            # reference scale: sigmoid of half the (negated) posterior
            return jax.nn.sigmoid(jnp.asarray(0.5, out.dtype) * out)
        return out
    if backend == "roll":
        if qc is None:
            raise ValueError("roll backend requires a quasi-cyclic LdpcCode")
        from ldpc_sims_tpu.ops.bp_roll import decode_roll

        return decode_roll(
            llr,
            qc,
            iterations=iterations,
            method=method,
            alpha=alpha,
            beta=beta,
            clamp=clamp,
            early_stop=early_stop,
            msg_qbits=msg_qbits,
            msg_qclip=msg_qclip,
            weights=weights,
            ms_weights=ms_w,
            output=output,
            schedule=schedule,
            dtype=dtype,
        )
    if backend not in ("dense", "gather"):
        raise ValueError(f"unknown backend {backend!r}")

    n, m, dc, dv = g.n_vars, g.n_checks, g.dc, g.dv
    B = llr.shape[0]
    Ec = m * dc
    Lv = (-llr.T).astype(dtype)  # (n, B), internal log(Pr0/Pr1)
    c2v0 = jnp.zeros((m, dc, B), dtype=dtype)
    c_mask_b = jnp.asarray(g.c_mask)[:, :, None]
    ref_mode = method == "sum-product-ref"

    if weights is not None:
        weights = jax.tree.map(lambda x: jnp.asarray(x, dtype), weights)

    if backend == "dense":
        # small codes: one Ec×Ec matmul (W_v). Large codes: the exact
        # factorization W_v = L_exp @ M_fin − I on valid slots — two
        # rectangular one-hot matmuls, O(n·Ec) constants instead of
        # O(Ec²); the TPU path for arbitrary alist/PEG codes.
        factored = Ec > _DENSE_MAX_PADDED_EDGES
        if factored and n * Ec > _FACTORED_MAX_ELEMS:
            raise ValueError(
                f"code too large for factored dense routing "
                f"(n·Ec = {n * Ec} > {_FACTORED_MAX_ELEMS}); decode on "
                "CPU with backend='gather'"
            )
        routing = g.factored_routing if factored else g.dense_routing
        W_v = None if factored else jnp.asarray(routing["W_v"], dtype)
        L_exp = jnp.asarray(routing["L_exp"], dtype)
        M_fin = jnp.asarray(routing["M_fin"], dtype)
        # variable-space weight slots → check-space edge order (one static
        # gather per weight tensor, outside the decode loop)
        vslot_of_cslot = np.minimum(g.to_check_space, n * dv - 1)
        cs_valid = jnp.asarray(
            (g.to_check_space < n * dv).astype(np.float32)
        )

        def w_to_cs(w_msg: jnp.ndarray) -> jnp.ndarray:
            flat = w_msg.reshape(*w_msg.shape[:-2], n * dv)
            return (
                jnp.take(flat, jnp.asarray(vslot_of_cslot), axis=-1)
                * cs_valid
            )

        w_msg_cs = w_to_cs(weights["w_msg"]) if weights is not None else None
        w_fin_cs = (
            w_to_cs(weights["w_msg_final"]) if weights is not None else None
        )

        def var_to_check(c2v: jnp.ndarray, it) -> jnp.ndarray:
            x = c2v.reshape(m * dc, B)
            if weights is not None:
                x = w_msg_cs[it][:, None] * x
                lv = weights["w_llr"][it][:, None] * Lv
            else:
                lv = Lv
            if factored:
                tot = _dot_split(M_fin, x, dtype) + lv
                v2c = (_dot_split(L_exp, tot, dtype) - x).reshape(
                    m, dc, B
                )
            else:
                v2c = (
                    jnp.dot(W_v, x, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
                    + jnp.dot(L_exp, lv, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
                ).reshape(m, dc, B)
            return jnp.where(c_mask_b, v2c, _BIG)

        def posterior(c2v: jnp.ndarray) -> jnp.ndarray:
            x = c2v.reshape(m * dc, B)
            if weights is not None:
                x = w_fin_cs[:, None] * x
                lv = weights["w_llr_final"][:, None] * Lv
            else:
                lv = Lv
            return lv + jnp.dot(M_fin, x, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)

    else:  # gather backend
        to_var = jnp.asarray(g.to_var_space)
        to_check = jnp.asarray(g.to_check_space)
        v_mask_b = jnp.asarray(g.v_mask)[:, :, None]

        def gather_to_var(c2v: jnp.ndarray) -> jnp.ndarray:
            vm = _take0(c2v.reshape(m * dc, B), to_var, 0.0)
            return vm.reshape(n, dv, B)

        offdiag = jnp.asarray(
            1.0 - np.eye(dv, dtype=np.float32)
        )  # pair weights: j==i structurally excluded (the ref's mask)

        def var_to_check(c2v: jnp.ndarray, it) -> jnp.ndarray:
            vm = gather_to_var(c2v)
            if weights is not None:
                vm = vm * weights["w_msg"][it][:, :, None]
                lv = weights["w_llr"][it][:, None] * Lv
            else:
                lv = Lv
            if weights is not None and "w_pair" in weights:
                # full per-(out-edge, in-edge) capacity of the reference
                # VC layers (bp/bp_vc.py:16-32): exclusive weighted mix
                wp = weights["w_pair"][it] * offdiag  # (n, dv, dv)
                vm_m = jnp.where(v_mask_b, vm, 0.0)
                ex = jnp.einsum("vji,vib->vjb", wp, vm_m)
                v2c_v = lv[:, None, :] + ex
            elif ref_mode:
                # exact exclusive sum (matches the reference's masked
                # matmul accumulation up to float reassociation)
                ex = _exclusive_sum(jnp.where(v_mask_b, vm, 0.0), axis=1)
                v2c_v = lv[:, None, :] + ex
            else:
                total = lv + jnp.sum(jnp.where(v_mask_b, vm, 0.0), axis=1)
                v2c_v = total[:, None, :] - vm
            return _take0(
                v2c_v.reshape(n * dv, B), to_check, _BIG
            ).reshape(m, dc, B)

        def posterior(c2v: jnp.ndarray) -> jnp.ndarray:
            vm = gather_to_var(c2v)
            if weights is not None:
                vm = vm * weights["w_msg_final"][:, :, None]
                lv = weights["w_llr_final"][:, None] * Lv
            else:
                lv = Lv
            return lv + jnp.sum(jnp.where(v_mask_b, vm, 0.0), axis=1)

    # per-iteration α/β views (traced ms pytree or static tuples)
    ms_a = ms_b = None
    if ms_w is not None:
        ms_a = jnp.asarray(ms_w["alpha"], dtype)
        ms_b = jnp.asarray(ms_w["beta"], dtype)
    else:
        if isinstance(alpha, tuple):
            ms_a = jnp.asarray(alpha, dtype)
        if isinstance(beta, tuple):
            ms_b = jnp.asarray(beta, dtype)

    def ab_at(it):
        a = alpha if ms_a is None else ms_a[it]
        b = beta if ms_b is None else ms_b[it]
        return a, b

    def check_update(v2c: jnp.ndarray, it=0) -> jnp.ndarray:
        if method == "min-sum":
            c2v = _check_update_minsum(v2c, *ab_at(it))
        elif method == "sum-product":
            c2v = _check_update_sumproduct(v2c)
        else:
            c2v = _check_update_ref(v2c, c_mask_b)
        if clamp is not None:
            c2v = jnp.clip(c2v, -clamp, clamp)
        if msg_qbits is not None:
            c2v = _quantize_messages(c2v, msg_qbits, msg_qclip)
        return c2v

    def one_iteration(it, c2v):
        return check_update(var_to_check(c2v, it), it)

    def hard(c2v: jnp.ndarray) -> jnp.ndarray:
        return (posterior(c2v) < 0).astype(jnp.int8)  # (n, B)

    if early_stop:
        if backend == "dense":
            # gather-free syndrome: int8 matmul against H (MXU)
            H_dense = np.zeros((m, n), dtype=np.int8)
            H_dense[g.edge_check, g.edge_var] = 1
            Hj = jnp.asarray(H_dense)

            def lanes_satisfied(c2v):
                bits = hard(c2v).astype(jnp.int8)  # (n, B)
                s = jax.lax.dot_general(
                    Hj, bits,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) & 1
                return jnp.all(s == 0, axis=0)  # (B,)

        else:

            def lanes_satisfied(c2v):
                bits = hard(c2v).astype(jnp.int32)  # (n, B)
                s = syndrome_from_bits_nb(bits, g)
                return jnp.all(s == 0, axis=0)  # (B,)

        # per-codeword termination (same semantics as roll/pallas): a
        # lane freezes at its first syndrome-satisfying state, the loop
        # exits when every lane is done; iters[b] = iterations lane b ran
        done0 = lanes_satisfied(c2v0)
        iters0 = jnp.where(done0, 0, iterations).astype(jnp.int32)

        def cond(state):
            it, _, done, _ = state
            return jnp.logical_and(
                it < iterations, jnp.logical_not(jnp.all(done))
            )

        def body(state):
            it, c2v, done, iters = state
            new = one_iteration(it, c2v)
            c2v = jnp.where(done[None, None, :], c2v, new)
            newly = jnp.logical_and(
                lanes_satisfied(c2v), jnp.logical_not(done)
            )
            iters = jnp.where(newly, it + 1, iters)
            return it + 1, c2v, jnp.logical_or(done, newly), iters

        _, c2v, _, iters_run = jax.lax.while_loop(
            cond, body, (jnp.int32(0), c2v0, done0, iters0)
        )
    else:
        if weights is not None or ms_w is not None:
            # static per-iteration weight indices (plain Python loop —
            # `iterations` is static and small; unrolled so reverse-mode
            # autodiff reaches the per-iteration parameters)
            c2v = c2v0
            for it in range(iterations):
                c2v = one_iteration(it, c2v)
        else:
            c2v = jax.lax.fori_loop(
                0, iterations, lambda i, x: one_iteration(i, x), c2v0
            )
        iters_run = jnp.full((B,), iterations, jnp.int32)

    if output == "posterior":
        return (-posterior(c2v)).T  # back to log(Pr1/Pr0), (B, n)
    if output == "soft":
        # reference output scale: 1 − sigmoid(half posterior) (bp/bp.py:51)
        return jax.nn.sigmoid(-0.5 * posterior(c2v)).T
    bits = hard(c2v).T  # (B, n)
    if output == "hard_iters":
        return bits, iters_run
    return bits


def syndrome_from_bits_nb(bits_nb: jnp.ndarray, g: TannerGraph) -> jnp.ndarray:
    """Syndrome from bits in (n, B) layout → (m, B) parity of each check.

    Gather-only (no scatters): replicate each variable's bit across its dv
    slots, then pull into check space with the static slot map.
    """
    B = bits_nb.shape[-1]
    bits_vslots = jnp.repeat(bits_nb, g.dv, axis=0)  # (n*dv, B) vslot-major
    cs = jnp.take(
        bits_vslots, jnp.asarray(g.to_check_space), axis=0,
        mode="fill", fill_value=0,
    )
    return jnp.sum(cs.reshape(g.n_checks, g.dc, B), axis=1) & 1


def syndrome(bits: jnp.ndarray, H: np.ndarray) -> jnp.ndarray:
    """(B, n) hard bits → (B, m) syndrome via int8 matmul (MXU) & 1."""
    Ht = jnp.asarray(H.T, dtype=jnp.int8)
    s = jax.lax.dot_general(
        bits.astype(jnp.int8),
        Ht,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return s & 1


def decode_to_bits(
    llrs: jnp.ndarray,
    code: LdpcCode | TannerGraph,
    bp_iterations: int,
    clamp_value: float = 20.0,
    method: str = "sum-product-ref",
) -> jnp.ndarray:
    """API mirror of the reference's ``decode_bits``
    (``ofdm/ofdm_functions.py:131-163``) minus its batch Python loop and
    per-call model rebuild: one jitted call decodes the whole batch.
    """
    return bp_decode(
        llrs,
        code,
        iterations=bp_iterations,
        method=method,
        clamp=clamp_value,
        output="hard",
    )
