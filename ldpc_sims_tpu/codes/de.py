"""Protograph density evolution: asymptotic thresholds for every code.

The reference validates decoding against ONE stored curve for its one
(64,32) code (``outputs/ber/…_quantized.pkl``); the large codes this
framework adds (802.11n 648/1296/1944, the high-rate QC constructions)
have no external anchor at all — their BER curves were, until round 5,
validated only by self-consistency (paired controls, monotonicity),
which cannot catch a silently-wrong base matrix or LLR scaling: both
curves would shift together. Density evolution is the missing external
check: the decoding threshold of the (infinite-length) protograph
ensemble depends ONLY on the base-matrix structure and the check rule,
and a finite-length waterfall must sit a small, predictable gap above
it. A committed curve whose waterfall lands below threshold (impossible)
or far above it (broken construction / scaling) is wrong.

Method: **sampled (Monte-Carlo) density evolution on the protograph**.
Each base-matrix edge (i, j) is an edge *type*; message distributions
are represented by sample populations of size ``samples``. One DE
iteration (all-zero codeword, BPSK over AWGN, ``snr = 1/sigma^2`` —
exactly the convention of the floor campaign and bench guards):

* channel LLRs for variable type j drawn fresh: N(2/sigma^2, 4/sigma^2)
  (internal log(Pr0/Pr1) convention — positive = correct);
* v2c populations: exclusive column sums with each producer population
  randomly permuted (independence across types is restored by
  re-shuffling at every use — standard sampled-DE practice);
* c2v populations: the exact exclusive check rule over the row — the
  SAME ``_minsum_excl`` / ``_sumproduct_excl`` kernels the decoder
  uses (ops/bp_roll.py), so the threshold is of *this* implementation,
  clamps, alpha/beta and all, not of a textbook idealization.

Unlike Gaussian-approximation/EXIT shortcuts, sampled DE handles
min-sum (and offset/normalized variants) with no extra modeling.

``de_threshold`` bisects SNR to the smallest value whose final error
probability falls below ``eps`` (resolution limited by the population
size; with 2^14 samples the practical floor is ~1e-4, plenty to locate
a waterfall to ±0.05 dB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_sims_tpu.ops.bp_roll import _minsum_excl, _sumproduct_excl

__all__ = ["protograph_de_error", "de_threshold"]


def _plan(base: np.ndarray):
    """Edge types + per-row / per-column groupings of a base matrix."""
    base = np.asarray(base)
    planes = [
        (i, j)
        for i in range(base.shape[0])
        for j in range(base.shape[1])
        if base[i, j] >= 0
    ]
    rows: list[list[int]] = [[] for _ in range(base.shape[0])]
    cols: list[list[int]] = [[] for _ in range(base.shape[1])]
    for p, (i, j) in enumerate(planes):
        rows[i].append(p)
        cols[j].append(p)
    return planes, rows, cols


@functools.partial(
    jax.jit,
    static_argnames=("base_key", "method", "alpha", "beta", "clamp",
                     "iterations", "samples"),
)
def _de_run(snr_db, base_key, method, alpha, beta, clamp, iterations,
            samples, seed):
    base = np.asarray(base_key, dtype=np.int64)
    planes, rows, cols = _plan(base)
    P = len(planes)
    nb = base.shape[1]
    snr = 10.0 ** (snr_db / 10.0)
    sigma2 = 1.0 / snr

    def chan(key):
        # internal log(Pr0/Pr1) channel LLR of the all-zero codeword:
        # mean 2/sigma^2, variance 4/sigma^2 (positive = correct)
        return (
            2.0 / sigma2
            + 2.0 / jnp.sqrt(sigma2)
            * jax.random.normal(key, (nb, samples))
        )

    def shuffle(key, x):
        return jax.random.permutation(key, x, axis=-1, independent=False)

    def one_iter(it, carry):
        c2v, key = carry
        key, kl, kc, kv = jax.random.split(key, 4)
        L = chan(kl)
        # variable side: exclusive column sums over freshly-shuffled
        # producer populations (one shuffle per producer per iteration;
        # cross-type correlation is destroyed again at the check side)
        kcs = jax.random.split(kc, P)
        shuf = [shuffle(kcs[p], c2v[p]) for p in range(P)]
        v2c = [None] * P
        for j, ps in enumerate(cols):
            tot = L[j] + sum(shuf[p] for p in ps)
            for p in ps:
                v2c[p] = tot - shuf[p]
        # check side: the decoder's own exclusive rules over the row
        kvs = jax.random.split(kv, P)
        v2c = [shuffle(kvs[p], v2c[p]) for p in range(P)]
        new = [None] * P
        for i, ps in enumerate(rows):
            x = jnp.stack([v2c[p] for p in ps])  # (d, samples)
            if method == "min-sum":
                y = _minsum_excl(x[:, None, :], alpha, beta)[:, 0, :]
            else:
                y = _sumproduct_excl(x[:, None, :])[:, 0, :]
            if clamp is not None:
                y = jnp.clip(y, -clamp, clamp)
            for k, p in enumerate(ps):
                new[p] = y[k]
        return jnp.stack(new), key

    c2v0 = jnp.zeros((P, samples))
    key0 = jax.random.key(seed)
    c2v, key = jax.lax.fori_loop(
        0, iterations, one_iter, (c2v0, key0)
    )
    # posterior error probability per variable type, then mean (each
    # column is one variable of the protograph)
    key, kl, kp = jax.random.split(key, 3)
    L = chan(kl)
    kps = jax.random.split(kp, P)
    err = []
    for j, ps in enumerate(cols):
        post = L[j] + sum(
            shuffle(kps[p], c2v[p]) for p in ps
        )
        err.append(jnp.mean((post < 0).astype(jnp.float32)))
    return jnp.mean(jnp.stack(err))


def protograph_de_error(
    base,
    snr_db: float,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    iterations: int = 200,
    samples: int = 1 << 14,
    seed: int = 0,
) -> float:
    """Asymptotic bit-error probability of the protograph ensemble at
    ``snr_db`` (``snr = 1/sigma^2``, BPSK) after ``iterations`` DE
    iterations. ~0 above threshold, bounded away from 0 below it."""
    if method not in ("min-sum", "sum-product"):
        raise ValueError(f"unknown method {method!r}")
    base = np.asarray(base, dtype=np.int64)
    base_key = tuple(tuple(int(x) for x in row) for row in base)
    return float(
        _de_run(jnp.asarray(snr_db, jnp.float32), base_key, method,
                float(alpha), float(beta), clamp, iterations, samples,
                seed)
    )


def de_threshold(
    base,
    method: str = "min-sum",
    alpha: float = 1.0,
    beta: float = 0.0,
    clamp: float | None = None,
    snr_lo_db: float = -2.0,
    snr_hi_db: float = 6.0,
    tol_db: float = 0.05,
    eps: float = 1e-4,
    iterations: int = 200,
    samples: int = 1 << 14,
    seed: int = 0,
) -> float:
    """Decoding threshold (dB, ``snr = 1/sigma^2``) of the protograph
    ensemble under the given check rule: the smallest SNR whose DE error
    probability falls below ``eps``. Bisection to ``tol_db``.

    Known anchor (test-pinned): the (3,6)-regular ensemble under
    sum-product has sigma* = 0.8797 -> 10*log10(1/sigma*^2) = 1.11 dB.
    """
    kw = dict(method=method, alpha=alpha, beta=beta, clamp=clamp,
              iterations=iterations, samples=samples, seed=seed)
    lo, hi = float(snr_lo_db), float(snr_hi_db)
    if protograph_de_error(base, hi, **kw) > eps:
        raise ValueError(
            f"DE does not converge even at {hi} dB; raise snr_hi_db"
        )
    while hi - lo > tol_db:
        mid = 0.5 * (lo + hi)
        if protograph_de_error(base, mid, **kw) <= eps:
            hi = mid
        else:
            lo = mid
    return hi
