#!/usr/bin/env python
"""Density-evolution threshold table + measured-waterfall validation.

For every QC code in the registry this computes the protograph DE
threshold (codes/de.py — sampled DE with the decoder's own exclusive
check rules) at the DECODER-MATCHED iteration budget (20) and at the
asymptotic budget (150), then measures the code's actual BPSK min-sum
flooding-20 waterfall (1e-3 BER crossing, bisected on the available
backend) and records the finite-length gap. Verdict per code:

    consistent  iff  0 < (measured 1e-3 crossing) - th20 < gap_max

where gap_max scales with block length (finite-length penalty ~ 1/sqrt
scaling: ~1.2 dB at n=648, ~0.8 dB at n~2000). A negative gap (beating
DE) is impossible and flags broken measurement; a huge gap flags a
broken construction (bad girth / wrong shifts / LLR scaling) — the
class of bug paired self-consistency checks cannot see (VERDICT r4
missing #4). This doubles as validation of the home-grown high-rate QC
constructions (codes/qc_construct.py).

Run:  python examples/de_thresholds.py            (any backend)
Env:  DE_CODES (comma list; default: all QC registry codes),
      DE_MEASURE=0 (skip the waterfall measurement), DE_SAMPLES,
      DE_BATCH (measurement batch, default 8192).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldpc_sims_tpu.codes import get_code, list_codes  # noqa: E402
from ldpc_sims_tpu.codes.de import de_threshold  # noqa: E402
from ldpc_sims_tpu.ops.bp import bp_decode  # noqa: E402
from ldpc_sims_tpu.utils import enable_compilation_cache  # noqa: E402

SAMPLES = int(os.environ.get("DE_SAMPLES", str(1 << 13)))
BATCH = int(os.environ.get("DE_BATCH", "8192"))
MEASURE = os.environ.get("DE_MEASURE", "1") == "1"
ART_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "artifacts",
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def measured_crossing(code, target=1e-3, lo=0.0, hi=6.0, steps=20):
    """Bisect the BPSK min-sum flooding-20 waterfall's BER crossing."""

    @jax.jit
    def ber_at(key, snr_db):
        snr = 10.0 ** (snr_db / 10.0)
        sigma = jax.lax.rsqrt(snr)
        r = 1.0 + sigma * jax.random.normal(key, (BATCH, code.n))
        llr = -2.0 * r / (sigma * sigma)
        bits = bp_decode(llr, code, iterations=20, method="min-sum")
        return jnp.sum(bits.astype(jnp.int32))

    def ber(snr_db):
        errs, bits = 0, 0
        for i in range(steps):
            k = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(7), int(snr_db * 1000)),
                i,
            )
            errs += int(ber_at(k, jnp.asarray(snr_db, jnp.float32)))
            bits += BATCH * code.n
            if errs > 3000:  # plenty to call a crossing
                break
        return errs / bits

    for _ in range(9):
        mid = 0.5 * (lo + hi)
        if ber(mid) > target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def main():
    log(f"cache: {enable_compilation_cache()}")
    log(f"backend: {jax.default_backend()}")
    names = [
        c for c in (
            os.environ.get("DE_CODES", "").split(",")
            if os.environ.get("DE_CODES")
            else list_codes()
        )
        if c and get_code(c).qc is not None
    ]
    table = {}
    for name in names:
        code = get_code(name)
        base = np.asarray(code.qc.base)
        t0 = time.time()
        th20 = de_threshold(base, method="min-sum", iterations=20,
                            samples=SAMPLES, snr_lo_db=-1.0,
                            snr_hi_db=8.0)
        th_inf = de_threshold(base, method="min-sum", iterations=150,
                              samples=SAMPLES, snr_lo_db=-1.0,
                              snr_hi_db=8.0)
        th_sp = de_threshold(base, method="sum-product", iterations=150,
                             samples=SAMPLES, snr_lo_db=-1.0,
                             snr_hi_db=8.0)
        ent = {
            "n": code.n, "k": code.k, "rate": code.rate,
            "th_minsum_20it_db": round(th20, 3),
            "th_minsum_db": round(th_inf, 3),
            "th_sumproduct_db": round(th_sp, 3),
            "de_wall_s": round(time.time() - t0, 1),
        }
        log(f"{name}: th(ms,20)={th20:.2f} th(ms)={th_inf:.2f} "
            f"th(sp)={th_sp:.2f} dB  [{ent['de_wall_s']}s]")
        if MEASURE:
            cross = measured_crossing(code, lo=max(th20 - 1.0, -1.0),
                                      hi=th20 + 3.0)
            gap = cross - th20
            gap_max = 0.8 if code.n >= 1500 else 1.2
            ent.update(
                measured_1e3_crossing_db=round(cross, 3),
                gap_db=round(gap, 3),
                gap_max_db=gap_max,
                consistent=bool(0.0 < gap < gap_max),
            )
            log(f"{name}: measured 1e-3 crossing {cross:.2f} dB, gap "
                f"{gap:+.2f} dB -> "
                f"{'CONSISTENT' if ent['consistent'] else 'INCONSISTENT'}")
        table[name] = ent

    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(ART_DIR, f"{stamp}_de_thresholds.json")
    with open(path, "w") as f:
        json.dump({
            "what": (
                "protograph DE thresholds (sampled DE, decoder's own "
                "check rules; snr = 1/sigma^2 BPSK units) vs measured "
                "min-sum flooding-20 waterfall crossings"
            ),
            "samples": SAMPLES, "batch": BATCH, "codes": table,
        }, f, indent=1)
    log(f"artifact -> {path}")


if __name__ == "__main__":
    main()
