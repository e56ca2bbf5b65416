"""Edge-compiler tests: slot maps vs brute force over H (SURVEY.md §4:
"mask/edge-index construction vs brute force")."""

import numpy as np
import pytest

from ldpc_sims_tpu.codes import TannerGraph, get_code, reference_6432

H_SMALL = np.array(
    [
        [1, 1, 0, 1, 1, 0, 0],
        [0, 1, 1, 1, 0, 1, 0],
        [1, 1, 1, 0, 0, 0, 1],
    ],
    dtype=np.uint8,
)  # the toy matrix from the reference's own __main__ (bp/masking.py:153-155)


@pytest.mark.parametrize(
    "H",
    [H_SMALL, reference_6432().H, get_code("wifi648").H],
    ids=["toy7", "ref6432", "wifi648"],
)
def test_edge_maps_consistent(H):
    g = TannerGraph.from_H(H)
    m, n = H.shape
    assert g.n_edges == int(H.sum())
    # every edge's (check, var) is a 1 in H, check-major sorted
    assert (H[g.edge_check, g.edge_var] == 1).all()
    order = np.lexsort((g.edge_var, g.edge_check))
    np.testing.assert_array_equal(order, np.arange(g.n_edges))
    # slot maps invert each other on valid slots
    valid_v = g.to_var_space < g.n_checks * g.dc
    vs_idx = np.nonzero(valid_v)[0]
    np.testing.assert_array_equal(g.to_check_space[g.to_var_space[vs_idx]], vs_idx)
    # degrees
    np.testing.assert_array_equal(g.c_deg, H.sum(axis=1))
    np.testing.assert_array_equal(g.v_deg, H.sum(axis=0))
    np.testing.assert_array_equal(g.c_mask.sum(axis=1), g.c_deg)
    np.testing.assert_array_equal(g.v_mask.sum(axis=1), g.v_deg)


def test_dense_masks_vs_bruteforce():
    """Reconstruct the reference's routing masks by brute force from H and
    compare (modulo the var-major axis permutation, see
    ``TannerGraph.dense_masks``)."""
    H = H_SMALL
    g = TannerGraph.from_H(H)
    E = g.n_edges
    masks = g.dense_masks()

    # brute force: same-variable (excl self) and same-check (excl self)
    ev, ec = g.edge_var, g.edge_check
    for a in range(E):
        for b in range(E):
            expect_v = float(ev[a] == ev[b] and a != b)
            expect_c = float(ec[a] == ec[b] and a != b)
            assert masks["mask_v"][a, b] == expect_v
            assert masks["mask_c"][a, b] == expect_c
    for v in range(g.n_vars):
        for e in range(E):
            assert masks["mask_v_final"][v, e] == float(ev[e] == v)
            assert masks["llr_expander"][e, v] == float(ev[e] == v)


def test_padding_slots_point_past_end():
    g = TannerGraph.from_H(H_SMALL)
    pad_v = g.to_var_space[~g.v_mask.reshape(-1)]
    assert (pad_v == g.n_checks * g.dc).all()
    pad_c = g.to_check_space[~g.c_mask.reshape(-1)]
    assert (pad_c == g.n_vars * g.dv).all()


def test_explicit_slot_assignment():
    """Hand-checked layout for the toy matrix."""
    g = TannerGraph.from_H(H_SMALL)
    # check 0 covers vars 0,1,3,4 in slots 0..3
    np.testing.assert_array_equal(g.edge_var[:4], [0, 1, 3, 4])
    # var 1 appears in checks 0,1,2 → vslots (1,0),(1,1),(1,2)
    e_var1 = np.nonzero(g.edge_var == 1)[0]
    np.testing.assert_array_equal(g.vslot_of_edge[e_var1] % g.dv, [0, 1, 2])
