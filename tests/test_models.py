"""Substitution model tests against the reference's golden fixtures."""

from pathlib import Path

import numpy as np
import pytest

from coati_tpu.models import (
    AmbiguousNucs,
    MarginalSubst,
    ecm_p,
    gtr_q,
    marginal_p,
    mg94_p,
)

DATA = Path(__file__).parent / "data"
PI = (0.308, 0.185, 0.199, 0.308)


def test_mg94_p_golden():
    """61x61 MG94 P at t=0.0133 matches mg94p.tcc element-wise."""
    p = mg94_p(0.0133, 0.2, PI)
    golden = np.load(DATA / "mg94p_golden.npy")
    np.testing.assert_allclose(p, golden, rtol=1e-10, atol=1e-12)


def test_mg94_p_rejects_bad_branch_length():
    with pytest.raises(ValueError):
        mg94_p(0.0, 0.2, PI)
    with pytest.raises(ValueError):
        mg94_p(-0.02, 0.2, PI)


def test_gtr_q_golden():
    """mutation_coati.cc:358-374 fixture."""
    got = gtr_q(PI, (0.009489730, 0.039164824, 0.004318182,
                     0.015438693, 0.038734091, 0.008550000))
    expect = np.array([
        [-0.010879400, 0.001755600, 0.00779380, 0.00133000],
        [0.002922837, -0.017925237, 0.00307230, 0.01193010],
        [0.012062766, 0.002856158, -0.01755232, 0.00263340],
        [0.001330000, 0.007165807, 0.00170145, -0.01019726],
    ])
    np.testing.assert_allclose(got, expect, atol=1e-8)


def test_gtr_q_sigma_range():
    with pytest.raises(ValueError):
        gtr_q(PI, (-0.01, 0.04, 0.004, 0.015, 0.04, 0.009))
    with pytest.raises(ValueError):
        gtr_q(PI, (0.01, 0.04, 0.004, 0.015, 1.04, 0.009))


def test_mg94_p_gtr_rows_sum_to_one():
    p = mg94_p(0.0133, 0.2, PI, (0.0095, 0.039, 0.0043, 0.015, 0.039, 0.0086))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-12)


def test_ecm_p_rows_sum_to_one():
    p = ecm_p(0.0133, 0.2)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-12)
    with pytest.raises(ValueError):
        ecm_p(0.0, 0.2)


def test_ecm_k_bias():
    """mutation_ecm.cc TEST_CASE('k')."""
    from coati_tpu.models import k_bias

    assert k_bias(0, 0, 0) == 1
    assert k_bias(0, 42, 1) == pytest.approx(15.625)
    assert k_bias(32, 29, 1) == 1
    assert k_bias(47, 38, 1) == pytest.approx(2.5)
    assert k_bias(21, 49, 1) == pytest.approx(6.25)
    assert k_bias(32, 29, 2) == pytest.approx(15.625)
    assert k_bias(22, 19, 2) == pytest.approx(6.25)


def test_nts_ntv():
    """mutation_ecm.cc TEST_CASE('nts_ntv')."""
    from coati_tpu.models import nts_ntv

    assert nts_ntv(0, 0) == (0, 0)
    assert nts_ntv(0, 1) == (0, 1)
    assert nts_ntv(39, 57) == (1, 2)
    assert nts_ntv(21, 42) == (0, 3)
    assert nts_ntv(42, 0) == (3, 0)


def test_marginal_p_rows_normalize():
    """mutation_coati.cc:206-222: sum_nuc exp(p)*pi == 1 per (codon, pos)."""
    p = mg94_p(0.0133, 0.2, PI)
    marg = marginal_p(p, PI, AmbiguousNucs.SUM, MarginalSubst.SUM)
    val = (np.exp(marg[:, :4]) * np.asarray(PI)[None, :]).sum(axis=1)
    np.testing.assert_allclose(val, 1.0, atol=1e-7)


def test_marginal_ambiguous_best_vs_sum():
    p = mg94_p(0.0133, 0.2, PI)
    s = marginal_p(p, PI, AmbiguousNucs.SUM, MarginalSubst.SUM)
    b = marginal_p(p, PI, AmbiguousNucs.BEST, MarginalSubst.SUM)
    # BEST takes max over components, SUM logSumExps them: SUM >= BEST
    assert np.all(s[:, 4:] >= b[:, 4:] - 1e-6)
    # N column under SUM is lse of all four
    np.testing.assert_allclose(
        s[:, 14],
        np.log(np.exp(s[:, :4]).sum(axis=1)),
        rtol=1e-5,
    )
