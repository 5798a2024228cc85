"""Pallas wavefront kernel vs the XLA scan kernel (interpret mode on CPU).

Corners must match bitwise-close and every valid-region backpointer must be
identical (same tie-break semantics as the reference traceback)."""

import numpy as np
import pytest

import jax.numpy as jnp

from coati_tpu.align.wavefront import gap_consts_array, wavefront
from coati_tpu.kernels.wavefront_pallas import wavefront_pallas
from coati_tpu.structs import GapParams


@pytest.mark.parametrize(
    "k,NA,NB", [(1, 48, 48), (3, 48, 48), (1, 96, 60), (5, 60, 60)]
)
def test_pallas_matches_xla(mg94_table, k, NA, NB):
    rng = np.random.default_rng(17 + k)
    B = 32
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 15, (B, NB)).astype(np.int32)
    la = np.full(B, NA - (NA % (3 * k)) if NA % (3 * k) else NA, np.int32)
    lb = np.full(B, NB - (NB % k) if NB % k else NB, np.int32)
    args = [jnp.asarray(x) for x in (aseq, bseq, la, lb, mg94_table, gc)]

    (cm1, cd1, ci1), bp1 = wavefront(
        *args, k=k, semiring="tropical", mode="viterbi"
    )
    (cm2, cd2, ci2), bp2 = wavefront_pallas(
        *args, k=k, bc=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(cm1), np.asarray(cm2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cd1), np.asarray(cd2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ci1), np.asarray(ci2), atol=1e-4)

    bp1 = np.asarray(bp1)
    bp2 = np.asarray(bp2)
    C1 = bp1.shape[2]
    mismatch = 0
    for d in range(bp1.shape[0]):
        js = np.arange(k - 1, min(d - (k - 1), C1 - 1) + 1)
        iis = d - js
        sel = (iis >= k - 1) & (iis < NA + k)
        js, iis = js[sel], iis[sel]
        if len(js) == 0:
            continue
        mismatch += int((bp1[d][:, js] != bp2[d][:, js]).sum())
    assert mismatch == 0


def test_pallas_traceback_roundtrip(mg94_table):
    """Full fused path (pallas DP + device traceback) = XLA path strings."""
    import random

    from coati_tpu.align.engine import _align_step, ops_to_strings
    from coati_tpu.constants import CODONS61
    from coati_tpu.utils import encode_marginal

    rng = random.Random(5)
    gap = GapParams()
    gc = gap_consts_array(gap)
    enc_as, enc_bs, astrs, bstrs = [], [], [], []
    for _ in range(32):
        anc = "".join(rng.choice(CODONS61) for _ in range(rng.randint(2, 10)))
        des = "".join(rng.choice("ACGT") for _ in range(rng.randint(3, 30)))
        ea, eb = encode_marginal(anc, des)
        enc_as.append(ea)
        enc_bs.append(eb)
        astrs.append(anc)
        bstrs.append(des)

    NA = max(len(a) for a in enc_as)
    NB = max(len(b) for b in enc_bs)
    B = len(enc_as)
    aseq = np.zeros((B, NA), np.int32)
    bseq = np.zeros((B, NB), np.int32)
    la = np.array([len(a) for a in enc_as], np.int32)
    lb = np.array([len(b) for b in enc_bs], np.int32)
    for i, (a, b) in enumerate(zip(enc_as, enc_bs)):
        aseq[i, : len(a)] = a
        bseq[i, : len(b)] = b

    import jax

    from coati_tpu.align.engine import _align_step_jit

    table32 = np.asarray(mg94_table, np.float32)
    # XLA path
    ops_x, score_x = _align_step_jit(
        jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(table32), jnp.asarray(gc),
        k=1, use_pallas=False,
    )
    rx = ops_to_strings(np.asarray(ops_x)[::-1], np.asarray(score_x),
                        astrs, bstrs, 1)
    # Pallas path (interpret via pallas's interpret flag isn't reachable
    # through _align_step_jit; call the pieces directly)
    from coati_tpu.align.wavefront import traceback_ops
    corners, bp = wavefront_pallas(
        jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(table32), jnp.asarray(gc),
        k=1, bc=32, interpret=True,
    )
    ops_p, (_, score_p) = traceback_ops(
        bp, corners, jnp.asarray(la), jnp.asarray(lb), k=1
    )
    rp = ops_to_strings(np.asarray(ops_p)[::-1], np.asarray(score_p),
                        astrs, bstrs, 1)
    for a, b in zip(rx, rp):
        assert (a.seq0, a.seq1) == (b.seq0, b.seq1)
        assert a.score == pytest.approx(b.score, abs=1e-4)


@pytest.mark.parametrize("bc,want_bp", [(8, True), (8, False)])
def test_pallas_narrow_chunk(mg94_table, bc, want_bp):
    """bc=8 (long-sequence chunk width, engine._pallas_bc_for) matches the
    XLA kernel exactly like bc=32 does."""
    rng = np.random.default_rng(91)
    B, NA, NB, k = 8, 60, 57, 1
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 4, (B, NB)).astype(np.int32)
    la = np.full(B, NA, np.int32)
    lb = np.full(B, NB, np.int32)
    args = [jnp.asarray(x) for x in (aseq, bseq, la, lb, mg94_table, gc)]

    (cm1, cd1, ci1), _ = wavefront(
        *args, k=k, semiring="tropical", mode="viterbi"
    )
    (cm2, cd2, ci2), bp = wavefront_pallas(
        *args, k=k, bc=bc, want_bp=want_bp, interpret=True
    )
    np.testing.assert_allclose(np.asarray(cm1), np.asarray(cm2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cd1), np.asarray(cd2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ci1), np.asarray(ci2), atol=1e-4)
    assert (bp is None) == (not want_bp)


def test_pallas_bc_for_thresholds():
    from coati_tpu.align.engine import PALLAS_BC, _pallas_bc_for

    assert _pallas_bc_for(128, want_bp=True) == PALLAS_BC
    assert _pallas_bc_for(2816, want_bp=True) == PALLAS_BC
    assert _pallas_bc_for(4096, want_bp=True) == 8
    assert _pallas_bc_for(11264, want_bp=True) == 8
    assert _pallas_bc_for(12000, want_bp=True) == 4
    assert _pallas_bc_for(16512, want_bp=True) == 4
    assert _pallas_bc_for(17000, want_bp=True) is None
    assert _pallas_bc_for(12000, want_bp=False) == 8
    assert _pallas_bc_for(32768, want_bp=False) is None


@pytest.mark.parametrize("k", [1, 3])
def test_pallas_forward_matches_xla(mg94_table, k):
    """Forward (log semiring) mode: corners and every valid-region state
    value match the XLA kernel."""
    rng = np.random.default_rng(5 + k)
    B, NA, NB = 8, 24, 21
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 15, (B, NB)).astype(np.int32)
    la = np.full(B, NA, np.int32)
    lb = np.full(B, NB, np.int32)
    args = [jnp.asarray(x) for x in (aseq, bseq, la, lb, mg94_table, gc)]

    (cm1, cd1, ci1), (M1, D1, I1) = wavefront(
        *args, k=k, semiring="log", mode="forward"
    )
    (cm2, cd2, ci2), (M2, D2, I2) = wavefront_pallas(
        *args, k=k, bc=8, mode="forward", interpret=True
    )
    np.testing.assert_allclose(np.asarray(cm1), np.asarray(cm2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cd1), np.asarray(cd2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ci1), np.asarray(ci2), atol=1e-4)
    # compare full diagonals over the valid slot range (XLA C = NB+k;
    # pallas pads slots to 128)
    C1 = NB + k
    for x1, x2 in ((M1, M2), (D1, D2), (I1, I2)):
        x1 = np.asarray(x1)
        x2 = np.asarray(x2)[: x1.shape[0], :, :C1]
        np.testing.assert_allclose(x1, x2, atol=1e-4)


@pytest.mark.parametrize(
    "k,du",
    [(1, 2), (1, 4), (3, 2), (3, 5),
     # du % ring == 0 -> static ring-slot indexing; k=1 additionally
     # uses the write-side pre-shifted ring (sshift)
     (1, 3), (1, 6), (3, 4), (3, 8)],
)
def test_pallas_multidiag_matches_single(mg94_table, k, du):
    """du>1 (multiple diagonals per grid step) is bit-identical to du=1:
    same corners, same valid-region backpointers."""
    rng = np.random.default_rng(31 + du)
    B, NA, NB = 32, 48, 54
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 15, (B, NB)).astype(np.int32)
    la = np.full(B, NA - (NA % (3 * k)) if NA % (3 * k) else NA, np.int32)
    lb = np.full(B, NB - (NB % k) if NB % k else NB, np.int32)
    args = [jnp.asarray(x) for x in (aseq, bseq, la, lb, mg94_table, gc)]

    (cm1, cd1, ci1), bp1 = wavefront_pallas(*args, k=k, bc=32, interpret=True)
    (cm2, cd2, ci2), bp2 = wavefront_pallas(
        *args, k=k, bc=32, interpret=True, du=du
    )
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm2))
    np.testing.assert_array_equal(np.asarray(cd1), np.asarray(cd2))
    np.testing.assert_array_equal(np.asarray(ci1), np.asarray(ci2))
    bp1 = np.asarray(bp1)
    bp2 = np.asarray(bp2)
    np.testing.assert_array_equal(bp1, bp2[: bp1.shape[0]])


def test_pallas_multidiag_forward(mg94_table):
    """Forward mode with du>1: streamed diagonals identical to du=1."""
    rng = np.random.default_rng(77)
    B, NA, NB = 32, 24, 30
    gap = GapParams()
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 15, (B, NB)).astype(np.int32)
    la = np.full(B, NA, np.int32)
    lb = np.full(B, NB, np.int32)
    args = [jnp.asarray(x) for x in (aseq, bseq, la, lb, mg94_table, gc)]

    (cm1, _, _), (Ms1, Ds1, Is1) = wavefront_pallas(
        *args, k=1, bc=32, interpret=True, mode="forward"
    )
    (cm2, _, _), (Ms2, Ds2, Is2) = wavefront_pallas(
        *args, k=1, bc=32, interpret=True, mode="forward", du=3
    )
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm2))
    D = Ms1.shape[0]
    np.testing.assert_array_equal(np.asarray(Ms1), np.asarray(Ms2)[:D])
    np.testing.assert_array_equal(np.asarray(Ds1), np.asarray(Ds2)[:D])
    np.testing.assert_array_equal(np.asarray(Is1), np.asarray(Is2)[:D])


@pytest.mark.parametrize(
    "k,R,du",
    # du chosen to cover static ring + k=1 pre-shift (1,4,3), static ring
    # at k=3 (3,4,4), and the dynamic-ring fallback (1,8,4)
    [(1, 4, 3), (3, 4, 4), (1, 8, 4)],
)
def test_pallas_stacked_matches_plain(mg94_table, k, R, du):
    """Diagonal-stacked kernel (R pairs per batch-row) == the XLA kernel:
    identical strings AND scores on random mixed-length batches, ties
    included (every cell sees bit-identical inputs by construction)."""
    import random

    import jax.numpy as jnp

    from coati_tpu.align.engine import _align_step_jit, ops_to_strings
    from coati_tpu.align.wavefront import traceback_ops
    from coati_tpu.constants import CODONS61
    from coati_tpu.kernels.wavefront_pallas import wavefront_pallas_stacked
    from coati_tpu.utils import encode_marginal

    bc = 8
    rows = bc
    B = R * rows
    rng = random.Random(13 + k + R)
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    enc_as, enc_bs, astrs, bstrs = [], [], [], []
    for _ in range(B):
        anc = "".join(rng.choice(CODONS61) for _ in range(rng.randint(2, 12)))
        des = "".join(rng.choice("ACGT") for _ in range(rng.randint(3, 40)))
        if k == 3 and len(des) % 3 != 0:
            des = des[: len(des) - len(des) % 3]
        ea, eb = encode_marginal(anc, des)
        enc_as.append(ea)
        enc_bs.append(eb)
        astrs.append(anc)
        bstrs.append(des)
    NA = max(len(a) for a in enc_as)
    NB = max(len(b) for b in enc_bs)
    aseq = np.zeros((B, NA), np.int32)
    bseq = np.zeros((B, NB), np.int32)
    la = np.array([len(a) for a in enc_as], np.int32)
    lb = np.array([len(b) for b in enc_bs], np.int32)
    for i, (a, b) in enumerate(zip(enc_as, enc_bs)):
        aseq[i, : len(a)] = a
        bseq[i, : len(b)] = b

    table32 = np.asarray(mg94_table, np.float32)
    ops_x, score_x = _align_step_jit(
        jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(table32), jnp.asarray(gc),
        k=k, use_pallas=False,
    )
    rx = ops_to_strings(np.asarray(ops_x)[::-1], np.asarray(score_x),
                        astrs, bstrs, k)

    corners, bp, d_base, row_idx, _ = wavefront_pallas_stacked(
        jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(table32), jnp.asarray(gc),
        k=k, R=R, bc=bc, du=du, interpret=True,
    )
    ops_s, (_, score_s) = traceback_ops(
        bp, corners, jnp.asarray(la), jnp.asarray(lb), k=k,
        d_base=d_base, row_idx=row_idx,
    )
    rs = ops_to_strings(np.asarray(ops_s)[::-1], np.asarray(score_s),
                        astrs, bstrs, k)
    for a, b in zip(rx, rs):
        assert (a.seq0, a.seq1) == (b.seq0, b.seq1)
        assert np.float32(a.score) == np.float32(b.score)


def test_stacked_rectangular_bucket(mg94_table):
    """Rectangular buckets (descendants much longer than ancestors) in the
    stacked kernel: before stacked_period learned the NA+NB bound, a pair's
    corner diagonal could land past era r+1, get flushed-then-missed by
    the parity cap banks, and return -3.4e38 scores SILENTLY. Also covers
    rebase_stacked_bp (the bank-slice traceback path the engine uses)."""
    import random

    from coati_tpu.align.engine import _align_step_jit, ops_to_strings
    from coati_tpu.align.wavefront import traceback_ops
    from coati_tpu.constants import CODONS61
    from coati_tpu.kernels.wavefront_pallas import (
        rebase_stacked_bp,
        stacked_period,
        wavefront_pallas_stacked,
    )
    from coati_tpu.utils import encode_marginal

    k, R, bc = 1, 4, 4
    B = R * bc
    rng = random.Random(31)
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    enc_as, enc_bs, astrs, bstrs = [], [], [], []
    for _ in range(B):
        anc = "".join(rng.choice(CODONS61) for _ in range(rng.randint(8, 30)))
        des = "".join(rng.choice("ACGT") for _ in range(rng.randint(380, 470)))
        ea, eb = encode_marginal(anc, des)
        enc_as.append(ea)
        enc_bs.append(eb)
        astrs.append(anc)
        bstrs.append(des)
    NA = max(len(a) for a in enc_as)
    NB = max(len(b) for b in enc_bs)
    aseq = np.zeros((B, NA), np.int32)
    bseq = np.zeros((B, NB), np.int32)
    la = np.array([len(a) for a in enc_as], np.int32)
    lb = np.array([len(b) for b in enc_bs], np.int32)
    for i, (a, b) in enumerate(zip(enc_as, enc_bs)):
        aseq[i, : len(a)] = a
        bseq[i, : len(b)] = b
    # this shape must actually exercise the rectangular regime; du=3 also
    # covers the static-ring + pre-shifted path in the stacked kernel
    C = ((NB + k + 127) // 128) * 128
    du = 3
    P = stacked_period(NA, NB, C, k, du)
    assert 2 * P >= NA + NB + 2 * k - 1

    table32 = np.asarray(mg94_table, np.float32)
    ops_x, score_x = _align_step_jit(
        jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(table32), jnp.asarray(gc),
        k=k, use_pallas=False,
    )
    rx = ops_to_strings(np.asarray(ops_x)[::-1], np.asarray(score_x),
                        astrs, bstrs, k)

    corners, bp, d_base, row_idx, P2 = wavefront_pallas_stacked(
        jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(table32), jnp.asarray(gc),
        k=k, R=R, bc=bc, du=du, interpret=True,
    )
    assert int(P2) == P
    bp2 = rebase_stacked_bp(bp, P, NA, NB, k, R)
    ops_s, (_, score_s) = traceback_ops(
        bp2, corners, jnp.asarray(la), jnp.asarray(lb), k=k,
    )
    rs = ops_to_strings(np.asarray(ops_s)[::-1], np.asarray(score_s),
                        astrs, bstrs, k)
    for a, b in zip(rx, rs):
        assert np.isfinite(b.score)
        assert (a.seq0, a.seq1) == (b.seq0, b.seq1)
        assert np.float32(a.score) == np.float32(b.score)


def test_compile_probe_falls_back_on_vmem_failure(mg94_table, monkeypatch,
                                                  caplog):
    """A Pallas compile failure (e.g. VMEM overflow on an untuned shape)
    probes smaller configs instead of hard-failing, logs once, and still
    returns correct results (VERDICT r2 weak #8)."""
    import logging

    import coati_tpu.align.engine as eng

    rng = np.random.default_rng(3)
    B, NA, NB, k = 8, 33, 30, 1
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 4, (B, NB)).astype(np.int32)
    la = np.full(B, NA, np.int32)
    lb = np.full(B, NB, np.int32)
    table32 = np.asarray(mg94_table, np.float32)

    class FakeDev:
        platform = "tpu"

    orig = eng._align_step_packed_jit
    attempts = []

    def flaky(*args, **kw):
        attempts.append((kw["use_pallas"], kw["bc"], kw["du"],
                         kw["stack_R"]))
        if kw["use_pallas"]:
            raise RuntimeError(
                "Mosaic failed to compile: Ran out of memory in memory "
                "space vmem")
        return orig(*args, **kw)

    monkeypatch.setattr(eng, "_align_step_packed_jit", flaky)
    monkeypatch.setattr(eng, "_compile_probe_warned", set())
    with caplog.at_level(logging.WARNING):
        ops, score = eng._align_step(
            aseq, bseq, la, lb, table32, gc, k, FakeDev(), fetch=True)
    # walked the ladder: >= 2 pallas attempts, ended on the XLA fallback
    assert len(attempts) >= 2
    assert attempts[-1][0] is False
    assert any("probing smaller config" in r.message for r in caplog.records)

    # results identical to the plain XLA path
    ops_ref, score_ref = eng._align_step(
        aseq, bseq, la, lb, table32, gc, k,
        type("D", (), {"platform": "cpu"})(), fetch=True)
    np.testing.assert_array_equal(score, score_ref)


def test_compile_probe_reraises_real_errors(mg94_table, monkeypatch):
    """Genuine (non-compile) errors are NOT swallowed by the probe."""
    import coati_tpu.align.engine as eng

    rng = np.random.default_rng(3)
    B, NA, NB, k = 8, 33, 30, 1
    gap = GapParams(len=k)
    gc = gap_consts_array(gap)
    aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
    bseq = rng.integers(0, 4, (B, NB)).astype(np.int32)
    la = np.full(B, NA, np.int32)
    lb = np.full(B, NB, np.int32)

    class FakeDev:
        platform = "tpu"

    def broken(*args, **kw):
        raise ValueError("user error: bad table shape")

    monkeypatch.setattr(eng, "_align_step_packed_jit", broken)
    with pytest.raises(ValueError, match="user error"):
        eng._align_step(aseq, bseq, la, lb,
                        np.asarray(mg94_table, np.float32), gc, k,
                        FakeDev(), fetch=True)
