"""Seeded sampling parity: alignments must be bit-identical to the
reference's seed-42 fixtures (align_marginal.cc:653-672); log-scores agree
to ~1e-5 (our table comes from an f64 expm vs Eigen f32)."""

import numpy as np
import pytest

from coati_tpu.align import oracle
from coati_tpu.rng import Lehmer64, encode_seed, seed_random, string_seed_seq
from coati_tpu.structs import GapParams
from coati_tpu.utils import encode_marginal


def _sample(mg94_table, anc, des, n):
    rng = Lehmer64()
    seed_random(rng, string_seed_seq(["42"]))
    a, b = encode_marginal(anc, des)
    work = oracle.forward_oracle(a, b, mg94_table, GapParams(), "log",
                                 save_edges=True)
    out = []
    for _ in range(n):
        out.append(oracle.sampleback(work, anc, des, GapParams(), rng))
    return out


def test_sample_seed42_insertion(mg94_table):
    out = _sample(mg94_table, "CCCCCC", "CCCCCCCC", 3)
    assert [(s0, s1) for s0, s1, _ in out] == [
        ("CC--CCCC", "CCCCCCCC"),
        ("CCCCCC--", "CCCCCCCC"),
        ("CCCC--CC", "CCCCCCCC"),
    ]
    scores = [sc for _, _, sc in out]
    expect = [-1.9466571807861328, -1.9466569423675537, -1.9466572999954224]
    np.testing.assert_allclose(scores, expect, atol=2e-6)


def test_sample_seed42_deletion(mg94_table):
    out = _sample(mg94_table, "CCCCCC", "CCCC", 1)
    assert (out[0][0], out[0][1]) == ("CCCCCC", "--CCCC")
    assert out[0][2] == pytest.approx(-1.6172490119934082, abs=2e-6)


def test_string_seed_seq_int_vs_str():
    a = string_seed_seq(["42"]).generate(4)
    b = string_seed_seq(["42x"]).generate(4)
    assert a != b
    # deterministic
    assert a == string_seed_seq(["42"]).generate(4)


def test_encode_seed_format():
    rng = Lehmer64()
    seed_random(rng, string_seed_seq(["42"]))
    s = encode_seed(rng.get_seed_u32x4())
    parts = s.split("-")
    assert len(parts) == 4
    assert all(len(p) == 6 for p in parts)


def test_lehmer_f24_range():
    rng = Lehmer64()
    vals = [rng.f24() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert abs(sum(vals) / len(vals) - 0.5) < 0.05
