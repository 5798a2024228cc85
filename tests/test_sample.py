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


# Golden vectors obtained by hand-evaluating the reference pipeline
# (string_seed_seq -> SeedSeq256 hash_implA -> Generate hash_implB ->
#  Lehmer state memcpy LE + |1 -> GetSeed -> base58 encode_seed) directly
# from /root/reference/contrib/random/random.hpp:328-440,465-540 and
# src/coati-genseed.cc:38-48, in an independent transcription (not via
# coati_tpu.rng). Pins full `coati genseed <args>` byte parity.
GENSEED_VECTORS = [
    (["42"], "5jsnAz-5FUGpQ-4m4mTp-4GfG7E"),
    (["42", "hello"], "3eBrK6-1FK5RW-5Py8gB-316Mnb"),
    (["coati"], "1adU4z-6VrFK2-4sYCQp-3FE9Wc"),
    (["-7"], "2X6ifN-2Y2NzF-2Yx3K8-2Zshdz"),
    # does not fit int32 -> hashed as a string, not parsed as a number
    (["2147483648"], "61hFyA-4CS2nZ-2PAobx-77SQZe"),
]


@pytest.mark.parametrize("args,expect", GENSEED_VECTORS,
                         ids=["-".join(a) for a, _ in GENSEED_VECTORS])
def test_genseed_reference_parity(args, expect):
    rng = Lehmer64()
    seed_random(rng, string_seed_seq(args))
    assert encode_seed(rng.get_seed_u32x4()) == expect


def test_lehmer_f24_range():
    rng = Lehmer64()
    vals = [rng.f24() for _ in range(1000)]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert abs(sum(vals) / len(vals) - 0.5) < 0.05


# --- vectorized device sampling (align/sample_device.py) ----------------------
def _mk_aln():
    from coati_tpu import utils
    from coati_tpu.structs import AlignmentParams

    aln = AlignmentParams()
    aln.model = "mar-mg"
    utils.set_subst(aln)
    return aln


def test_sample_device_matches_host_distribution():
    """N parallel threefry tracebacks reproduce the host sampler's
    distribution and per-path scores (VERDICT round-1 item 4)."""
    from collections import Counter

    from coati_tpu.align import oracle
    from coati_tpu.align.sample_device import sample_batch_device
    from coati_tpu.driver import _forward_diag, _forward_mdi
    from coati_tpu.rng import Lehmer64
    from coati_tpu.utils import encode_marginal

    aln = _mk_aln()
    anc, des = "CTCTGGATAGTG", "CTATAGTG"
    enc_a, enc_b = encode_marginal(anc, des)
    N = 2000

    Ms, Ds, Is, corners, _ = _forward_diag(enc_a, enc_b, aln)
    dev = list(sample_batch_device(Ms, Ds, Is, corners, enc_a, enc_b,
                                   aln.subst_matrix, anc, des, aln.gap,
                                   42, N))
    assert len(dev) == N

    M, D, I = _forward_mdi(enc_a, enc_b, aln)
    rng = Lehmer64()
    host = [oracle.sampleback_mdi(M, D, I, enc_a, enc_b, aln.subst_matrix,
                                  anc, des, aln.gap, rng) for _ in range(N)]

    host_score = {(s0, s1): sc for s0, s1, sc in host}
    for s0, s1, sc in dev:
        assert len(s0) == len(s1)
        assert s0.replace("-", "") == anc and s1.replace("-", "") == des
        hs = host_score.get((s0, s1))
        if hs is not None:  # same path -> same relative log-probability
            assert sc == pytest.approx(hs, abs=1e-3)

    cd = Counter((s0, s1) for s0, s1, _ in dev)
    ch = Counter((s0, s1) for s0, s1, _ in host)
    for key in set(cd) | set(ch):
        assert abs(cd.get(key, 0) - ch.get(key, 0)) / N < 0.04


def test_sample_device_deterministic_and_chunked():
    from coati_tpu.align.sample_device import sample_batch_device
    from coati_tpu.driver import _forward_diag
    from coati_tpu.utils import encode_marginal

    aln = _mk_aln()
    anc, des = "CCCCCC", "CCCCCCCC"
    enc_a, enc_b = encode_marginal(anc, des)
    Ms, Ds, Is, corners, _ = _forward_diag(enc_a, enc_b, aln)

    run = lambda n, chunk: [
        x[:2] for x in sample_batch_device(
            Ms, Ds, Is, corners, enc_a, enc_b, aln.subst_matrix,
            anc, des, aln.gap, 7, n, chunk=chunk)
    ]
    a = run(60, 4096)
    b = run(60, 4096)
    assert a == b  # same seed -> same stream
    c = run(60, 25)  # chunked calls keep one compiled shape, same results
    assert len(c) == 60
    for s0, s1 in c:
        assert s0.replace("-", "") == anc and s1.replace("-", "") == des


def test_marg_sample_mid_input_routes_to_native(tmp_path, monkeypatch):
    """Mid-size inputs (<= 4M cells) batch all tracebacks through the
    native Lehmer-stream sampler; stream output stays a valid JSON
    array."""
    import json

    from coati_tpu import native
    from coati_tpu.cli import main

    if not native.available():
        pytest.skip("native pairhmm library not built")
    calls = []
    orig = native.sampleback_batch

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    monkeypatch.setattr(native, "sampleback_batch", spy)

    from coati_tpu.constants import CODONS61

    rng = np.random.default_rng(5)
    anc = "".join(rng.choice(np.array(CODONS61), size=170))
    des = anc[:250] + anc[260:]
    inp = tmp_path / "big.fasta"
    inp.write_text(f">a\n{anc}\n>b\n{des}\n")
    out = tmp_path / "s.json"
    rc = main(["sample", str(inp), "-n", "8", "-s", "11",
               "-o", str(out)])
    assert rc == 0
    arr = json.loads(out.read_text())
    assert len(arr) == 8 and calls
    for rec in arr:
        s0, s1 = rec["alignment"].values()
        assert s0.replace("-", "") == anc
        assert s1.replace("-", "") == des


def test_marg_sample_large_input_routes_to_device(tmp_path, monkeypatch):
    """Above the native threshold (> 4M cells), marg_sample batches all
    tracebacks through the device sampler."""
    import json

    import coati_tpu.align.sample_device as sd
    from coati_tpu.cli import main

    calls = []
    orig = sd.sample_batch_device

    def spy(*args, **kw):
        calls.append(1)
        return orig(*args, **kw)

    monkeypatch.setattr(sd, "sample_batch_device", spy)

    from coati_tpu.constants import CODONS61

    rng = np.random.default_rng(5)
    anc = "".join(rng.choice(np.array(CODONS61), size=700))  # 2100 nt
    des = anc[:1000] + anc[1020:]
    inp = tmp_path / "huge.fasta"
    inp.write_text(f">a\n{anc}\n>b\n{des}\n")
    out = tmp_path / "s.json"
    rc = main(["sample", str(inp), "-n", "4", "-s", "11",
               "-o", str(out)])
    assert rc == 0
    arr = json.loads(out.read_text())
    assert len(arr) == 4 and calls
    for rec in arr:
        s0, s1 = rec["alignment"].values()
        assert s0.replace("-", "") == anc
        assert s1.replace("-", "") == des


def test_native_sampleback_stream_exact_vs_oracle():
    """The native C++ sampling walk consumes the SAME Lehmer64 f24 stream
    as oracle.sampleback_mdi and reproduces every sampled path exactly
    (this is what lets marg_sample route mid-size inputs to native with
    full reference seed parity)."""
    from coati_tpu import native
    from coati_tpu.align import oracle
    from coati_tpu.driver import _forward_mdi
    from coati_tpu.rng import Lehmer64

    if not native.available():
        pytest.skip("native pairhmm library not built")
    aln = _mk_aln()
    anc, des = "CTCTGGATAGTG", "CTATAGTG"
    from coati_tpu.utils import encode_marginal

    enc_a, enc_b = encode_marginal(anc, des)
    N = 500

    rng_n = Lehmer64()
    nat = native.sampleback_batch(
        enc_a, enc_b, aln.subst_matrix, aln.gap, anc, des, N, rng_n
    )
    M, D, I = _forward_mdi(enc_a, enc_b, aln)
    rng_o = Lehmer64()
    host = [
        oracle.sampleback_mdi(M, D, I, enc_a, enc_b, aln.subst_matrix,
                              anc, des, aln.gap, rng_o)
        for _ in range(N)
    ]
    assert rng_n.state == rng_o.state  # identical draw consumption
    for (n0, n1, ns), (h0, h1, hs) in zip(nat, host):
        assert (n0, n1) == (h0, h1)
        assert ns == pytest.approx(hs, abs=1e-5)
