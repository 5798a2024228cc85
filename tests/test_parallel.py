"""Multi-device data parallelism tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh8():
    from coati_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_scores_match_single_device(mg94_table, mesh8):
    import random

    from coati_tpu.align.engine import viterbi_scores_batch
    from coati_tpu.parallel.mesh import sharded_viterbi_scores
    from coati_tpu.structs import GapParams
    from coati_tpu.utils import encode_marginal
    from coati_tpu.constants import CODONS61

    rng = random.Random(3)
    gap = GapParams()
    enc_as, enc_bs = [], []
    for _ in range(19):  # odd count: exercises mesh padding
        anc = "".join(rng.choice(CODONS61) for _ in range(rng.randint(2, 8)))
        des = "".join(rng.choice("ACGT") for _ in range(rng.randint(3, 24)))
        ea, eb = encode_marginal(anc, des)
        enc_as.append(ea)
        enc_bs.append(eb)

    single = viterbi_scores_batch(enc_as, enc_bs, mg94_table, gap, quantum=32)
    sharded = sharded_viterbi_scores(enc_as, enc_bs, mg94_table, gap, mesh8,
                                     quantum=32)
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_graft_entry_and_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    ops, score = fn(*(np.asarray(a) for a in args))
    assert np.all(np.isfinite(np.asarray(score)))
    if len(jax.devices()) >= 8:
        ge.dryrun_multichip(8)


def test_host_shard_partition():
    from coati_tpu.parallel.multihost import host_shard

    items = list(range(10))
    shards = [host_shard(items, pi, 3) for pi in range(3)]
    assert sum(shards, []) == items
    assert all(len(s) <= 4 for s in shards)


def test_global_scores_allgather(mesh8):
    import numpy as np

    from coati_tpu.parallel.multihost import global_scores_allgather

    scores = np.arange(16, dtype=np.float32)
    out = global_scores_allgather(scores, mesh8)
    np.testing.assert_array_equal(out, scores)


def test_sharded_align_strings_match_single_device(mg94_table, mesh8):
    """Production mesh path: sharded alignment strings == single-device."""
    import random

    from coati_tpu.align.engine import viterbi_align_batch
    from coati_tpu.parallel.mesh import sharded_viterbi_align_batch
    from coati_tpu.structs import GapParams
    from coati_tpu.utils import encode_marginal
    from coati_tpu.constants import CODONS61

    rng = random.Random(11)
    gap = GapParams()
    enc_as, enc_bs, ancs, dess = [], [], [], []
    for _ in range(21):  # odd count: exercises mesh padding
        anc = "".join(rng.choice(CODONS61) for _ in range(rng.randint(2, 8)))
        des = "".join(rng.choice("ACGT") for _ in range(rng.randint(3, 24)))
        ea, eb = encode_marginal(anc, des)
        enc_as.append(ea)
        enc_bs.append(eb)
        ancs.append(anc)
        dess.append(des)

    single = viterbi_align_batch(enc_as, enc_bs, ancs, dess, mg94_table, gap,
                                 quantum=32)
    sharded = sharded_viterbi_align_batch(enc_as, enc_bs, ancs, dess,
                                          mg94_table, gap, mesh8, quantum=32)
    for s, r in zip(sharded, single):
        assert (s.seq0, s.seq1) == (r.seq0, r.seq1)
        assert s.score == pytest.approx(r.score, abs=1e-5)


def test_engine_round_robin_uses_all_devices(mg94_table):
    """The bucketed engine spreads chunks across every local device."""
    import random

    from coati_tpu.align.engine import viterbi_align_batch
    from coati_tpu.structs import GapParams
    from coati_tpu.utils import encode_marginal
    from coati_tpu.constants import CODONS61

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = random.Random(5)
    gap = GapParams()
    enc_as, enc_bs, ancs, dess = [], [], [], []
    for _ in range(32):
        anc = "".join(rng.choice(CODONS61) for _ in range(4))
        des = "".join(rng.choice("ACGT") for _ in range(12))
        ea, eb = encode_marginal(anc, des)
        enc_as.append(ea)
        enc_bs.append(eb)
        ancs.append(anc)
        dess.append(des)
    results = viterbi_align_batch(enc_as, enc_bs, ancs, dess, mg94_table,
                                  gap, quantum=16)
    assert len(results) == 32
    # one bucket of 32 pairs over 8 devices -> ceil(32/8)=4 per chunk
    # (the split is an internal detail; correctness is covered above)
    assert all(len(r.seq0) == len(r.seq1) for r in results)
