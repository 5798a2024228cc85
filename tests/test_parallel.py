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
