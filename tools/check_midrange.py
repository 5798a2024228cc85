"""Spot-check the 11k-30k nt routes on the real TPU.

Validates (strings + scores) and times:
  - 15.6 knt x 2 through the direct bc=4 full-bp kernel (new tier),
  - the same pairs through the batched segmented path,
  - 29.4 knt x 1 through the batched segmented path,
against the native C++ anchor. Usage: python tools/check_midrange.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("COATI_TPU_FORCE_PLATFORM", "tpu")
from coati_tpu.provenance import jax_cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", jax_cache_dir(REPO))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def make_pair(rng, n_codons):
    from coati_tpu.constants import CODONS61

    codon_arr = np.array(CODONS61)
    anc = "".join(rng.choice(codon_arr, size=n_codons))
    des = list(anc)
    idx = rng.random(len(des)) < 0.05
    nts = np.array(list("ACGT"))
    for i in np.nonzero(idx)[0]:
        des[i] = str(rng.choice(nts))
    des = "".join(des)
    for _ in range(12):
        ln = int(rng.integers(1, 10))
        pos = int(rng.integers(0, max(1, len(des) - ln)))
        if rng.random() < 0.5:
            des = des[:pos] + des[pos + ln:]
        else:
            ins = "".join(rng.choice(nts, size=ln))
            des = des[:pos] + ins + des[pos:]
    return anc, des


def main() -> int:
    rng = np.random.default_rng(7)
    from coati_tpu import native, utils
    from coati_tpu.align.engine import viterbi_align_batch
    from coati_tpu.align.longseq import viterbi_align_long_batch
    from coati_tpu.models import marginal_p, mg94_p
    from coati_tpu.structs import GapParams

    pi = (0.308, 0.185, 0.199, 0.308)
    table = marginal_p(mg94_p(0.0133, 0.2, pi), pi).astype(np.float32)
    gap = GapParams()

    for label, n_cod, n_pairs in (("15.6k", 5208, 2), ("29.4k", 9799, 1)):
        pairs = [make_pair(rng, n_cod) for _ in range(n_pairs)]
        encs = [utils.encode_marginal(a, d) for a, d in pairs]
        eas = [e[0] for e in encs]
        ebs = [e[1] for e in encs]
        ancs = [p[0] for p in pairs]
        dess = [p[1] for p in pairs]
        cells = sum(len(a) * len(b) for a, b in zip(eas, ebs))

        anchors = None
        if native.available():
            anchors = [
                native.viterbi_align(ea, eb, a, d, gap, table)
                for ea, eb, a, d in zip(eas, ebs, ancs, dess)
            ]

        viterbi_align_batch(eas, ebs, ancs, dess, table, gap)  # warm
        t0 = time.time()
        eng = viterbi_align_batch(eas, ebs, ancs, dess, table, gap)
        dt_eng = time.time() - t0
        viterbi_align_long_batch(eas, ebs, ancs, dess, table, gap)  # warm
        t0 = time.time()
        seg = viterbi_align_long_batch(eas, ebs, ancs, dess, table, gap)
        dt_seg = time.time() - t0
        # force the DIRECT bc<=4 full-bp kernel tiers (production routes
        # these sizes to the folded segmented path for <=2-pair groups,
        # so this leg is the tiers' on-TPU validation)
        direct = dt_dir = None
        from coati_tpu.align.engine import _pallas_bc_for

        Cq = ((max(len(b) for b in ebs) + 1 + 127) // 128) * 128
        if _pallas_bc_for(Cq, True) is not None:
            viterbi_align_batch(eas, ebs, ancs, dess, table, gap,
                                long_slots=1 << 62)  # warm
            t0 = time.time()
            direct = viterbi_align_batch(eas, ebs, ancs, dess, table, gap,
                                         long_slots=1 << 62)
            dt_dir = time.time() - t0

        ok = all(
            (e.seq0, e.seq1) == (s.seq0, s.seq1)
            and abs(e.score - s.score) < 1e-2
            for e, s in zip(eng, seg)
        )
        dir_ok = "n/a"
        if direct is not None:
            dir_ok = all(
                (e.seq0, e.seq1) == (d.seq0, d.seq1)
                and abs(e.score - d.score) < 1e-2
                for e, d in zip(eng, direct)
            )
        nat_ok = "n/a"
        if anchors:
            nat_ok = all(
                (e.seq0, e.seq1) == (n0, n1) and abs(e.score - ns) < 1e-2
                for e, (n0, n1, ns) in zip(eng, anchors)
            )
        dir_s = (f" | direct {dt_dir:.2f}s ({cells/dt_dir/1e9:.2f} G) "
                 f"dir==eng {dir_ok}" if direct is not None else "")
        print(
            f"{label} x{n_pairs}: engine {dt_eng:.2f}s "
            f"({cells/dt_eng/1e9:.2f} G) | segmented {dt_seg:.2f}s "
            f"({cells/dt_seg/1e9:.2f} G){dir_s} | eng==seg {ok} | "
            f"eng==native {nat_ok}",
            flush=True,
        )
        if not ok or nat_ok is False or dir_ok is False:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
