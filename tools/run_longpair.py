"""Generate LONGPAIR.json: checked-in evidence for the long-pair path.

Aligns a 32 knt pair (the reference's largest benchmark input scale,
benchmark/data/benchmark_32k.fasta) and a 160 knt pair (the reference's
largest sampledata input scale, sampledata/example-160k.fasta — which the
reference itself REJECTS/cannot run: its FST path dies at ~2 knt and its
3-matrix DP would need ~300 GB) through the segmented O(n)-memory
two-pass traceback on the real TPU, recording wall time, peak RSS, and
throughput. Run on TPU:  python tools/run_longpair.py [--quick]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("COATI_TPU_FORCE_PLATFORM", "tpu")

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
    quick = "--quick" in sys.argv
    import jax

    from coati_tpu.align.engine import viterbi_align_batch
    from coati_tpu.models import marginal_p, mg94_p
    from coati_tpu.structs import GapParams
    from coati_tpu.utils import encode_marginal

    pi = (0.308, 0.185, 0.199, 0.308)
    table = marginal_p(mg94_p(0.0133, 0.2, pi), pi).astype(np.float32)
    gap = GapParams()
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    sizes = [10667, 53334]  # codons -> 32001 / 160002 nt
    if quick:
        sizes = [2667]
    runs = []
    for n_cod in sizes:
        rng = np.random.default_rng(20260819 + n_cod)
        anc, des = make_pair(rng, n_cod)
        ea, eb = encode_marginal(anc, des)
        cells = len(ea) * len(eb)
        print(f"# aligning {len(ea)} x {len(eb)} nt "
              f"({cells/1e9:.1f} Gcells)...", file=sys.stderr)
        # first run absorbs compile + remote first-execution overhead;
        # the timed run measures the steady-state path
        t0 = time.time()
        viterbi_align_batch([ea], [eb], [anc], [des], table, gap)
        cold = time.time() - t0
        t0 = time.time()
        r = viterbi_align_batch([ea], [eb], [anc], [des], table, gap)[0]
        dt = time.time() - t0
        print(f"#   cold {cold:.1f} s -> warm below", file=sys.stderr)
        peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert len(r.seq0) == len(r.seq1)
        assert np.isfinite(r.score)
        runs.append({
            "nt": len(ea),
            "nt_des": len(eb),
            "cells": cells,
            "wall_seconds": round(dt, 2),
            "cells_per_sec": round(cells / dt, 0),
            "score": float(r.score),
            "aligned_len": len(r.seq0),
            "peak_rss_kb": int(peak_kb),
            "device": str(dev),
        })
        print(f"#   {dt:.1f} s, {cells/dt/1e6:.0f} Mcells/s, "
              f"peak RSS {peak_kb/1e6:.2f} GB", file=sys.stderr)

    from coati_tpu.provenance import kernel_hash

    blob = {
        "note": ("segmented O(n)-memory two-pass traceback "
                 "(align/longseq.py); full alignpair incl. string build. "
                 "The reference cannot run these sizes: FST path dies at "
                 "~2 knt, 3-matrix DP at 160 knt would need ~300 GB."),
        "generated": time.strftime("%Y-%m-%d %H:%M:%S"),
        "runs": runs,
        "kernel_hash": kernel_hash(REPO),
    }
    out = REPO / "LONGPAIR.json"
    out.write_text(json.dumps(blob, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
