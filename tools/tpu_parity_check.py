"""Compiled-TPU kernel parity check: engine strings vs the NumPy oracle.

Runs the production bucketed engine (Pallas kernel, compiled mode) on the
real accelerator for ~100 random pairs — k=1 and k=3, with IUPAC ambiguity
codes in the descendant — and compares alignment strings and scores against
the float32-faithful host oracle (align/oracle.py, the reference
align_pair.cc mirror). Writes a JSON verdict to TPU_PARITY.json.

Usage:  COATI_TPU_FORCE_PLATFORM=tpu python tools/tpu_parity_check.py
(or COATI_TPU_FORCE_PLATFORM=cpu for a host-only smoke run).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def make_group(rng, n_pairs, k, max_codons, ambig_frac=0.05):
    from coati_tpu.constants import CODONS61

    codon_arr = np.array(CODONS61)
    ambig = np.array(list("RYSWKMBDHVN"))
    nts = np.array(list("ACGT"))
    pairs = []
    for _ in range(n_pairs):
        n_cod = int(rng.integers(2, max_codons + 1))
        anc = "".join(rng.choice(codon_arr, size=n_cod))
        m = int(rng.integers(1, 2 * n_cod + 1)) * 3
        m -= m % k
        m = max(m, k)
        des = list(rng.choice(nts, size=m))
        amb_idx = np.nonzero(rng.random(m) < ambig_frac)[0]
        for i in amb_idx:
            des[i] = str(rng.choice(ambig))
        pairs.append((anc, "".join(des)))
    return pairs


def main() -> int:
    rng = np.random.default_rng(20260819)

    if os.environ.get("COATI_TPU_FORCE_PLATFORM") == "cpu":
        # host-only smoke: never initialize the (slow, remote) axon backend;
        # must happen before anything imports jax (conftest.py semantics)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from coati_tpu import utils
    from coati_tpu.align import oracle
    from coati_tpu.align.engine import viterbi_align_batch
    from coati_tpu.models import marginal_p, mg94_p
    from coati_tpu.structs import GapParams

    pi = (0.308, 0.185, 0.199, 0.308)
    table = marginal_p(mg94_p(0.0133, 0.2, pi), pi).astype(np.float32)

    # the third group is 128 same-shape pairs: deep enough that the engine
    # routes it through the diagonal-STACKED kernel (stack_R >= 4), so the
    # artifact pins that path's compiled-TPU numerics too
    groups = [
        ("scattered-k1", GapParams(len=1), make_group(rng, 80, 1, 40)),
        ("scattered-k3", GapParams(len=3), make_group(rng, 24, 3, 30)),
        ("stacked-k1", GapParams(len=1),
         [(a, d) for a, d in make_group(rng, 128, 1, 22, ambig_frac=0.0)
          ][:128]),
    ]

    import jax

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    n_total = 0
    mismatches = []
    t0 = time.time()
    for label, gap, pairs in groups:
        enc = [utils.encode_marginal(a, d) for a, d in pairs]
        enc_as = [e[0] for e in enc]
        enc_bs = [e[1] for e in enc]
        astrs = [p[0] for p in pairs]
        bstrs = [p[1] for p in pairs]
        results = viterbi_align_batch(
            enc_as, enc_bs, astrs, bstrs, table, gap
        )
        for (anc, des), ea, eb, r in zip(pairs, enc_as, enc_bs, results):
            n_total += 1
            w = oracle.forward_oracle(ea, eb, table, gap, "tropical")
            s0, s1, score = oracle.traceback(w, anc, des, gap)
            if (r.seq0, r.seq1) != (s0, s1) or abs(r.score - score) > 1e-4:
                mismatches.append({
                    "group": label, "k": gap.len, "anc": anc, "des": des,
                    "engine": [r.seq0, r.seq1, r.score],
                    "oracle": [s0, s1, score],
                })
        print(f"# {label}: {len(pairs)} pairs checked", file=sys.stderr)

    # triplet: batched device forward + device traceback vs the host
    # engine (float32-canonical, must match exactly)
    from coati_tpu.structs import AlignmentParams
    from coati_tpu.triplet_hmm import build_triplet_model, triplet_align
    from coati_tpu.triplet_wavefront import triplet_align_batch

    taln = AlignmentParams()
    taln.model = "tri-mg"
    tmodel = build_triplet_model(taln)
    tri_pairs = []
    from coati_tpu.constants import CODONS61

    codon_arr = np.array(CODONS61)
    nts = np.array(list("ACGT"))
    for _ in range(32):
        n_cod = int(rng.integers(2, 16))
        anc = "".join(rng.choice(codon_arr, size=n_cod))
        des = "".join(rng.choice(nts, size=int(rng.integers(3, 3 * n_cod + 4))))
        tri_pairs.append((anc, des))
    tri_dev = triplet_align_batch(tmodel, tri_pairs)
    n_tri_mism = 0
    for (anc, des), (s0, s1, sc) in zip(tri_pairs, tri_dev):
        n_total += 1
        h0, h1, hsc = triplet_align(tmodel, anc, des)
        if (s0, s1) != (h0, h1) or abs(sc - hsc) > 2e-3:
            n_tri_mism += 1
            mismatches.append({
                "group": "triplet", "anc": anc, "des": des,
                "engine": [s0, s1, sc], "oracle": [h0, h1, hsc],
            })
    print(f"# triplet: {len(tri_pairs)} pairs checked", file=sys.stderr)

    from coati_tpu.provenance import kernel_hash

    out = {
        "ok": not mismatches,
        "n_pairs": n_total,
        "n_mismatches": len(mismatches),
        "mismatches": mismatches[:5],
        "groups": [g[0] for g in groups] + ["triplet"],
        "device": str(dev),
        "seconds": round(time.time() - t0, 1),
        "kernel_hash": kernel_hash(REPO),
    }
    (REPO / "TPU_PARITY.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({kk: out[kk] for kk in
                      ("ok", "n_pairs", "n_mismatches", "device")}))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    os.environ.setdefault("COATI_TPU_FORCE_PLATFORM", "tpu")
    sys.exit(main())
