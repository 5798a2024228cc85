"""Independent FST-lattice verifier for the triplet models.

Builds the EXPLICIT composed machine anc-FSA o (codon-subst FST o indel FST)
o des-FSA as a graph — states (i, j, q, lane), one edge per FST arc — and
runs generic Dijkstra over -log weights. No DP closed forms (no prefix-max
insertion rows, no collapsed codon boundaries, no lane invariant): every
lane/intermediate-nucleotide choice is a separate edge the search explores.

This is the harness that justifies the 2e-3 score tolerance against the
reference fixture (BASELINE.md): the raw composed machine's exact shortest
distance for the align_fst.cc test pair is 9.3166508, while the reference's
published expectation (9.3160009) carries determinize/minimize f32 weight
redistribution noise. Reference semantics: mutation_fst.cc:197-257 (indel
channel), align_fst.cc:45-111 (composition + ShortestPath).
"""

import heapq

import numpy as np
import pytest

from coati_tpu import constants as C
from coati_tpu.structs import AlignmentParams
from coati_tpu.triplet_hmm import (
    build_triplet_model,
    encode_triplet_anc,
    encode_triplet_des,
    triplet_score,
)

S, M, D, I = 0, 1, 2, 3  # path states (q); S = initial


def lattice_shortest(model, anc: str, des: str) -> float:
    """Exact shortest distance (-log weight) over the explicit lattice."""
    if model.codon:
        anc_c = encode_triplet_anc(anc)  # [n/3] codon61
    else:
        anc_c = encode_triplet_des(anc)  # [n] nuc
    des_c = encode_triplet_des(des)
    n, m = len(anc), len(des_c)

    ng, gs, go, ge = model.ng, model.gs, model.go, model.ge
    into_m = {S: ng * 2, M: ng * 2, I: gs + ng, D: gs}
    into_d = {S: ng + go, M: ng + go, I: gs + go, D: ge}
    into_i = {S: go, M: go, I: ge}
    NOLANE = -1

    # Dijkstra over states (i, j, q, lane); all arc weights are -log of
    # probabilities, hence non-negative.
    start = (0, 0, S, NOLANE)
    dist = {start: 0.0}
    pq = [(0.0, start)]
    best = None
    while pq:
        d, st = heapq.heappop(pq)
        if d > dist.get(st, np.inf):
            continue
        i, j, q, lane = st

        if i == n and j == m:  # terminal arc
            cand = d - into_m[q]
            best = cand if best is None else min(best, cand)
            continue

        edges = []  # (cost >= 0, next_state)
        if model.codon:
            phase = i % 3
            if i < n:
                if phase == 0:
                    # codon entry: pick a descendant-codon lane (61 arcs)
                    lanes = [
                        (l, float(model.logP[anc_c[i // 3], l]))
                        for l in range(61)
                    ]
                else:
                    lanes = [(lane, 0.0)]
                nxt_lane = lambda l: NOLANE if (i + 1) % 3 == 0 else l
                for l, entry in lanes:
                    nuc = int(model.cnuc[phase, l])
                    if j < m:  # match arc: emit des[j] through the channel
                        w = entry + float(
                            model.match_emit[nuc, des_c[j]]
                        ) + into_m[q]
                        edges.append((-w, (i + 1, j + 1, M, nxt_lane(l))))
                    # delete arc: the intermediate nucleotide is consumed
                    # by the indel channel with no emission
                    w = entry + into_d[q]
                    edges.append((-w, (i + 1, j, D, nxt_lane(l))))
        else:
            if i < n:
                for mid in range(4):  # explicit intermediate nucleotide
                    chan = float(model.logP[anc_c[i], mid])
                    if j < m:
                        w = chan + float(
                            model.match_emit[mid, des_c[j]]
                        ) + into_m[q]
                        edges.append((-w, (i + 1, j + 1, M, NOLANE)))
                    w = chan + into_d[q]
                    edges.append((-w, (i + 1, j, D, NOLANE)))
        if j < m and q != D:  # insertion arc (never directly after D)
            w = float(model.ins_emit[des_c[j]]) + into_i[q]
            edges.append((-w, (i, j + 1, I, lane)))

        for cost, nst in edges:
            nd = d + cost
            if nd < dist.get(nst, np.inf):
                dist[nst] = nd
                heapq.heappush(pq, (nd, nst))
    assert best is not None
    return float(best)


def _model(name):
    aln = AlignmentParams()
    aln.model = name
    if name == "tri-ecm":
        aln.pi = C.ECM_DNA_PI
    return build_triplet_model(aln)


def test_lattice_confirms_fixture_score():
    """The raw composed machine's exact shortest distance for the
    align_fst.cc fixture — pins the BASELINE.md tolerance claim."""
    m = _model("tri-mg")
    got = lattice_shortest(m, "CTCTGGATAGTG", "CTATAGTG")
    assert got == pytest.approx(9.3166508, abs=1e-5)
    assert triplet_score(m, "CTCTGGATAGTG", "CTATAGTG") == pytest.approx(
        got, abs=1e-4
    )


@pytest.mark.parametrize("name", ["tri-mg", "tri-ecm", "dna"])
def test_lattice_matches_dp_random_pairs(name):
    """Generic shortest path over the explicit lattice == the DP's optimal
    score on random pairs (all three models)."""
    import random

    m = _model(name)
    rng = random.Random(123)
    for _ in range(12):
        anc = "".join(rng.choice(C.CODONS61) for _ in range(rng.randint(1, 4)))
        des = "".join(rng.choice("ACGTN") for _ in range(rng.randint(0, 10)))
        want = triplet_score(m, anc, des)
        got = lattice_shortest(m, anc, des)
        assert got == pytest.approx(want, abs=1e-4), (anc, des)


def test_fixture_tolerance_numbers():
    """Executable backing for docs/TRIPLET_TOLERANCE.md: our engine equals
    the EXACT lattice shortest distance to f32 rounding, while the
    reference's published fixture value carries ~6.5e-4 of its own
    determinize/minimize float32 noise — which is what the three
    abs=2e-3 fixture assertions in test_triplet.py are absorbing."""
    from coati_tpu.triplet_hmm import triplet_align

    anc, des = "CTCTGGATAGTG", "CTATAGTG"
    fixture = 9.316000938415527  # align_fst.cc published expectation

    aln = AlignmentParams()
    aln.model = "tri-mg"
    model = build_triplet_model(aln)
    _, _, eng = triplet_align(model, anc, des)
    lat = lattice_shortest(model, anc, des)

    # our engine == exact shortest path over the raw composed machine
    assert eng == pytest.approx(lat, abs=1e-5)
    # the fixture's drift from the exact value is real, bounded, and far
    # larger than ours — the tolerance bounds THE REFERENCE, not us
    drift = abs(fixture - lat)
    assert 1e-4 < drift < 2e-3, drift
    assert abs(eng - lat) < drift / 100
