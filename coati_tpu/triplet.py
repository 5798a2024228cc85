"""Triplet (full codon-model) alignment path: FST-free re-expression.

The reference aligns under tri-mg / tri-ecm / dna by composing the codon
substitution FST with an affine indel FST and two sequence acceptors
(align_fst.cc:45-150). Here the same model is expressed directly as a
codon-context pair-HMM evaluated by a wavefront kernel with a state
dimension — no FST library involved. Implemented in coati_tpu.triplet_hmm.
"""

from __future__ import annotations

from coati_tpu.structs import AlignmentParams


def triplet_alignment(aln: AlignmentParams) -> bool:
    from coati_tpu.triplet_hmm import triplet_align_driver

    return triplet_align_driver(aln)
