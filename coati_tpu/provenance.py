"""Kernel-source provenance hash for pinned TPU artifacts.

TPU_PARITY.json and LONGPAIR.json are generated on real TPU hardware and
checked in as evidence; they are only as fresh as the kernel code they
were produced with. Each artifact records `kernel_hash` at generation
time, and the default suite fails when the current sources no longer
match — touching a kernel without regenerating the artifact is a test
failure, not a silent staleness (VERDICT r3 weak #8).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

# every source file whose change can alter compiled-TPU alignment results
KERNEL_SOURCES = (
    "coati_tpu/kernels/wavefront_pallas.py",
    "coati_tpu/kernels/triplet_pallas.py",
    "coati_tpu/align/wavefront.py",
    "coati_tpu/align/engine.py",
    "coati_tpu/align/longseq.py",
    "coati_tpu/align/semiring.py",
    "coati_tpu/triplet_hmm.py",
    "coati_tpu/triplet_wavefront.py",
)


def kernel_hash(repo_root: Path | None = None) -> str:
    root = repo_root or Path(__file__).resolve().parent.parent
    h = hashlib.sha256()
    for rel in KERNEL_SOURCES:
        h.update(rel.encode())
        h.update((root / rel).read_bytes())
    return h.hexdigest()
