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


def jax_cache_dir(repo_root: Path | None = None) -> str:
    """Host-keyed persistent-compile-cache directory.

    XLA:CPU AOT cache entries bake in the COMPILING machine's CPU feature
    set; loading them on a host with different features warns and can
    SIGILL (observed: a segfault in backend_compile_and_load during the
    unit suite after another machine populated the shared cache). Keying
    the directory by hostname + CPU flags keeps every machine's entries
    separate."""
    import hashlib
    import platform

    if repo_root is None:
        repo_root = Path(__file__).resolve().parent.parent
    try:
        flags = ""
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        flags = platform.processor()
    key = hashlib.sha256(
        (platform.node() + "|" + flags).encode()
    ).hexdigest()[:12]
    return str(Path(repo_root) / ".jax_cache" / key)
