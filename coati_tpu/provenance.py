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
    SIGILL (observed: segfaults in backend_compile_and_load and
    _cache_read during the unit suite). Two contamination paths exist:
    another machine populating a shared checkout's cache, and — subtler —
    the axon TPU plugin routing even CPU-backend compiles through its
    REMOTE compile helper, whose machine differs from this host. Key the
    directory by hostname + CPU flags + the process's JAX_PLATFORMS
    setting, so the CPU-pinned unit suite (locally-compiled entries only)
    never reads entries written by a TPU-tunnel process."""
    import hashlib
    import os
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
    plats = os.environ.get("JAX_PLATFORMS", "any")
    key = hashlib.sha256(
        (platform.node() + "|" + plats + "|" + flags).encode()
    ).hexdigest()[:12]
    return str(Path(repo_root) / ".jax_cache" / key)
