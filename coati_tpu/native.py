"""ctypes bindings to the native pair-HMM engine (native/pairhmm.cc).

Built on demand with `make -C native`. Used as the single-thread C++
baseline in benchmarks and as a JAX-free host fast path.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libcoatihmm.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    for name in ("coati_viterbi_score", "coati_forward_score"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_float
        fn.argtypes = [i32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
                       ctypes.c_float, ctypes.c_float, ctypes.c_int]
    lib.coati_viterbi_bp.restype = ctypes.c_float
    lib.coati_viterbi_bp.argtypes = [
        i32p, ctypes.c_int, i32p, ctypes.c_int, f32p,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, u8p,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def viterbi_score(enc_a, enc_b, table, gap) -> float:
    lib = _load()
    a = np.ascontiguousarray(enc_a, dtype=np.int32)
    b = np.ascontiguousarray(enc_b, dtype=np.int32)
    t = np.ascontiguousarray(table, dtype=np.float32)
    return float(lib.coati_viterbi_score(a, len(a), b, len(b), t,
                                         np.float32(gap.open),
                                         np.float32(gap.extend), gap.len))


def forward_score(enc_a, enc_b, table, gap) -> float:
    lib = _load()
    a = np.ascontiguousarray(enc_a, dtype=np.int32)
    b = np.ascontiguousarray(enc_b, dtype=np.int32)
    t = np.ascontiguousarray(table, dtype=np.float32)
    return float(lib.coati_forward_score(a, len(a), b, len(b), t,
                                         np.float32(gap.open),
                                         np.float32(gap.extend), gap.len))


def viterbi_bp(enc_a, enc_b, table, gap):
    """Returns (score, bp[(na+k), (nb+k)] uint8, start_state)."""
    lib = _load()
    a = np.ascontiguousarray(enc_a, dtype=np.int32)
    b = np.ascontiguousarray(enc_b, dtype=np.int32)
    t = np.ascontiguousarray(table, dtype=np.float32)
    k = gap.len
    bp = np.zeros(((len(a) + k), (len(b) + k)), dtype=np.uint8)
    state = ctypes.c_int(0)
    score = lib.coati_viterbi_bp(a, len(a), b, len(b), t,
                                 np.float32(gap.open), np.float32(gap.extend),
                                 k, bp, ctypes.byref(state))
    return float(score), bp, int(state.value)
