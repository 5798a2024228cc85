"""One-off probe: decompose the wavefront kernel's time budget on TPU.

Measures, per bucket shape:
  full     — fused DP + device traceback (engine path, plain kernel)
  dp+bp    — wavefront_pallas alone with backpointers (no traceback)
  dp       — wavefront_pallas want_bp=False (score only)
  stacked  — fused stacked kernel (engine path at R)

The dp/dp+bp delta bounds what bp op-golf can buy; dp vs theoretical VPU
peak bounds everything else. Usage: python tools/probe_kernel.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

os.environ.setdefault("COATI_TPU_FORCE_PLATFORM", "tpu")
from coati_tpu.provenance import jax_cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", jax_cache_dir(REPO))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def devloop_time(step, M: int):
    """True device seconds per `step(acc)` call: M chained iterations in
    ONE dispatch (fori_loop), a ~1e-30 data dependency threading the
    previous iteration's scalar into the next call's inputs so nothing is
    hoisted. Tunnel-independent (the round-trip amortizes over M)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def looped():
        def body(_, acc):
            return step(acc)

        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

    looped().block_until_ready()  # compile + warm
    t0 = time.time()
    looped().block_until_ready()
    return (time.time() - t0) / M


def bench(fn, small, reps=5):
    """Time reps async launches, forcing completion by device_get of the
    SMALL output (block_until_ready is unreliable over the axon tunnel).
    `small(out)` must pick a small leaf (score/corner) to fetch."""
    np.asarray(small(fn()))  # compile + warm
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        np.asarray(small(o))
    return (time.time() - t0) / reps


def main() -> int:
    import jax
    import jax.numpy as jnp

    from coati_tpu.align.engine import _align_step_jit
    from coati_tpu.align.wavefront import gap_consts_array
    from coati_tpu.kernels.wavefront_pallas import (
        wavefront_pallas,
        wavefront_pallas_stacked,
    )
    from coati_tpu.models import marginal_p, mg94_p
    from coati_tpu.structs import GapParams

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    pi = (0.308, 0.185, 0.199, 0.308)
    table = jnp.asarray(marginal_p(mg94_p(0.0133, 0.2, pi), pi)
                        .astype(np.float32))
    gap = GapParams()
    gc = jnp.asarray(gap_consts_array(gap))
    rng = np.random.default_rng(0)

    shapes = [
        tuple(int(v) for v in s.split("x"))
        for s in os.environ.get("PROBE_SHAPES", "480x480x1024,1056x1056x256").split(",")
    ]
    du = int(os.environ.get("PROBE_DU", "8"))
    bc = int(os.environ.get("PROBE_BC", "32"))
    R = int(os.environ.get("PROBE_R", "8"))
    reps = int(os.environ.get("PROBE_REPS", "5"))
    cc = (0, 1, 2, 3)

    for NA, NB, B in shapes:
        aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
        bseq = rng.integers(0, 4, (B, NB)).astype(np.int32)
        la = np.full(B, NA, np.int32)
        lb = np.full(B, NB, np.int32)
        args = (jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
                jnp.asarray(lb), table, gc)
        true_cells = float(B) * NA * NB
        C = ((NB + 1 + 127) // 128) * 128
        Dtot = (NA + 1) + (NB + 1) - 1
        slot_cells = float(B) * Dtot * C

        def report(label, dt):
            print(f"NA={NA} B={B} {label}: {true_cells/dt/1e9:.2f} Gtrue/s "
                  f"{slot_cells/dt/1e9:.2f} Gslot/s ({dt*1e3:.1f} ms)",
                  flush=True)

        # device-only stage decomposition (one dispatch, M chained sweeps;
        # the ~30 ms tunnel round-trip cancels out)
        import jax.numpy as jnp

        from coati_tpu.align.engine import fused_align_ops_impl

        M = int(os.environ.get("PROBE_DEVLOOP", "10"))
        a_, b_, la_, lb_ = args[:4]

        def gcp(acc):
            return gc + acc * jnp.float32(1e-30)

        stages = [
            ("dev full(plain)", lambda acc: jnp.min(fused_align_ops_impl(
                a_, b_, la_, lb_, table, gcp(acc), k=1, use_pallas=True,
                code_cols=cc, bc=bc, du=du, stack_R=1)[1])),
            ("dev dp+bp", lambda acc: jnp.min(wavefront_pallas(
                a_, b_, la_, lb_, table, gcp(acc), k=1, bc=bc, want_bp=True,
                code_cols=cc, du=du)[0][0])),
            ("dev dp-only", lambda acc: jnp.min(wavefront_pallas(
                a_, b_, la_, lb_, table, gcp(acc), k=1, bc=bc, want_bp=False,
                code_cols=cc, du=du)[0][0])),
            (f"dev stacked-dp R={R}", lambda acc: jnp.min(
                wavefront_pallas_stacked(
                    a_, b_, la_, lb_, table, gcp(acc), k=1, R=R, bc=bc,
                    code_cols=cc, du=du)[0][0])),
            (f"dev full(stacked R={R})", lambda acc: jnp.min(
                fused_align_ops_impl(
                    a_, b_, la_, lb_, table, gcp(acc), k=1, use_pallas=True,
                    code_cols=cc, bc=bc, du=du, stack_R=R)[1])),
        ]
        only = os.environ.get("PROBE_STAGES")  # comma substrings
        for label, step in stages:
            if only and not any(s in label for s in only.split(",")):
                continue
            try:
                report(label, devloop_time(step, M))
            except Exception as exc:
                print(f"{label} FAIL {type(exc).__name__}: "
                      f"{str(exc)[:100]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
