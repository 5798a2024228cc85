"""Sweep Pallas kernel knobs (du, bc) on the real TPU in one warm process.

Measures the fused DP+traceback step (what the engine actually runs) on
representative bucket shapes from bench.py's length mix, printing
slot-cells/s and true-cells/s per configuration. Use to pick the defaults
baked into engine.PALLAS_DU / PALLAS_BC.
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


def _device_time(args, table, gc, kw, M: int):
    """True device seconds per fused-align call, tunnel-independent.

    Runs the step M times inside ONE lax.fori_loop dispatch, feeding a
    tiny function of the previous score back into the gap constants so the
    compiler cannot hoist or CSE iterations (numerics are perturbed by
    ~1e-30 — fine for timing, never used for results). One dispatch means
    the tunnel round-trip amortizes to ~0 over M device sweeps."""
    if not M:
        return None
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from coati_tpu.align.engine import fused_align_ops_impl

    @functools.partial(
        jax.jit,
        static_argnames=("k", "use_pallas", "code_cols", "bc", "du",
                         "stack_R", "M"),
    )
    def looped(aseq, bseq, la, lb, table, gc, *, M, **kw):
        def body(_, acc):
            _, score = fused_align_ops_impl(
                aseq, bseq, la, lb, table, gc + acc * jnp.float32(1e-30),
                **kw,
            )
            return jnp.min(score)

        return jax.lax.fori_loop(0, M, body, jnp.float32(0.0))

    out = looped(*args, table, gc, M=M, **kw)
    out.block_until_ready()  # compile + warm
    t0 = time.time()
    looped(*args, table, gc, M=M, **kw).block_until_ready()
    return (time.time() - t0) / M


def main() -> int:
    import jax
    import jax.numpy as jnp

    from coati_tpu.align.engine import _align_step_jit
    from coati_tpu.align.wavefront import gap_consts_array
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

    # (NA nt, NB nt, B): one bucket per bench length class, batch sized so
    # each call carries enough work to swamp the ~33 ms tunnel round-trip
    shapes = [(192, 192, 2048), (480, 480, 512), (1056, 1056, 128)]
    shapes = [
        tuple(int(v) for v in s.split("x"))
        for s in os.environ.get(
            "TUNE_SHAPES", "192x192x2048,480x480x512,1056x1056x128"
        ).split(",")
    ]
    dus = [int(x) for x in os.environ.get("TUNE_DU", "1,2,4,8").split(",")]
    bcs = [int(x) for x in os.environ.get("TUNE_BC", "32").split(",")]
    rs = [int(x) for x in os.environ.get("TUNE_R", "1").split(",")]
    reps = int(os.environ.get("TUNE_REPS", "5"))
    # TUNE_DEVLOOP=M adds a device-only rate: M sweeps in one dispatch
    devloop = int(os.environ.get("TUNE_DEVLOOP", "0"))

    for NA, NB, B in shapes:
        aseq = rng.integers(0, 183, (B, NA)).astype(np.int32)
        bseq = rng.integers(0, 4, (B, NB)).astype(np.int32)
        la = np.full(B, NA, np.int32)
        lb = np.full(B, NB, np.int32)
        args = (jnp.asarray(aseq), jnp.asarray(bseq), jnp.asarray(la),
                jnp.asarray(lb))
        true_cells = float(B) * NA * NB
        for bc in bcs:
            for du in dus:
                for R in rs:
                    kw = dict(k=1, use_pallas=True, code_cols=(0, 1, 2, 3),
                              bc=bc, du=du, stack_R=R)
                    if R > 1 and (B // R) % bc != 0:
                        continue
                    try:
                        ops, score = _align_step_jit(*args, table, gc, **kw)
                        np.asarray(score)  # block (compile + run 1)
                        # async back-to-back launches, block once at the
                        # end: mirrors the engine's chunk pipeline
                        t0 = time.time()
                        outs = [
                            _align_step_jit(*args, table, gc, **kw)
                            for _ in range(reps)
                        ]
                        for _, s in outs:
                            np.asarray(s)
                        dt = (time.time() - t0) / reps
                        ddt = _device_time(args, table, gc, kw, devloop)
                        dev_s = (f" | device {true_cells/ddt/1e9:.2f} G "
                                 f"({ddt*1e3:.1f} ms)") if ddt else ""
                        print(f"NA={NA} B={B} bc={bc} du={du} R={R}: "
                              f"{true_cells/dt/1e9:.2f} Gcells/s "
                              f"({dt*1e3:.0f} ms/call){dev_s}", flush=True)
                    except Exception as exc:
                        print(f"NA={NA} B={B} bc={bc} du={du} R={R}: FAIL "
                              f"{type(exc).__name__}: {str(exc)[:120]}",
                              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
