"""One-off probe: decompose the triplet path's time budget on TPU.

The bench's triplet number (64 pairs x ~999 nt) is END-TO-END through
triplet_align_batch: host encode/pack, device forward (Pallas factored
kernel), device traceback (scan of blocks + inner while walk), result
fetch, host string decode. This tool times each stage separately so the
roofline in docs/PERF.md is measured, not guessed.

Usage: python tools/probe_triplet.py [--nt 999] [--n 64] [--bc 8]
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


def t(fn, reps=3):
    fn()  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        fn()
    return (time.time() - t0) / reps


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nt", type=int, default=999)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--bc", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from bench import make_pairs
    from coati_tpu.structs import AlignmentParams
    from coati_tpu.triplet_hmm import build_triplet_model, encode_triplet_pair
    from coati_tpu import triplet_wavefront as tw
    from coati_tpu.triplet_wavefront import (
        _pack_batch,
        _triplet_rows,
        _triplet_traceback,
        triplet_align_batch,
    )

    if args.bc:
        tw.TRI_PALLAS_BC = args.bc

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(20260820)
    aln = AlignmentParams()
    aln.model = "tri-mg"
    model = build_triplet_model(aln)
    pairs = make_pairs(args.n, rng, length_mix=[(args.nt, 1.0)])
    true_cells = sum(len(a) * len(d) for a, d in pairs)

    # --- host prep ---------------------------------------------------------
    t0 = time.time()
    enc = [encode_triplet_pair(model, a, d) for a, d in pairs]
    anc_p, des_p, lens_t, lens_m, ins_off, tables, n_cod = _pack_batch(
        model, [e[0] for e in enc], [e[1] for e in enc]
    )
    t_prep = time.time() - t0
    logP64_t, me_t, gc_t = tables
    B, m = des_p.shape
    Cc = ((m + 1 + 127) // 128) * 128
    print(f"# shapes: B={B} n_cod={n_cod} m={m} Cc128={Cc}", file=sys.stderr)

    aj = jnp.asarray(anc_p)
    dj = jnp.asarray(des_p)
    io = jnp.asarray(ins_off)

    # --- forward: Pallas kernel vs XLA scan --------------------------------
    from coati_tpu.kernels.triplet_pallas import triplet_rows_pallas

    bc = tw.TRI_PALLAS_BC
    padB = (-B) % bc
    if padB:
        aj_p = jnp.concatenate([aj, jnp.zeros((padB, n_cod), jnp.int32)])
        dj_p = jnp.concatenate([dj, jnp.zeros((padB, m), jnp.int32)])
        io_p = jnp.concatenate(
            [io, jnp.broadcast_to(io[:1], (padB, m + 1))]
        )
    else:
        aj_p, dj_p, io_p = aj, dj, io

    def fwd_pallas():
        g, a = triplet_rows_pallas(
            aj_p, dj_p, io_p, logP64_t, me_t, gc_t, n_cod=n_cod, bc=bc
        )
        np.asarray(jax.device_get(g[-1, 0, 0, :8]))
        return g, a

    def fwd_xla():
        g, a = _triplet_rows(
            aj, dj, io, logP64_t, me_t, gc_t, n_cod=n_cod
        )
        np.asarray(jax.device_get(g[-1, 0, 0, :8]))
        return g, a

    dt_fp = t(fwd_pallas, args.reps)
    dt_fx = t(fwd_xla, args.reps)
    grid, amax = fwd_pallas()
    if padB:
        grid = grid[:, :, :B]
        amax = amax[:, :, :B]

    # --- traceback ---------------------------------------------------------
    def walk():
        ops, i_e, j_e, score = _triplet_traceback(
            grid, amax, aj, dj, io, jnp.asarray(lens_t),
            jnp.asarray(lens_m), logP64_t, me_t, gc_t, n_cod=n_cod,
        )
        np.asarray(jax.device_get(score))
        return ops, i_e, j_e, score

    dt_walk = t(walk, args.reps)
    ops, i_e, j_e, score = walk()

    # --- fetch + host decode ----------------------------------------------
    def fetch():
        return np.asarray(jax.device_get(ops))

    dt_fetch = t(fetch, args.reps)
    ops_h = fetch()
    ie_h = np.asarray(jax.device_get(i_e))
    je_h = np.asarray(jax.device_get(j_e))

    def decode():
        return [
            tw._decode_ops(a, d, ops_h[:, b], int(ie_h[b]), int(je_h[b]))
            for b, (a, d) in enumerate(pairs)
        ]

    dt_dec = t(decode, args.reps)

    # --- end-to-end (the bench's number) -----------------------------------
    def e2e():
        return triplet_align_batch(model, pairs)

    dt_e2e = t(e2e, 1)

    def row(name, dt):
        print(f"{name:18s} {dt*1e3:9.1f} ms   "
              f"{true_cells/dt/1e6:8.0f} Mcells/s")

    print(f"# {args.n} pairs x {args.nt} nt, {true_cells/1e6:.0f} Mcells")
    row("host prep", t_prep)
    row("forward pallas", dt_fp)
    row("forward xla", dt_fx)
    row("walk (device)", dt_walk)
    row("fetch ops", dt_fetch)
    row("host decode", dt_dec)
    row("end-to-end", dt_e2e)
    return 0


if __name__ == "__main__":
    sys.exit(main())
