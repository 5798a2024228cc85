"""Pallas TPU wavefront kernel for the pair-HMM DP.

Why Pallas: the XLA scan version round-trips its diagonal carries plus a
[B, 15, C] emission slice through HBM every step — ~100 B/cell of HBM
traffic for ~40 flops/cell of VPU work. This kernel keeps all DP state in
VMEM and streams only packed backpointers (1 B/cell, optional) plus corner
scores off-chip.

Coordinate system: buffers are indexed by u = i mod C (ancestor ROW index
modulo the slot count) rather than by column j. On diagonal d the active
rows are (d-C, d], so u <-> (i, j) is a bijection per diagonal and the
recurrence sources become circular u-shifts (the wrapped neighbor is
always the mathematically correct cell — no boundary fill needed):

    match  source (i-1, j-1), diag d-2: u-shift 1
    delete source (i-k, j  ), diag d-k: u-shift k
    insert source (i,   j-k), diag d-k: u-shift 0

The payoff is the emission bookkeeping: in u-space the table-row window
Gwin[15, BC, C] is STATIC per column (column u always belongs to one row
at a time) — one fresh column write per step instead of rolling fifteen
planes — and the descendant-code window is a single int32 plane whose roll
circulates the code sequence b[j] with per-column phase (each column's j
advances by one per step; its neighbor already holds the next code).
Margin values, body masks, and corner positions are precomputed per
diagonal in u-space on the XLA side and streamed as (1, 1, C) blocks.

Numerics (f32 op order, margin formulas, tie-break comparisons) are
identical to align/wavefront.py and therefore to the reference C++
(align_pair.cc:62-139). Backpointers are emitted in u-space; the traceback
walk indexes bp[i+j, p, i mod C].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coati_tpu.constants import F32_LOWEST

LOWEST = float(F32_LOWEST)  # plain float: jnp scalars get captured as consts


def _argmax_mdi_i32(m, d, i):
    code = jnp.where(d > m, 1, 0)
    best = jnp.maximum(m, d)
    return jnp.where(i > best, 2, code)


def _make_kernel(k: int, NA: int, C: int, BC: int, Dtot: int, ring: int,
                 want_bp: bool):
    def kernel(
        grow_ref,  # [1, BC, 15] table row for a[d-k] (auto-pipelined)
        binit_ref,  # [BC, C] int32: bwin layout at d=0 (resident)
        cd_ref,  # [BC, C] int32 per-pair corner diagonal (broadcast)
        cu_ref,  # [BC, C] int32 per-pair corner u-column (broadcast)
        body_ref,  # [1, 1, C] f32 1.0 where body cell on this diagonal (u)
        margM_ref,  # [1, 1, C] f32 margin-or-LOWEST for M (u-space)
        margD_ref,  # [1, 1, C] f32
        margI_ref,  # [1, 1, C] f32
        gc_ref,  # [1, 4] f32 gap constants in SMEM
        *refs,
    ):
        if want_bp:
            (bp_ref, corner_ref, Mr_ref, Dr_ref, Ir_ref, gwin_ref,
             bwin_ref, cap_ref) = refs
        else:
            (corner_ref, Mr_ref, Dr_ref, Ir_ref, gwin_ref, bwin_ref,
             cap_ref) = refs
            bp_ref = None
        d = pl.program_id(1)
        ng = gc_ref[0, 0]
        gs = gc_ref[0, 1]
        go = gc_ref[0, 2]
        ge = gc_ref[0, 3]
        gek1 = ge * jnp.float32(k - 1)
        gek = ge * jnp.float32(k)

        @pl.when(d == 0)
        def _init():
            cap_ref[...] = jnp.full((3, BC, C), LOWEST, jnp.float32)
            bwin_ref[...] = binit_ref[...]
            gwin_ref[...] = jnp.zeros((15, BC, C), jnp.float32)
            low = jnp.full((ring, BC, C), LOWEST, jnp.float32)
            Mr_ref[...] = low
            Dr_ref[...] = low
            Ir_ref[...] = low

        @pl.when(d > 0)
        def _advance():
            # each column's descendant index j advances by one; the
            # neighboring column already holds that code (roll circulates)
            bwin_ref[...] = pltpu.roll(bwin_ref[...], 1, axis=1)

        # gwin: write the entering row's table values into its column
        u_new = jax.lax.rem(d, C)
        fresh = grow_ref[0]  # [BC, 15]
        valid_fresh = jnp.logical_and(d - k >= 0, d - k < NA)
        fresh_g = jnp.where(valid_fresh, jnp.transpose(fresh, (1, 0)), 0.0)
        gwin_ref[:, :, pl.ds(u_new, 1)] = fresh_g[:, :, None]

        bwin = bwin_ref[...]
        win = gwin_ref[...]
        sub = jnp.zeros((BC, C), jnp.float32)
        for c in range(15):
            sub = jnp.where(bwin == c, win[c], sub)

        # --- ring reads (circular u-shifts) ---------------------------------
        def ring_at(ref, dd):
            idx = jax.lax.rem(dd + ring * 4, ring)
            return ref[pl.ds(idx, 1)][0]

        p2M = pltpu.roll(ring_at(Mr_ref, d - 2), 1, axis=1)
        p2D = pltpu.roll(ring_at(Dr_ref, d - 2), 1, axis=1)
        p2I = pltpu.roll(ring_at(Ir_ref, d - 2), 1, axis=1)
        pkMs = ring_at(Mr_ref, d - k)  # insert source, shift 0
        pkIs = ring_at(Ir_ref, d - k)
        pkM = pltpu.roll(pkMs, k, axis=1)  # delete source, shift k
        pkD = pltpu.roll(ring_at(Dr_ref, d - k), k, axis=1)
        pkI = pltpu.roll(pkIs, k, axis=1)

        # --- recurrence (f32 op order == align_pair.cc:98-124) -------------
        m2m = ((p2M + ng) + ng) + sub
        d2m = (p2D + gs) + sub
        i2m = ((p2I + gs) + ng) + sub
        m2d = ((pkM + ng) + go) + gek1
        i2d = ((pkI + gs) + go) + gek1
        d2d = pkD + gek
        m2i = (pkMs + go) + gek1
        i2i = pkIs + gek

        M = jnp.maximum(jnp.maximum(m2m, d2m), i2m)
        D = jnp.maximum(jnp.maximum(m2d, d2d), i2d)
        I = jnp.maximum(m2i, i2i)

        # --- body/margin select (streamed per diagonal, u-space) ------------
        body = body_ref[0, 0] > 0.5  # [C]
        M = jnp.where(body[None, :], M, margM_ref[0, 0][None, :])
        D = jnp.where(body[None, :], D, margD_ref[0, 0][None, :])
        I = jnp.where(body[None, :], I, margI_ref[0, 0][None, :])

        # --- ring write -----------------------------------------------------
        slot = jax.lax.rem(d, ring)
        Mr_ref[pl.ds(slot, 1)] = M[None]
        Dr_ref[pl.ds(slot, 1)] = D[None]
        Ir_ref[pl.ds(slot, 1)] = I[None]

        # --- backpointers (traceback-form comparisons) ----------------------
        if want_bp:
            bp_m = _argmax_mdi_i32((p2M + ng) + ng, p2D + gs, (p2I + gs) + ng)
            bp_d = _argmax_mdi_i32((pkM + ng) + go, pkD + ge, (pkI + gs) + go)
            bp_i = jnp.where(pkMs + go > pkIs + ge, 0, 2)
            bp_ref[0] = (bp_m | (bp_d << 2) | (bp_i << 4)).astype(jnp.uint8)

        # --- corner capture -------------------------------------------------
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (BC, C), 1)
        sel = (d == cd_ref[...]) & (u_iota == cu_ref[...])
        cap = cap_ref[...]
        cap_ref[...] = jnp.stack(
            [jnp.where(sel, M, cap[0]), jnp.where(sel, D, cap[1]),
             jnp.where(sel, I, cap[2])], axis=0)

        @pl.when(d == Dtot - 1)
        def _fin():
            red = jnp.max(cap_ref[...], axis=2)  # [3, BC]
            out = jnp.broadcast_to(red[:, :, None], (3, BC, 128))
            corner_ref[0:3] = out
            corner_ref[3:8] = jnp.zeros((5, BC, 128), jnp.float32)

    return kernel


def _diag_tables_u(k, NA, C, Dtot, gap_consts):
    """Per-diagonal body mask and margin values in u-space, [Dtot, C] f32.

    For (d, u): j = (d - u) mod C, i = d - j. Same f32 margin formulas as
    the XLA kernel (align_pair.cc:84-90)."""
    ng, gs, go, ge = (gap_consts[i] for i in range(4))
    d = jnp.arange(Dtot, dtype=jnp.int32)[:, None]
    u = jnp.arange(C, dtype=jnp.int32)[None, :]
    j = jnp.mod(d - u, C)
    i = d - j
    R = NA + k
    body = ((i >= k) & (i < R) & (j >= k)).astype(jnp.float32)
    jf = j.astype(jnp.float32)
    if_ = i.astype(jnp.float32)
    mM = jnp.where((i == k - 1) & (j == k - 1), jnp.float32(0.0), LOWEST)
    ins_ok = (i == k - 1) & (j >= 2 * k - 1) & ((j - (k - 1)) % k == 0)
    mI = jnp.where(ins_ok, go + ge * (jf - 1.0), LOWEST)
    del_ok = (j == k - 1) & (i >= 2 * k - 1) & ((i - (k - 1)) % k == 0)
    mD = jnp.where(del_ok, (ng + go) + ge * (if_ - 1.0), LOWEST)
    return body, mM, mD, mI


@functools.partial(
    jax.jit, static_argnames=("k", "bc", "want_bp", "interpret")
)
def wavefront_pallas(
    aseq, bseq, lens_a, lens_b, table, gap_consts, *, k: int,
    bc: int = 32, want_bp: bool = True, interpret: bool = False
):
    """Viterbi wavefront via Pallas (u-space layout). Returns
    ((cM, cD, cI), bp); bp is None if want_bp=False. bp is u-space indexed:
    cell (i, j) lives at bp[i+j, p, i mod C]."""
    B, NA = aseq.shape
    NB = bseq.shape[1]
    C = ((NB + k + 127) // 128) * 128
    R = NA + k
    Dtot = R + (NB + k) - 1
    ring = max(k, 2) + 1
    assert B % bc == 0, (B, bc)

    # G rows: table[a[t]] for t in [0, NA), laid out [NA, B, 15]
    G = jnp.transpose(jnp.take(table, aseq, axis=0), (1, 0, 2))

    # descendant codes per slot j (99 = never matches); bwin at d=0 has
    # column u holding code for j = (0 - u) mod C, i.e. b_slot reversed
    # about column 0
    b_slot = jnp.pad(
        bseq, ((0, 0), (k, C - NB - k)), constant_values=99
    ).astype(jnp.int32)
    binit = jnp.concatenate(
        [b_slot[:, :1], jnp.flip(b_slot[:, 1:], axis=1)], axis=1
    )

    corner_d = (lens_a + lens_b + jnp.int32(2 * (k - 1)))[:, None]
    corner_u = jnp.mod(lens_a + jnp.int32(k - 1), C)[:, None]
    cd = jnp.broadcast_to(corner_d, (B, C)).astype(jnp.int32)
    cu = jnp.broadcast_to(corner_u, (B, C)).astype(jnp.int32)
    gc = gap_consts.reshape(1, 4).astype(jnp.float32)
    body, mM, mD, mI = (
        x[:, None, :] for x in _diag_tables_u(k, NA, C, Dtot, gap_consts)
    )

    kernel = _make_kernel(k, NA, C, bc, Dtot, ring, want_bp)
    grid = (B // bc, Dtot)

    in_specs = [
        pl.BlockSpec(
            (1, bc, 15),
            lambda bi, d: (jnp.clip(d - k, 0, NA - 1), bi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((bc, C), lambda bi, d: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, C), lambda bi, d: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, C), lambda bi, d: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda bi, d: (d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda bi, d: (d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda bi, d: (d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, C), lambda bi, d: (d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda bi, d: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = []
    out_shape = []
    if want_bp:
        out_specs.append(
            pl.BlockSpec((1, bc, C), lambda bi, d: (d, bi, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Dtot, B, C), jnp.uint8))
    out_specs.append(
        pl.BlockSpec((8, bc, 128), lambda bi, d: (0, bi, 0),
                     memory_space=pltpu.VMEM)
    )
    out_shape.append(jax.ShapeDtypeStruct((8, B, 128), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ring, bc, C), jnp.float32),
            pltpu.VMEM((ring, bc, C), jnp.float32),
            pltpu.VMEM((ring, bc, C), jnp.float32),
            pltpu.VMEM((15, bc, C), jnp.float32),
            pltpu.VMEM((bc, C), jnp.int32),
            pltpu.VMEM((3, bc, C), jnp.float32),
        ],
        interpret=interpret,
    )(G, binit, cd, cu, body, mM, mD, mI, gc)

    if want_bp:
        bp, corner = outs
    else:
        (corner,) = outs
        bp = None

    ng, gs = gap_consts[0], gap_consts[1]
    cM = (corner[0, :, 0] + ng) + ng
    cD = corner[1, :, 0] + gs
    cI = (corner[2, :, 0] + gs) + ng
    return (cM, cD, cI), bp
