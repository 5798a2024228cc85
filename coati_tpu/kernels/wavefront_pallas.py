"""Pallas TPU wavefront kernel for the pair-HMM DP.

Why Pallas: the XLA scan version round-trips its diagonal carries (6 x
[B, C] f32) plus a [B, 15, C] emission slice through HBM every step —
~100 B/cell of HBM traffic for ~40 flops/cell of VPU work, capping
throughput at ~1.5 Gcells/s on v5e. This kernel keeps everything resident
in VMEM:

  - ring buffers of the last max(k,2)+1 diagonals (M/D/I),
  - a sliding emission window Gwin[15, BC, C] holding table rows for the
    ancestor positions intersecting the current diagonal, advanced by a
    roll + one fresh row per step (the row arrives via an auto-pipelined
    input block, index-mapped to grid step d),
  - resident float one-hot masks of the descendant codes, so the emission
    is 15 fused multiply-adds per cell,
  - per-diagonal margin values and body masks precomputed once per call
    on the XLA side and streamed in as (1, C) blocks per step.

Grid = (batch_chunks, diagonals); only packed backpointers (1 B/cell,
optional) and the captured corner scores leave the chip. Numerics (f32 op
order, margin formulas, tie-break comparisons) are identical to
align/wavefront.py and therefore to the reference C++
(align_pair.cc:62-139).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coati_tpu.constants import F32_LOWEST

LOWEST = float(F32_LOWEST)  # plain float: jnp scalars get captured as consts


def _shift_right(x, s):
    """x[..., j] <- x[..., j-s] along the last (slot) axis, LOWEST fill."""
    if s == 0:
        return x
    rolled = pltpu.roll(x, s, axis=x.ndim - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(j < s, LOWEST, rolled)


def _argmax_mdi_i32(m, d, i):
    code = jnp.where(d > m, 1, 0)
    best = jnp.maximum(m, d)
    return jnp.where(i > best, 2, code)


def _lse(a, b):
    """f32 logSumExp mirroring the reference's piecewise log1p_exp
    (utils.hpp:134-156); identical to align.wavefront._lse."""
    mx = jnp.maximum(a, b)
    y = -jnp.abs(a - b)
    t = jnp.where(
        y <= jnp.float32(-16.0),
        jnp.exp(y),
        jnp.log1p(jnp.exp(jnp.minimum(y, jnp.float32(0.0)))),
    )
    return mx + t


def _make_kernel(k: int, NA: int, C: int, BC: int, Dtot: int, ring: int,
                 want_bp: bool, nc: int, mode: str = "viterbi",
                 du: int = 1, n_steps: int = 0, seg: bool = False,
                 fold: int = 1):
    """Stacked-state kernel body: the M/D/I diagonals live as ONE ring
    plane [ring, 3, BC, C], so each step issues 2 ring reads + 2 shifts +
    a handful of stacked adds instead of 6 reads + 5 shifts + ~16 scalar-
    plane adds. Every original f32 add maps to exactly one stacked add
    (state lanes with fewer adds pad with +0.0, which is exact here: no
    operand sum can round to -0.0), so results are bit-identical to the
    per-state form and to align_pair.cc:94-129."""
    def kernel(
        grow_ref,  # [du, BC, nc] table rows for a[d-k] (pre-shifted, padded)
        ohb_ref,  # [nc, BC, C] f32 one-hot of descendant codes (resident)
        cd_ref,  # [BC, C] int32 per-pair corner diagonal (broadcast)
        cj_ref,  # [BC, C] int32 per-pair corner slot (broadcast)
        *refs,
    ):
        Mout_ref = Dout_ref = Iout_ref = bp_ref = None
        ringo_ref = gwino_ref = capo_ref = None
        body_ref = marg_ref = None
        corner_ref = None
        d0v = 0
        if seg:
            # carried-state segment: margins are computed in-kernel from
            # the global diagonal index (streaming [Dtot, C] tables would
            # cost O(n*m) HBM — the thing this path exists to avoid);
            # [1,1] SMEM global start diagonal + carried ring/window/corner
            gc_ref, d0_ref, ring0_ref, gwin0_ref, cap0_ref = refs[:5]
            refs = refs[5:]
            d0v = d0_ref[0, 0]
            if want_bp:
                bp_ref = refs[0]
                refs = refs[1:]
            (ringo_ref, gwino_ref, capo_ref,
             Pr_ref, gwin_ref, cap_ref) = refs
        else:
            body_ref, marg_ref, gc_ref = refs[:3]
            refs = refs[3:]
            if mode == "forward":
                (Mout_ref, Dout_ref, Iout_ref, corner_ref,
                 Pr_ref, gwin_ref, cap_ref) = refs
            elif want_bp:
                bp_ref, corner_ref, Pr_ref, gwin_ref, cap_ref = refs
            else:
                corner_ref, Pr_ref, gwin_ref, cap_ref = refs
        plus2 = _lse if mode == "forward" else jnp.maximum
        g = pl.program_id(1)
        ng = gc_ref[0, 0]
        gs = gc_ref[0, 1]
        go = gc_ref[0, 2]
        ge = gc_ref[0, 3]
        gek1 = ge * jnp.float32(k - 1)
        gek = ge * jnp.float32(k)
        zero = jnp.float32(0.0)

        # per-state broadcast constants [3, 1, 1]: one stacked add applies
        # a different scalar to each of the M/D/I lanes
        si = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 1), 0)

        def c3(a, b, c):
            return jnp.where(si == 0, a, jnp.where(si == 1, b, c))

        cA = c3(ng, gs, gs)       # (tmm | tdm | tim) first add
        cB = c3(ng, zero, ng)     # second add
        cC = c3(ng, zero, gs)     # (tmd | pkD | tid) first add
        cD_ = c3(go, zero, go)    # second add
        cE = c3(gek1, gek, gek1)  # (m2d | d2d | i2d) extension add
        cF = c3(go, zero, gek)    # (tmi | - | i2i)

        @pl.when(g == 0)
        def _init():
            if seg:
                cap_ref[...] = cap0_ref[...]
                gwin_ref[...] = gwin0_ref[...]
                Pr_ref[...] = ring0_ref[...]
            else:
                cap_ref[...] = jnp.full((3, BC, C), LOWEST, jnp.float32)
                gwin_ref[...] = jnp.zeros((nc, BC, C), jnp.float32)
                # clear stale state from the previous batch chunk so results
                # are bit-deterministic (only never-visited cells see it)
                Pr_ref[...] = jnp.full(
                    (ring, 3, BC, C), LOWEST, jnp.float32
                )

        # fold > 1: the slot axis is laid out as (fold, W) with fold along
        # the ROW axis — row r of pair b (rows b*fold .. b*fold+fold-1)
        # holds slots [f*W, (f+1)*W) where f = r % fold and W = C (this
        # kernel's lane width). Slot-index-dependent logic (margins,
        # corner capture) uses the folded jv; ring shifts pull their
        # wrapped lanes from the previous fold row.
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (BC, C), 1)
        if fold > 1:
            fr = jax.lax.broadcasted_iota(jnp.int32, (BC, C), 0) % fold
            j_i = fr * C + lane_i
        else:
            j_i = lane_i
        j3 = jax.lax.broadcasted_iota(jnp.int32, (nc, BC, C), 2)
        # hoisted shift-fill masks (loop-invariant)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (3, BC, C), 2)
        mask1 = lane3 < 1
        maskk = lane3 < k
        if fold > 1:
            row3 = jax.lax.broadcasted_iota(jnp.int32, (3, BC, C), 1)
            first3 = (row3 % fold) == 0  # rows holding slots [0, W)
        win = gwin_ref[...]
        cap = cap_ref[...]

        def shift3(x, s, mask):
            rolled = pltpu.roll(x, s, axis=2)
            if fold > 1:
                # wrapped lanes (w < s) take x[f-1, W-s+w] from the
                # previous fold row; fold row 0 is the true slot-0 margin
                prev = pltpu.roll(rolled, 1, axis=1)
                return jnp.where(
                    mask, jnp.where(first3, LOWEST, prev), rolled
                )
            return jnp.where(mask, LOWEST, rolled)

        # NOTE r4: a static-ring variant (du % ring == 0, value-carried
        # planes + k=1 write-side pre-shifted ring) was measured SLOWER
        # (480 nt stacked: 6.6-7.1 vs 7.8 G) — value-carrying the ring
        # forces live [3, BC, C] temporaries through VMEM each grid step,
        # costing more than the rem + dynamic-slice reads it removed.

        # du diagonals per grid step: amortizes the per-step fixed work
        # (index maps, pipeline turnaround) over du full-width row updates
        for t in range(du):
            d = d0v + g * du + t

            # --- advance emission window: Gwin[c,:,j] = table[a[d-k-j], c]
            # (G is pre-shifted by k and zero-padded on the XLA side)
            fresh = grow_ref[t]  # [BC, nc]
            win = pltpu.roll(win, 1, axis=2)
            fresh_t = jnp.transpose(fresh, (1, 0))[:, :, None]  # [nc, BC, 1]
            win = jnp.where(j3 == 0, fresh_t, win)

            # --- emission: nc multiply-adds against resident one-hot masks
            oh = ohb_ref[...]
            sub = oh[0] * win[0]
            for c in range(1, nc):
                sub = sub + oh[c] * win[c]

            # --- ring reads (one [3, BC, C] plane per diagonal) -------------
            def ring_at(dd):
                idx = jax.lax.rem(dd + ring * 4, ring)
                return Pr_ref[pl.ds(idx, 1)][0]

            s1 = shift3(ring_at(d - 2), 1, mask1)  # [p2Ms, p2Ds, p2Is]
            pk = ring_at(d - k)                    # [pkM, pkD, pkI]
            s2 = shift3(pk, k, maskk)              # [pkMs, -, pkIs]

            # --- recurrence (f32 op order == align_pair.cc:98-124) ---------
            # stacked T-terms double as backpointer comparands below
            T1 = (s1 + cA) + cB        # [tmm, tdm, tim]
            mt = T1 + sub[None]        # [m2m, d2m, i2m]
            M = plus2(plus2(mt[0], mt[1]), mt[2])
            Ud = (pk + cC) + cD_       # [tmd, pkD, tid]
            V = Ud + cE                # [m2d, d2d, i2d]
            D = plus2(plus2(V[0], V[1]), V[2])
            Wi = s2 + cF               # [tmi, -, i2i]
            m2i = Wi[0] + gek1
            I = plus2(m2i, Wi[2])

            P = jnp.stack([M, D, I], axis=0)

            # --- body/margin select ------------------------------------------
            if seg:
                # computed in place from the diagonal index (f32 formulas
                # identical to _diag_tables); jv is the FOLDED slot index
                # when fold > 1
                jv = j_i
                iv = d - jv
                body = (iv >= k) & (iv < NA + k) & (jv >= k)
                jf = jv.astype(jnp.float32)
                if_ = iv.astype(jnp.float32)
                mMv = jnp.where((iv == k - 1) & (jv == k - 1),
                                jnp.float32(0.0), LOWEST)
                ins_ok = ((iv == k - 1) & (jv >= 2 * k - 1)
                          & ((jv - (k - 1)) % k == 0))
                mIv = jnp.where(ins_ok, go + ge * (jf - 1.0), LOWEST)
                del_ok = ((jv == k - 1) & (iv >= 2 * k - 1)
                          & ((iv - (k - 1)) % k == 0))
                mDv = jnp.where(del_ok, (ng + go) + ge * (if_ - 1.0), LOWEST)
                mvals = jnp.stack([mMv, mDv, mIv], axis=0)  # [3, BC, C]
                P = jnp.where(body[None], P, mvals)
            else:
                body = body_ref[t, 0] > 0.5  # [C]
                P = jnp.where(
                    body[None, None, :], P, marg_ref[t][:, None, :]
                )

            # --- ring write --------------------------------------------------
            slot = jax.lax.rem(d, ring)
            Pr_ref[pl.ds(slot, 1)] = P[None]

            # --- forward: stream the full diagonals out ----------------------
            if mode == "forward":
                Mout_ref[t] = P[0]
                Dout_ref[t] = P[1]
                Iout_ref[t] = P[2]

            # --- backpointers (traceback-form comparisons) -------------------
            if want_bp:
                bp_m = _argmax_mdi_i32(T1[0], T1[1], T1[2])
                bp_d = _argmax_mdi_i32(Ud[0], Ud[1] + ge, Ud[2])
                bp_i = jnp.where(Wi[0] > s2[2] + ge, 0, 2)
                bp_ref[t] = (bp_m | (bp_d << 2) | (bp_i << 4)).astype(
                    jnp.uint8
                )

            # --- corner capture ----------------------------------------------
            sel = (d == cd_ref[...]) & (j_i == cj_ref[...])
            cap = jnp.where(sel[None], P, cap)

        gwin_ref[...] = win
        cap_ref[...] = cap

        if seg:
            @pl.when(g == n_steps - 1)
            def _export():
                ringo_ref[...] = Pr_ref[...]
                gwino_ref[...] = gwin_ref[...]
                capo_ref[...] = cap_ref[...]
        else:
            @pl.when(g == n_steps - 1)
            def _fin():
                red = jnp.max(cap_ref[...], axis=2)  # [3, BC]
                out = jnp.broadcast_to(red[:, :, None], (3, BC, 128))
                corner_ref[0:3] = out
                corner_ref[3:8] = jnp.zeros((5, BC, 128), jnp.float32)

    return kernel


def _diag_tables(k, NA, C, Dtot, gap_consts):
    """Per-diagonal body mask and margin values, [Dtot, C] f32 each.

    Same f32 formulas as the in-kernel versions previously (and as the XLA
    kernel), computed once per call instead of once per step."""
    ng, gs, go, ge = (gap_consts[i] for i in range(4))
    d = jnp.arange(Dtot, dtype=jnp.int32)[:, None]
    j = jnp.arange(C, dtype=jnp.int32)[None, :]
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
    jax.jit,
    static_argnames=("k", "bc", "want_bp", "interpret", "code_cols", "mode",
                     "du"),
)
def wavefront_pallas(
    aseq, bseq, lens_a, lens_b, table, gap_consts, *, k: int,
    bc: int = 32, want_bp: bool = True, interpret: bool = False,
    code_cols: tuple = tuple(range(15)), mode: str = "viterbi",
    du: int = 1,
):
    """Viterbi/Forward wavefront via Pallas. mode='viterbi' returns
    ((cM, cD, cI), bp) like align.wavefront.wavefront(mode='viterbi'); bp is
    None if want_bp=False. mode='forward' (log semiring) returns
    ((cM, cD, cI), (Ms, Ds, Is)) with the full [Dtot, B, C] state diagonals
    in slot-j layout, exactly like the XLA kernel's forward mode.

    code_cols: the nucleotide-code columns actually used by this batch's
    descendants (e.g. (0,1,2,3) for pure ACGT, (0,1,2,3,14) with N). The
    emission window and FMA chain shrink accordingly — ambiguity codes are
    rare in real data and cost 3x when present.

    du: diagonals computed per grid step (diagonal count padded up to a
    multiple; padding diagonals land on body=0 rows and are discarded)."""
    B, NA = aseq.shape
    NB = bseq.shape[1]
    # pad slots to the 128-lane tile
    C = ((NB + k + 127) // 128) * 128
    R = NA + k
    Dtot = R + (NB + k) - 1
    Dtot_p = -(-Dtot // du) * du
    n_steps = Dtot_p // du
    ring = max(k, 2) + 1
    assert B % bc == 0, (B, bc)
    nc = len(code_cols)

    # G rows shifted into diagonal space: G_shift[d] = table[a[d-k]] for
    # d in [k, k+NA), zeros outside — removes the in-kernel validity select
    table_sub = table[:, jnp.asarray(code_cols)]
    G = jnp.transpose(jnp.take(table_sub, aseq, axis=0), (1, 0, 2))
    G = jnp.pad(G, ((k, Dtot_p - k - NA), (0, 0), (0, 0)))

    # remap descendant codes into the compact column space
    lut = np.full(16, 99, np.int32)
    for idx, col in enumerate(code_cols):
        lut[col] = idx
    bseq_m = jnp.asarray(lut)[bseq]

    b_slot = jnp.pad(
        bseq_m, ((0, 0), (k, C - NB - k)), constant_values=99
    ).astype(jnp.int32)  # 99 = never matches a code
    oh_b = jax.nn.one_hot(b_slot, nc, axis=0, dtype=jnp.float32)  # [nc,B,C]
    corner_d = (lens_a + lens_b + jnp.int32(2 * (k - 1)))[:, None]
    corner_j = (lens_b + jnp.int32(k - 1))[:, None]
    cd = jnp.broadcast_to(corner_d, (B, C)).astype(jnp.int32)
    cj = jnp.broadcast_to(corner_j, (B, C)).astype(jnp.int32)
    gc = gap_consts.reshape(1, 4).astype(jnp.float32)
    body, mM, mD, mI = _diag_tables(k, NA, C, Dtot, gap_consts)
    body = body[:, None, :]
    marg = jnp.stack([mM, mD, mI], axis=1)  # [Dtot, 3, C]
    pad_d = ((0, Dtot_p - Dtot), (0, 0), (0, 0))
    body = jnp.pad(body, pad_d)  # padding diagonals: body=0 -> margins
    marg = jnp.pad(marg, pad_d, constant_values=LOWEST)

    if mode == "forward":
        want_bp = False
    kernel = _make_kernel(k, NA, C, bc, Dtot, ring, want_bp, nc, mode,
                          du=du, n_steps=n_steps)
    grid = (B // bc, n_steps)

    in_specs = [
        pl.BlockSpec((du, bc, nc), lambda bi, g: (g, bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nc, bc, C), lambda bi, g: (0, bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, C), lambda bi, g: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, C), lambda bi, g: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((du, 1, C), lambda bi, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((du, 3, C), lambda bi, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda bi, g: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = []
    out_shape = []
    if mode == "forward":
        for _ in range(3):
            out_specs.append(
                pl.BlockSpec((du, bc, C), lambda bi, g: (g, bi, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((Dtot_p, B, C), jnp.float32)
            )
    if want_bp:
        out_specs.append(
            pl.BlockSpec((du, bc, C), lambda bi, g: (g, bi, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((Dtot_p, B, C), jnp.uint8))
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
            pltpu.VMEM((ring, 3, bc, C), jnp.float32),
            pltpu.VMEM((nc, bc, C), jnp.float32),
            pltpu.VMEM((3, bc, C), jnp.float32),
        ],
        interpret=interpret,
    )(G, oh_b, cd, cj, body, marg, gc)

    aux = None
    if mode == "forward":
        Ms, Ds, Is, corner = outs
        aux = (Ms, Ds, Is)
    elif want_bp:
        bp, corner = outs
        aux = bp
    else:
        (corner,) = outs

    ng, gs = gap_consts[0], gap_consts[1]
    cM = (corner[0, :, 0] + ng) + ng
    cD = corner[1, :, 0] + gs
    cI = (corner[2, :, 0] + gs) + ng
    return (cM, cD, cI), aux


# --- diagonal-stacked sweep: R pairs per batch-row ---------------------------
# The plain wavefront wastes ~60% of its slot-cells: diagonal d of one
# pair's (NA+k)x(NB+k) matrix touches only part of the C-lane row, and the
# sweep runs NA+NB+2k-1 diagonals for NA*NB cells. Stacking R pairs along
# the DIAGONAL axis fills the pipeline: pair r of a row occupies diagonals
# [r*P, r*P + Dtot) (P >= NA+k, so the parallelograms tile), its ancestor
# rows simply concatenate into the G stream (slot j at diagonal d holds
# stream[d - j] = pair r's row i_loc = d - j - r*P), and utilization rises
# from ~40% to R*(NA+k)/((R+1)*P) ~ 80-90%.
#
# What changes vs the plain kernel:
#   - descendant one-hots: slot j's pair changes over the sweep, so TWO
#     banks of [nc, bc, C] rotate through VMEM via block index maps
#     (stacked_period's 2P >= Dloc + du bound proves every in-body cell's
#     pair is r_hi or r_hi - 1 within a grid step), and the emission
#     selects per cell with a single compare j <= d - r_hi*P;
#   - corner capture: same-row pairs may share a corner slot, so captures
#     go to parity-alternating cap banks, exported once per era (P
#     diagonals) to an [R, 3, bc, C] output — pair r's corner lands in era
#     r or r+1 and its bank is untouched by pair r+2 until after export;
#   - margins/body tables use the pair-local row i_loc = (d-j) - r*P.
# Every cell sees bit-identical inputs to the plain kernel, so results
# (including tie-breaks) are exact.


def _make_kernel_stacked(k: int, NA: int, C: int, BC: int, ring: int,
                         nc: int, du: int, n_steps: int, P: int, R: int):
    Pdu = P // du  # grid steps per era (P is a multiple of du)

    def kernel(
        grow_ref,   # [du, BC, nc] G-stream rows (concat of R ancestors)
        ohHI_ref,   # [1, nc, BC, C] descendant one-hot, bank r_hi
        ohMID_ref,  # [1, nc, BC, C] bank r_hi - 1
        cdHI_ref,   # [1, BC, C] int32 corner-diag-at-corner-slot, bank r_hi
        cdMID_ref,  # [1, BC, C]
        body_ref,   # [du, 1, C]
        marg_ref,   # [du, 3, C] stacked (M | D | I) margin values
        gc_ref,     # [1, 4] SMEM
        bp_ref,     # out [du, BC, C] uint8
        caps_ref,   # out [1, 3, BC, C] f32 (per-era corner export)
        Pr_ref,     # scratch ring [ring, 3, BC, C]
        gwin_ref,   # scratch [nc, BC, C]
        capE_ref,   # scratch [3, BC, C] even-parity pair captures
        capO_ref,   # scratch [3, BC, C] odd-parity pair captures
    ):
        g = pl.program_id(1)
        ng = gc_ref[0, 0]
        gs = gc_ref[0, 1]
        go = gc_ref[0, 2]
        ge = gc_ref[0, 3]
        gek1 = ge * jnp.float32(k - 1)
        gek = ge * jnp.float32(k)
        zero = jnp.float32(0.0)

        # per-state broadcast constants (see _make_kernel: each original
        # f32 add maps to one stacked add; +0.0 pads are exact)
        si = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 1), 0)

        def c3(a, b, c):
            return jnp.where(si == 0, a, jnp.where(si == 1, b, c))

        cA = c3(ng, gs, gs)
        cB = c3(ng, zero, ng)
        cC = c3(ng, zero, gs)
        cD_ = c3(go, zero, go)
        cE = c3(gek1, gek, gek1)
        cF = c3(go, zero, gek)

        @pl.when(g == 0)
        def _init():
            low3 = jnp.full((3, BC, C), LOWEST, jnp.float32)
            capE_ref[...] = low3
            capO_ref[...] = low3
            gwin_ref[...] = jnp.zeros((nc, BC, C), jnp.float32)
            Pr_ref[...] = jnp.full((ring, 3, BC, C), LOWEST, jnp.float32)

        j_i = jax.lax.broadcasted_iota(jnp.int32, (BC, C), 1)
        j3 = jax.lax.broadcasted_iota(jnp.int32, (nc, BC, C), 2)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (3, BC, C), 2)
        mask1 = lane3 < 1
        maskk = lane3 < k
        win = gwin_ref[...]
        capE = capE_ref[...]
        capO = capO_ref[...]
        r_hi = (g * du + du - 1) // P  # unclamped bank index of this step
        hi_odd = (r_hi & 1) == 1  # scalar parity of the HI bank

        def shift3(x, s, mask):
            rolled = pltpu.roll(x, s, axis=2)
            return jnp.where(mask, LOWEST, rolled)

        for t in range(du):
            d = g * du + t

            fresh = grow_ref[t]  # [BC, nc]
            win = pltpu.roll(win, 1, axis=2)
            fresh_t = jnp.transpose(fresh, (1, 0))[:, :, None]
            win = jnp.where(j3 == 0, fresh_t, win)

            # --- per-cell pair/bank mask (shared by emission and capture).
            # ONE compare: m_hi <=> j <= b_hi <=> (d - j) // P == r_hi
            # (j > b_hi - P is vacuous: b_hi = d - r_hi*P < P, j >= 0; an
            # owner > r_hi would need j <= b_hi - P < 0). Cells below MID
            # (owner <= r_hi - 2) read MID's one-hot, which is safe:
            # stacked_period's 2P >= Dloc + du bound proves no in-body cell
            # of any pair lives there (a real cell has d - j <= oP + NA+k-1
            # and d >= r_hi*P - du + 1, so owner o >= r_hi - 1), and the
            # margin select overwrites whatever the dead cells computed.
            b_hi = d - r_hi * P
            m_hi = j_i <= b_hi

            oh = jnp.where(m_hi[None], ohHI_ref[0], ohMID_ref[0])
            sub = oh[0] * win[0]
            for c in range(1, nc):
                sub = sub + oh[c] * win[c]

            def ring_at(dd):
                idx = jax.lax.rem(dd + ring * 4, ring)
                return Pr_ref[pl.ds(idx, 1)][0]

            s1 = shift3(ring_at(d - 2), 1, mask1)
            pk = ring_at(d - k)
            s2 = shift3(pk, k, maskk)

            T1 = (s1 + cA) + cB        # [tmm, tdm, tim]
            mt = T1 + sub[None]
            M = jnp.maximum(jnp.maximum(mt[0], mt[1]), mt[2])
            Ud = (pk + cC) + cD_       # [tmd, pkD, tid]
            V = Ud + cE
            D = jnp.maximum(jnp.maximum(V[0], V[1]), V[2])
            Wi = s2 + cF               # [tmi, -, i2i]
            m2i = Wi[0] + gek1
            I = jnp.maximum(m2i, Wi[2])

            P3 = jnp.stack([M, D, I], axis=0)
            body = body_ref[t, 0] > 0.5  # [C]
            P3 = jnp.where(body[None, None, :], P3, marg_ref[t][:, None, :])

            slot = jax.lax.rem(d, ring)
            Pr_ref[pl.ds(slot, 1)] = P3[None]

            bp_m = _argmax_mdi_i32(T1[0], T1[1], T1[2])
            bp_d = _argmax_mdi_i32(Ud[0], Ud[1] + ge, Ud[2])
            bp_i = jnp.where(Wi[0] > s2[2] + ge, 0, 2)
            bp_ref[t] = (bp_m | (bp_d << 2) | (bp_i << 4)).astype(jnp.uint8)

            # --- corner capture into the parity bank of the cell's pair.
            # Corners are real cells, so only the HI/MID banks can capture
            # (see the m_hi note above); a sub-MID cell can never match
            # cdMID (it would need la + k - 1 < 0). Cell parity: owner is
            # r_hi for HI cells, r_hi - 1 otherwise -> m_hi XOR hi_odd.
            cd_eff = jnp.where(m_hi, cdHI_ref[0], cdMID_ref[0])
            sel = cd_eff == d
            selE = sel & (m_hi ^ hi_odd)
            selO = sel ^ selE
            capE = jnp.where(selE[None], P3, capE)
            capO = jnp.where(selO[None], P3, capO)

        gwin_ref[...] = win
        capE_ref[...] = capE
        capO_ref[...] = capO

        # --- era export: at the last step of era e >= 1, pair e-1's bank
        # ((e-1) & 1) is complete -> flush it to output block e-1 and clear
        # it for pair e+1
        @pl.when(((g + 1) % Pdu == 0) & (g >= 2 * Pdu - 1))
        def _export():
            e = (g * du) // P  # current era (>= 1 here)
            low3 = jnp.full((3, BC, C), LOWEST, jnp.float32)
            is_even = ((e - 1) & 1) == 0
            capEv = capE_ref[...]
            capOv = capO_ref[...]
            caps_ref[0] = jnp.where(is_even, capEv, capOv)
            capE_ref[...] = jnp.where(is_even, low3, capEv)
            capO_ref[...] = jnp.where(is_even, capOv, low3)

    return kernel


def _diag_tables_stacked(k, NA, C, P, R, Dswp, gap_consts):
    """Per-diagonal body mask and margin values for the stacked layout:
    identical f32 formulas to _diag_tables with i replaced by the
    pair-local row i_loc = (d - j) - clamp((d - j) // P, 0, R-1) * P."""
    ng, gs, go, ge = (gap_consts[i] for i in range(4))
    d = jnp.arange(Dswp, dtype=jnp.int32)[:, None]
    j = jnp.arange(C, dtype=jnp.int32)[None, :]
    r = jnp.clip((d - j) // P, 0, R - 1)
    i = (d - j) - r * P
    body = ((i >= k) & (i < NA + k) & (j >= k)).astype(jnp.float32)
    jf = j.astype(jnp.float32)
    if_ = i.astype(jnp.float32)
    mM = jnp.where((i == k - 1) & (j == k - 1), jnp.float32(0.0), LOWEST)
    ins_ok = (i == k - 1) & (j >= 2 * k - 1) & ((j - (k - 1)) % k == 0)
    mI = jnp.where(ins_ok, go + ge * (jf - 1.0), LOWEST)
    del_ok = ((j == k - 1) & (i >= 2 * k - 1) & (i < NA + k)
              & ((i - (k - 1)) % k == 0))
    mD = jnp.where(del_ok, (ng + go) + ge * (if_ - 1.0), LOWEST)
    return body, mM, mD, mI


def stacked_period(NA: int, NB: int, C: int, k: int, du: int) -> int:
    """Diagonal period P: >= NA + k (one pair's rows fit), large enough
    that one grid step spans at most 3 pair banks (du + C - 2 < 2P), a
    multiple of du (era boundaries align with grid steps), AND large
    enough that 2P >= Dloc + du (Dloc = NA + NB + 2k - 1). The last bound
    does double duty: every pair's corner diagonal lands within era r + 1
    (the corner-capture banks are flushed at era boundaries, so a later
    corner would be exported-then-missed), and no in-body cell of any pair
    can sit below the MID bank within a grid step — which is what lets the
    kernel carry only TWO one-hot/corner banks and resolve them with a
    single compare. For square buckets (NB ~ NA) this bound nearly
    coincides with NA + k; it binds on rectangular buckets with NB >> NA
    (regression: tests/test_pallas.py::test_stacked_rectangular_bucket)."""
    need = max(NA + k, (C + du) // 2 + 1, (NA + NB + 2 * k + du) // 2)
    return -(-need // du) * du


def rebase_stacked_bp(bp, P: int, NA: int, NB: int, k: int, R: int):
    """Collapse the stacked bp stream's per-bank diagonal offsets: bank r's
    pairs live at diagonals [r*P, r*P + Dloc) of bp [Dswp, rows, C]; slice
    each bank's window and concatenate along rows -> one [Dloc, R*rows, C]
    stream whose row p is pair p, walkable by traceback_ops_impl WITHOUT
    d_base/row_idx (the d_base path sweeps all (R+1)*P diagonals with R
    bank-selects per step — ~R x the work). Bank r's cells have pair-local
    i < P, so each slice holds exactly its own bank's cells at (i+j, j);
    stacked_period guarantees (R-1)*P + Dloc <= (R+1)*P."""
    Dloc = NA + NB + 2 * k - 1
    return jnp.concatenate(
        [
            jax.lax.slice_in_dim(bp, r * P, r * P + Dloc, axis=0)
            for r in range(R)
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "bc", "R", "du", "interpret", "code_cols"),
)
def wavefront_pallas_stacked(
    aseq, bseq, lens_a, lens_b, table, gap_consts, *, k: int, R: int,
    bc: int = 32, du: int = 8, interpret: bool = False,
    code_cols: tuple = tuple(range(15)),
):
    """Viterbi + backpointers with R pairs stacked per batch-row along the
    diagonal axis. B must be a multiple of R*bc; pair p = r*rows + row maps
    to row `row` with diagonal offset r*P.

    Returns ((cM, cD, cI) [B] terminal-adjusted corners, bp
    [Dswp, rows, C] uint8, d_base [B], row_idx [B], P). Preferred
    traceback route (what the engine uses): collapse the bank offsets with
    rebase_stacked_bp(bp, ...) and walk the result with traceback_ops_impl
    — one Dloc-diagonal scan, no per-step bank selects. Feeding bp with
    d_base/row_idx directly to traceback_ops_impl is the legacy/alternate
    path: correct, but it sweeps all (R+1)*P diagonals."""
    B, NA = aseq.shape
    NB = bseq.shape[1]
    C = ((NB + k + 127) // 128) * 128
    P = stacked_period(NA, NB, C, k, du)
    assert B % R == 0, (B, R)
    rows = B // R
    assert rows % bc == 0, (rows, bc)
    Dswp = (R + 1) * P
    n_steps = Dswp // du
    ring = max(k, 2) + 1
    nc = len(code_cols)

    table_sub = table[:, jnp.asarray(code_cols)]
    # G stream: per row, R ancestor blocks of length P (k leading pads)
    TA = jnp.take(table_sub, aseq, axis=0)  # [B, NA, nc]
    TA = jnp.transpose(TA.reshape(R, rows, NA, nc), (0, 2, 1, 3))
    TA = jnp.pad(TA, ((0, 0), (k, P - NA - k), (0, 0), (0, 0)))
    G = TA.reshape(R * P, rows, nc)
    G = jnp.pad(G, ((0, Dswp - R * P), (0, 0), (0, 0)))

    lut = np.full(16, 99, np.int32)
    for idx, col in enumerate(code_cols):
        lut[col] = idx
    bseq_m = jnp.asarray(lut)[bseq]
    b_slot = jnp.pad(
        bseq_m, ((0, 0), (k, C - NB - k)), constant_values=99
    ).astype(jnp.int32)
    oh_b = jax.nn.one_hot(b_slot, nc, axis=0, dtype=jnp.float32)  # [nc,B,C]
    oh_banks = jnp.transpose(
        oh_b.reshape(nc, R, rows, C), (1, 0, 2, 3)
    )  # [R, nc, rows, C]

    r_vec = jnp.repeat(jnp.arange(R, dtype=jnp.int32), rows)
    d_base = r_vec * jnp.int32(P)
    corner_d = d_base + lens_a + lens_b + jnp.int32(2 * (k - 1))  # [B]
    corner_j = lens_b + jnp.int32(k - 1)
    j_iota = jnp.arange(C, dtype=jnp.int32)[None, :]
    capd = jnp.where(
        j_iota == corner_j[:, None], corner_d[:, None], jnp.int32(-1)
    )  # [B, C]
    capd_banks = capd.reshape(R, rows, C)

    gc = gap_consts.reshape(1, 4).astype(jnp.float32)
    body, mM, mD, mI = _diag_tables_stacked(k, NA, C, P, R, Dswp, gap_consts)
    body = body[:, None, :]
    marg = jnp.stack([mM, mD, mI], axis=1)  # [Dswp, 3, C]

    kernel = _make_kernel_stacked(k, NA, C, bc, ring, nc, du, n_steps, P, R)
    grid = (rows // bc, n_steps)
    Pdu = P // du

    def bank_map(off):
        def f(bi, g):
            r_hi = (g * du + du - 1) // P
            return (jnp.clip(r_hi - off, 0, R - 1), 0, bi, 0)
        return f

    def capd_map(off):
        def f(bi, g):
            r_hi = (g * du + du - 1) // P
            return (jnp.clip(r_hi - off, 0, R - 1), bi, 0)
        return f

    in_specs = [
        pl.BlockSpec((du, bc, nc), lambda bi, g: (g, bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, bc, C), bank_map(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, bc, C), bank_map(1), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bc, C), capd_map(0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bc, C), capd_map(1), memory_space=pltpu.VMEM),
        pl.BlockSpec((du, 1, C), lambda bi, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((du, 3, C), lambda bi, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4), lambda bi, g: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((du, bc, C), lambda bi, g: (g, bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 3, bc, C),
            lambda bi, g: (jnp.clip((g * du) // P - 1, 0, R - 1), 0, bi, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Dswp, rows, C), jnp.uint8),
        jax.ShapeDtypeStruct((R, 3, rows, C), jnp.float32),
    ]

    bp, caps = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ring, 3, bc, C), jnp.float32),
            pltpu.VMEM((nc, bc, C), jnp.float32),
            pltpu.VMEM((3, bc, C), jnp.float32),
            pltpu.VMEM((3, bc, C), jnp.float32),
        ],
        # ~34 f32 bc x C planes resident (rings + window + 2 cap banks +
        # 3 one-hot banks + export block) push past the default 16 MB
        # scoped-vmem budget at long C; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(G, oh_banks, oh_banks, capd_banks, capd_banks, body, marg, gc)

    row_idx = jnp.tile(jnp.arange(rows, dtype=jnp.int32), R)
    cap_vals = caps[r_vec, :, row_idx, corner_j]  # [B, 3]
    ng, gs = gap_consts[0], gap_consts[1]
    cM = (cap_vals[:, 0] + ng) + ng
    cD = cap_vals[:, 1] + gs
    cI = (cap_vals[:, 2] + gs) + ng
    return (cM, cD, cI), bp, d_base, row_idx, P


# --- segmented (carried-state) sweeps for the long-pair path -----------------
def segment_consts(aseq, bseq, lens_a, lens_b, table, gap_consts, *, k,
                   T, code_cols=tuple(range(15)), fold: int = 1):
    """Per-pair constant arrays for segmented sweeps, padded so every
    segment slice [d0, d0 + T) is in range. O(NA + C) memory — body/margin
    values are computed in-kernel from the diagonal index. Returns
    (consts tuple, initial carry tuple, n_seg, Dtot, NA).

    fold > 1: each pair's slot axis is laid out as (fold, W) with the fold
    index along the kernel's row axis — a batch of B pairs occupies
    B * fold rows. A single long pair at fold=8 fills all 8 VPU sublanes
    instead of wasting 7 on batch padding (an 8x device-throughput win for
    the B=1 segmented sweep); the kernel's ring shifts chain the fold rows
    (see _make_kernel)."""
    B, NA = aseq.shape
    NB = bseq.shape[1]
    q = 128 * fold
    C = ((NB + k + q - 1) // q) * q  # W = C // fold stays lane-tiled
    W = C // fold
    rows = B * fold
    R = NA + k
    Dtot = R + (NB + k) - 1
    n_seg = -(-Dtot // T)
    Dpad = n_seg * T
    nc = len(code_cols)
    ring = max(k, 2) + 1

    table_sub = table[:, jnp.asarray(code_cols)]
    G = jnp.transpose(jnp.take(table_sub, aseq, axis=0), (1, 0, 2))
    G = jnp.pad(G, ((k, Dpad - k - NA), (0, 0), (0, 0)))  # [Dpad, B, nc]
    if fold > 1:
        # fold row f's fresh lane-0 slot at diagonal d is global slot f*W,
        # whose G row is G[d - f*W] — per-row shifted copies of the stream
        G = jnp.stack(
            [
                jnp.pad(G, ((f * W, 0), (0, 0), (0, 0)))[:Dpad]
                for f in range(fold)
            ],
            axis=2,
        ).reshape(Dpad, rows, nc)

    lut = np.full(16, 99, np.int32)
    for idx, col in enumerate(code_cols):
        lut[col] = idx
    bseq_m = jnp.asarray(lut)[bseq]
    b_slot = jnp.pad(
        bseq_m, ((0, 0), (k, C - NB - k)), constant_values=99
    ).astype(jnp.int32)
    b_slot = b_slot.reshape(rows, W)  # (B, fold*W) -> (B*fold, W)
    oh_b = jax.nn.one_hot(b_slot, nc, axis=0, dtype=jnp.float32)
    corner_d = (lens_a + lens_b + jnp.int32(2 * (k - 1)))[:, None]
    corner_j = (lens_b + jnp.int32(k - 1))[:, None]
    cd = jnp.broadcast_to(corner_d, (B, C)).astype(jnp.int32)
    cj = jnp.broadcast_to(corner_j, (B, C)).astype(jnp.int32)
    cd = cd.reshape(rows, W)
    cj = cj.reshape(rows, W)
    gc = gap_consts.reshape(1, 4).astype(jnp.float32)

    ring0 = jnp.full((ring, 3, rows, W), LOWEST, jnp.float32)
    gwin0 = jnp.zeros((nc, rows, W), jnp.float32)
    cap0 = jnp.full((3, rows, W), LOWEST, jnp.float32)
    return ((G, oh_b, cd, cj, gc),
            (ring0, gwin0, cap0), n_seg, Dtot, NA)


@functools.partial(
    jax.jit,
    static_argnames=("k", "T", "want_bp", "du", "interpret", "NA", "fold"),
)
def wavefront_pallas_segment(consts, carry, d0, *, k, T, want_bp, NA,
                             du: int = 4, interpret: bool = False,
                             fold: int = 1):
    """Run T diagonals of the Viterbi wavefront from a carried
    (ring, emission window, corner capture) state — the VMEM-resident
    engine for the segmented O(n)-memory long-pair path. d0 is DYNAMIC
    (one compiled executable serves every segment of a pair shape).

    Returns (bp [T, B, C] uint8 or None, new carry). The final corner is
    max over the last carry's cap plane (the capture selects exactly one
    cell), adjusted by the caller like the full kernel's epilogue."""
    G, oh_b, cd, cj, gc = consts
    ring0, gwin0, cap0 = carry
    nc, B, C = oh_b.shape
    ring = ring0.shape[0]
    assert T % du == 0
    n_steps = T // du

    Gs = jax.lax.dynamic_slice(G, (d0, 0, 0), (T, B, nc))
    d0a = jnp.reshape(d0, (1, 1)).astype(jnp.int32)

    kernel = _make_kernel(k, NA, C, B, 0, ring, want_bp, nc,
                          mode="viterbi", du=du, n_steps=n_steps, seg=True,
                          fold=fold)
    grid = (1, n_steps)
    full = lambda *dims: pl.BlockSpec(dims, lambda bi, g: (0,) * len(dims),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((du, B, nc), lambda bi, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        full(nc, B, C),
        full(B, C),
        full(B, C),
        pl.BlockSpec((1, 4), lambda bi, g: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda bi, g: (0, 0), memory_space=pltpu.SMEM),
        full(ring, 3, B, C),
        full(nc, B, C),
        full(3, B, C),
    ]
    out_specs = []
    out_shape = []
    if want_bp:
        out_specs.append(
            pl.BlockSpec((du, B, C), lambda bi, g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((T, B, C), jnp.uint8))
    out_specs += [full(ring, 3, B, C), full(nc, B, C), full(3, B, C)]
    out_shape += [
        jax.ShapeDtypeStruct((ring, 3, B, C), jnp.float32),
        jax.ShapeDtypeStruct((nc, B, C), jnp.float32),
        jax.ShapeDtypeStruct((3, B, C), jnp.float32),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ring, 3, B, C), jnp.float32),
            pltpu.VMEM((nc, B, C), jnp.float32),
            pltpu.VMEM((3, B, C), jnp.float32),
        ],
        # B=1 planes tile-pad to 8 sublanes, so the carried state
        # overshoots the default 16 MB scoped-vmem budget at long C;
        # v5e has 128 MB physical VMEM — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Gs, oh_b, cd, cj, gc, d0a, ring0, gwin0, cap0)

    if want_bp:
        bp, ring_o, gwin_o, cap_o = outs
    else:
        bp = None
        ring_o, gwin_o, cap_o = outs
    return bp, (ring_o, gwin_o, cap_o)


def segment_corners(cap, gap_consts, fold: int = 1):
    """Terminal-adjusted corner scores from the final carry's capture plane
    (same f32 epilogue as the full kernel). With fold > 1 the rows axis is
    (B, fold) and each pair's single captured cell sits in one fold row."""
    red = jnp.max(cap, axis=2)  # [3, rows]
    if fold > 1:
        red = jnp.max(red.reshape(3, -1, fold), axis=2)  # [3, B]
    ng, gs = gap_consts[0], gap_consts[1]
    cM = (red[0] + ng) + ng
    cD = red[1] + gs
    cI = (red[2] + gs) + ng
    return cM, cD, cI
