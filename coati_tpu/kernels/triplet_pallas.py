"""Pallas TPU kernel for the triplet (codon-context) forward sweep.

Factored over the codon lane (see triplet_hmm._DP): within one codon block
the 61 chosen-codon lanes differ only by the entry cost and the per-phase
emission class in {A,C,G,T}, so the kernel computes 4 phase-1 variants,
16 phase-2 variants, and 16 phase-3 cores, folding (cost + phase-3
emission) as the 4-way max K — ~36 [bc, Cc] row computations per codon
step instead of the previous 3 laned [bc, 64, Cc] planes (~5x fewer
element-ops, and VMEM per batch row shrinks ~16x, so bc and the length
envelope grow).

Everything lives in VMEM: the carried collapsed boundary rows
([3, bc, Cc] scratch), the 4 emission-class planes, and the per-step
factored rows as registers. Only the per-step boundary rows and their
argmax-lane planes (codon64 encoding) stream out — what the single-lane
traceback walks.

The in-row insertion recurrence is solved by an exact log-tree prefix-max
(max is associative, so the tree reassociation is bit-identical to the
sequential cummax). All arithmetic matches triplet_wavefront._triplet_rows
bitwise; the unit suite asserts exact equality in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-1.0e30)
NEG_INF = np.float32(-np.inf)


def _shift_right_last(x, s, fill):
    """x[..., j] <- x[..., j - s] along the last axis, `fill` fill."""
    rolled = pltpu.roll(x, s, axis=x.ndim - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(j < s, fill, rolled)


def _cummax_last(x, n, fill=NEG):
    """Exact running max along the last axis via a log-step tree."""
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        x = jnp.maximum(x, jnp.where(j < s, fill, shifted))
        s *= 2
    return x


def _max3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


def _make_kernel(bc: int, Cc: int, n_cod: int):
    def kernel(cost_ref,   # [1, bc, 64] codon64 entry costs (NEG at stops)
               E_ref,      # [4, bc, Cc] per-class match emissions
               insoff_ref,  # [bc, Cc] insertion run offsets
               gc_ref,     # [1, 4] SMEM gap constants
               bnd_ref,    # out [1, bc, 3, Cc] collapsed boundary rows
               amax_ref,   # out [1, bc, 3, Cc] argmax lane64 per state
               carry_ref,  # scratch [3, bc, Cc] collapsed carry
               ):
        t = pl.program_id(1)
        ng = gc_ref[0, 0]
        gs = gc_ref[0, 1]
        go = gc_ref[0, 2]
        ge = gc_ref[0, 3]
        ng_ng = ng + ng
        gs_ng = gs + ng
        ng_go = ng + go
        gs_go = gs + go
        go_ge = go - ge
        off = insoff_ref[...]  # [bc, Cc]

        def row_ins(M):
            run = _cummax_last(M - off, Cc)
            return _shift_right_last(run, 1, NEG) + (off + go_ge)

        def shiftmax3(M, D, I):
            sM = _shift_right_last(M, 1, NEG)
            sD = _shift_right_last(D, 1, NEG)
            sI = _shift_right_last(I, 1, NEG)
            body = _max3(sM + ng_ng, sD + gs, sI + gs_ng)
            j = jax.lax.broadcasted_iota(jnp.int32, M.shape, M.ndim - 1)
            return jnp.where(j < 1, NEG, body)

        def dmax3(M, D, I):
            return _max3(M + ng_go, D + ge, I + gs_go)

        @pl.when(t == 0)
        def _init():
            j = jax.lax.broadcasted_iota(jnp.int32, (bc, Cc), 1)
            M0 = jnp.where(j == 0, jnp.float32(0.0), NEG)
            run0 = _cummax_last(M0 - off, Cc)
            I0 = _shift_right_last(run0, 1, NEG) + (off + go_ge)
            carry_ref[0] = M0
            carry_ref[1] = jnp.full((bc, Cc), NEG, jnp.float32)
            carry_ref[2] = I0

        Mc = carry_ref[0]
        Dc = carry_ref[1]
        Ic = carry_ref[2]
        E = [E_ref[x] for x in range(4)]  # [bc, Cc] each

        core1 = shiftmax3(Mc, Dc, Ic)
        M1 = [core1 + E[x] for x in range(4)]
        D1 = dmax3(Mc, Dc, Ic)
        I1 = [row_ins(M1[x]) for x in range(4)]
        core2 = [shiftmax3(M1[x], D1, I1[x]) for x in range(4)]
        M2 = [core2[g >> 2] + E[g & 3] for g in range(16)]
        D2 = [dmax3(M1[x], D1, I1[x]) for x in range(4)]
        I2 = [row_ins(M2[g]) for g in range(16)]
        core3 = [shiftmax3(M2[g], D2[g >> 2], I2[g]) for g in range(16)]
        D3 = [dmax3(M2[g], D2[g >> 2], I2[g]) for g in range(16)]

        # K[g] = max_x3(cost + e3), first-max payload
        costv = cost_ref[...].reshape(bc, 64)  # [bc, 64]
        Kpay = []
        KDpay = []
        Mlane = []
        Dlane = []
        for g in range(16):
            cost0 = costv[:, 4 * g + 0][:, None]  # [bc, 1]
            k = cost0 + E[0]
            pay = jnp.zeros((bc, Cc), jnp.int32)
            kd = cost0
            kdpay = jnp.zeros((bc, 1), jnp.int32)
            for x3 in range(1, 4):
                cx = costv[:, 4 * g + x3][:, None]
                v = cx + E[x3]
                better = v > k
                k = jnp.where(better, v, k)
                pay = jnp.where(better, x3, pay)
                db = cx > kd
                kd = jnp.where(db, cx, kd)
                kdpay = jnp.where(db, x3, kdpay)
            Kpay.append(pay)
            KDpay.append(kdpay)
            Mlane.append(core3[g] + k)
            Dlane.append(D3[g] + kd)

        def collapse16(vals):
            m = vals[0]
            for g in range(1, 16):
                m = jnp.maximum(m, vals[g])
            hit = jnp.full((bc, Cc), 16, jnp.int32)
            for g in range(15, -1, -1):
                hit = jnp.where(vals[g] == m, g, hit)
            return m, hit  # first-max group

        Mc2, gM = collapse16(Mlane)
        Dc2, gD = collapse16(Dlane)

        def pay_at(paylist, gsel):
            out = jnp.zeros((bc, Cc), jnp.int32)
            for g in range(16):
                out = jnp.where(gsel == g, paylist[g], out)
            return out

        amaxM = gM * 4 + pay_at(Kpay, gM)
        amaxD = gD * 4 + pay_at(
            [jnp.broadcast_to(p, (bc, Cc)) for p in KDpay], gD
        )

        W = [Mlane[g] - off for g in range(16)]
        Wstar, gW = collapse16(W)
        lane_at_u = gW * 4 + pay_at(Kpay, gW)
        run = _cummax_last(Wstar, Cc)
        Ic2 = _shift_right_last(run, 1, NEG) + (off + go_ge)
        prev_run = _shift_right_last(run, 1, NEG_INF)
        newmax = Wstar > prev_run
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (bc, Cc), 1)
        code = jnp.where(newmax, u_iota * 64 + lane_at_u, -1)
        code_run = _cummax_last(code, Cc, fill=jnp.int32(-1))
        amaxI = _shift_right_last(code_run, 1, jnp.int32(0)) % 64
        jmask = u_iota == 0
        amaxI = jnp.where(jmask, 0, amaxI)

        carry_ref[0] = Mc2
        carry_ref[1] = Dc2
        carry_ref[2] = Ic2
        bnd_ref[0] = jnp.stack([Mc2, Dc2, Ic2], axis=1)
        amax_ref[0] = jnp.stack([amaxM, amaxD, amaxI], axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_cod", "bc", "interpret")
)
def triplet_rows_pallas(anc_cods, des_codes, ins_off, logP64, match_emit,
                        gc, *, n_cod: int, bc: int = 8,
                        interpret: bool = False):
    """Drop-in Pallas replacement for triplet_wavefront._triplet_rows:
    same arguments, same (boundaries [n_cod+1, 3, B, Cc], amax codon64)
    outputs, bit-identical f32 values. Cc is padded to the 128-lane tile;
    columns beyond m+1 are garbage the traceback never reads. ins_off
    arrives host-computed (bit-parity with the host engine's cumsum)."""
    B, m = des_codes.shape
    Cc_real = m + 1
    Cc = ((Cc_real + 127) // 128) * 128
    assert B % bc == 0, (B, bc)
    ng, gs, go, ge = (gc[i] for i in range(4))
    go_ge = go - ge

    ins_off_p = jnp.pad(ins_off, ((0, 0), (0, Cc - Cc_real)))

    # E[b, x, j]: per-class emissions (pure gathers on the XLA side)
    E = jnp.concatenate(
        [
            jnp.zeros((B, 4, 1), jnp.float32),
            jnp.transpose(match_emit[:4, des_codes], (1, 0, 2)),
        ],
        axis=2,
    )
    E = jnp.pad(E, ((0, 0), (0, 0), (0, Cc - Cc_real)))
    E = jnp.transpose(E, (1, 0, 2))  # [4, B, Cc]

    # per-step entry costs [n_cod, B, 64]
    cost = jnp.transpose(logP64[anc_cods], (1, 0, 2))

    gc4 = jnp.stack([ng, gs, go, ge]).reshape(1, 4).astype(jnp.float32)

    kernel = _make_kernel(bc, Cc, n_cod)
    grid = (B // bc, n_cod)
    bnd, amax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, 64), lambda bi, t: (t, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bc, Cc), lambda bi, t: (0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, Cc), lambda bi, t: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda bi, t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bc, 3, Cc), lambda bi, t: (t, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, 3, Cc), lambda bi, t: (t, bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_cod, B, 3, Cc), jnp.float32),
            jax.ShapeDtypeStruct((n_cod, B, 3, Cc), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((3, bc, Cc), jnp.float32)],
        # ~40 live [bc, Cc] f32 register planes; the default 16 MB
        # scoped-vmem cap binds at very long Cc — v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(cost, E, ins_off_p, gc4)
    bnd = jnp.transpose(bnd, (0, 2, 1, 3))
    amax = jnp.transpose(amax, (0, 2, 1, 3))

    # row 0 (identical to the scan's init) + trim the column padding
    M0 = jnp.full((B, Cc_real), NEG, jnp.float32).at[:, 0].set(0.0)
    cum = jax.lax.cummax(M0 - ins_off[:, :Cc_real], axis=1)
    I0 = jnp.concatenate([
        jnp.full((B, 1), NEG, jnp.float32),
        cum[:, :-1] + (ins_off[:, 1:Cc_real] + go_ge),
    ], axis=1)
    b0 = jnp.stack(
        [M0, jnp.full((B, Cc_real), NEG, jnp.float32), I0], axis=0
    )[None]
    a0 = jnp.zeros((1, 3, B, Cc_real), jnp.int32)
    bnd = jnp.concatenate([b0, bnd[:, :, :, :Cc_real]], axis=0)
    amax = jnp.concatenate([a0, amax[:, :, :, :Cc_real]], axis=0)
    return bnd, amax


# --- device traceback walk --------------------------------------------------
# The XLA walk (triplet_wavefront._triplet_walk_seg) is launch-bound: each
# codon block issues ~200 small XLA ops (row recomputes + one-hot
# extractions) at ~4 us apiece -> ~0.9 ms/block, 5x the Pallas forward's
# whole factored step. This kernel runs the identical 6-phase static walk
# in VMEM: grid over block groups (descending), carried (i, j, st) walk
# state as [B, 1] planes, run-encoded op rows streamed out per group.
# Arithmetic, tie-breaks, and the run-exit rule match the XLA walk
# bit-for-bit (asserted in interpret mode by tests/test_triplet.py).


def _make_walk_kernel(B: int, Cc: int, K: int, n_groups: int, S: int):
    def kernel(
        tlo_ref,     # [1, 2] SMEM: (t_lo, unused)
        grid_ref,    # [K, 3, B, Cc] boundary rows for this group's blocks
        amax_ref,    # [K, 3, B, Cc] int32 argmax lanes
        cost_ref,    # [K, B, 64] codon64 entry costs
        E_ref,       # [4, B, Cc] per-class match emissions (resident)
        insoff_ref,  # [B, Cc] insertion run offsets (resident)
        gc_ref,      # [1, 4] SMEM gap constants
        st_in_ref,   # [4, B, 1] int32 walk state in (i, j, st, pad)
        ops_ref,     # out [6K, B, 1] int32 run-encoded rows
        st_out_ref,  # out [4, B, 1] int32 walk state out
        state_ref,   # scratch [4, B, 1] int32
    ):
        g = pl.program_id(0)
        tg = n_groups - 1 - g  # groups run in DESCENDING block order
        t_lo = tlo_ref[0, 0]
        ng = gc_ref[0, 0]
        gs = gc_ref[0, 1]
        go = gc_ref[0, 2]
        ge = gc_ref[0, 3]
        ng_ng = ng + ng
        gs_ng = gs + ng
        ng_go = ng + go
        gs_go = gs + go
        go_ge = go - ge
        off = insoff_ref[...]
        u_Cc = jax.lax.broadcasted_iota(jnp.int32, (B, Cc), 1)
        i64 = jax.lax.broadcasted_iota(jnp.int32, (B, 64), 1)

        @pl.when(g == 0)
        def _init():
            state_ref[...] = st_in_ref[...]

        i = state_ref[0]   # [B, 1]
        j = state_ref[1]
        st = state_ref[2]

        def red_max(plane, oh, fill):
            """plane[b, j*] for the single column with oh[b, j*] True."""
            return jnp.max(
                jnp.where(oh, plane, fill), axis=1, keepdims=True
            )

        def row_ins(M):
            run = _cummax_last(M - off, Cc)
            return _shift_right_last(run, 1, NEG) + (off + go_ge)

        def shiftmax3(M, D, I):
            sM = _shift_right_last(M, 1, NEG)
            sD = _shift_right_last(D, 1, NEG)
            sI = _shift_right_last(I, 1, NEG)
            body = _max3(sM + ng_ng, sD + gs, sI + gs_ng)
            return jnp.where(u_Cc < 1, NEG, body)

        def dmax3(M, D, I):
            return _max3(M + ng_go, D + ge, I + gs_go)

        def amax_pref(a, b, c):
            code = jnp.where(b > a, 1, 0)
            return jnp.where(c > jnp.maximum(a, b), 2, code)

        E = [E_ref[x] for x in range(4)]

        for q in range(K):
            tl = K - 1 - q  # blocks run descending within the group
            gr = grid_ref[tl]    # [3, B, Cc]
            am = amax_ref[tl]
            Mr, Dr, Ir = gr[0], gr[1], gr[2]

            # bind each active pair's lane at the block's top boundary
            am_st = jnp.where(
                st == 0, am[0], jnp.where(st == 1, am[1], am[2])
            )
            oh_j = u_Cc == j
            lane = red_max(am_st, oh_j, 0)  # [B, 1] codon64
            cost_s = red_max(cost_ref[tl], i64 == lane, NEG)
            x1 = (lane >> 4) & 3
            x2 = (lane >> 2) & 3
            x3 = lane & 3

            def e_at(x):
                return jnp.where(
                    x == 0, E[0],
                    jnp.where(x == 1, E[1], jnp.where(x == 2, E[2], E[3])),
                )

            e1 = e_at(x1)
            e2 = e_at(x2)
            e3 = e_at(x3)

            core1 = shiftmax3(Mr, Dr, Ir)
            M1 = core1 + e1
            D1 = dmax3(Mr, Dr, Ir)
            I1 = row_ins(M1)
            core2 = shiftmax3(M1, D1, I1)
            M2 = core2 + e2
            D2 = dmax3(M1, D1, I1)
            I2 = row_ins(M2)
            core3 = shiftmax3(M2, D2, I2)
            ce3 = cost_s + e3
            M3 = core3 + ce3
            D3 = dmax3(M2, D2, I2) + cost_s
            I3 = row_ins(M3)
            rows_M = (M1, M2, M3)
            rows_D = (D1, D2, D3)
            rows_I = (I1, I2, I3)

            def run_exit_cols(Mrow, Irow):
                # LAST u where the LITERAL f32 rule M[u]+go > I[u]+ge
                # holds (identical to the XLA walk's run-exit form)
                exit_ok = (Mrow + go) > (Irow + ge)
                return _cummax_last(
                    jnp.where(exit_ok, u_Cc, -1), Cc, fill=jnp.int32(-1)
                )

            base_i = 3 * (t_lo + tg * K + tl)
            for ph in range(6):
                act = (i > base_i) & ((i > 0) | (j > 0))
                if ph % 2 == 0:
                    r = 2 - ph // 2
                    run_here = act & (st == 2)
                    Ucol = run_exit_cols(rows_M[r], rows_I[r])
                    u = red_max(Ucol, u_Cc == (j - 1), 0)
                    cnt = jnp.where(run_here, j - u, 0)
                    ops_ref[6 * tl + ph] = jnp.int32(2) | (cnt << 2)
                    j = jnp.where(run_here, u, j)
                    st = jnp.where(run_here, 0, st)
                else:
                    rb = 1 - ph // 2
                    dj = jnp.where(st == 0, 1, 0)
                    pj = j - dj
                    oh_pj = u_Cc == pj
                    if ph < 5:
                        Mv, Dv, Iv = rows_M[rb], rows_D[rb], rows_I[rb]
                    else:
                        Mv, Dv, Iv = Mr, Dr, Ir
                    mv = red_max(Mv, oh_pj, NEG)
                    dv = red_max(Dv, oh_pj, NEG)
                    iv = red_max(Iv, oh_pj, NEG)
                    nxt_m = amax_pref(mv + ng_ng, dv + gs, iv + gs_ng)
                    nxt_d = amax_pref(mv + ng_go, dv + ge, iv + gs_go)
                    nxt = jnp.where(st == 0, nxt_m, nxt_d)
                    cnt = act.astype(jnp.int32)
                    ops_ref[6 * tl + ph] = st | (cnt << 2)
                    i = jnp.where(act, i - 1, i)
                    j = jnp.where(act, pj, j)
                    st = jnp.where(act, nxt, st)

        state_ref[0] = i
        state_ref[1] = j
        state_ref[2] = st

        @pl.when(g == n_groups - 1)
        def _export():
            st_out_ref[...] = state_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("S", "K", "interpret"))
def triplet_walk_pallas(grid_seg, amax_seg, cost_rows, E4, ins_off, t_lo,
                        i0, j0, st0, gc, *, S: int, K: int = 8,
                        interpret: bool = False):
    """Pallas traceback walk over S codon blocks (descending).

    grid_seg [S, 3, B, Cc_real], amax_seg [S, 3, B, Cc_real],
    cost_rows [S, B, 64], E4 [B, 4, Cc_real], ins_off [B, Cc_real];
    i0/j0/st0 [B] int32 walk state entering block S-1's TOP boundary.
    Returns (i, j, st [B], ops [6S, B] int32 run-encoded rows)."""
    Sg, _, B, Cc_real = grid_seg.shape
    assert Sg == S
    Cc = ((Cc_real + 127) // 128) * 128
    Kk = min(K, S)
    n_groups = -(-S // Kk)
    S_pad = n_groups * Kk

    padc = ((0, S_pad - S), (0, 0), (0, 0), (0, Cc - Cc_real))
    grid_p = jnp.pad(grid_seg, padc)
    amax_p = jnp.pad(amax_seg, padc)
    cost_p = jnp.pad(cost_rows, ((0, S_pad - S), (0, 0), (0, 0)))
    E = jnp.pad(
        jnp.transpose(E4, (1, 0, 2)), ((0, 0), (0, 0), (0, Cc - Cc_real))
    )
    off_p = jnp.pad(ins_off, ((0, 0), (0, Cc - Cc_real)))
    gc4 = jnp.reshape(jnp.stack([gc[0], gc[1], gc[2], gc[3]]), (1, 4))
    tlo_a = jnp.reshape(
        jnp.stack([jnp.int32(t_lo), jnp.int32(0)]), (1, 2)
    )
    st_in = jnp.stack(
        [i0, j0, st0, jnp.zeros_like(i0)], axis=0
    ).astype(jnp.int32)[:, :, None]

    kernel = _make_walk_kernel(B, Cc, Kk, n_groups, S)
    ops, st_out = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Kk, 3, B, Cc), lambda g: (n_groups - 1 - g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kk, 3, B, Cc), lambda g: (n_groups - 1 - g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kk, B, 64), lambda g: (n_groups - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, B, Cc), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Cc), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, B, 1), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6 * Kk, B, 1),
                         lambda g: (n_groups - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, B, 1), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6 * S_pad, B, 1), jnp.int32),
            jax.ShapeDtypeStruct((4, B, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((4, B, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tlo_a, grid_p, amax_p, cost_p, E, off_p, gc4, st_in)
    return (st_out[0, :, 0], st_out[1, :, 0], st_out[2, :, 0],
            ops[: 6 * S, :, 0])
