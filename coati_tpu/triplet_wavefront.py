"""Batched device forward for the triplet (codon-context) pair-HMM.

TPU-first replacement for the compute-heavy half of the reference FST path
(align_fst.cc:45-150): the codon-channel DP runs as a lax.scan over CODON
steps, carrying only the lane-collapsed rows [B, Cc]. The 61 descendant-
codon lanes exist solely INSIDE one scan step (three unrolled row updates,
[B, 61, Cc] — phase is static per unrolled row, so the codon-entry collapse
and the per-phase emission tables involve no dynamic masking), which is why
a row sweep beats an anti-diagonal wavefront here: a diagonal mixes all
three phases, forcing per-slot phase selects and a sliding entry-cost
window.

The in-row insertion recurrence I[j] = max(M[j-1]+go, I[j-1]+ge) + e[j-1]
is solved by the prefix-max closed form (jax.lax.cummax), keeping each row
update a fixed number of full-width VPU ops.

Outputs: every lane-collapsed codon-boundary row (the O(n/3 * m) f32
checkpoint grid the host traceback walks with per-block recompute,
triplet_hmm.traceback_from_boundaries) plus per-pair terminal scores.
Arithmetic is float32 throughout; the host recompute runs in float32 too,
so walk decisions agree with device boundaries.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from coati_tpu import constants as C

NEG = np.float32(-1.0e30)


def _max3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


@functools.partial(jax.jit, static_argnames=("n_cod",))
def _triplet_rows(anc_cods, des_codes, logP, ins_emit, match_emit, cnuc_oh,
                  gc, *, n_cod: int):
    """Forward sweep over n_cod codon steps.

    anc_cods: [B, n_cod] int32 codon61 indices (padded arbitrarily)
    des_codes: [B, m] int32 in [0, 5)  (4 = N; padding arbitrary)
    logP: [61, 61] f32; ins_emit: [5] f32; match_emit: [4, 5] f32
    cnuc_oh: [3, 61, 4] f32 one-hot of nuc(codon, phase)
    gc: [4] f32 (ng, gs, go, ge)

    Returns boundaries [n_cod + 1, 3, B, Cc] f32 (lane-collapsed rows at
    i = 0, 3, 6, ..., 3*n_cod)."""
    B, m = des_codes.shape
    Cc = m + 1
    ng, gs, go, ge = (gc[i] for i in range(4))

    # insertion run offsets: ins_off[b, j] = cumsum(ins_emit)[j] + ge*j
    e_ins = ins_emit[des_codes]  # [B, m]
    cumE = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(e_ins, axis=1)], axis=1
    )
    j_f = jnp.arange(Cc, dtype=jnp.float32)[None, :]
    ins_off = (cumE + ge * j_f)[:, None, :]  # [B, 1, Cc]
    go_ge = go - ge

    def row_ins(M):
        # I[j] = ins_off[j] + (go-ge) + max_{u<j}(M[u] - ins_off[u])
        run = jax.lax.cummax(M - ins_off, axis=2)
        pad = jnp.full(M.shape[:2] + (1,), NEG, jnp.float32)
        return jnp.concatenate(
            [pad, run[:, :, :-1] + (ins_off[:, :, 1:] + go_ge)], axis=2
        )

    # per-phase match emissions: emit[p, b, lane, j] for j >= 1 uses
    # des[j-1]; built as a one-hot contraction (MXU-friendly)
    ME = match_emit[:, des_codes]  # [4, B, m]
    emit = jnp.einsum("pln,nbj->pblj", cnuc_oh, ME)  # [3, B, 61, m]
    zcol = jnp.zeros((3, B, 61, 1), jnp.float32)
    emit = jnp.concatenate([zcol, emit], axis=3)  # [3, B, 61, Cc]

    # boundary row 0
    M0 = jnp.full((B, 1, Cc), NEG, jnp.float32).at[:, 0, 0].set(0.0)
    D0 = jnp.full((B, 1, Cc), NEG, jnp.float32)
    I0 = row_ins(M0)

    def step(carry, t):
        Mr, Dr, Ir = carry  # collapsed [B, Cc]
        cods = jax.lax.dynamic_index_in_dim(
            anc_cods, t, axis=1, keepdims=False
        )  # [B]
        cost = logP[cods][:, :, None]  # [B, 61, 1] codon entry
        Mp = Mr[:, None, :] + cost
        Dp = Dr[:, None, :] + cost
        Ip = Ir[:, None, :] + cost
        for p in range(3):
            e = emit[p]  # [B, 61, Cc]
            body = _max3(
                Mp[:, :, :-1] + (ng + ng),
                Dp[:, :, :-1] + gs,
                Ip[:, :, :-1] + (gs + ng),
            ) + e[:, :, 1:]
            M = jnp.concatenate(
                [jnp.full((B, 61, 1), NEG, jnp.float32), body], axis=2
            )
            D = _max3(Mp + (ng + go), Dp + ge, Ip + (gs + go))
            I = row_ins(M)
            Mp, Dp, Ip = M, D, I
        Mc = jnp.max(Mp, axis=1)
        Dc = jnp.max(Dp, axis=1)
        Ic = jnp.max(Ip, axis=1)
        return (Mc, Dc, Ic), jnp.stack([Mc, Dc, Ic], axis=0)

    init = (M0[:, 0], D0[:, 0], I0[:, 0])
    _, ys = jax.lax.scan(step, init, jnp.arange(n_cod, dtype=jnp.int32))
    b0 = jnp.stack(init, axis=0)[None]  # [1, 3, B, Cc]
    return jnp.concatenate([b0, ys], axis=0)


@functools.partial(jax.jit, static_argnames=("n_cod",))
def _triplet_traceback(grid, anc_cods, des_codes, lens_t, lens_m, logP,
                       ins_emit, match_emit, cnuc_oh, gc, *, n_cod: int):
    """Batched on-device traceback over the boundary grid.

    Scans codon blocks last-to-first; each step recomputes the block's three
    laned rows from the boundary row below it (same arithmetic as the
    forward) and advances every pair's walk through the block with a
    while_loop. Only per-pair op sequences (backward order, per-pair write
    positions) and final (i, j) leave the device. Row-0 insertions (i == 0,
    j > 0) are appended by the host."""
    B, m = des_codes.shape
    Cc = m + 1
    ng, gs, go, ge = (gc[x] for x in range(4))
    bidx = jnp.arange(B, dtype=jnp.int32)
    lanes = jnp.arange(61, dtype=jnp.int32)

    # terminal state & raw score (align_fst ShortestDistance convention)
    tm = grid[lens_t, 0, bidx, lens_m] + (ng + ng)
    td = grid[lens_t, 1, bidx, lens_m] + gs
    ti = grid[lens_t, 2, bidx, lens_m] + (gs + ng)
    st0 = jnp.where(td > tm, 1, 0)
    st0 = jnp.where(ti > jnp.maximum(tm, td), 2, st0).astype(jnp.int32)
    score = _max3(tm, td, ti)

    # emissions + insertion offsets (identical to the forward)
    e_ins = ins_emit[des_codes]
    cumE = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.cumsum(e_ins, axis=1)], axis=1
    )
    j_f = jnp.arange(Cc, dtype=jnp.float32)[None, :]
    ins_off = (cumE + ge * j_f)[:, None, :]
    go_ge = go - ge

    def row_ins(M):
        run = jax.lax.cummax(M - ins_off, axis=2)
        pad = jnp.full(M.shape[:2] + (1,), NEG, jnp.float32)
        return jnp.concatenate(
            [pad, run[:, :, :-1] + (ins_off[:, :, 1:] + go_ge)], axis=2
        )

    ME = match_emit[:, des_codes]
    emit = jnp.einsum("pln,nbj->pblj", cnuc_oh, ME)
    emit = jnp.concatenate(
        [jnp.zeros((3, B, 61, 1), jnp.float32), emit], axis=3
    )

    smax = 3 * n_cod + m + 2
    ops0 = jnp.full((smax, B), -1, jnp.int8)

    def block(carry, t):
        i, j, st, lane, s, ops = carry
        base_i = 3 * t
        Mr = grid[t, 0]
        Dr = grid[t, 1]
        Ir = grid[t, 2]
        cods = jax.lax.dynamic_index_in_dim(
            anc_cods, t, axis=1, keepdims=False
        )
        cost = logP[cods][:, :, None]
        Mp = Mr[:, None, :] + cost
        Dp = Dr[:, None, :] + cost
        Ip = Ir[:, None, :] + cost
        rows = []
        for p in range(3):
            e = emit[p]
            body = _max3(
                Mp[:, :, :-1] + (ng + ng),
                Dp[:, :, :-1] + gs,
                Ip[:, :, :-1] + (gs + ng),
            ) + e[:, :, 1:]
            M = jnp.concatenate(
                [jnp.full((B, 61, 1), NEG, jnp.float32), body], axis=2
            )
            D = _max3(Mp + (ng + go), Dp + ge, Ip + (gs + go))
            I = row_ins(M)
            rows.append((M, D, I))
            Mp, Dp, Ip = M, D, I
        RM = jnp.stack([r[0] for r in rows])  # [3, B, 61, Cc]
        RD = jnp.stack([r[1] for r in rows])
        RI = jnp.stack([r[2] for r in rows])

        def lane_gather(R, ridx, lane_v, col):
            return R[ridx, bidx, lane_v, col]  # [B]

        def wcond(c):
            i, j, st, lane, s, ops = c
            return jnp.any((i > base_i) & ((i > 0) | (j > 0)))

        def wbody(c):
            i, j, st, lane, s, ops = c
            act = (i > base_i) & ((i > 0) | (j > 0))
            ridx = jnp.clip(i - base_i - 1, 0, 2)

            # bind a lane where none is bound: argmax lane of the current
            # cell's own state value
            cur = jnp.stack([
                RM[ridx[:, None], bidx[:, None], lanes[None, :], j[:, None]],
                RD[ridx[:, None], bidx[:, None], lanes[None, :], j[:, None]],
                RI[ridx[:, None], bidx[:, None], lanes[None, :], j[:, None]],
            ])  # [3, B, 61]
            cur_st = cur[st, bidx]  # [B, 61]
            lane = jnp.where(
                act & (lane < 0), jnp.argmax(cur_st, axis=1).astype(jnp.int32),
                lane,
            )

            di = jnp.where(st == 0, 1, jnp.where(st == 1, 1, 0))
            dj = jnp.where(st == 0, 1, jnp.where(st == 1, 0, 1))
            pi = i - di
            pj = j - dj
            crossing = (st != 2) & ((i - 1) % 3 == 0)

            ridx_p = jnp.clip(pi - base_i - 1, 0, 2)
            lane_c = jnp.maximum(lane, 0)
            mv_l = lane_gather(RM, ridx_p, lane_c, pj)
            dv_l = lane_gather(RD, ridx_p, lane_c, pj)
            iv_l = lane_gather(RI, ridx_p, lane_c, pj)
            # crossing-entry predecessor: the collapsed boundary row below
            # (the codon-entry cost is common to all candidates)
            mv_b = Mr[bidx, pj]
            dv_b = Dr[bidx, pj]
            iv_b = Ir[bidx, pj]
            mv = jnp.where(crossing, mv_b, mv_l)
            dv = jnp.where(crossing, dv_b, dv_l)
            iv = jnp.where(crossing, iv_b, iv_l)

            def amax_pref(a, b, c):
                code = jnp.where(b > a, 1, 0)
                return jnp.where(c > jnp.maximum(a, b), 2, code)

            nxt_m = amax_pref(mv + (ng + ng), dv + gs, iv + (gs + ng))
            nxt_d = amax_pref(mv + (ng + go), dv + ge, iv + (gs + go))
            nxt_i = jnp.where(mv + go > iv + ge, 0, 2)
            nxt = jnp.where(st == 0, nxt_m, jnp.where(st == 1, nxt_d, nxt_i))

            prev_ops = ops[s, bidx]
            ops = ops.at[s, bidx].set(
                jnp.where(act, st.astype(jnp.int8), prev_ops)
            )
            s = s + act.astype(jnp.int32)
            i = jnp.where(act, pi, i)
            j = jnp.where(act, pj, j)
            st = jnp.where(act, nxt.astype(jnp.int32), st)
            lane = jnp.where(act & crossing, -1, lane)
            return (i, j, st, lane, s, ops)

        carry2 = jax.lax.while_loop(wcond, wbody, (i, j, st, lane, s, ops))
        return carry2, None

    i0 = 3 * lens_t
    j0 = lens_m
    lane0 = jnp.full((B,), -1, jnp.int32)
    s0 = jnp.zeros((B,), jnp.int32)
    (i, j, st, lane, s, ops), _ = jax.lax.scan(
        block, (i0, j0, st0, lane0, s0, ops0),
        jnp.arange(n_cod - 1, -1, -1, dtype=jnp.int32),
    )
    return ops, s, i, j, score


def triplet_boundaries_batch(model, anc_encs, des_encs):
    """Device forward for a batch of encoded pairs (codon models).

    anc_encs: list of [n_cod_i] codon61 arrays; des_encs: list of [m_i]
    code arrays. Returns the boundary grid [n_cod_max + 1, 3, B, Cc] as
    numpy f32 (rows beyond a pair's own n_cod/m are padding)."""
    anc_p, des_p, _, _, tables, n_cod = _pack_batch(model, anc_encs, des_encs)
    ys = _triplet_rows(
        jnp.asarray(anc_p), jnp.asarray(des_p), *tables, n_cod=n_cod
    )
    return np.asarray(jax.device_get(ys))


def _pack_batch(model, anc_encs, des_encs):
    B = len(anc_encs)
    n_cod = max(len(a) for a in anc_encs)
    m = max(len(d) for d in des_encs)
    anc_p = np.zeros((B, n_cod), np.int32)
    des_p = np.zeros((B, m), np.int32)
    lens_t = np.zeros(B, np.int32)
    lens_m = np.zeros(B, np.int32)
    for i, (a, d) in enumerate(zip(anc_encs, des_encs)):
        anc_p[i, : len(a)] = a
        des_p[i, : len(d)] = d
        lens_t[i] = len(a)
        lens_m[i] = len(d)

    cnuc_oh = np.zeros((3, 61, 4), np.float32)
    for p in range(3):
        cnuc_oh[p, np.arange(61), C.CODON_NUC[:, p]] = 1.0
    gc = np.array([model.ng, model.gs, model.go, model.ge], np.float32)
    tables = (
        jnp.asarray(model.logP.astype(np.float32)),
        jnp.asarray(model.ins_emit.astype(np.float32)),
        jnp.asarray(model.match_emit.astype(np.float32)),
        jnp.asarray(cnuc_oh),
        jnp.asarray(gc),
    )
    return anc_p, des_p, lens_t, lens_m, tables, n_cod


def _decode_ops(anc, des, ops_b, n_ops, i_end, j_end):
    """Rebuild aligned strings from a backward op sequence (0=M 1=D 2=I)
    ending at (i_end, j_end); leading row-0 insertions cover des[:j_end]."""
    s0 = ["-" * j_end]
    s1 = [des[:j_end]]
    ia, jb = i_end, j_end
    for t in range(n_ops - 1, -1, -1):
        op = ops_b[t]
        if op == 0:
            s0.append(anc[ia])
            s1.append(des[jb])
            ia += 1
            jb += 1
        elif op == 1:
            s0.append(anc[ia])
            s1.append("-")
            ia += 1
        else:
            s0.append("-")
            s1.append(des[jb])
            jb += 1
    return "".join(s0), "".join(s1)


def triplet_align_batch(model, pairs, traceback: str = "device"):
    """Align (anc, des) string pairs under a triplet model on the
    accelerator: batched device forward, then either the batched device
    traceback (default; only op sequences leave the device) or the per-pair
    host walk over the boundary grid (traceback="host" — the recompute
    oracle the device walk is tested against).

    Returns [(seq0, seq1, score), ...]; matches triplet_hmm.triplet_align
    output up to float32 tie-breaks (the dna model routes to the host
    engine — its 1-lane rows are host-cheap and its per-row boundary grid
    would be 3x larger)."""
    from coati_tpu.triplet_hmm import (
        _DP,
        encode_triplet_pair,
        traceback_from_boundaries,
        triplet_align,
    )

    if not model.codon:
        return [triplet_align(model, a, d) for a, d in pairs]

    enc = [encode_triplet_pair(model, a, d) for a, d in pairs]
    anc_encs = [e[0] for e in enc]
    des_encs = [e[1] for e in enc]
    anc_p, des_p, lens_t, lens_m, tables, n_cod = _pack_batch(
        model, anc_encs, des_encs
    )

    grid = _triplet_rows(
        jnp.asarray(anc_p), jnp.asarray(des_p), *tables, n_cod=n_cod
    )

    if traceback == "device":
        ops, s, i_end, j_end, score = _triplet_traceback(
            grid, jnp.asarray(anc_p), jnp.asarray(des_p),
            jnp.asarray(lens_t), jnp.asarray(lens_m), *tables, n_cod=n_cod
        )
        ops = np.asarray(jax.device_get(ops))
        s = np.asarray(s)
        i_end = np.asarray(i_end)
        j_end = np.asarray(j_end)
        score = np.asarray(score)
        out = []
        for b, (anc, des) in enumerate(pairs):
            s0, s1 = _decode_ops(
                anc, des, ops[:, b], int(s[b]), int(i_end[b]), int(j_end[b])
            )
            out.append((s0, s1, float(-score[b])))
        return out

    grid = np.asarray(jax.device_get(grid))
    out = []
    for b, ((anc, des), (ea, ed)) in enumerate(zip(pairs, enc)):
        ncb = len(ea)
        Ccb = len(ed) + 1
        boundaries = [
            (
                grid[t, 0, b, :Ccb].copy(),
                grid[t, 1, b, :Ccb].copy(),
                grid[t, 2, b, :Ccb].copy(),
            )
            for t in range(ncb + 1)
        ]
        Mb, Db, Ib = boundaries[ncb]
        term = (
            float(Mb[-1] + model.ng + model.ng),
            float(Db[-1] + model.gs),
            float(Ib[-1] + model.gs + model.ng),
        )
        dp = _DP(model, ea, ed, dtype=np.float32)
        out.append(
            traceback_from_boundaries(model, anc, des, term, boundaries, dp)
        )
    return out
