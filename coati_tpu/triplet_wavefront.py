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

import os as _os

# Pallas triplet-forward envelope: chunk width and max padded slot count.
# The resident [3, bc, 64, Cc] emission block is ~3 MB per 1k slots (x2
# pipelined); with the kernel's 110 MB scoped-vmem budget the envelope
# reaches 8k slots at bc=4 (measured; was 1024 under the default 16 MB cap)
TRI_PALLAS_BC = int(_os.environ.get("COATI_TPU_TRI_BC", "4"))
TRI_PALLAS_MAX_C = int(_os.environ.get("COATI_TPU_TRI_MAX_C", "8192"))


def _max3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


@functools.partial(jax.jit, static_argnames=("n_cod",))
def _triplet_rows(anc_cods, des_codes, ins_off, logP, match_emit, cnuc_int,
                  gc, *, n_cod: int):
    """Forward sweep over n_cod codon steps.

    anc_cods: [B, n_cod] int32 codon61 indices (padded arbitrarily)
    des_codes: [B, m] int32 in [0, 5)  (4 = N; padding arbitrary)
    ins_off: [B, m + 1] f32 insertion run offsets, computed on HOST numpy
        (cumsum grouping must match the host engine bit-for-bit; an
        in-graph cumsum may reassociate on TPU)
    logP: [61, 61] f32; match_emit: [4, 5] f32
    cnuc_int: [3, 61] int32 nuc(codon, phase)
    gc: [4] f32 (ng, gs, go, ge)

    Returns boundaries [n_cod + 1, 3, B, Cc] f32 (lane-collapsed rows at
    i = 0, 3, 6, ..., 3*n_cod)."""
    B, m = des_codes.shape
    Cc = m + 1
    ng, gs, go, ge = (gc[i] for i in range(4))
    ins_off = ins_off[:, None, :]  # [B, 1, Cc]
    go_ge = go - ge

    def row_ins(M):
        # I[j] = ins_off[j] + (go-ge) + max_{u<j}(M[u] - ins_off[u])
        run = jax.lax.cummax(M - ins_off, axis=2)
        pad = jnp.full(M.shape[:2] + (1,), NEG, jnp.float32)
        return jnp.concatenate(
            [pad, run[:, :, :-1] + (ins_off[:, :, 1:] + go_ge)], axis=2
        )

    # per-phase match emissions emit[p, b, lane, j] = me[nuc(lane, p),
    # des[b, j-1]]: pure gathers (an MXU one-hot contraction would round
    # the f32 emission values through bf16, breaking host parity)
    ME = match_emit[:, des_codes]  # [4, B, m]
    emit = jnp.transpose(ME[cnuc_int], (0, 2, 1, 3))  # [3, B, 61, m]
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
        amax = jnp.stack([
            jnp.argmax(Mp, axis=1),
            jnp.argmax(Dp, axis=1),
            jnp.argmax(Ip, axis=1),
        ], axis=0).astype(jnp.int32)  # [3, B, Cc] lane attaining the max
        return (Mc, Dc, Ic), (jnp.stack([Mc, Dc, Ic], axis=0), amax)

    init = (M0[:, 0], D0[:, 0], I0[:, 0])
    _, (ys, amax) = jax.lax.scan(step, init, jnp.arange(n_cod, dtype=jnp.int32))
    b0 = jnp.stack(init, axis=0)[None]  # [1, 3, B, Cc]
    a0 = jnp.zeros((1, 3, B, Cc), jnp.int32)  # row 0: never lane-bound
    return (jnp.concatenate([b0, ys], axis=0),
            jnp.concatenate([a0, amax], axis=0))


@functools.partial(jax.jit, static_argnames=("n_cod",))
def _triplet_traceback(grid, amax, anc_cods, des_codes, ins_off, lens_t,
                       lens_m, logP, match_emit, cnuc_int, gc, *,
                       n_cod: int):
    """Batched on-device traceback over the boundary grid.

    Scans codon blocks last-to-first. Every active pair sits at the block's
    TOP boundary row when the block starts (crossings drain each walk to
    exactly the block base), so its optimal descendant-codon lane is read
    straight from the forward's stored boundary argmax — and the block's
    three rows are recomputed for THAT SINGLE LANE per pair ([B, Cc]
    planes, 61x cheaper than the full laned recompute). The walk itself is
    a while_loop advancing all pairs one edge per iteration; only op
    sequences and final (i, j) leave the device. Row-0 insertions (i == 0,
    j > 0) are appended by the host."""
    B, m = des_codes.shape
    Cc = m + 1
    ng, gs, go, ge = (gc[x] for x in range(4))
    bidx = jnp.arange(B, dtype=jnp.int32)

    # terminal state & raw score (align_fst ShortestDistance convention)
    tm = grid[lens_t, 0, bidx, lens_m] + (ng + ng)
    td = grid[lens_t, 1, bidx, lens_m] + gs
    ti = grid[lens_t, 2, bidx, lens_m] + (gs + ng)
    st0 = jnp.where(td > tm, 1, 0)
    st0 = jnp.where(ti > jnp.maximum(tm, td), 2, st0).astype(jnp.int32)
    score = _max3(tm, td, ti)

    # insertion offsets arrive host-computed (identical to the forward's)
    go_ge = go - ge

    def row_ins2(M):  # [B, Cc]
        run = jax.lax.cummax(M - ins_off, axis=1)
        pad = jnp.full((B, 1), NEG, jnp.float32)
        return jnp.concatenate(
            [pad, run[:, :-1] + (ins_off[:, 1:] + go_ge)], axis=1
        )

    smax = 3 * n_cod + m + 2
    ops0 = jnp.full((smax, B), -1, jnp.int8)

    def block(carry, t):
        i, j, st, s, ops = carry
        base_i = 3 * t
        Mr = grid[t, 0]  # collapsed boundary below the block, [B, Cc]
        Dr = grid[t, 1]
        Ir = grid[t, 2]

        # bind each active pair's lane at the block's top boundary
        lane = amax[t + 1, st, bidx, j]  # [B] in [0, 61)
        cods = jax.lax.dynamic_index_in_dim(
            anc_cods, t, axis=1, keepdims=False
        )
        cost = logP[cods, lane][:, None]  # [B, 1] codon-entry at the lane
        Mp = Mr + cost
        Dp = Dr + cost
        Ip = Ir + cost
        rows = []
        for p in range(3):
            nuc = cnuc_int[p, lane]  # [B] intermediate nucleotide
            e = match_emit[nuc[:, None], des_codes]  # [B, m]
            body = _max3(
                Mp[:, :-1] + (ng + ng),
                Dp[:, :-1] + gs,
                Ip[:, :-1] + (gs + ng),
            ) + e
            M = jnp.concatenate(
                [jnp.full((B, 1), NEG, jnp.float32), body], axis=1
            )
            D = _max3(Mp + (ng + go), Dp + ge, Ip + (gs + go))
            I = row_ins2(M)
            rows.append((M, D, I))
            Mp, Dp, Ip = M, D, I
        RM = jnp.stack([r[0] for r in rows])  # [3, B, Cc]
        RD = jnp.stack([r[1] for r in rows])
        RI = jnp.stack([r[2] for r in rows])

        def wcond(c):
            i, j, st, s, ops = c
            return jnp.any((i > base_i) & ((i > 0) | (j > 0)))

        def wbody(c):
            i, j, st, s, ops = c
            act = (i > base_i) & ((i > 0) | (j > 0))

            di = jnp.where(st == 0, 1, jnp.where(st == 1, 1, 0))
            dj = jnp.where(st == 0, 1, jnp.where(st == 1, 0, 1))
            pi = i - di
            pj = j - dj
            crossing = (st != 2) & ((i - 1) % 3 == 0)

            ridx_p = jnp.clip(pi - base_i - 1, 0, 2)
            mv_l = RM[ridx_p, bidx, pj]
            dv_l = RD[ridx_p, bidx, pj]
            iv_l = RI[ridx_p, bidx, pj]
            # crossing-entry predecessor: the collapsed boundary row below
            # (the codon-entry cost is common to all candidates)
            mv = jnp.where(crossing, Mr[bidx, pj], mv_l)
            dv = jnp.where(crossing, Dr[bidx, pj], dv_l)
            iv = jnp.where(crossing, Ir[bidx, pj], iv_l)

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
            return (i, j, st, s, ops)

        carry2 = jax.lax.while_loop(wcond, wbody, (i, j, st, s, ops))
        return carry2, None

    i0 = 3 * lens_t
    j0 = lens_m
    s0 = jnp.zeros((B,), jnp.int32)
    (i, j, st, s, ops), _ = jax.lax.scan(
        block, (i0, j0, st0, s0, ops0),
        jnp.arange(n_cod - 1, -1, -1, dtype=jnp.int32),
    )
    return ops, s, i, j, score


def triplet_boundaries_batch(model, anc_encs, des_encs):
    """Device forward for a batch of encoded pairs (codon models).

    anc_encs: list of [n_cod_i] codon61 arrays; des_encs: list of [m_i]
    code arrays. Returns the boundary grid [n_cod_max + 1, 3, B, Cc] as
    numpy f32 (rows beyond a pair's own n_cod/m are padding)."""
    anc_p, des_p, _, _, ins_off, tables, n_cod = _pack_batch(
        model, anc_encs, des_encs
    )
    ys, _ = _triplet_rows(
        jnp.asarray(anc_p), jnp.asarray(des_p), jnp.asarray(ins_off),
        *tables, n_cod=n_cod
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

    # insertion run offsets on HOST numpy f32 — the same sequential cumsum
    # and op grouping as triplet_hmm._DP, so host and device walks see
    # bit-identical I-state arithmetic (a device-side cumsum may
    # reassociate); columns past a pair's own length are prefix-consistent
    # padding its walk never reads
    ge32 = np.float32(model.ge)
    e = model.ins_emit[des_p].astype(np.float32)  # [B, m]
    cumE = np.concatenate(
        [np.zeros((B, 1), np.float32), np.cumsum(e, axis=1, dtype=np.float32)],
        axis=1,
    )
    ins_off = cumE + ge32 * np.arange(m + 1, dtype=np.float32)[None, :]

    gc = np.array([model.ng, model.gs, model.go, model.ge], np.float32)
    tables = (
        jnp.asarray(model.logP.astype(np.float32)),
        jnp.asarray(model.match_emit.astype(np.float32)),
        jnp.asarray(model.cnuc.astype(np.int32)),
        jnp.asarray(gc),
    )
    return anc_p, des_p, lens_t, lens_m, ins_off, tables, n_cod


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
    anc_p, des_p, lens_t, lens_m, ins_off, tables, n_cod = _pack_batch(
        model, anc_encs, des_encs
    )

    from coati_tpu.align.engine import _device_for

    B, m = des_p.shape
    C128 = ((m + 1 + 127) // 128) * 128
    dev = _device_for(len(pairs) * 3 * n_cod * m)
    # VMEM-resident kernel up to 1024 slots (tools/tune_kernel.py envelope);
    # longer descendants use the XLA scan
    use_pallas = (
        getattr(dev, "platform", "cpu") != "cpu" and C128 <= TRI_PALLAS_MAX_C
    )
    with jax.default_device(dev):
        if use_pallas:
            from coati_tpu.kernels.triplet_pallas import triplet_rows_pallas

            bc = TRI_PALLAS_BC
            pad_b = (-B) % bc
            if pad_b:
                anc_p = np.concatenate(
                    [anc_p, np.zeros((pad_b, n_cod), np.int32)]
                )
                des_p = np.concatenate([des_p, np.zeros((pad_b, m), np.int32)])
                ins_off = np.concatenate(
                    [ins_off, np.broadcast_to(ins_off[:1], (pad_b, m + 1))]
                )
            grid, amax = triplet_rows_pallas(
                jnp.asarray(anc_p), jnp.asarray(des_p), jnp.asarray(ins_off),
                *tables, n_cod=n_cod, bc=bc,
            )
            if pad_b:
                grid = grid[:, :, :B]
                amax = amax[:, :, :B]
                anc_p = anc_p[:B]
                des_p = des_p[:B]
                ins_off = ins_off[:B]
        else:
            grid, amax = _triplet_rows(
                jnp.asarray(anc_p), jnp.asarray(des_p), jnp.asarray(ins_off),
                *tables, n_cod=n_cod
            )

    if traceback == "device":
        logP_t, match_emit_t, cnuc_int, gc_t = tables
        ops, s, i_end, j_end, score = _triplet_traceback(
            grid, amax, jnp.asarray(anc_p), jnp.asarray(des_p),
            jnp.asarray(ins_off), jnp.asarray(lens_t), jnp.asarray(lens_m),
            logP_t, match_emit_t, cnuc_int, gc_t, n_cod=n_cod
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
        dp = _DP(model, ea, ed, dtype=np.float32)
        term = (
            Mb[-1] + dp.ng_ng,
            Db[-1] + dp.gs,
            Ib[-1] + dp.gs_ng,
        )
        out.append(
            traceback_from_boundaries(model, anc, des, term, boundaries, dp)
        )
    return out
