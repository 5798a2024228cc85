"""Triplet codon models (tri-mg, tri-ecm, dna) as a codon-context pair-HMM.

The reference evaluates these models by FST composition + shortest path
(align_fst.cc:45-150) over a vendored OpenFst subset. Derivation used here
instead: the composed machine  anc-FSA ∘ (codon-subst FST ∘ indel FST) ∘
des-FSA  is exactly a 3-state affine pair-HMM whose match/delete steps carry
a live "chosen descendant codon" lane c' in [0,61):

  generative chain: ancestor codons --P(c'|c) codon channel--> intermediate
  nucleotide sequence --per-nucleotide affine indel channel
  (mutation_fst.cc:197-257: insert ~pi, delete free, match pays 1-3*eps /
  eps base-calling error, N matches free)--> descendant.

The transition structure (insertions precede deletions, d->i forbidden,
identical start/terminal factors) is the same as the marginal DP; emissions
depend on the intermediate nucleotide nuc(c', phase); P(c'|c) is paid when
a codon is entered whether or not its nucleotides survive deletion (the
FST composition emits before the indel channel consumes).

Viterbi memory: collapsed codon-boundary rows only (~4 B/cell), with
per-block (3 rows) recompute during traceback. The in-row insertion
recurrence is solved by a prefix-max (cummax) closed form, so each row is
pure vectorized numpy over (columns, 61 codon lanes). The 'dna' model uses
the same machinery with a 4x4 channel and no codon lane.

Scores follow the FST convention: reported score = -log(best path weight);
insertions pay pi (a path-independent constant away from the marginal
convention, so gap placement agrees between the two conventions).
"""

from __future__ import annotations

import numpy as np

from coati_tpu import constants as C
from coati_tpu.structs import AlignmentParams

NEG = -1.0e30
MATCH, DELETION, INSERTION = 0, 1, 2


def encode_triplet_des(des: str) -> np.ndarray:
    """A,C,G,T(U)->0..3, N->4; other symbols rejected (acceptor table,
    mutation_fst.cc:310-327)."""
    table = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3, "N": 4}
    out = np.empty(len(des), dtype=np.int32)
    for i, ch in enumerate(des):
        v = table.get(ch.upper())
        if v is None:
            raise ValueError(
                f"Invalid nucleotide {ch!r} for triplet model alignment."
            )
        out[i] = v
    return out


def encode_triplet_anc(anc: str) -> np.ndarray:
    """Ancestor as 61-index codon array (pre-validated by process_triplet)."""
    codes = C.NT16_TABLE[np.frombuffer(anc.upper().encode(), np.uint8)]
    if np.any(codes > 3):
        raise ValueError(
            "Ambiguous nucleotides in reference sequence not supported."
        )
    c64 = (
        (codes[0::3].astype(np.int32) << 4)
        | (codes[1::3].astype(np.int32) << 2)
        | codes[2::3].astype(np.int32)
    )
    if np.any(np.isin(c64, C.STOP_CODONS_64)):
        raise ValueError("Early stop codon in ancestor.")
    return C.COD64_TO_61[c64]


class TripletModel:
    """Log-space emission/transition tables for one model instance."""

    def __init__(self, logP, pi, gap_open, gap_extend, bc_error, codon=True):
        self.codon = codon
        self.logP = np.asarray(logP, dtype=np.float64)  # [61,61] or [4,4]
        self.ng = float(np.log1p(-gap_open))
        self.gs = float(np.log1p(-gap_extend))
        self.go = float(np.log(gap_open))
        self.ge = float(np.log(gap_extend))
        pi = np.asarray(pi, dtype=np.float64)
        # insertion emission per des code (4=N -> weight 1)
        self.ins_emit = np.concatenate([np.log(pi), [0.0]])
        # match emission [intermediate nuc 0..3, des code 0..4]
        eps = float(bc_error)
        me = np.full((4, 5), np.log(eps))
        np.fill_diagonal(me[:, :4], np.log1p(-3.0 * eps))
        me[:, 4] = 0.0
        self.match_emit = me
        self.cnuc = C.CODON_NUC.T.copy()  # [3, 61]
        if not codon:
            # dna model: the 4-lane intermediate nucleotide is entered and
            # collapsed within a single row, so the per-symbol channel folds
            # into effective tables (mutation_fst.cc:105-148 composed with
            # the indel FST's match/delete arcs, :232-247):
            #   match: max_mid logP[a, mid] + me[mid, des]
            #   delete: the deleted symbol still passed the channel ->
            #           max_mid logP[a, mid]
            self.match_emit_eff = (
                self.logP[:, :, None] + me[None, :, :]
            ).max(axis=1)  # [4, 5]
            self.del_cost = self.logP.max(axis=1)  # [4]


def build_triplet_model(aln: AlignmentParams) -> TripletModel:
    from coati_tpu.models import ecm_p, mg94_p

    if aln.model == "tri-mg":
        sigma = aln.sigma if any(s > 0 for s in aln.sigma) else None
        P = mg94_p(aln.br_len, aln.omega, aln.pi, sigma)
        return TripletModel(np.log(np.maximum(P, 1e-300)), aln.pi,
                            aln.gap.open, aln.gap.extend, aln.bc_error)
    if aln.model == "tri-ecm":
        P = ecm_p(aln.br_len, aln.omega)
        return TripletModel(np.log(np.maximum(P, 1e-300)), C.ECM_DNA_PI,
                            aln.gap.open, aln.gap.extend, aln.bc_error)
    if aln.model == "dna":
        P = mg94_p(aln.br_len, aln.omega, aln.pi)
        # marginalize to 4x4 and row-normalize (mutation_fst.cc:105-148)
        dna_p = np.zeros((4, 4))
        nucs = C.CODON_NUC
        for pos in range(3):
            sel = np.zeros((61, 4))
            sel[np.arange(61), nucs[:, pos]] = 1.0
            dna_p += sel.T @ P @ sel
        dna_p /= dna_p.sum(axis=1, keepdims=True)
        return TripletModel(np.log(dna_p), aln.pi, aln.gap.open,
                            aln.gap.extend, aln.bc_error, codon=False)
    raise ValueError("Mutation model unknown.")


class _DP:
    """Row-sweep DP engine over columns j (0..m) and codon lanes.

    The CANONICAL dtype is float32 — the reference's FST weights are f32
    (OpenFst StdArc) and the device forward is f32, so both engines share
    one arithmetic and traceback tie decisions agree bit-for-bit. All gap
    constants are pre-cast to the dtype and composite sums are grouped
    exactly as the device kernel groups them ((ng+ng) first, then added to
    the row) so rounding is identical. dtype=float64 remains available for
    oracle cross-checks."""

    def __init__(self, model: TripletModel, anc: np.ndarray, des: np.ndarray,
                 dtype=np.float32):
        self.m = model
        self.anc = anc
        self.des = des
        self.dtype = dtype
        self.Cc = len(des) + 1
        # dtype-local gap constants and their composite sums (device-order)
        self.ng = dtype(model.ng)
        self.gs = dtype(model.gs)
        self.go = dtype(model.go)
        self.ge = dtype(model.ge)
        self.ng_ng = self.ng + self.ng
        self.gs_ng = self.gs + self.ng
        self.ng_go = self.ng + self.go
        self.gs_go = self.gs + self.go
        self.go_ge = self.go - self.ge
        e = model.ins_emit[des].astype(dtype)
        self.cumE = np.concatenate(
            [np.zeros(1, dtype), np.cumsum(e, dtype=dtype)]
        )  # [Cc]
        j = np.arange(self.Cc, dtype=dtype)
        self.ins_off = self.cumE + self.ge * j
        self.n_lanes = 61 if model.codon else 1

    def init_row(self):
        """Boundary row 0: M=[one at j=0], D=-inf, I = insertion run margin."""
        M0 = np.full(self.Cc, NEG, dtype=self.dtype)
        M0[0] = 0.0
        D0 = np.full(self.Cc, NEG, dtype=self.dtype)
        I0 = self.row_ins(M0)
        return M0, D0, I0

    def row_ins(self, Mrow):
        """I[j] = max(M[j-1]+go, I[j-1]+ge) + ins_emit[j-1], vectorized:
        I[j] = cumE[j] + ge*j + (go-ge) + max_{u<j}(M[u] - cumE[u] - ge*u).
        Grouping matches the device row_ins: run + (ins_off + (go-ge))."""
        if Mrow.ndim == 1:
            base = Mrow - self.ins_off
            run = np.maximum.accumulate(base)
            out = np.full(self.Cc, NEG, dtype=Mrow.dtype)
            out[1:] = run[:-1] + (self.ins_off[1:] + self.go_ge)
            return out
        base = Mrow - self.ins_off[:, None]
        run = np.maximum.accumulate(base, axis=0)
        out = np.full_like(Mrow, NEG)
        out[1:] = run[:-1] + (self.ins_off[1:, None] + self.go_ge)
        return out

    def step_row(self, i, M_prev, D_prev, I_prev):
        """Compute row i (consuming ancestor symbol i-1) from row i-1.

        Returns laned rows [Cc, 61] for codon models (the caller collapses
        at boundaries), plain [Cc] for the dna model.
        """
        m = self.m
        dt = self.dtype
        if m.codon:
            p = (i - 1) % 3
            t = (i - 1) // 3
            x = m.cnuc[p]  # [61]
            emit = m.match_emit[x][:, self.des].T.astype(dt)  # [mlen, 61]
            if p == 0:
                cost = m.logP[self.anc[t]].astype(dt)  # [61] codon entry
                Mp = _clp(M_prev)[:, None] + cost[None, :]
                Dp = _clp(D_prev)[:, None] + cost[None, :]
                Ip = _clp(I_prev)[:, None] + cost[None, :]
            else:
                Mp, Dp, Ip = M_prev, D_prev, I_prev
            M = np.full((self.Cc, 61), NEG, dtype=dt)
            M[1:] = np.maximum(
                np.maximum(Mp[:-1] + self.ng_ng, Dp[:-1] + self.gs),
                Ip[:-1] + self.gs_ng,
            ) + emit
            D = np.maximum(np.maximum(Mp + self.ng_go, Dp + self.ge),
                           Ip + self.gs_go)
            I = self.row_ins(M)
            return M, D, I
        x = self.anc[i - 1]
        emit = m.match_emit_eff[x][self.des].astype(dt)
        M = np.full(self.Cc, NEG, dtype=dt)
        M[1:] = np.maximum(
            np.maximum(M_prev[:-1] + self.ng_ng, D_prev[:-1] + self.gs),
            I_prev[:-1] + self.gs_ng,
        ) + emit
        D = np.maximum(np.maximum(M_prev + self.ng_go, D_prev + self.ge),
                       I_prev + self.gs_go) + dt(m.del_cost[x])
        I = self.row_ins(M)
        return M, D, I


def _clp(x):
    return x if x.ndim == 1 else x.max(axis=-1)


def triplet_forward(model, anc_cods, des_codes, keep_boundaries=False,
                    dtype=np.float32):
    """Viterbi sweep. Returns (terminal (M,D,I) adjusted at (n,m),
    boundary_rows) where boundary_rows[t] = collapsed rows at i=3t (codon
    models; every row for dna)."""
    dp = _DP(model, anc_cods, des_codes, dtype=dtype)
    n = len(anc_cods) * (3 if model.codon else 1)
    Mr, Dr, Ir = dp.init_row()
    boundaries = [(Mr.copy(), Dr.copy(), Ir.copy())] if keep_boundaries else None

    period = 3 if model.codon else 1
    for i in range(1, n + 1):
        Mr, Dr, Ir = dp.step_row(i, Mr, Dr, Ir)
        if i % period == 0:
            Mc, Dc, Ic = _clp(Mr), _clp(Dr), _clp(Ir)
            if keep_boundaries:
                boundaries.append((Mc, Dc, Ic))
            Mr, Dr, Ir = Mc, Dc, Ic

    term = (
        Mr[-1] + dp.ng_ng,
        Dr[-1] + dp.gs,
        Ir[-1] + dp.gs_ng,
    )
    return term, boundaries, dp


def _argmax_pref(mv, dv, iv):
    """M unless D strictly greater; I only if strictly greater than both."""
    best, val = MATCH, mv
    if dv > val:
        best, val = DELETION, dv
    if iv > val:
        return INSERTION
    return best


def encode_triplet_pair(model, anc: str, des: str):
    if model.codon:
        anc_enc = encode_triplet_anc(anc)
    else:
        anc_enc = encode_triplet_des(anc)
        if np.any(anc_enc == 4):
            raise ValueError(
                "Ambiguous nucleotides in reference sequence not supported."
            )
    return anc_enc, encode_triplet_des(des)


def triplet_align(model, anc: str, des: str):
    """Viterbi alignment under a triplet model.

    Returns (seq0, seq1, score) with score = -log best path weight (the
    FST ShortestDistance convention, align_fst.cc:91-97).
    """
    anc_enc, des_codes = encode_triplet_pair(model, anc, des)
    term, boundaries, dp = triplet_forward(
        model, anc_enc, des_codes, keep_boundaries=True
    )
    return traceback_from_boundaries(model, anc, des, term, boundaries, dp)


def traceback_from_boundaries(model, anc: str, des: str, term, boundaries,
                              dp: _DP):
    """Backward walk over checkpointed boundary rows (shared by the host
    forward and the device batch forward).

    Lane invariant: within a codon block the optimal path's lane c' is
    constant; whenever the walk arrives at a row with no lane bound (walk
    start, or after crossing a codon-entry transition), any argmax lane of
    the current cell value is globally optimal because the value flowing
    onward was collapsed at the next codon entry.
    """
    n = len(anc)
    mnum = len(des)
    score = max(term)
    state = _argmax_pref(*term)

    # dtype-local constants with device-identical grouping (dp.ng_ng etc.)
    # so every comparison below rounds exactly like the device traceback
    period = 3 if model.codon else 1

    # recompute laned rows of one block at a time: block t = rows
    # t*period+1 .. (t+1)*period, seeded from boundary row t*period
    cache_t = [-1, None]

    def block_rows(t):
        if cache_t[0] != t:
            Mr, Dr, Ir = boundaries[t]
            rows = []
            for i in range(t * period + 1, (t + 1) * period + 1):
                Mr, Dr, Ir = dp.step_row(i, Mr, Dr, Ir)
                rows.append((Mr, Dr, Ir))
            cache_t[0] = t
            cache_t[1] = rows
        return cache_t[1]

    def laned_cell(i, j):
        """Laned (M, D, I) row-slices at row i (i >= 1), each [61] or scalar."""
        rows = block_rows((i - 1) // period)
        Mr, Dr, Ir = rows[(i - 1) % period]
        if model.codon:
            return Mr[j], Dr[j], Ir[j]  # [61] each
        return Mr[j], Dr[j], Ir[j]  # scalars

    s0: list[str] = []
    s1: list[str] = []
    i, j = n, mnum
    lane: int | None = None

    def bind_lane(i, j, st):
        """Pick an argmax lane for the current cell if none is bound."""
        mv, dv, iv = laned_cell(i, j)
        v = (mv, dv, iv)[st]
        return int(np.argmax(v))

    while i > 0 or j > 0:
        if model.codon and i > 0 and lane is None:
            lane = bind_lane(i, j, state)

        if state == MATCH:
            s0.append(anc[i - 1])
            s1.append(des[j - 1])
            pi_, pj = i - 1, j - 1
        elif state == DELETION:
            s0.append(anc[i - 1])
            s1.append("-")
            pi_, pj = i - 1, j
        else:  # INSERTION
            s0.append("-")
            s1.append(des[j - 1])
            pi_, pj = i, j - 1

        if pi_ == 0 and pj == 0:
            i, j = 0, 0
            break

        crossing_entry = (
            model.codon and state != INSERTION and (i - 1) % period == 0
        )

        # predecessor candidate values
        if pi_ == 0:
            Mb, Db, Ib = boundaries[0]
            mv, dv, iv = Mb[pj], Db[pj], Ib[pj]
        elif model.codon and crossing_entry:
            # predecessor is the collapsed boundary row; the codon-entry
            # cost is common to all three candidates and drops out
            Mb, Db, Ib = boundaries[pi_ // period]
            mv, dv, iv = Mb[pj], Db[pj], Ib[pj]
        elif model.codon:
            mvv, dvv, ivv = laned_cell(pi_, pj)
            mv, dv, iv = mvv[lane], dvv[lane], ivv[lane]
        else:
            mv, dv, iv = laned_cell(pi_, pj)

        if state == MATCH:
            nxt = _argmax_pref(mv + dp.ng_ng, dv + dp.gs, iv + dp.gs_ng)
        elif state == DELETION:
            nxt = _argmax_pref(mv + dp.ng_go, dv + dp.ge, iv + dp.gs_go)
        else:
            nxt = MATCH if mv + dp.go > iv + dp.ge else INSERTION

        if crossing_entry:
            lane = None
        i, j, state = pi_, pj, nxt

    return "".join(reversed(s0)), "".join(reversed(s1)), float(-score)


def triplet_path_score(model, s0: str, s1: str) -> float:
    """Score a FIXED aligned pair under the triplet model (the path weight
    the FST composition would assign this exact alignment): transition
    chain + per-codon-block max over the descendant-codon lane. Returns
    -log weight like triplet_align. Independent of the DP engines — used
    to verify that a traceback's alignment attains the optimal score."""
    if len(s0) != len(s1):
        raise ValueError("Aligned sequences must have equal length.")
    anc = s0.replace("-", "")
    des = s1.replace("-", "")
    if model.codon:
        anc_c = encode_triplet_anc(anc)
    else:
        anc_c = encode_triplet_des(anc)
    des_c = encode_triplet_des(des)

    ng, gs, go, ge = model.ng, model.gs, model.go, model.ge
    into_m = {"S": ng * 2, "M": ng * 2, "I": gs + ng, "D": gs}
    into_d = {"S": ng + go, "M": ng + go, "I": gs + go, "D": ge}
    into_i = {"S": go, "M": go, "I": ge}

    logp = 0.0
    prev = "S"
    i = j = 0
    ops = []
    for a, b in zip(s0, s1):
        if a != "-" and b != "-":
            logp += into_m[prev]
            ops.append(("M", i, j))
            if not model.codon:
                logp += float(model.match_emit_eff[anc_c[i], des_c[j]])
            i += 1
            j += 1
            prev = "M"
        elif b == "-":
            logp += into_d[prev]
            if not model.codon:
                logp += float(model.del_cost[anc_c[i]])
            i += 1
            prev = "D"
        else:
            if prev == "D":
                raise ValueError("Insertion directly after deletion is "
                                 "not representable.")
            logp += into_i[prev] + float(model.ins_emit[des_c[j]])
            j += 1
            prev = "I"
    logp += into_m[prev]  # terminal factor
    if model.codon:
        for t in range(len(anc) // 3):
            lane = np.array(model.logP[anc_c[t]], dtype=np.float64)
            for (op, ii, jj) in ops:
                if op == "M" and 3 * t <= ii < 3 * t + 3:
                    lane = lane + model.match_emit[
                        model.cnuc[ii % 3], des_c[jj]
                    ]
            logp += float(lane.max())
    return float(-logp)


def triplet_score(model, anc: str, des: str) -> float:
    """Optimal-path score in float64 (oracle precision; the alignment
    engines themselves are float32-canonical like the reference's f32 FST
    weights)."""
    anc_enc = (encode_triplet_anc(anc) if model.codon
               else encode_triplet_des(anc))
    des_codes = encode_triplet_des(des)
    term, _, _ = triplet_forward(model, anc_enc, des_codes,
                                 dtype=np.float64)
    return float(-max(term))


def triplet_align_driver(aln: AlignmentParams) -> bool:
    """CLI driver for tri-mg / tri-ecm / dna (align_fst.cc:45-111)."""
    from coati_tpu import utils
    from coati_tpu.io import read_input, write_output

    if aln.score:
        raise ValueError("Scoring only works with marginal models.")

    aln.data = read_input(aln)
    utils.process_triplet(aln)
    utils.set_subst(aln)  # sets ECM pi etc.
    model = build_triplet_model(aln)

    anc, des = aln.seq(0), aln.seq(1)
    # large pairs route through the batched device engine (identical f32
    # arithmetic and tie-breaks, so strings match triplet_align exactly);
    # small ones stay on the per-pair host sweep, which beats paying the
    # jit/compile latency for a one-off CLI call
    if model.codon and len(anc) * len(des) > 250_000:
        from coati_tpu.triplet_wavefront import triplet_align_batch

        s0, s1, score = triplet_align_batch(model, [(anc, des)])[0]
    else:
        s0, s1, score = triplet_align(model, anc, des)
    aln.data.seqs = [s0, s1]
    aln.data.score = score

    utils.restore_end_stops(aln.data, aln.gap)
    write_output(aln)
    return True
