"""Pallas TPU kernel for the triplet (codon-context) forward sweep.

The XLA scan version (triplet_wavefront._triplet_rows) round-trips every
laned row (3 x [B, 61, Cc] f32 per codon step, plus cummax passes) through
HBM — measured ~10 true-Mcells/s on v5e. This kernel keeps the whole codon
step in VMEM: the collapsed boundary rows are the only carried state
([3, bc, Cc] scratch), the three laned phase rows live as registers/VMEM
temporaries inside one grid step, and only the per-step boundary rows and
their argmax-lane planes are streamed out (what the single-lane traceback
walks).

Layout: laned planes are [bc, 64, Cc] — batch leading, the codon lane on
the SUBLANE axis (61 lanes padded to 64 with NEG entry costs so padding
never wins a collapse), descendant slots on the 128-lane axis. Every
block's trailing two dims are then (64, Cc) / (bc, Cc) — tile-legal — and
the codon-entry broadcast needs no in-kernel transpose.

The in-row insertion recurrence is solved by an exact log-tree prefix-max
(max is associative, so the tree reassociation is bit-identical to the
sequential cummax). All arithmetic matches _triplet_rows bitwise; the unit
suite asserts exact equality in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-1.0e30)


def _shift_right_last(x, s):
    """x[..., j] <- x[..., j - s] along the last axis, NEG fill."""
    rolled = pltpu.roll(x, s, axis=x.ndim - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(j < s, NEG, rolled)


def _cummax_last(x, n):
    """Exact running max along the last axis via a log-step tree."""
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        x = jnp.maximum(x, jnp.where(j < s, NEG, shifted))
        s *= 2
    return x


def _max3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


def _make_kernel(bc: int, Cc: int, n_cod: int):
    def kernel(entry_ref,  # [1, bc, 1, 64] codon-entry logP row (NEG-pad)
               emit_ref,  # [3, bc, 64, Cc] per-phase lane emissions
               insoff_ref,  # [bc, 1, Cc] insertion run offsets
               gc_ref,  # [1, 4] SMEM gap constants
               bnd_ref,  # out [1, bc, 3, Cc] collapsed boundary rows
               amax_ref,  # out [1, bc, 3, Cc] argmax lane per state
               carry_ref,  # scratch [3, bc, Cc] collapsed carry
               ):
        t = pl.program_id(1)
        ng = gc_ref[0, 0]
        gs = gc_ref[0, 1]
        go = gc_ref[0, 2]
        ge = gc_ref[0, 3]
        go_ge = go - ge
        ins_off = insoff_ref[...].reshape(-1, insoff_ref.shape[-1])

        def row_ins(M):  # laned [bc, 64, Cc]
            run = _cummax_last(M - ins_off[:, None], Cc)
            return _shift_right_last(run, 1) + (ins_off[:, None] + go_ge)

        @pl.when(t == 0)
        def _init():
            j = jax.lax.broadcasted_iota(jnp.int32, (bc, Cc), 1)
            M0 = jnp.where(j == 0, jnp.float32(0.0), NEG)
            run0 = _cummax_last(M0 - ins_off, Cc)
            I0 = _shift_right_last(run0, 1) + (ins_off + go_ge)
            carry_ref[0] = M0
            carry_ref[1] = jnp.full((bc, Cc), NEG, jnp.float32)
            carry_ref[2] = I0

        Mc = carry_ref[0]
        Dc = carry_ref[1]
        Ic = carry_ref[2]
        cost = entry_ref[...].reshape(bc, 64)[:, :, None]
        Mp = Mc[:, None] + cost
        Dp = Dc[:, None] + cost
        Ip = Ic[:, None] + cost
        for p in range(3):
            e = emit_ref[p]  # [bc, 64, Cc]
            M = _max3(
                _shift_right_last(Mp, 1) + (ng + ng),
                _shift_right_last(Dp, 1) + gs,
                _shift_right_last(Ip, 1) + (gs + ng),
            ) + e
            D = _max3(Mp + (ng + go), Dp + ge, Ip + (gs + go))
            I = row_ins(M)
            Mp, Dp, Ip = M, D, I

        Mc2 = jnp.max(Mp, axis=1)
        Dc2 = jnp.max(Dp, axis=1)
        Ic2 = jnp.max(Ip, axis=1)
        carry_ref[0] = Mc2
        carry_ref[1] = Dc2
        carry_ref[2] = Ic2
        bnd_ref[0] = jnp.stack([Mc2, Dc2, Ic2], axis=1)

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bc, 64, Cc), 1)

        def amax_first(X, mx):
            # first lane attaining the max (argmax tie semantics) without
            # a gather: iota where equal to the max, min-reduce over lanes
            hit = jnp.where(X == mx[:, None, :], lane_iota, 64)
            return jnp.min(hit, axis=1)

        amax_ref[0] = jnp.stack([
            amax_first(Mp, Mc2),
            amax_first(Dp, Dc2),
            amax_first(Ip, Ic2),
        ], axis=1).astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_cod", "bc", "interpret")
)
def triplet_rows_pallas(anc_cods, des_codes, ins_off, logP, match_emit,
                        cnuc_int, gc, *, n_cod: int, bc: int = 4,
                        interpret: bool = False):
    """Drop-in Pallas replacement for triplet_wavefront._triplet_rows:
    same arguments, same (boundaries [n_cod+1, 3, B, Cc], amax) outputs,
    bit-identical f32 values. Cc is padded to the 128-lane tile; columns
    beyond m+1 are garbage the traceback never reads. ins_off arrives
    host-computed (bit-parity with the host engine's cumsum)."""
    B, m = des_codes.shape
    Cc_real = m + 1
    Cc = ((Cc_real + 127) // 128) * 128
    assert B % bc == 0, (B, bc)
    ng, gs, go, ge = (gc[i] for i in range(4))

    ins_off_p = jnp.pad(ins_off, ((0, 0), (0, Cc - Cc_real)))[:, None, :]

    # per-phase lane emissions [3, B, 64, Cc]: pure gathers (exact; an MXU
    # one-hot contraction would round the f32 values through bf16)
    ME = match_emit[:, des_codes]  # [4, B, m]
    emit = jnp.transpose(ME[cnuc_int], (0, 2, 1, 3))  # [3, B, 61, m]
    emit = jnp.pad(emit, ((0, 0), (0, 0), (0, 3), (1, Cc - Cc_real)))

    # codon-entry costs [n_cod, B, 1, 64] (pad lanes never win a collapse)
    Gcod = jnp.transpose(logP[anc_cods], (1, 0, 2))  # [n_cod, B, 61]
    Gcod = jnp.pad(
        Gcod, ((0, 0), (0, 0), (0, 3)), constant_values=NEG
    )[:, :, None, :]

    gc4 = jnp.stack([ng, gs, go, ge]).reshape(1, 4).astype(jnp.float32)

    kernel = _make_kernel(bc, Cc, n_cod)
    grid = (B // bc, n_cod)
    bnd, amax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc, 1, 64), lambda bi, t: (t, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bc, 64, Cc), lambda bi, t: (0, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1, Cc), lambda bi, t: (bi, 0, 0),
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
        # the resident [3, bc, 64, Cc] emission block alone is ~3 MB per
        # 1k slots (x2 for pipelining) — the default 16 MB scoped-vmem cap
        # was the old 1024-slot envelope; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Gcod, emit, ins_off_p, gc4)
    bnd = jnp.transpose(bnd, (0, 2, 1, 3))
    amax = jnp.transpose(amax, (0, 2, 1, 3))

    # row 0 (identical to the scan's init) + trim the column padding
    M0 = jnp.full((B, Cc_real), NEG, jnp.float32).at[:, 0].set(0.0)
    cum = jax.lax.cummax(M0 - ins_off[:, :Cc_real], axis=1)
    I0 = jnp.concatenate([
        jnp.full((B, 1), NEG, jnp.float32),
        cum[:, :-1] + (ins_off[:, 1:Cc_real] + (go - ge)),
    ], axis=1)
    b0 = jnp.stack(
        [M0, jnp.full((B, Cc_real), NEG, jnp.float32), I0], axis=0
    )[None]
    a0 = jnp.zeros((1, 3, B, Cc_real), jnp.int32)
    bnd = jnp.concatenate([b0, bnd[:, :, :, :Cc_real]], axis=0)
    amax = jnp.concatenate([a0, amax[:, :, :, :Cc_real]], axis=0)
    return bnd, amax
