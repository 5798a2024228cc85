"""Vectorized stochastic traceback on the accelerator.

The reference samples alignments one at a time with a host loop over the 11
edge matrices (align_pair.cc:401-458). Here the Forward (log-semiring) DP
runs once on device, then N tracebacks walk the three diagonal-layout state
matrices IN PARALLEL: one lax.scan over walk steps carries the per-sample
(i, j, state) cursors, gathers the 3 predecessor candidate values, and draws
the categorical choice from a threefry stream (jax.random) — every sample
advances one edge per step. Only the int8 op codes and per-sample scores
leave the device.

The distribution matches the host sampler (oracle.sampleback_mdi): the same
f32 edge reconstructions, the same margin semantics (del_del/ins_ins copy
rows), the same `p * scale` inverse-CDF draw. The sampled STREAM differs —
reference-seed bit parity (rng.py Lehmer64 f24 draws) is preserved by the
small-input host path in driver.marg_sample; this module is the throughput
path for large inputs where no parity fixture exists. The stream is still
deterministic per seed: the threefry key is derived from the seeded
Lehmer64.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from coati_tpu.align.semiring import ZERO, gap_constants

F = np.float32


@functools.partial(
    jax.jit, static_argnames=("k", "n_steps", "n_samples", "R", "Cc")
)
def _sample_paths(Ms, Ds, Is, enc_a, enc_b, table, gc4, key, *, k, n_steps,
                  n_samples, R, Cc):
    """N parallel stochastic tracebacks over diagonal-layout state matrices.

    Ms/Ds/Is: [Dtot, C] f32 with C >= Cc (column padding ignored),
    value(i, j) = S[i + j, j] for the rectangular (R, Cc) DP grid; the
    terminal-adjusted corner must already be written at (R - 1, Cc - 1).
    Returns (ops [n_steps, N] int8 in walk order with -1 padding,
    scores [N] f32)."""
    N = n_samples
    ng, gs, go, ge = (gc4[x] for x in range(4))
    gek1 = ge * F(k - 1)
    gek = ge * F(k)
    zero = jnp.float32(ZERO)

    # one stacked state volume: each walk step gathers the (M, D, I)
    # triple at a coordinate with ONE gather instead of three (the scan is
    # gather-latency-bound, not bandwidth-bound); padded to 4 lanes so the
    # gathered vector is power-of-two aligned
    S3 = jnp.stack([Ms, Ds, Is, Is], axis=-1)  # [Dtot, C, 4]

    def val3(i, j):
        return S3[i + j, j]  # [N, 4]; lane 3 unused

    def val(S, i, j):
        return S[i + j, j]

    # corner draw: pick the terminal state
    key, k0 = jax.random.split(key)
    cm = Ms[R - 1 + Cc - 1, Cc - 1]
    cd = Ds[R - 1 + Cc - 1, Cc - 1]
    ci = Is[R - 1 + Cc - 1, Cc - 1]
    w0 = jnp.maximum(jnp.maximum(cm, cd), ci)
    p0 = jax.random.uniform(k0, (N,), jnp.float32)

    def draw(logm, logd, logi, p):
        em = jnp.exp(logm)
        ed = jnp.exp(logd)
        ei = jnp.exp(logi)
        scale = em + ed + ei
        ps = p * scale
        pick = jnp.where(ps < em, 0, jnp.where(ps < em + ed, 1, 2))
        chosen = jnp.where(pick == 0, logm, jnp.where(pick == 1, logd, logi))
        return pick.astype(jnp.int32), chosen - jnp.log(scale)

    pick0, ds0 = draw(
        jnp.full((N,), cm - w0), jnp.full((N,), cd - w0),
        jnp.full((N,), ci - w0), p0,
    )

    i0 = jnp.full((N,), R - 1, jnp.int32)
    j0 = jnp.full((N,), Cc - 1, jnp.int32)
    score0 = ds0.astype(jnp.float32)
    keys = jax.random.split(key, n_steps)

    def step(carry, kt):
        i, j, pick, score = carry
        active = (i > k - 1) | (j > k - 1)
        body = (i >= k) & (j >= k)

        ia = jnp.clip(i - k, 0, None)
        jb = jnp.clip(j - k, 0, None)
        sub = table[enc_a[ia], enc_b[jb]]

        v_c = val3(i, j)  # (M, D, I) at the current cell

        # branch M candidates (predecessor at (i-1, j-1))
        pi = jnp.clip(i - 1, 0, None)
        pj = jnp.clip(j - 1, 0, None)
        v_p = val3(pi, pj)
        mm = v_p[:, 0] + (ng + ng) + sub
        dm = v_p[:, 1] + gs + sub
        im = v_p[:, 2] + (gs + ng) + sub
        mm, dm, im = (jnp.where(body, x, zero) for x in (mm, dm, im))

        # branch D candidates (predecessor at (i-k, j))
        pik = jnp.clip(i - k, 0, None)
        v_k = val3(pik, j)
        md = jnp.where(body, v_k[:, 0] + (ng + go) + gek1, zero)
        dd = jnp.where(body, v_k[:, 1] + gek, v_c[:, 1])
        id_ = jnp.where(body, v_k[:, 2] + (gs + go) + gek1, zero)

        # branch I candidates (predecessor at (i, j-k)); D never precedes I
        pjk = jnp.clip(j - k, 0, None)
        v_j = val3(i, pjk)
        mi = jnp.where(body, v_j[:, 0] + go + gek1, zero)
        ii = jnp.where(body, v_j[:, 2] + gek, v_c[:, 2])

        w = jnp.where(
            pick == 0, v_c[:, 0],
            jnp.where(pick == 1, v_c[:, 1], v_c[:, 2]),
        )
        logm = jnp.where(pick == 0, mm, jnp.where(pick == 1, md, mi)) - w
        logd = jnp.where(pick == 0, dm, jnp.where(pick == 1, dd, zero)) - w
        logi = jnp.where(pick == 0, im, jnp.where(pick == 1, id_, ii)) - w

        p = jax.random.uniform(kt, (N,), jnp.float32)
        nxt, ds = draw(logm, logd, logi, p)

        op = jnp.where(active, pick, -1).astype(jnp.int8)
        di = jnp.where(pick == 0, 1, jnp.where(pick == 1, k, 0))
        dj = jnp.where(pick == 0, 1, jnp.where(pick == 2, k, 0))
        i = jnp.where(active, i - di, i)
        j = jnp.where(active, j - dj, j)
        score = jnp.where(active, score + ds, score)
        pick = jnp.where(active, nxt, pick)
        return (i, j, pick, score), op

    # U walk-steps per scan iteration: the scan is per-iteration-overhead
    # bound (each step is ~5 small gathers over [N] lanes); unrolling
    # amortizes it. Finished walks no-op through padding steps, and the
    # per-step key stream is identical to the unrolled-by-1 form.
    U = 8
    pad = (-n_steps) % U
    if pad:
        keys = jnp.concatenate([keys, keys[-1:].repeat(pad, axis=0)])

    def group(carry, kg):
        ops_u = []
        for u in range(U):
            carry, op = step(carry, kg[u])
            ops_u.append(op)
        return carry, jnp.stack(ops_u)

    (_, _, _, score), opsg = jax.lax.scan(
        group, (i0, j0, pick0, score0), keys.reshape(-1, U, *keys.shape[1:])
    )
    ops = opsg.reshape(-1, N)[:n_steps]
    return ops, score


def decode_sample_ops(ops_n, a: str, b: str, k: int):
    """Rebuild one aligned pair from a walk-order op column (int8, -1 pad).

    Vectorized: per-op column starts from cumsum of op widths, then one
    fancy-index scatter each for ancestor and descendant characters."""
    ops = ops_n[ops_n >= 0][::-1].astype(np.int64)  # forward order
    if ops.size == 0:
        return "", ""
    lens = np.where(ops == 0, 1, k)
    pos = np.concatenate([[0], np.cumsum(lens)])
    L = int(pos[-1])
    s0 = np.full(L, ord("-"), np.uint8)
    s1 = np.full(L, ord("-"), np.uint8)
    a_bytes = np.frombuffer(a.encode(), np.uint8)
    b_bytes = np.frombuffer(b.encode(), np.uint8)

    def scatter(dst, src_bytes, consumes):
        reps = np.where(consumes, lens, 0)
        total = int(reps.sum())
        if total == 0:
            return
        starts = np.cumsum(reps) - reps
        idx_op = np.repeat(np.arange(len(ops)), reps)
        off = np.arange(total) - np.repeat(starts, reps)
        src_off = np.concatenate([[0], np.cumsum(reps)])[:-1]
        dst[pos[idx_op] + off] = src_bytes[src_off[idx_op] + off]

    scatter(s0, a_bytes, ops != 2)
    scatter(s1, b_bytes, ops != 1)
    return s0.tobytes().decode(), s1.tobytes().decode()


def sample_batch_device(Ms, Ds, Is, corners, enc_a, enc_b, table, a: str,
                        b: str, gap, seed_u64: int, n: int,
                        chunk: int = 4096):
    """Draw n alignments from the Forward distribution on device.

    Ms/Ds/Is: diagonal-layout [Dtot, C] device arrays (single pair, column
    padding allowed); corners: (cm, cd, ci) terminal-adjusted corner
    scalars. Yields (s0, s1, score) in stream order; deterministic for a
    given seed."""
    k = int(gap.len)
    gc4 = np.array(gap_constants(gap.open, gap.extend), np.float32)
    R = len(enc_a) + k
    Cc = len(enc_b) + k
    d_corner = R - 1 + Cc - 1
    Ms = jnp.asarray(Ms).at[d_corner, Cc - 1].set(F(corners[0]))
    Ds = jnp.asarray(Ds).at[d_corner, Cc - 1].set(F(corners[1]))
    Is = jnp.asarray(Is).at[d_corner, Cc - 1].set(F(corners[2]))
    n_steps = (R - k) + (Cc - k)
    key = jax.random.PRNGKey(seed_u64 & 0x7FFFFFFFFFFFFFFF)

    table = jnp.asarray(np.asarray(table, np.float32))
    enc_a = jnp.asarray(np.asarray(enc_a, np.int32))
    enc_b = jnp.asarray(np.asarray(enc_b, np.int32))

    # one compiled shape: full-size chunks, surplus lanes discarded
    n_call = min(chunk, n) if n <= chunk else chunk
    done = 0
    while done < n:
        nb = min(n_call, n - done)
        key, sub = jax.random.split(key)
        ops, scores = _sample_paths(
            Ms, Ds, Is, enc_a, enc_b, table, jnp.asarray(gc4), sub,
            k=k, n_steps=n_steps, n_samples=n_call, R=R, Cc=Cc,
        )
        ops = np.asarray(jax.device_get(ops))
        scores = np.asarray(jax.device_get(scores))
        for s in range(nb):
            s0, s1 = decode_sample_ops(ops[:, s], a, b, k)
            yield s0, s1, float(scores[s])
        done += nb
