"""Break down where the mixed-10k-pair bench pass spends its time.

Phases measured separately:
  prep    — host bucketing + numpy padding
  kernel  — fused align step (pallas fill + device traceback), blocked
  fetch   — device->host transfer of ops+scores
  strings — native/numpy op->string building

Run: python tools/profile_batch.py [n_pairs]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("COATI_TPU_FORCE_PLATFORM", "tpu")

import numpy as np

import bench as benchmod

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10000


def main():
    rng = np.random.default_rng(20260817)
    from coati_tpu.models import marginal_p, mg94_p
    from coati_tpu.structs import GapParams
    from coati_tpu.utils import encode_marginal

    pi = (0.308, 0.185, 0.199, 0.308)
    table = marginal_p(mg94_p(0.0133, 0.2, pi), pi).astype(np.float32)
    gap = GapParams()
    pairs = benchmod.make_pairs(N, rng)
    enc = [encode_marginal(a, d) for a, d in pairs]
    enc_as = [e[0] for e in enc]
    enc_bs = [e[1] for e in enc]
    a_strs = [p[0] for p in pairs]
    b_strs = [p[1] for p in pairs]
    true_cells = float(sum(len(a) * len(b) for a, b in zip(enc_as, enc_bs)))

    import jax
    import jax.numpy as jnp
    import collections
    from coati_tpu.align.engine import (
        _pad_batch, _align_step, _fetch_packed, ops_to_strings,
        _devices_for, LONG_PAIR_SLOTS, _round_up,
        RLE_MAX_STEPS, _fetch_rle_chunk,
    )
    from coati_tpu.align.wavefront import gap_consts_array

    use_rle = os.environ.get("COATI_TPU_FETCH_RLE", "1") != "0"

    k = int(gap.len)
    gc = gap_consts_array(gap)
    table32 = np.asarray(table, dtype=np.float32)
    quantum = 96
    max_batch_cells = 1 << 30

    def run(label):
        t_all = time.time()
        buckets = collections.defaultdict(list)
        for idx, (a, b) in enumerate(zip(enc_as, enc_bs)):
            qa = max(_round_up(len(a), quantum), quantum)
            qb = max(_round_up(len(b), quantum), quantum)
            buckets[(qa, qb)].append(idx)
        total_cells = sum(
            (qa + k) * (qb + k) * len(v) for (qa, qb), v in buckets.items())
        devs = _devices_for(total_cells)
        resident = {
            d: (jax.device_put(table32, d), jax.device_put(gc, d))
            for d in devs
        }

        t_prep = 0.0
        t_kernel = 0.0
        inflight = []
        n_launched = 0
        for (qa, qb), idxs in buckets.items():
            cells = (qa + k) * (qb + k)
            max_b = max(1, max_batch_cells // cells)
            for s in range(0, len(idxs), max_b):
                chunk = idxs[s: s + max_b]
                n_real = len(chunk)
                pad_n = (max_b - n_real) if (s > 0 and n_real < max_b) else 0
                padded = chunk + [chunk[0]] * pad_n
                t0 = time.time()
                aseq, bseq, la, lb = _pad_batch(
                    [enc_as[i] for i in padded], [enc_bs[i] for i in padded],
                    quantum)
                t_prep += time.time() - t0
                t0 = time.time()
                dev = devs[n_launched % len(devs)]
                n_launched += 1
                table_d, gc_d = resident[dev]
                rle_c = (use_rle
                         and int(np.max(la + lb)) + 1 <= RLE_MAX_STEPS)
                with jax.default_device(dev):
                    launched = _align_step(
                        aseq, bseq, la, lb, table_d, gc_d, k, dev,
                        fetch=False, rle=rle_c)
                if rle_c and os.environ.get(
                        "COATI_TPU_ASYNC_FETCH", "1") != "0":
                    try:
                        launched[2].copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        pass
                t_kernel += time.time() - t0
                inflight.append((chunk, n_real, rle_c, launched, (qa, qb)))

        # block on all device work
        t0 = time.time()
        for _, _, _, (pk_d, ns_d, aux_d), _ in inflight:
            pk_d.block_until_ready()
            aux_d.block_until_ready()
        t_block = time.time() - t0

        t_fetch = 0.0
        t_strings = 0.0
        results = [None] * N
        for chunk, n_real, rle_c, launched, bshape in inflight:
            ca = [a_strs[i] for i in chunk]
            cb = [b_strs[i] for i in chunk]
            if rle_c:
                # the engine's own fetch+decode helper: fetch timing folds
                # decode/strings in (blob decode is the fetch's tail)
                t0 = time.time()
                out = _fetch_rle_chunk(launched, n_real, ca, cb, k)
                t_strings += time.time() - t0
            else:
                t0 = time.time()
                ops, score = _fetch_packed(*launched, n_real)
                t_fetch += time.time() - t0
                t0 = time.time()
                out = ops_to_strings(ops, score, ca, cb, k)
                t_strings += time.time() - t0
            for i, r in zip(chunk, out):
                results[i] = r
        t_total = time.time() - t_all
        print(f"[{label}] total={t_total:.3f}s prep={t_prep:.3f} "
              f"dispatch={t_kernel:.3f} device_block={t_block:.3f} "
              f"fetch={t_fetch:.3f} strings={t_strings:.3f} "
              f"-> {true_cells / t_total / 1e9:.2f} Gcells/s "
              f"({len(inflight)} chunks, {len(buckets)} buckets)")
        for chunk, n_real, rle_c, launched, bshape in inflight:
            print(f"    chunk {bshape} n={n_real} rle={int(rle_c)} "
                  f"packed_shape={launched[0].shape}")
        return results

    run("warmup")
    run("pass2")
    run("pass3")


if __name__ == "__main__":
    main()
