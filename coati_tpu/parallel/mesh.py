"""Device-mesh data parallelism for batch alignment.

The workload is embarrassingly data-parallel over sequence pairs: model
tables (183x15) are tiny and replicated; the pair batch is sharded over a
1-D 'data' mesh axis, each chip runs the wavefront scan on its shard, and
only per-pair corner scores / op sequences are gathered. This replaces the
reference's single-threaded loop (it has no parallelism at all,
SURVEY.md section 2.3) with jax.sharding + shard_map over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coati_tpu.align.wavefront import (
    traceback_ops_impl,
    wavefront_impl,
)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


@functools.partial(
    jax.jit, static_argnames=("k", "semiring", "mesh")
)
def _sharded_scores(aseq, bseq, lens_a, lens_b, table, gc, *, k, semiring, mesh):
    def local(aseq, bseq, la, lb, table, gc):
        (cm, cd, ci), _ = wavefront_impl(
            aseq, bseq, la, lb, table, gc, k=k, semiring=semiring, mode="score"
        )
        return jnp.maximum(cm, jnp.maximum(cd, ci))

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P(), P()),
        out_specs=P("data"),
        check_vma=False,
    )(aseq, bseq, lens_a, lens_b, table, gc)


def sharded_viterbi_scores(
    enc_as, enc_bs, table, gap, mesh: Mesh, quantum: int = 64
) -> np.ndarray:
    """Viterbi scores for a pair batch, sharded over the mesh's 'data' axis.

    The batch is padded to a multiple of the mesh size; each device computes
    its shard independently (no cross-device communication inside the DP).
    """
    from coati_tpu.align.engine import _pad_batch, _round_up
    from coati_tpu.align.wavefront import gap_consts_array

    n = len(enc_as)
    nd = mesh.devices.size
    k = int(gap.len)
    pad_n = _round_up(max(n, nd), nd)
    enc_as = list(enc_as) + [enc_as[0]] * (pad_n - n)
    enc_bs = list(enc_bs) + [enc_bs[0]] * (pad_n - n)
    aseq, bseq, la, lb = _pad_batch(enc_as, enc_bs, quantum)
    gc = gap_consts_array(gap)

    sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    aseq = jax.device_put(jnp.asarray(aseq), sharding)
    bseq = jax.device_put(jnp.asarray(bseq), sharding)
    la_d = jax.device_put(jnp.asarray(la), sharding)
    lb_d = jax.device_put(jnp.asarray(lb), sharding)
    table_d = jax.device_put(jnp.asarray(table, dtype=jnp.float32), rep)
    gc_d = jax.device_put(jnp.asarray(gc), rep)

    scores = _sharded_scores(
        aseq, bseq, la_d, lb_d, table_d, gc_d,
        k=k, semiring="tropical", mesh=mesh,
    )
    return np.asarray(jax.device_get(scores))[:n]


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_align_step(aseq, bseq, lens_a, lens_b, table, gc, *, k, mesh):
    """Full data-parallel alignment step: DP fill + on-device traceback walk.

    Returns (ops [steps, B] int8 backward-ordered, scores [B]) with the
    batch dimension sharded over 'data'. This is the jit'd unit the driver
    dry-runs over an N-device mesh.
    """

    def local(aseq, bseq, la, lb, table, gc):
        corners, bp = wavefront_impl(
            aseq, bseq, la, lb, table, gc, k=k, semiring="tropical",
            mode="viterbi",
        )
        ops, (_, score) = traceback_ops_impl(bp, corners, la, lb, k=k)
        return ops, score

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P(None, "data"), P("data")),
        check_vma=False,
    )(aseq, bseq, lens_a, lens_b, table, gc)
