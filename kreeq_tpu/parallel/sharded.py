"""Multi-device sharded counting and probing (SPMD over a Mesh).

TPU-native re-expression of the reference's scaling story:

  * the reference shards its table 128 ways by `key % mapCount` inside
    one process (reference: include/kreeq.h:139-148) and scales across
    machines by building separate DBs and merging them through the
    filesystem with `kreeq union` (reference: README.md:31-39,
    src/graph-builder.cpp:297-351);
  * here the table is sharded `key % n_devices` across a device mesh:
    every device extracts k-mers from its local read chunk, records are
    routed to their owner shard with all_to_all over ICI, and each
    owner builds its sorted sub-table locally.  Probes route the same
    way and return by the inverse exchange; QV totals reduce with psum.

Shards are disjoint by construction, so multi-host DB union is a
per-shard sorted merge with no data movement between shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kmers import SENTINEL, count_sorted, kmer_positions, probe_sorted

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def _bucket_by_owner(keys, payload, valid, n: int, bucket: int):
    """Scatter records into [n, bucket] per-owner bins (local op).

    Records beyond a bin's capacity are dropped (callers size bins to
    make this impossible for real workloads); invalid slots carry
    SENTINEL keys.
    """
    p = keys.shape[0]
    owner = jnp.where(valid, (keys % jnp.uint64(n)).astype(jnp.int32), n)
    order = jnp.argsort(owner, stable=True)
    owner_s = owner[order]
    keys_s = jnp.where(valid[order], keys[order], SENTINEL)
    payload_s = jnp.where(valid[order], payload[order], 0)
    pos_s = jnp.where(valid[order], order.astype(jnp.int32), -1)

    start = jnp.searchsorted(owner_s, jnp.arange(n, dtype=jnp.int32))
    rank = jnp.arange(p, dtype=jnp.int32) - start[
        jnp.clip(owner_s, 0, n - 1)]
    flat_idx = jnp.where((owner_s < n) & (rank < bucket),
                         owner_s * bucket + rank, n * bucket)

    out_keys = jnp.full((n * bucket + 1,), SENTINEL, jnp.uint64)
    out_keys = out_keys.at[flat_idx].set(keys_s, mode="drop")[:-1]
    out_payload = jnp.zeros((n * bucket + 1,), payload_s.dtype)
    out_payload = out_payload.at[flat_idx].set(payload_s, mode="drop")[:-1]
    out_pos = jnp.full((n * bucket + 1,), -1, jnp.int32)
    out_pos = out_pos.at[flat_idx].set(pos_s, mode="drop")[:-1]
    return (out_keys.reshape(n, bucket), out_payload.reshape(n, bucket),
            out_pos.reshape(n, bucket))


def sharded_count_fn(mesh: Mesh, k: int):
    """Build the jitted SPMD counting step.

    Input: codes uint8[n*chunk] (sharded on devices).  Output: per-shard
    sorted tables (keys/cov/fw/bw stacked on the device axis) + n_valid.
    """
    n = mesh.devices.size

    def local_step(codes):  # codes: [1, chunk] on each device
        codes = codes[0]
        chunk = codes.shape[0]
        p = chunk - k + 1
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        bucket = p  # safe upper bound
        bkeys, bedges, _ = _bucket_by_owner(keys, edges, valid, n, bucket)
        # route records to their owner shard
        rkeys = jax.lax.all_to_all(bkeys, AXIS, 0, 0, tiled=False)
        redges = jax.lax.all_to_all(bedges, AXIS, 0, 0, tiled=False)
        rkeys = rkeys.reshape(-1)
        redges = redges.reshape(-1)
        ukeys, cov, fw, bw, nvalid = count_sorted(
            rkeys, redges, rkeys != SENTINEL)
        return (ukeys[None], cov[None], fw[None], bw[None],
                nvalid[None])

    from jax import shard_map

    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(P(AXIS),),
                   out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)))
    return jax.jit(fn)


def sharded_probe_fn(mesh: Mesh, k: int, cutoff: int = 0):
    """Build the jitted SPMD probe step.

    Inputs: per-shard tables (as produced by sharded_count_fn) and a
    device-sharded query code array.  Output: per-position (found, cov,
    fw, bw) in the original query layout plus psum'd QV counters.
    """
    n = mesh.devices.size

    def local_step(tkeys, tcov, tfw, tbw, codes):
        codes = codes[0]
        tkeys, tcov, tfw, tbw = tkeys[0], tcov[0], tfw[0], tbw[0]
        chunk = codes.shape[0]
        p = chunk - k + 1
        keys, isfw, _edges, valid = kmer_positions(codes, k)
        bucket = p
        bkeys, _bp, bpos = _bucket_by_owner(
            keys, jnp.zeros_like(keys, jnp.uint32), valid, n, bucket)
        rkeys = jax.lax.all_to_all(bkeys, AXIS, 0, 0)
        flat = rkeys.reshape(-1)
        found, cov, fw, bw = probe_sorted(tkeys, tcov, tfw, tbw, flat)
        # answers return by the inverse exchange
        def back(x):
            shaped = x.reshape(n, bucket, *x.shape[1:])
            return jax.lax.all_to_all(shaped, AXIS, 0, 0)

        rfound = back(found.astype(jnp.uint8))
        rcov = back(cov)
        rfw = back(fw)
        rbw = back(bw)
        # scatter answers back to original query positions
        pos = bpos.reshape(-1)
        tgt = jnp.where(pos >= 0, pos, p)

        def unscatter(v):
            out = jnp.zeros((p + 1,) + v.shape[2:], v.dtype)
            return out.at[tgt].set(v.reshape(n * bucket, *v.shape[2:]),
                                   mode="drop")[:p]

        qfound = unscatter(rfound).astype(bool) & valid
        qcov = unscatter(rcov)
        qfw = unscatter(rfw)
        qbw = unscatter(rbw)

        # per-base QV classification (reference: src/kreeq.cpp:143-219)
        nxt = jnp.concatenate([codes[k:], jnp.full((1,), 4, jnp.uint8)])
        prv = jnp.concatenate([jnp.full((1,), 4, jnp.uint8),
                               codes[: p - 1]])
        has_next = nxt <= 3
        has_prev = prv <= 3
        nc = (nxt & 3).astype(jnp.int32)
        pc = (prv & 3).astype(jnp.int32)

        # one-hot select+reduce: take_along_axis lowers to a per-row
        # HBM gather on TPU, these stay on the VPU
        lanes = jnp.arange(4, dtype=jnp.int32)[None, :]

        def pick(mat, idx):
            return jnp.where(lanes == idx[:, None], mat,
                             jnp.uint32(0)).sum(axis=1, dtype=jnp.uint32)

        right = pick(jnp.where(isfw[:, None], qfw, qbw),
                     jnp.where(isfw, nc, 3 - nc))
        left = pick(jnp.where(isfw[:, None], qbw, qfw),
                    jnp.where(isfw, pc, 3 - pc))
        qcov = jnp.where(qfound, qcov, 0)
        missing = valid & ((qcov == 0) | (qcov < jnp.uint32(cutoff)))
        no_right = has_next & (jnp.where(qfound & has_next, right, 0) == 0)
        no_left = has_prev & (jnp.where(qfound & has_prev, left, 0) == 0)
        edge_missing = valid & ~missing & no_left & no_right

        # int32 psum: per-step counts are < 2^31 and the TPU compiler
        # does not lower 64-bit all-reduces; accumulate on the host
        tot = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), AXIS)
        miss = jax.lax.psum(jnp.sum(missing.astype(jnp.int32)), AXIS)
        emiss = jax.lax.psum(jnp.sum(edge_missing.astype(jnp.int32)),
                             AXIS)
        return (qfound[None], qcov[None], tot[None], miss[None],
                emiss[None])

    from jax import shard_map

    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                   out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)))
    return jax.jit(fn)


def full_pipeline_fn(mesh: Mesh, k: int):
    """Count reads and validate an assembly in one jitted SPMD step —
    the framework's 'training step' for multi-chip dry runs."""
    count = sharded_count_fn(mesh, k)
    probe = sharded_probe_fn(mesh, k)

    def step(read_codes, asm_codes):
        tkeys, tcov, tfw, tbw, _n = count(read_codes)
        return probe(tkeys, tcov, tfw, tbw, asm_codes)

    return jax.jit(step)
