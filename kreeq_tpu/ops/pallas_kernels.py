"""Pallas TPU kernel: streaming run-aggregation of sorted k-mer records.

After the device sort, the XLA count path spends most of its time in a
[P,9] cumsum plus a [P,11] random-row scatter (HBM-bound gather/scatter
rounds).  This kernel replaces both with ONE streaming pass over the
sorted records:

  * the TPU Pallas grid runs sequentially on a core, so scalar/vector
    scratch carries the running state (previous key, running column
    totals, output offset) across tiles;
  * per-tile inclusive prefix sums and stream compaction are MXU
    matmuls (lower-triangular ones / rank-one-hot), exact in f32
    because all counts are < 2^24 per chunk;
  * compacted rows are written with async DMA at a running offset —
    successive writes overlap the previous tile's padding, so no
    scatter is ever needed.

A run's aggregate row is emitted when the first record of the NEXT run
is seen; the wrapper appends a tile of sentinel keys so the final real
run always flushes.  Output rows hold cumulative column sums; the
wrapper takes adjacent differences to recover per-run totals
(cov, fw[4], bw[4]) and reassembles u64 keys from u16 limbs.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
NCOL = 16  # 9 sums + 4 key u16 limbs + padding

_SENT32 = -1  # 0xFFFFFFFF as i32 (python int: avoids captured consts)


def _kernel(lo_ref, hi_ref, edges_ref, out_ref, cnt_ref,
            carry_ref, tot_ref, flush_ref, sem_ref):
    """Refs: lo/hi/edges [TILE,1] i32 blocks; out [NCOL,cap] f32 in ANY;
    cnt [1,1] i32 out; scratch: carry (SMEM i32[4]: prev_lo, prev_hi,
    flushed_off (x128), tail_len), tot (VMEM [1,NCOL] f32 running
    totals), flush (VMEM [NCOL,TILE+128] f32 staging incl. the pending
    sub-128 tail), sem DMA.

    HBM lane offsets must be 128-aligned, so compacted entries stream
    through the flush buffer: each step merges the pending tail with
    the new entries, DMAs a fixed [NCOL, TILE+128] window at the
    aligned offset, and keeps the sub-128 remainder as the next tail
    (the unflushed lanes are already correct in HBM; the next window
    simply rewrites them at its start)."""
    t = pl.program_id(0)

    # all vectors stay 2-D [TILE, 1]: 1-D sublane rotates are not
    # implemented by the mosaic backend
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    edges = edges_ref[:, :]

    @pl.when(t == 0)
    def _():
        carry_ref[0] = _SENT32
        carry_ref[1] = _SENT32
        carry_ref[2] = 0
        carry_ref[3] = 0
        tot_ref[:, :] = jnp.zeros((1, NCOL), jnp.float32)

    prev_lo_in = carry_ref[0]
    prev_hi_in = carry_ref[1]
    out_off = carry_ref[2]
    tail_len = carry_ref[3]

    # previous-position key (roll by one sublane, carry into row 0)
    sub0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0) == 0
    prev_lo = jnp.where(sub0, prev_lo_in,
                        pltpu.roll(lo, np.int32(1), axis=0))
    prev_hi = jnp.where(sub0, prev_hi_in,
                        pltpu.roll(hi, np.int32(1), axis=0))

    start = (lo != prev_lo) | (hi != prev_hi)  # [TILE, 1]
    prev_real = ~((prev_lo == _SENT32) & (prev_hi == _SENT32))
    emit = start & prev_real  # emit the run that just ended

    # column matrix M [TILE, NCOL]: cov + 8 edge-bit columns
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE, NCOL), 1)
    e2d = jnp.broadcast_to(edges, (TILE, NCOL))
    shift = jnp.maximum(col - jnp.ones((TILE, NCOL), jnp.int32),
                        jnp.zeros((TILE, NCOL), jnp.int32))
    bits = jax.lax.shift_right_logical(e2d, shift) & jnp.ones(
        (TILE, NCOL), jnp.int32)
    m = jnp.where(col == 0, jnp.ones((TILE, NCOL), jnp.int32), bits)
    m = jnp.where(col < 9, m,
                  jnp.zeros((TILE, NCOL), jnp.int32)).astype(jnp.float32)

    # inclusive prefix sums via lower-triangular MXU matmul (exact:
    # cumulative counts stay < 2^24 per chunk)
    r = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    lower = (c <= r).astype(jnp.float32)
    cum = jax.lax.dot_general(lower, m, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    cum = cum + tot_ref[0, :][None, :]

    # emitted row for position j = cumulative sums at j-1 (= totals of
    # the ending run) + the ENDING run's key limbs (prev key)
    cum_prev = jnp.where(sub0, tot_ref[0, :][None, :],
                         pltpu.roll(cum, np.int32(1), axis=0))
    u16lo0 = (prev_lo & 0xFFFF).astype(jnp.float32)
    u16lo1 = ((prev_lo >> 16) & 0xFFFF).astype(jnp.float32)
    u16hi0 = (prev_hi & 0xFFFF).astype(jnp.float32)
    u16hi1 = ((prev_hi >> 16) & 0xFFFF).astype(jnp.float32)
    keycols = jnp.concatenate([u16lo0, u16lo1, u16hi0, u16hi1], axis=1)
    zf = jnp.zeros((TILE, NCOL), jnp.float32)
    rows = jnp.where(col < 9, cum_prev, zf)
    rows = jnp.where((col >= 9) & (col < 13),
                     jnp.pad(keycols, ((0, 0), (9, NCOL - 13))), rows)

    # stream compaction: one-hot of emission ranks, contracted on MXU
    emit_f = emit.astype(jnp.float32)  # [TILE, 1]
    rank = jax.lax.dot_general(lower, emit_f,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    onehot_t = ((rank.astype(jnp.int32) - 1 == d)
                & emit).astype(jnp.float32)
    # [NCOL, TILE]: compacted entries along lanes
    compacted = jax.lax.dot_general(rows, onehot_t,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    ntile = jnp.sum(emit_f).astype(jnp.int32)

    win = TILE + 128
    comp_pad = jnp.pad(compacted, ((0, 0), (0, 128)))
    shifted = pltpu.roll(comp_pad, tail_len, axis=1)
    li = jax.lax.broadcasted_iota(jnp.int32, (NCOL, win), 1)
    merged = jnp.where(li < tail_len, flush_ref[:, :], shifted)

    total = tail_len + ntile
    c128 = jnp.int32(128)
    nflush = (total // c128) * c128
    flush_ref[:, :] = merged
    copy = pltpu.make_async_copy(
        flush_ref,
        out_ref.at[:, pl.ds(pl.multiple_of(out_off, 128), win)],
        sem_ref)
    copy.start()
    copy.wait()
    # keep the sub-128 remainder as the next tail at lane 0
    flush_ref[:, :] = pltpu.roll(merged,
                                 (jnp.int32(win) - nflush) % jnp.int32(win),
                                 axis=1)

    # carry state forward
    carry_ref[0] = lo[TILE - 1, 0]
    carry_ref[1] = hi[TILE - 1, 0]
    carry_ref[2] = out_off + nflush
    carry_ref[3] = total - nflush
    tot_ref[:, :] = cum[TILE - 1, :][None, :]

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = out_off + total


@partial(jax.jit, static_argnums=(3,))
def _run_pallas(lo, hi, edges, grid: int):
    cap = grid * TILE + TILE + 384
    # trace the kernel with x64 OFF: the package enables x64 globally,
    # under which Python int constants in the kernel body become i64 —
    # a type Mosaic cannot legalize on TPU ("failed to legalize
    # operation 'func.return'"); every value here is explicitly
    # i32/f32, so 32-bit tracing is semantically identical
    with jax.enable_x64(False):
        return _run_pallas_x32(lo, hi, edges, grid, cap)


def _run_pallas_x32(lo, hi, edges, grid: int, cap: int):
    out, cnt = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NCOL, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((1, NCOL), jnp.float32),
            pltpu.VMEM((NCOL, TILE + 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1",
    )(lo, hi, edges)
    return out, cnt


@partial(jax.jit, static_argnums=())
def count_sorted_pallas(keys, edges, valid):
    """Drop-in replacement for ops.kmers.count_sorted (same contract)."""
    from .kmers import SENTINEL

    p = keys.shape[0]
    skeys = jnp.where(valid, keys, SENTINEL)
    sedges = jnp.where(valid, edges, 0).astype(jnp.uint32)
    hi = (skeys >> jnp.uint64(32)).astype(jnp.uint32)
    lo = skeys.astype(jnp.uint32)
    hi, lo, sedges = jax.lax.sort((hi, lo, sedges), num_keys=2)

    pad = (-p) % TILE + TILE  # round up + one full sentinel tile
    grid = (p + pad) // TILE

    def ext(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    lo_i = ext(lo, 0xFFFFFFFF).astype(jnp.int32).reshape(-1, 1)
    hi_i = ext(hi, 0xFFFFFFFF).astype(jnp.int32).reshape(-1, 1)
    ed_i = ext(sedges, 0).astype(jnp.int32).reshape(-1, 1)

    out, cnt = _run_pallas(lo_i, hi_i, ed_i, grid)
    out = out.T  # [cap, NCOL]
    n = cnt[0, 0].astype(jnp.uint32)

    live = (jnp.arange(out.shape[0], dtype=jnp.uint32)
            < n)[:, None]
    sums = jnp.where(live, out[:, :9], 0.0)
    totals = (sums - jnp.concatenate(
        [jnp.zeros((1, 9), jnp.float32), sums[:-1]], axis=0))
    totals = jnp.where(live, totals, 0.0).astype(jnp.uint32)

    k16 = jnp.where(live, out[:, 9:13], 0.0).astype(jnp.uint32)
    ukeys = (k16[:, 0].astype(jnp.uint64)
             | (k16[:, 1].astype(jnp.uint64) << jnp.uint64(16))
             | (k16[:, 2].astype(jnp.uint64) << jnp.uint64(32))
             | (k16[:, 3].astype(jnp.uint64) << jnp.uint64(48)))
    ukeys = jnp.where(live[:, 0], ukeys, SENTINEL)

    return (ukeys[:p], totals[:p, 0], totals[:p, 1:5], totals[:p, 5:9],
            n)


# ---------------------------------------------------------------------------
# Streaming merge-probe kernel
# ---------------------------------------------------------------------------
# probe_merge (ops/kmers.py) pays two (t+q)-element device sorts per
# probe because XLA has no "merge two sorted streams" primitive.  This
# kernel IS that primitive: queries are sorted once (q elements, not
# t+q), each 256-query tile knows from a cheap boundary searchsorted
# which table chunks can contain its matches, and the grid streams
# exactly those chunks through VMEM — sequential HBM reads at full
# bandwidth, no gathers.  Matching inside a (query tile, table chunk)
# pair is one [256,256] outer key-equality (VPU) contracted on the MXU
# against the chunk's payload split into u16 limbs (exact in f32:
# at most one table row matches a query, limbs < 2^16).
#
# Replaces the reference's per-base hash probe at scale
# (reference: src/kreeq.cpp:143-219) for both moderate AND huge
# tables: a table much larger than the query batch is only read where
# queries can land, so the bucketed-bisection fallback's ~log2 rounds
# of HBM gathers disappear as well.

PCOL = 16  # payload i32 rows: cov, fw0-3, bw0-3, zeros, row15 = 1
LCOL = 32  # u16 limb rows (lo limbs 0-15, hi limbs 16-31)


def _probe_kernel(base_ref, nch_ref, qhi_ref, qlo_ref, thi_ref, tlo_ref,
                  pay_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((LCOL, TILE), jnp.float32)

    @pl.when(j < nch_ref[i])
    def _():
        # [TILE,1] query halves vs [1,TILE] table halves -> [TILE,TILE]
        eq = ((qhi_ref[:, :] == thi_ref[:, :])
              & (qlo_ref[:, :] == tlo_ref[:, :])).astype(jnp.float32)
        pay = pay_ref[:, :]
        limbs = jnp.concatenate(
            [(pay & 0xFFFF).astype(jnp.float32),
             (jax.lax.shift_right_logical(pay, jnp.full_like(pay, 16))
              & 0xFFFF).astype(jnp.float32)], axis=0)  # [LCOL, TILE]
        # res[c, a] = limb c of the table row matching query a (or 0)
        res = jax.lax.dot_general(limbs, eq, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[:, :] += res


@partial(jax.jit, static_argnums=(5, 6))
def _probe_run(qhi, qlo, thi, tlo, pay, nq_tiles: int, dmax: int,
               base=None, nch=None):
    # x64 OFF for the same reason as _run_pallas: i64 from Python int
    # promotion (index maps, kernel constants) does not legalize
    with jax.enable_x64(False):
        return _probe_run_x32(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                              base, nch)


def _probe_run_x32(qhi, qlo, thi, tlo, pay, nq_tiles, dmax, base, nch):
    tchunks = thi.shape[1] // TILE

    def qmap(i, j, b, n):
        del j, b, n
        return (i, 0)

    def tmap(i, j, b, n):
        # clamp j past the tile's span to its last chunk so the
        # pipeline re-uses the resident block instead of refetching
        c = b[i] + jnp.minimum(j, jnp.maximum(n[i] - 1, 0))
        return (0, jnp.minimum(c, tchunks - 1))

    def omap(i, j, b, n):
        del j, b, n
        return (0, i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_tiles, dmax),
        in_specs=[
            pl.BlockSpec((TILE, 1), qmap),
            pl.BlockSpec((TILE, 1), qmap),
            pl.BlockSpec((1, TILE), tmap),
            pl.BlockSpec((1, TILE), tmap),
            pl.BlockSpec((PCOL, TILE), tmap),
        ],
        out_specs=pl.BlockSpec((LCOL, TILE), omap),
    )
    return pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((LCOL, nq_tiles * TILE),
                                       jnp.float32),
        interpret=os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1",
    )(base, nch, qhi, qlo, thi, tlo, pay)


@jax.jit
def _probe_prep(tkeys, qkeys):
    """Sort queries (with index) and compute per-tile table chunk
    spans.  Returns device arrays; the wrapper reads back max(nch)
    to pick the static grid depth."""
    from .kmers import SENTINEL

    q = qkeys.shape[0]
    qpad = (-q) % TILE
    # invalid/sentinel queries can never match a table row, and pads
    # must sort last AND carry a last-position index for the restore
    never = jnp.uint64(0xFFFFFFFFFFFFFFFE)
    qk = jnp.where(qkeys == SENTINEL, never, qkeys)
    qk = jnp.concatenate([qk, jnp.full((qpad,), SENTINEL, jnp.uint64)])
    idx = jnp.concatenate([
        jnp.arange(q, dtype=jnp.uint64),
        jnp.full((qpad,), (1 << 26) - 1, jnp.uint64)])
    hi = (qk >> jnp.uint64(38)).astype(jnp.uint32)
    lo = ((qk & jnp.uint64((1 << 38) - 1)) << jnp.uint64(26)) | idx
    shi, slo = jax.lax.sort((hi, lo), num_keys=2)
    sq = (shi.astype(jnp.uint64) << jnp.uint64(38)) \
        | (slo >> jnp.uint64(26))
    sidx = (slo & jnp.uint64((1 << 26) - 1)).astype(jnp.int32)
    sq = jnp.where(sq == SENTINEL, never, sq)  # pads: never match

    qhi = (sq >> jnp.uint64(32)).astype(jnp.int32)[:, None]
    qlo = sq.astype(jnp.int32)[:, None]

    tile_min = sq[::TILE]
    tile_max = sq[TILE - 1::TILE]
    b_idx = jnp.searchsorted(tkeys, tile_min, side="left")
    h_idx = jnp.searchsorted(tkeys, tile_max, side="right")
    tchunks = max((tkeys.shape[0] + TILE - 1) // TILE, 1)
    base = jnp.minimum(b_idx // TILE, tchunks - 1).astype(jnp.int32)
    last = jnp.clip((h_idx - 1) // TILE, base, tchunks - 1) \
        .astype(jnp.int32)
    nch = jnp.where(h_idx > b_idx, last - base + 1, 0).astype(jnp.int32)
    return sq, sidx, qhi, qlo, base, nch


@jax.jit
def _probe_post(out, sidx):
    """Unpack limb rows and restore original query order."""
    qpad = out.shape[1]
    # perm[original position] = sorted position
    v = (sidx.astype(jnp.uint64) << jnp.uint64(26)) \
        | jnp.arange(qpad, dtype=jnp.uint64)
    perm = (jax.lax.sort(v) & jnp.uint64((1 << 26) - 1)).astype(jnp.int32)
    rows = jnp.take(out.T, perm, axis=0, unique_indices=True)  # [qpad,32]
    lo16 = rows[:, :PCOL].astype(jnp.uint32)
    hi16 = rows[:, PCOL:].astype(jnp.uint32)
    vals = lo16 | (hi16 << jnp.uint32(16))
    found = vals[:, 15] > 0
    cov = jnp.where(found, vals[:, 0], 0)
    fw = jnp.where(found[:, None], vals[:, 1:5], 0)
    bw = jnp.where(found[:, None], vals[:, 5:9], 0)
    return found, cov, fw, bw


_probe_tbl_cache = {}


def probe_merge_pallas(tkeys, cov, fw, bw, qkeys):
    """Streaming-merge drop-in for ops.kmers.probe_merge (same
    contract: found/cov/fw/bw in query order).  Host-level wrapper:
    reads back the max chunk span to pick the static grid depth."""
    import jax.numpy as jnp  # noqa: F811  (kept local for clarity)

    q = qkeys.shape[0]
    if q == 0 or tkeys.shape[0] == 0:
        z = jnp.zeros((q,), jnp.uint32)
        z4 = jnp.zeros((q, 4), jnp.uint32)
        return jnp.zeros((q,), bool), z, z4, z4
    if q > (1 << 26) - TILE:  # index rides in 26 bits of the sort key
        from .kmers import probe_merge

        return probe_merge(tkeys, cov, fw, bw, qkeys)
    sq, sidx, qhi, qlo, base, nch = _probe_prep(tkeys, qkeys)
    dmax = int(jnp.max(nch))
    dmax = max(1, 1 << int(np.ceil(np.log2(max(dmax, 1)))))

    # reuse the packed table across windows of the same probe pass;
    # the source table is held by weakref so a freed table releases
    # its HBM (the packed copy is replaced on the next distinct probe)
    import weakref

    cached = _probe_tbl_cache.get("entry")
    src = cached[0]() if cached is not None else None
    if src is tkeys and src is not None:
        thi, tlo, pay = cached[1]
    else:
        if cached is not None and src is None:
            _probe_tbl_cache.clear()  # drop the stale packed copy now
        thi, tlo, pay = _pack_table(tkeys, cov, fw, bw)
        _probe_tbl_cache["entry"] = (weakref.ref(tkeys), (thi, tlo, pay))

    nq_tiles = sq.shape[0] // TILE
    out = _probe_run(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                     base=base, nch=nch)
    found, pcov, pfw, pbw = _probe_post(out, sidx)
    return found[:q], pcov[:q], pfw[:q], pbw[:q]


@jax.jit
def _pack_table(tkeys, cov, fw, bw):
    t = tkeys.shape[0]
    tpad = (-t) % TILE
    tk = jnp.concatenate(
        [tkeys, jnp.full((tpad,), 0xFFFFFFFFFFFFFFFF, jnp.uint64)])
    thi = (tk >> jnp.uint64(32)).astype(jnp.int32)[None, :]
    tlo = tk.astype(jnp.int32)[None, :]
    z = jnp.zeros((t + tpad,), jnp.uint32)

    def ext(a):
        return jnp.concatenate([a, jnp.zeros((tpad,), jnp.uint32)])

    rows = ([ext(cov)] + [ext(fw[:, w]) for w in range(4)]
            + [ext(bw[:, w]) for w in range(4)]
            + [z] * 6 + [jnp.ones((t + tpad,), jnp.uint32)])
    pay = jnp.stack(rows, axis=0).astype(jnp.int32)  # [PCOL, tpad]
    return thi, tlo, pay
