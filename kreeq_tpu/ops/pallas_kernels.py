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
# count-kernel tile: the streaming aggregation is grid-step-bound
# (~1.4 us/step), so it runs wider tiles than the merge/probe kernels
# (the MXU prefix/compaction matmuls grow as CTILE^2 but stay cheap at
# bf16).  KREEQ_TPU_COUNT_TILE is an on-chip tuning knob (part of the
# pallas auto-gate fingerprint — a changed tile re-earns its verdict).
CTILE = int(os.environ.get("KREEQ_TPU_COUNT_TILE", "512"))
NCOL = 16  # 9 sums + 4 key u16 limbs + padding

# Every dot_general whose data operand carries more than 8 significant
# bits (u16 key limbs, cumulative counts up to 2^24) must run the MXU
# at HIGHEST precision: the DEFAULT f32 path truncates inputs to bf16
# (7 explicit mantissa bits), which is exact for the 0/1 masks but
# silently rounds limb/count values — the interpret path (CPU f32)
# hides this, so round 2's kernels validated in interpret and produced
# wrong rows on the real chip (scripts/debug_pallas_onchip.py bisects
# it).  With one operand exactly 0/1, the multi-pass HIGHEST
# decomposition reproduces the exact f32 product.
_EXACT = jax.lax.Precision.HIGHEST

_SENT32 = -1  # 0xFFFFFFFF as i32 (python int: avoids captured consts)


def _kernel(lo_ref, hi_ref, edges_ref, out_ref, cnt_ref,
            carry_ref, tot_ref, flush_ref, upper_ref, iota_ref,
            sem_ref):
    """Refs: lo/hi/edges [1,CTILE] i32 blocks (lane-contiguous — a
    [CTILE,1] block is 1 lane wide: 128x-padded registers and a
    pathological strided DMA, measured at ~2 us/step of overhead);
    out [NCOL,cap] f32 in ANY; cnt [1,1] i32 out; scratch: carry
    (SMEM i32[4]: prev_lo, prev_hi, flushed_off (x128), tail_len),
    tot (VMEM [NCOL,1] f32 running totals), flush (VMEM
    [NCOL,CTILE+128] f32 staging incl. the pending sub-128 tail),
    sem DMA.

    HBM lane offsets must be 128-aligned, so compacted entries stream
    through the flush buffer: each step merges the pending tail with
    the new entries, DMAs a fixed [NCOL, CTILE+128] window at the
    aligned offset, and keeps the sub-128 remainder as the next tail
    (the unflushed lanes are already correct in HBM; the next window
    simply rewrites them at its start)."""
    t = pl.program_id(0)

    lo = lo_ref[:, :]  # [1, CTILE]: records on lanes
    hi = hi_ref[:, :]
    edges = edges_ref[:, :]

    @pl.when(t == 0)
    def _():
        carry_ref[0] = _SENT32
        carry_ref[1] = _SENT32
        carry_ref[2] = 0
        carry_ref[3] = 0
        tot_ref[:, :] = jnp.zeros((NCOL, 1), jnp.float32)
        ri = jax.lax.broadcasted_iota(jnp.int32, (CTILE, CTILE), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (CTILE, CTILE), 1)
        upper_ref[:, :] = (ri <= ci).astype(jnp.float32)
        iota_ref[:, :] = ri

    prev_lo_in = carry_ref[0]
    prev_hi_in = carry_ref[1]
    out_off = carry_ref[2]
    tail_len = carry_ref[3]

    # previous-position key (roll by one lane, carry into lane 0)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (1, CTILE), 1) == 0
    prev_lo = jnp.where(lane0, prev_lo_in,
                        pltpu.roll(lo, np.int32(1), axis=1))
    prev_hi = jnp.where(lane0, prev_hi_in,
                        pltpu.roll(hi, np.int32(1), axis=1))

    start = (lo != prev_lo) | (hi != prev_hi)  # [1, CTILE]
    prev_real = ~((prev_lo == _SENT32) & (prev_hi == _SENT32))
    emit = start & prev_real  # emit the run that just ended

    # column matrix M [NCOL, CTILE]: cov row + 8 edge-bit rows
    row = jax.lax.broadcasted_iota(jnp.int32, (NCOL, CTILE), 0)
    e2d = jnp.broadcast_to(edges, (NCOL, CTILE))
    shift = jnp.maximum(row - jnp.ones((NCOL, CTILE), jnp.int32),
                        jnp.zeros((NCOL, CTILE), jnp.int32))
    bits = jax.lax.shift_right_logical(e2d, shift) & jnp.ones(
        (NCOL, CTILE), jnp.int32)
    m = jnp.where(row == 0, jnp.ones((NCOL, CTILE), jnp.int32), bits)
    m = jnp.where(row < 9, m,
                  jnp.zeros((NCOL, CTILE), jnp.int32)).astype(jnp.float32)

    # inclusive prefix sums along lanes via upper-triangular MXU matmul
    # (exact: cumulative counts stay < 2^24 per chunk); the triangular
    # matrix is built once at t == 0 (scratch persists across steps)
    upper = upper_ref[:, :]
    # 0/1 x 0/1: bf16-exact, DEFAULT precision is fine and 6x cheaper
    cum_w = jax.lax.dot_general(m, upper, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    cum = cum_w + tot_ref[:, :]

    # emitted row for lane j = cumulative sums at j-1 (= totals of the
    # ending run) + the ENDING run's key limbs (prev key).  The
    # cumulative value splits as (carry-in total) + (within-tile
    # prefix <= CTILE): only the within part rides the compaction
    # matmul — as two u8 limb rows per column, exact at single-pass
    # DEFAULT (bf16) precision — and the constant carry-in is re-added
    # after compaction via a compacted all-ones indicator row.  (The
    # round-3 kernel compacted full 24-bit cumulatives, which forced
    # the 6-pass HIGHEST decomposition: ~60% of the step.)
    within_prev = jnp.where(lane0, jnp.zeros((NCOL, 1), jnp.float32),
                            pltpu.roll(cum_w, np.int32(1), axis=1))
    whi = jnp.floor(within_prev[:9] * (1.0 / 256.0))
    wlo = within_prev[:9] - 256.0 * whi

    def kb8(x, sh):
        return (jax.lax.shift_right_logical(
            x, jnp.full_like(x, sh)) & 0xFF).astype(jnp.float32)

    klimbs = jnp.concatenate(
        [kb8(prev_lo, 0), kb8(prev_lo, 8), kb8(prev_lo, 16),
         kb8(prev_lo, 24), kb8(prev_hi, 0), kb8(prev_hi, 8),
         kb8(prev_hi, 16), kb8(prev_hi, 24)], axis=0)
    rows = jnp.concatenate(
        [wlo, whi, klimbs, jnp.ones((1, CTILE), jnp.float32),
         jnp.zeros((5, CTILE), jnp.float32)], axis=0)  # [32, CTILE]

    # stream compaction: one-hot of emission ranks, contracted on MXU
    emit_f = emit.astype(jnp.float32)  # [1, CTILE]
    rank = jax.lax.dot_general(emit_f, upper, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    onehot = ((jnp.broadcast_to(rank.astype(jnp.int32), (CTILE, CTILE))
               - 1 == iota_ref[:, :]) & emit).astype(jnp.float32)
    compF = jax.lax.dot_general(rows, onehot,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    ind = compF[26:27]  # 1 where a run landed, 0 on dead columns
    cum9 = compF[0:9] + 256.0 * compF[9:18] + tot_ref[0:9, :] * ind
    k16 = jnp.concatenate(
        [compF[18 + 2 * m_ : 19 + 2 * m_]
         + 256.0 * compF[19 + 2 * m_ : 20 + 2 * m_] for m_ in range(4)],
        axis=0)
    compacted = jnp.concatenate(
        [cum9, k16, jnp.zeros((NCOL - 13, CTILE), jnp.float32)], axis=0)
    ntile = jnp.sum(emit_f).astype(jnp.int32)

    win = CTILE + 128
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
    carry_ref[0] = lo[0, CTILE - 1]
    carry_ref[1] = hi[0, CTILE - 1]
    carry_ref[2] = out_off + nflush
    carry_ref[3] = total - nflush
    tot_ref[:, :] = cum[:, CTILE - 1:CTILE]

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = out_off + total


@partial(jax.jit, static_argnums=(3,))
def _run_pallas(lo, hi, edges, grid: int):
    cap = grid * CTILE + CTILE + 384
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
            pl.BlockSpec((1, CTILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CTILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CTILE), lambda i: (0, i),
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
            pltpu.VMEM((NCOL, 1), jnp.float32),
            pltpu.VMEM((NCOL, CTILE + 128), jnp.float32),
            pltpu.VMEM((CTILE, CTILE), jnp.float32),
            pltpu.VMEM((CTILE, CTILE), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1",
    )(lo, hi, edges)
    return out, cnt


@partial(jax.jit, static_argnums=())
def count_sorted_pallas(keys, edges, valid):
    """Drop-in replacement for ops.kmers.count_sorted (same contract).

    Chunk-size cap: the kernel's f32 prefix sums are exact only while
    cumulative counts stay < 2^24, so chunks must hold < 2^24 records
    (get_count_sorted routes larger chunks to the XLA path)."""
    from .kmers import SENTINEL

    p = keys.shape[0]
    assert p < (1 << 24), (
        f"count_sorted_pallas chunk {p} >= 2^24: f32 prefix sums would "
        "lose count precision; use ops.kmers.count_sorted")
    skeys = jnp.where(valid, keys, SENTINEL)
    sedges = jnp.where(valid, edges, 0).astype(jnp.uint32)
    hi = (skeys >> jnp.uint64(32)).astype(jnp.uint32)
    lo = skeys.astype(jnp.uint32)
    hi, lo, sedges = jax.lax.sort((hi, lo, sedges), num_keys=2)

    pad = (-p) % CTILE + CTILE  # round up + one full sentinel tile
    grid = (p + pad) // CTILE

    def ext(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    lo_i = ext(lo, 0xFFFFFFFF).astype(jnp.int32).reshape(1, -1)
    hi_i = ext(hi, 0xFFFFFFFF).astype(jnp.int32).reshape(1, -1)
    ed_i = ext(sedges, 0).astype(jnp.int32).reshape(1, -1)

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
#
# Payload extraction splits the 9 u32 columns into u8 limbs so the
# one-hot contraction runs at DEFAULT precision (single-pass bf16,
# exact for 0/1 masks x values <= 255): the round-2 u16-limb kernel
# needed the 6-pass HIGHEST decomposition and was MXU-bound at 55 ms
# per 4M queries; u8 limbs double the rows but cut passes 6x.

PCOL = 16  # payload i32 rows: cov, fw0-3, bw0-3, zeros, row15 = 1
NROW = 24  # 18 u16 limb rows (9 cols x {lo16, hi16}) + marker + pad
# Probe tile sizes: larger than the count/merge TILE because the probe
# grid's cost is dominated by per-step orchestration (~0.8 us/step on
# v5e: 64K steps of 256x256 ran in 51 ms with the MXU work itself worth
# ~5 ms).  1024x1024 visits cut the grid ~5x at ~5 MB VMEM.
QT = 1024  # queries per tile
TT = 1024  # table rows per chunk


def _probe_kernel(base_ref, nch_ref, qhi_ref, qlo_ref, thi_ref, tlo_ref,
                  pay_ref, out_ref, qhi_s, qlo_s):
    """qhi/qlo arrive lane-contiguous [1, QT] (a [QT, 1] block would be
    1-lane-wide — 128x-padded registers and a pathological strided DMA,
    measured at ~5.8 us/step of pure overhead) and are transposed once
    per query tile into [QT, 1] scratch for the outer compare."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((NROW, QT), jnp.float32)
        qhi_s[:, :] = jnp.transpose(qhi_ref[:, :], (1, 0))
        qlo_s[:, :] = jnp.transpose(qlo_ref[:, :], (1, 0))

    @pl.when(j < nch_ref[i])
    def _():
        # [QT,1] query halves vs [1,TT] table halves -> [QT,TT]
        eq = ((qhi_s[:, :] == thi_ref[:, :])
              & (qlo_s[:, :] == tlo_ref[:, :])).astype(jnp.float32)
        pay = pay_ref[:, :]
        p9 = pay[:9, :]

        def limb(sh):
            return (jax.lax.shift_right_logical(
                p9, jnp.full_like(p9, sh)) & 0xFF).astype(jnp.float32)

        limbs = jnp.concatenate(
            [limb(0), limb(8), limb(16), limb(24),
             pay[15:16, :].astype(jnp.float32)], axis=0)  # [37, TT]
        # res[c, a] = limb c of the table row matching query a (or 0);
        # one-hot x u8 values: exact at single-pass bf16
        res = jax.lax.dot_general(limbs, eq, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # pair u8 limbs into u16 rows (<= 65535: exact f32) so the
        # output array and its downstream passes are 40% smaller
        rows = jnp.concatenate(
            [res[0:9] + 256.0 * res[9:18],
             res[18:27] + 256.0 * res[27:36],
             res[36:37],
             jnp.zeros((NROW - 19, QT), jnp.float32)], axis=0)
        out_ref[:, :] += rows


@partial(jax.jit, static_argnums=(5, 6))
def _probe_run(qhi, qlo, thi, tlo, pay, nq_tiles: int, dmax: int,
               base=None, nch=None):
    # x64 OFF for the same reason as _run_pallas: i64 from Python int
    # promotion (index maps, kernel constants) does not legalize
    with jax.enable_x64(False):
        return _probe_run_x32(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                              base, nch)


def _probe_run_x32(qhi, qlo, thi, tlo, pay, nq_tiles, dmax, base, nch):
    tchunks = thi.shape[1] // TT
    # queries as [1, qpad]: lane-contiguous column blocks (legal with
    # dim0 == 1; a [nq, QT] layout can't carry (1, QT) blocks)
    qhi = qhi.reshape(1, -1)
    qlo = qlo.reshape(1, -1)

    def qmap(i, j, b, n):
        del j, b, n
        return (0, i)

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
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, TT), tmap),
            pl.BlockSpec((1, TT), tmap),
            pl.BlockSpec((PCOL, TT), tmap),
        ],
        out_specs=pl.BlockSpec((NROW, QT), omap),
        scratch_shapes=[
            pltpu.VMEM((QT, 1), jnp.int32),
            pltpu.VMEM((QT, 1), jnp.int32),
        ],
    )
    return pl.pallas_call(
        _probe_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NROW, nq_tiles * QT),
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
    qpad = (-q) % QT
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

    base, nch = _tile_spans(tkeys, sq)
    return sq, sidx, qhi, qlo, base, nch


@jax.jit
def _probe_post(out, sidx):
    """Unpack limb rows and restore original query order."""
    qpad = out.shape[1]
    # perm[original position] = sorted position
    v = (sidx.astype(jnp.uint64) << jnp.uint64(26)) \
        | jnp.arange(qpad, dtype=jnp.uint64)
    perm = (jax.lax.sort(v) & jnp.uint64((1 << 26) - 1)).astype(jnp.int32)
    rows = jnp.take(out.T, perm, axis=0,
                    unique_indices=True)  # [qpad, NROW]
    u = rows.astype(jnp.uint32)
    vals = u[:, 0:9] | (u[:, 9:18] << jnp.uint32(16))
    found = u[:, 18] > 0
    cov = jnp.where(found, vals[:, 0], 0)
    fw = jnp.where(found[:, None], vals[:, 1:5], 0)
    bw = jnp.where(found[:, None], vals[:, 5:9], 0)
    return found, cov, fw, bw


_probe_tbl_cache = {}


def _cached_pack_table(tkeys, cov, fw, bw):
    """Packed (thi, tlo, pay) for the probe kernel, reused across
    windows of the same probe pass; the source table is held by
    weakref so a freed table releases its HBM."""
    import weakref

    cached = _probe_tbl_cache.get("entry")
    src = cached[0]() if cached is not None else None
    if src is tkeys and src is not None:
        return cached[1]
    if cached is not None and src is None:
        _probe_tbl_cache.clear()  # drop the stale packed copy now
    packed = _pack_table(tkeys, cov, fw, bw)
    _probe_tbl_cache["entry"] = (weakref.ref(tkeys), packed)
    return packed


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
    if q > (1 << 26) - QT:  # index rides in 26 bits of the sort key
        from .kmers import probe_merge

        return probe_merge(tkeys, cov, fw, bw, qkeys)
    sq, sidx, qhi, qlo, base, nch = _probe_prep(tkeys, qkeys)
    dmax = _grid_depth(nch)
    thi, tlo, pay = _cached_pack_table(tkeys, cov, fw, bw)
    nq_tiles = sq.shape[0] // QT
    out = _probe_run(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                     base=base, nch=nch)
    found, pcov, pfw, pbw = _probe_post(out, sidx)
    return found[:q], pcov[:q], pfw[:q], pbw[:q]


@jax.jit
def _pack_table(tkeys, cov, fw, bw):
    t = tkeys.shape[0]
    tpad = (-t) % TT
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


# ---------------------------------------------------------------------------
# Select-probe: the validate fast path
# ---------------------------------------------------------------------------
# probe_merge_pallas restores query order with a [q, LCOL] row gather —
# measured 173 ms at q=4M on v5e, 3x the kernel itself (random HBM row
# gathers run at ~25-40 M rows/s regardless of row width; see
# scripts/bench_probe_stages.py).  The validate workload only consumes
# FOUR values per position — found, cov, and the two edge counters the
# classifier selects by the neighbour bases (reference:
# src/kreeq.cpp:177-210) — so the fast path carries an 8-bit selection
# context through the query sort, picks the two columns right after the
# kernel, and restores query order with ONE keyed sort of
# (u32 idx-key, u64, u32) instead of the gather.


@jax.jit
def _probe_prep_sel(tkeys, qkeys, qctx):
    """Sort queries by key, carrying original index + selection context
    in the payload word: lo = key_low32 << 32 | ctx8 << 24 | idx24.
    Returns per-tile table chunk spans like _probe_prep."""
    from .kmers import SENTINEL

    q = qkeys.shape[0]
    qpad = (-q) % QT
    never = jnp.uint64(0xFFFFFFFFFFFFFFFE)
    qk = jnp.where(qkeys == SENTINEL, never, qkeys)
    qk = jnp.concatenate([qk, jnp.full((qpad,), SENTINEL, jnp.uint64)])
    ctx = jnp.concatenate([qctx.astype(jnp.uint64) & jnp.uint64(0xFF),
                           jnp.zeros((qpad,), jnp.uint64)])
    idx = jnp.concatenate([
        jnp.arange(q, dtype=jnp.uint64),
        jnp.full((qpad,), (1 << 24) - 1, jnp.uint64)])
    hi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (qk << jnp.uint64(32)) | (ctx << jnp.uint64(24)) | idx
    shi, slo = jax.lax.sort((hi, lo), num_keys=2)
    sq = (shi.astype(jnp.uint64) << jnp.uint64(32)) \
        | (slo >> jnp.uint64(32))
    sq = jnp.where(sq == SENTINEL, never, sq)  # pads: never match
    sctx = ((slo >> jnp.uint64(24)) & jnp.uint64(0xFF)).astype(jnp.int32)
    sidx = (slo & jnp.uint64((1 << 24) - 1)).astype(jnp.uint32)

    qhi = (sq >> jnp.uint64(32)).astype(jnp.int32)[:, None]
    qlo = sq.astype(jnp.int32)[:, None]

    base, nch = _tile_spans(tkeys, sq)
    return sidx, sctx, qhi, qlo, base, nch


def _tile_spans(tkeys, sq):
    """Per-query-tile table chunk spans via the downsampled chunk-first
    keys: bisecting tkeys[::TT] (8K entries at t=8M) instead of the
    full table cuts the span computation's gather rounds.  Spans are
    conservative to <= one extra leading chunk (base may start one
    chunk early when a tile's min lands mid-chunk past its last key);
    the kernel only requires coverage, not tightness."""
    tchunks = max((tkeys.shape[0] + TT - 1) // TT, 1)
    tk_ds = tkeys[::TT]  # first key of each chunk
    tile_min = sq[::QT]
    tile_max = sq[QT - 1::QT]
    base = jnp.clip(
        jnp.searchsorted(tk_ds, tile_min, side="right") - 1,
        0, tchunks - 1).astype(jnp.int32)
    last = jnp.clip(
        jnp.searchsorted(tk_ds, tile_max, side="right") - 1,
        base, tchunks - 1).astype(jnp.int32)
    nch = (last - base + 1).astype(jnp.int32)
    return base, nch


@jax.jit
def _probe_post_sel(out, sidx, sctx):
    """Column-select by context, then restore query order with one
    keyed sort (no gather).  Returns (found, cov, right, left) padded
    to the sorted length; caller slices [:q]."""
    u = out.astype(jnp.uint32)  # [NROW, qpad]
    vals = u[0:9] | (u[9:18] << jnp.uint32(16))
    found = u[18] > 0
    row_r = sctx & 0xF  # 1..8 into vals rows (1-4 fw, 5-8 bw)
    row_l = (sctx >> 4) & 0xF
    zero = jnp.zeros_like(vals[0])
    right = zero
    left = zero
    for j in range(1, 9):
        right = right + jnp.where(row_r == j, vals[j], 0)
        left = left + jnp.where(row_l == j, vals[j], 0)
    # restore: key = idx<<1 | found (idx distinct, so order == idx
    # order); payloads (cov | right << 32, left)
    key = (sidx << jnp.uint32(1)) | found.astype(jnp.uint32)
    p0 = vals[0].astype(jnp.uint64) \
        | (right.astype(jnp.uint64) << jnp.uint64(32))
    sk, sp0, sp1 = jax.lax.sort((key, p0, left), num_keys=1)
    found = (sk & jnp.uint32(1)).astype(bool)
    cov = (sp0 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    right = (sp0 >> jnp.uint64(32)).astype(jnp.uint32)
    return found, cov, right, sp1


def probe_select_pallas(tkeys, cov, fw, bw, qkeys, qctx):
    """Context-selected probe: (found, cov, right, left) in query
    order, where qctx packs the two vals-row selectors
    (bits 0-3 = right row 1..8, bits 4-7 = left row 1..8).

    Same wrapper structure as probe_merge_pallas (max-span readback
    for the static grid depth, weakref-cached packed table)."""
    q = qkeys.shape[0]
    if q == 0 or tkeys.shape[0] == 0 or q > (1 << 24) - QT:
        # fall back through the generic probe + XLA selection
        from .kmers import probe_merge

        found, pcov, pfw, pbw = (
            probe_merge_pallas(tkeys, cov, fw, bw, qkeys)
            if 0 < q <= (1 << 26) - TILE and tkeys.shape[0] > 0
            else probe_merge(tkeys, cov, fw, bw, qkeys))
        return _select_xla(found, pcov, pfw, pbw, qctx)
    sidx, sctx, qhi, qlo, base, nch = _probe_prep_sel(tkeys, qkeys, qctx)
    dmax = _grid_depth(nch)
    thi, tlo, pay = _cached_pack_table(tkeys, cov, fw, bw)
    nq_tiles = qhi.shape[0] // QT
    out = _probe_run(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                     base=base, nch=nch)
    found, pcov, right, left = _probe_post_sel(out, sidx, sctx)
    return found[:q], pcov[:q], right[:q], left[:q]


# ---------------------------------------------------------------------------
# Select-probe v2: in-kernel selection, 8-row output
# ---------------------------------------------------------------------------
# The round-3 select-probe emitted 19 value rows per query and did the
# context selection in the XLA post stage — a [24, 4M] readback plus a
# 16-way select loop before the restore sort.  v2 accumulates the
# paired u16 value rows in VMEM scratch across a tile's chunk visits
# and applies the selection IN KERNEL at the tile's last visit, so the
# output is 8 rows (found, cov lo/hi, right lo/hi, left lo/hi, pad)
# and the post stage goes straight to the restore sort.

SROW = 8


def _probe_kernel_sel2(base_ref, nch_ref, qhi_ref, qlo_ref, sctx_ref,
                       thi_ref, tlo_ref, pay_ref, out_ref,
                       qhi_s, qlo_s, acc_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((SROW, QT), jnp.float32)
        acc_ref[:, :] = jnp.zeros((24, QT), jnp.float32)
        qhi_s[:, :] = jnp.transpose(qhi_ref[:, :], (1, 0))
        qlo_s[:, :] = jnp.transpose(qlo_ref[:, :], (1, 0))

    @pl.when(j < nch_ref[i])
    def _():
        eq = ((qhi_s[:, :] == thi_ref[:, :])
              & (qlo_s[:, :] == tlo_ref[:, :])).astype(jnp.float32)
        pay = pay_ref[:, :]
        p9 = pay[:9, :]

        def limb(sh):
            return (jax.lax.shift_right_logical(
                p9, jnp.full_like(p9, sh)) & 0xFF).astype(jnp.float32)

        limbs = jnp.concatenate(
            [limb(0), limb(8), limb(16), limb(24),
             pay[15:16, :].astype(jnp.float32)], axis=0)  # [37, TT]
        res = jax.lax.dot_general(limbs, eq, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rows = jnp.concatenate(
            [res[0:9] + 256.0 * res[9:18],
             res[18:27] + 256.0 * res[27:36],
             res[36:37],
             jnp.zeros((24 - 19, QT), jnp.float32)], axis=0)
        acc_ref[:, :] += rows

    @pl.when((j == nch_ref[i] - 1) & (nch_ref[i] > 0))
    def _():
        acc = acc_ref[:, :]
        ctx = sctx_ref[:, :]
        row_r = ctx & 0xF
        row_l = jax.lax.shift_right_logical(
            ctx, jnp.full_like(ctx, 4)) & 0xF
        z = jnp.zeros((1, QT), jnp.float32)
        r_lo = z
        r_hi = z
        l_lo = z
        l_hi = z
        for c in range(1, 9):
            r_lo = r_lo + jnp.where(row_r == c, acc[c:c + 1], 0.0)
            r_hi = r_hi + jnp.where(row_r == c, acc[9 + c:10 + c], 0.0)
            l_lo = l_lo + jnp.where(row_l == c, acc[c:c + 1], 0.0)
            l_hi = l_hi + jnp.where(row_l == c, acc[9 + c:10 + c], 0.0)
        out_ref[:, :] = jnp.concatenate(
            [acc[18:19], acc[0:1], acc[9:10], r_lo, r_hi, l_lo, l_hi,
             jnp.zeros((SROW - 7, QT), jnp.float32)], axis=0)


@partial(jax.jit, static_argnums=(6, 7))
def _probe_run_sel2(qhi, qlo, sctx, thi, tlo, pay, nq_tiles: int,
                    dmax: int, base=None, nch=None):
    with jax.enable_x64(False):
        return _probe_run_sel2_x32(qhi, qlo, sctx, thi, tlo, pay,
                                   nq_tiles, dmax, base, nch)


def _probe_run_sel2_x32(qhi, qlo, sctx, thi, tlo, pay, nq_tiles, dmax,
                        base, nch):
    tchunks = thi.shape[1] // TT
    qhi = qhi.reshape(1, -1)
    qlo = qlo.reshape(1, -1)
    sctx = sctx.reshape(1, -1)

    def qmap(i, j, b, n):
        del j, b, n
        return (0, i)

    def tmap(i, j, b, n):
        c = b[i] + jnp.minimum(j, jnp.maximum(n[i] - 1, 0))
        return (0, jnp.minimum(c, tchunks - 1))

    def omap(i, j, b, n):
        del j, b, n
        return (0, i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_tiles, dmax),
        in_specs=[
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, TT), tmap),
            pl.BlockSpec((1, TT), tmap),
            pl.BlockSpec((PCOL, TT), tmap),
        ],
        out_specs=pl.BlockSpec((SROW, QT), omap),
        scratch_shapes=[
            pltpu.VMEM((QT, 1), jnp.int32),
            pltpu.VMEM((QT, 1), jnp.int32),
            pltpu.VMEM((24, QT), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _probe_kernel_sel2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SROW, nq_tiles * QT),
                                       jnp.float32),
        interpret=os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1",
    )(base, nch, qhi, qlo, sctx, thi, tlo, pay)


@jax.jit
def _probe_post_sel2(out, sidx):
    """Restore query order from the 8-row pre-selected kernel output
    with one keyed sort (the select loop already ran in kernel)."""
    u = out.astype(jnp.uint32)  # [SROW, qpad]
    found = u[0] > 0
    cov = u[1] | (u[2] << jnp.uint32(16))
    right = u[3] | (u[4] << jnp.uint32(16))
    left = u[5] | (u[6] << jnp.uint32(16))
    key = (sidx << jnp.uint32(1)) | found.astype(jnp.uint32)
    p0 = cov.astype(jnp.uint64) \
        | (right.astype(jnp.uint64) << jnp.uint64(32))
    sk, sp0, sp1 = jax.lax.sort((key, p0, left), num_keys=1)
    found = (sk & jnp.uint32(1)).astype(bool)
    cov = (sp0 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    right = (sp0 >> jnp.uint64(32)).astype(jnp.uint32)
    return found, cov, right, sp1


# ---------------------------------------------------------------------------
# QV-probe: the sums-only validate fast path
# ---------------------------------------------------------------------------
# Plain `kreeq validate` (no track output) consumes ONLY the two QV
# aggregates per window: #missing and #edge-missing positions
# (reference: the DBGbase tracks filled by evaluateSegment,
# src/kreeq.cpp:143-219, feed only the QV totals at
# src/kreeq.cpp:78-106 unless a bed/csv/kwig/bkwig writer runs).
# Sums are order-invariant, so this path never restores query order
# (the select-probe's 15.7 ms keyed sort disappears) and the kernel
# contracts 10 INDICATOR rows (cov>=cutoff, the 8 edge columns != 0,
# and the found marker) instead of 37 u8 value limbs.  Window bounds
# ride the carried query index as a mask.

IROW = 16  # 10 indicator rows + pad to the f32 sublane multiple


def _probe_kernel_ind(base_ref, nch_ref, qhi_ref, qlo_ref, thi_ref,
                      tlo_ref, pay_ref, out_ref, qhi_s, qlo_s, *,
                      tbias: int):
    """Indicator variant of _probe_kernel: rows 0 = cov >= cutoff,
    1-8 = fw0-3/bw0-3 != 0, 9 = found.  tbias = cutoff - 2^31: u32
    compare via the signed-bias trick (cov rows are u32 bit patterns
    in i32)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros((IROW, QT), jnp.float32)
        qhi_s[:, :] = jnp.transpose(qhi_ref[:, :], (1, 0))
        qlo_s[:, :] = jnp.transpose(qlo_ref[:, :], (1, 0))

    @pl.when(j < nch_ref[i])
    def _():
        eq = ((qhi_s[:, :] == thi_ref[:, :])
              & (qlo_s[:, :] == tlo_ref[:, :])).astype(jnp.float32)
        pay = pay_ref[:, :]
        covok = ((pay[0:1, :] ^ jnp.int32(-(1 << 31)))
                 >= jnp.int32(tbias)).astype(jnp.float32)
        edges = (pay[1:9, :] != 0).astype(jnp.float32)
        ind = jnp.concatenate(
            [covok, edges, pay[15:16, :].astype(jnp.float32),
             jnp.zeros((IROW - 10, TT), jnp.float32)], axis=0)
        # one-hot x 0/1 indicators: exact at single-pass bf16
        res = jax.lax.dot_general(ind, eq, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[:, :] += res


@partial(jax.jit, static_argnums=(5, 6, 7))
def _probe_run_ind(qhi, qlo, thi, tlo, pay, nq_tiles: int, dmax: int,
                   cutoff: int, base=None, nch=None):
    with jax.enable_x64(False):
        return _probe_run_ind_x32(qhi, qlo, thi, tlo, pay, nq_tiles,
                                  dmax, cutoff, base, nch)


def _probe_run_ind_x32(qhi, qlo, thi, tlo, pay, nq_tiles, dmax, cutoff,
                       base, nch):
    tchunks = thi.shape[1] // TT
    qhi = qhi.reshape(1, -1)
    qlo = qlo.reshape(1, -1)

    def qmap(i, j, b, n):
        del j, b, n
        return (0, i)

    def tmap(i, j, b, n):
        c = b[i] + jnp.minimum(j, jnp.maximum(n[i] - 1, 0))
        return (0, jnp.minimum(c, tchunks - 1))

    def omap(i, j, b, n):
        del j, b, n
        return (0, i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_tiles, dmax),
        in_specs=[
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, QT), qmap),
            pl.BlockSpec((1, TT), tmap),
            pl.BlockSpec((1, TT), tmap),
            pl.BlockSpec((PCOL, TT), tmap),
        ],
        out_specs=pl.BlockSpec((IROW, QT), omap),
        scratch_shapes=[
            pltpu.VMEM((QT, 1), jnp.int32),
            pltpu.VMEM((QT, 1), jnp.int32),
        ],
    )
    tbias = max(int(cutoff), 1) - (1 << 31)
    return pl.pallas_call(
        partial(_probe_kernel_ind, tbias=tbias),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((IROW, nq_tiles * QT),
                                       jnp.float32),
        interpret=os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1",
    )(base, nch, qhi, qlo, thi, tlo, pay)


@jax.jit
def _post_qv(out, sidx, sctx, lead, hi, nch, dmax):
    """QV sums from indicator rows, in SORTED order (no restore):
    missing = ~(found & covok); edge-missing = found & covok with both
    selected edge columns zero (a ctx row selector of 0 encodes "no
    neighbour base", making that side a non-witness — reference
    semantics at src/kreeq.cpp:176-210).  Positions outside
    [lead, hi) (window seam context + pads) are masked by the carried
    index.

    Returns i64[3] = (miss, edge, depth_ok): ONE array so the caller
    reads everything back in one transfer.  depth_ok = every tile's
    span fit the hinted grid depth; a 0 means the kernel skipped
    chunks and the window must be recomputed with the true depth (the
    hint scheme avoids a blocking max(nch) readback per window — a
    ~26 ms pipeline bubble through the tunnel)."""
    found = out[9] > 0
    covok = out[0] > 0
    row_r = sctx & 0xF
    row_l = (sctx >> 4) & 0xF
    rnz = jnp.zeros_like(found)
    lnz = jnp.zeros_like(found)
    for j in range(1, 9):
        nz = out[j] > 0
        rnz = rnz | ((row_r == j) & nz)
        lnz = lnz | ((row_l == j) & nz)
    ok = found & covok
    no_right = (row_r != 0) & ~rnz
    no_left = (row_l != 0) & ~lnz
    edge_missing = ok & no_left & no_right
    inwin = (sidx >= lead) & (sidx < hi)
    miss_n = jnp.sum((~ok & inwin).astype(jnp.int32))
    edge_n = jnp.sum((edge_missing & inwin).astype(jnp.int32))
    depth_ok = (jnp.max(nch) <= dmax).astype(jnp.int32)
    return jnp.stack([miss_n.astype(jnp.int64),
                      edge_n.astype(jnp.int64),
                      depth_ok.astype(jnp.int64)])


# dmax hints per (tchunks, nq_tiles) AND table identity (held by
# weakref — a hint computed against one table must not leak to a
# different same-shaped table): one blocking readback the first time a
# (table, shape) pair is seen, then reused; _post_qv's depth_ok flag
# catches (rare, skew-driven) underestimates and the wrapper retries
# with the true depth, raising the hint.
_dmax_hints: dict = {}


def get_dmax_hint(tkeys, hkey):
    ent = _dmax_hints.get(hkey)
    if ent is None or ent[0]() is not tkeys:
        return None
    return ent[1]


def set_dmax_hint(tkeys, hkey, dmax: int) -> None:
    import weakref

    ent = _dmax_hints.get(hkey)
    prev = ent[1] if ent is not None and ent[0]() is tkeys else 0
    _dmax_hints[hkey] = (weakref.ref(tkeys), max(int(dmax), prev))


def probe_qv_pallas(tkeys, cov, fw, bw, qkeys, qctx, lead, hi,
                    cutoff: int):
    """Standalone sums-only probe: (#missing, #edge-missing) among
    query positions with lead <= index < hi.  qctx packs the two
    vals-row selectors with 0 = that side has no neighbour base.
    Same wrapper structure as probe_select_pallas."""
    q = qkeys.shape[0]
    if q == 0 or tkeys.shape[0] == 0:
        # nothing can be found: every in-window position is missing
        n_in = jnp.maximum(
            jnp.minimum(hi.astype(jnp.int32), jnp.int32(q))
            - lead.astype(jnp.int32), 0)
        return n_in, jnp.int32(0)
    if q > (1 << 24) - QT:
        found, pcov, right, left = probe_select_pallas(
            tkeys, cov, fw, bw, qkeys, qctx)
        return _sum_qv_xla(found, pcov, right, left, qctx, lead, hi,
                           cutoff)
    sidx, sctx, qhi, qlo, base, nch = _probe_prep_sel(tkeys, qkeys, qctx)
    dmax = _grid_depth(nch)
    thi, tlo, pay = _cached_pack_table(tkeys, cov, fw, bw)
    nq_tiles = qhi.shape[0] // QT
    out = _probe_run_ind(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                         max(int(cutoff), 1), base=base, nch=nch)
    res = _post_qv(out, sidx, sctx, lead, hi, nch, jnp.int32(dmax))
    return res[0].astype(jnp.int32), res[1].astype(jnp.int32)


@partial(jax.jit, static_argnums=(7,))
def _sum_qv_xla(found, cov, right, left, qctx, lead, hi, cutoff: int):
    """The same QV sums over a generic selected probe result (the
    big-window / empty-table fallback)."""
    q = found.shape[0]
    idx = jnp.arange(q, dtype=jnp.uint32)
    inwin = (idx >= lead) & (idx < hi)
    cut = jnp.uint32(max(int(cutoff), 1))
    ok = found & (cov >= cut)
    row_r = qctx & jnp.uint32(0xF)
    row_l = (qctx >> jnp.uint32(4)) & jnp.uint32(0xF)
    no_right = (row_r != 0) & ~(ok & (right != 0))
    no_left = (row_l != 0) & ~(ok & (left != 0))
    edge_missing = ok & no_left & no_right
    miss_n = jnp.sum((~ok & inwin).astype(jnp.int32))
    edge_n = jnp.sum((edge_missing & inwin).astype(jnp.int32))
    return miss_n, edge_n


@jax.jit
def _select_xla(found, cov, fw, bw, qctx):
    """The same context selection applied to a generic probe result."""
    row_r = (qctx & 0xF).astype(jnp.int32)
    row_l = ((qctx >> 4) & 0xF).astype(jnp.int32)
    cols = jnp.concatenate([cov[:, None], fw, bw], axis=1)  # [q, 9]
    lanes = jnp.arange(9, dtype=jnp.int32)[None, :]

    def pick(idx):
        return jnp.where(lanes == idx[:, None], cols,
                         jnp.uint32(0)).sum(axis=1, dtype=jnp.uint32)

    return found, cov, pick(row_r), pick(row_l)


# ---------------------------------------------------------------------------
# Streaming union/merge: shared pack/post helpers
# ---------------------------------------------------------------------------
# The merge kernel itself lives below ("Streaming union/merge kernel
# v2"); these helpers pack tables into its lane-major layout and
# decode its u16-limb output rows.

MROW = 24  # output rows: 4 key u16 limbs + 18 payload limbs + pad


def _grid_depth(nch) -> int:
    """Host readback of max(nch) for a static grid depth (the probe
    kernels' wrapper; the merge kernel uses a visit-list grid and
    needs no readback).  Small values are used exactly — each wasted
    depth step costs real pipeline orchestration — and only large
    outliers bucket to powers of two to bound recompilation."""
    d = max(int(jnp.max(nch)), 1) if nch.shape[0] else 1
    if d <= 8:
        return d
    return 1 << int(np.ceil(np.log2(d)))


_BIAS = -(1 << 31)  # signed<->unsigned order bias for key halves
_SENT_BIASED = (1 << 31) - 1  # 0xFFFFFFFF after the bias (u32^0x80000000)


def _key_lt(ahi, alo, bhi, blo):
    """Lexicographic compare of biased (hi, lo) key halves."""
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


@partial(jax.jit, static_argnums=(4,))
def _merge_pack(ka, cov, fw, bw, reverse: bool = False):
    """Key halves [1, n] i32 + payload [PCOL, n] i32 (optionally lane-
    reversed, for the bitonic network's descending side)."""
    n0 = cov.shape[0]
    padn = ka.shape[0] - n0

    def ext(a):
        return jnp.concatenate([a, jnp.zeros((padn,), jnp.uint32)])

    rows = ([ext(cov)] + [ext(fw[:, w]) for w in range(4)]
            + [ext(bw[:, w]) for w in range(4)]
            + [jnp.zeros((ka.shape[0],), jnp.uint32)] * 7)
    pay = jnp.stack(rows, axis=0).astype(jnp.int32)
    khi = (ka >> jnp.uint64(32)).astype(jnp.int32)[None, :]
    klo = ka.astype(jnp.int32)[None, :]
    if reverse:
        khi = khi[:, ::-1]
        klo = klo[:, ::-1]
        pay = pay[:, ::-1]
    return khi, klo, pay


@jax.jit
def _merge_post(out, cnt):
    rows = out.T  # [cap, MROW]
    n = cnt[0, 0].astype(jnp.uint32)
    live = (jnp.arange(rows.shape[0], dtype=jnp.uint32) < n)
    u = rows.astype(jnp.uint32)
    keys = (u[:, 0].astype(jnp.uint64)
            | (u[:, 1].astype(jnp.uint64) << jnp.uint64(16))
            | (u[:, 2].astype(jnp.uint64) << jnp.uint64(32))
            | (u[:, 3].astype(jnp.uint64) << jnp.uint64(48)))
    keys = jnp.where(live, keys, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    lo = u[:, 4:13]
    hi = u[:, 13:22]
    vals = jnp.where(live[:, None], lo | (hi << jnp.uint32(16)), 0)
    return keys, vals[:, 0], vals[:, 1:5], vals[:, 5:9], n

# ---------------------------------------------------------------------------
# Streaming union/merge kernel v2
# ---------------------------------------------------------------------------
# Round-3 verdict: the v1 merge kernel lost to the XLA merge on-chip
# (merge_path: "xla", 48.5 M rows/s).  Profiling shows why: v1 ran
# TWO full one-hot MXU compactions per 256-row step (one in flush, one
# rebuilding the working tile), moved payloads through the bitonic
# network as 22 f32 u16-limb rows, rebuilt its [n2,n2] iota matrices
# every step, used the 6-pass HIGHEST matmul decomposition, and
# blocked on every flush DMA.  v2 keeps the same merge architecture
# (per-A-tile B spans from _merge_prep, bitonic block merge, bounded
# emission, saturating dedup, 128-aligned overlap flush) but:
#   * payloads ride the network as 9 PACKED i32 rows (11 rows total
#     with the two key halves) — u8 limb extraction happens once, at
#     flush time, for the single compaction matmul;
#   * dedup saturating adds run in i32 with the sign-bias trick
#     (wrap-add + unsigned-overflow detect), no limb carries;
#   * the keep side needs NO compaction: after the merge network the
#     keep zone [e_pos:) is live W survivors followed only by
#     sentinels (dup sentinels always land in the emit zone — a dup
#     pair's key is <= the chunk bound), so the working tile rebuild
#     is one dynamic roll + mask;
#   * ONE one-hot compaction per step (emit zone), built against a
#     hoisted iota scratch with a roll-doubling prefix rank (no
#     tri matmul), applied to u8 limbs with a single-pass DEFAULT
#     (bf16) matmul — exact for 0/1 one-hots times values <= 255.
# Tile width is a tuning knob (KREEQ_TPU_MERGE_TILE, default 512).

MTILE = int(os.environ.get("KREEQ_TPU_MERGE_TILE", "512"))
# profiling knob (trace-time): letters disable kernel pieces to
# localize per-step cost on-chip — b=bitonic, f=flush compact+DMA,
# k=keep rebuild, m=onehot matmul, d=dedup.  Results are WRONG with
# any letter set; never set outside scripts/bench_merge_r4.py.  A
# leaked letter must fail loudly, not silently corrupt merges: it is
# honored only alongside the explicit bench-only opt-in (the pallas
# auto-gate fingerprint additionally keys on these knobs, so =auto
# cannot ride a cached OK verdict into a debug configuration).
_MDBG = os.environ.get("KREEQ_TPU_MERGE_DEBUG", "")
if _MDBG and os.environ.get("KREEQ_TPU_MERGE_DEBUG_OPTIN") != "1":
    raise RuntimeError(
        "KREEQ_TPU_MERGE_DEBUG is set (merge results would be WRONG); "
        "set KREEQ_TPU_MERGE_DEBUG_OPTIN=1 only in bench scripts")


def _satadd_u32(a, b, add_mask):
    """Per-lane u32 saturating add of i32-typed rows where add_mask."""
    s = a + b  # i32 wrap-add == u32 wrap-add
    ovf = (s ^ _BIAS) < (a ^ _BIAS)  # unsigned s < a  => wrapped
    sat = jnp.where(ovf, jnp.int32(-1), s)
    return jnp.where(add_mask, sat, a)


def _limbs_u8(rows11, width):
    """[11, width] i32 (biased khi, biased klo, 9 payload u32-as-i32)
    -> [48, width] f32 u8-limb rows: 8 key limbs (low->high of the
    unbiased u64 key) + 36 payload limbs (per column: b0..b3)."""
    khi = rows11[0:1] - _BIAS
    klo = rows11[1:2] - _BIAS
    pay = rows11[2:11]

    def b8(x, sh):
        return (jax.lax.shift_right_logical(
            x, jnp.full_like(x, sh)) & 0xFF).astype(jnp.float32)

    key_l = [b8(klo, s) for s in (0, 8, 16, 24)] \
        + [b8(khi, s) for s in (0, 8, 16, 24)]
    pay_l = [b8(pay, s) for s in (0, 8, 16, 24)]  # 4 x [9, width]
    return jnp.concatenate(
        key_l + pay_l + [jnp.zeros((4, width), jnp.float32)], axis=0)


def _pair_u16(comp):
    """[48, width] f32 compacted u8 limbs -> [MROW, width] output rows
    (4 key u16 limbs, 9 payload lo16, 9 payload hi16, pad) matching
    _merge_post's layout."""
    width = comp.shape[1]
    k16 = jnp.concatenate(
        [comp[0:1] + 256.0 * comp[1:2], comp[2:3] + 256.0 * comp[3:4],
         comp[4:5] + 256.0 * comp[5:6], comp[6:7] + 256.0 * comp[7:8]],
        axis=0)
    lo16 = comp[8:17] + 256.0 * comp[17:26]
    hi16 = comp[26:35] + 256.0 * comp[35:44]
    return jnp.concatenate(
        [k16, lo16, hi16, jnp.zeros((MROW - 22, width), jnp.float32)],
        axis=0)


def _rank_roll(live_f, width):
    """Inclusive prefix count of the [1, width] 0/1 f32 mask via
    roll-doubling (log2(width) add/where passes — no tri matmul)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    s = live_f.astype(jnp.int32)
    d = 1
    while d < width:
        s = s + jnp.where(lane >= d, pltpu.roll(s, d, axis=1), 0)
        d *= 2
    return s  # [1, width] i32 inclusive ranks


def _merge_kernel2(tv_ref, jv_ref, first_ref, nch_ref, blo_ref, bhi_ref,
                   ahi_ref, alo_ref, apay_ref,
                   bhi_rev_ref, blo_rev_ref, bpay_rev_ref,
                   out_ref, cnt_ref,
                   w_ref, carry_ref, flush_ref, iota_ref, sem_ref):
    """1-D visit-list grid: step s works on A tile tv[s], span chunk
    jv[s] (prep flattens the variable per-tile spans, so there are no
    dead (tile, depth) grid cells and no blocking max-span readback;
    pad steps carry jv = 2^30 and are fully predicated off).

    Scratch: w VMEM [11, MTILE] i32 working tile (biased khi, klo,
    9 packed payload rows; empty slots read biased-SENTINEL keys);
    carry SMEM i32[2] (out_off, tail_len); flush VMEM
    [MROW, 2*MTILE+128] f32; iota VMEM [n2, n2] i32 row indices."""
    s = pl.program_id(0)
    i = tv_ref[s]
    j = jv_ref[s]
    n2 = 2 * MTILE
    sent = jnp.int32(_SENT_BIASED)

    @pl.when(s == 0)
    def _():
        carry_ref[0] = 0
        carry_ref[1] = 0
        iota_ref[:, :] = jax.lax.broadcasted_iota(
            jnp.int32, (n2, n2), 0)

    @pl.when(j == 0)
    def _():
        w_ref[0:1, :] = ahi_ref[0, :][None, :] + _BIAS
        w_ref[1:2, :] = alo_ref[0, :][None, :] + _BIAS
        w_ref[2:11, :] = apay_ref[:9, :]

    def flush(rows11, live):
        """Extract u8 limbs of the live lanes, compact with one
        single-pass one-hot matmul, stream through the 128-aligned
        overlap window."""
        width = rows11.shape[1]
        live_f = live.astype(jnp.float32)
        ntile = jnp.sum(live_f).astype(jnp.int32)
        if "f" in _MDBG:
            carry_ref[0] = carry_ref[0] + (ntile // 128) * 128
            carry_ref[1] = ntile % 128
            return
        rank = _rank_roll(live_f, width)
        limbs = _limbs_u8(rows11, width) * live_f
        if "m" in _MDBG:
            comp = limbs + jnp.broadcast_to(
                rank.astype(jnp.float32), limbs.shape)
        else:
            onehot = ((jnp.broadcast_to(rank - 1, (width, width))
                       == iota_ref[:width, :width])
                      & live[0, :][None, :]).astype(jnp.float32)
            comp = jax.lax.dot_general(limbs, onehot,
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        rows = _pair_u16(comp)

        out_off = carry_ref[0]
        tail_len = carry_ref[1]
        win = n2 + 128
        comp_pad = jnp.pad(rows, ((0, 0), (0, win - width)))
        shifted = pltpu.roll(comp_pad, tail_len, axis=1)
        li = jax.lax.broadcasted_iota(jnp.int32, (MROW, win), 1)
        merged = jnp.where(li < tail_len, flush_ref[:, :], shifted)
        total = tail_len + ntile
        nflush = (total // jnp.int32(128)) * jnp.int32(128)
        flush_ref[:, :] = merged
        copy = pltpu.make_async_copy(
            flush_ref,
            out_ref.at[:, pl.ds(pl.multiple_of(out_off, 128), win)],
            sem_ref)
        copy.start()
        copy.wait()
        flush_ref[:, :] = pltpu.roll(
            merged, (jnp.int32(win) - nflush) % jnp.int32(win), axis=1)
        carry_ref[0] = out_off + nflush
        carry_ref[1] = total - nflush

    @pl.when(j < nch_ref[i])
    def _():
        # reversed B chunk: span rows live, others sentinel; rotate the
        # masked prefix to the front so the lane sequence stays
        # descending (same construction as v1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, MTILE), 1)
        cstart = (first_ref[i] + j) * MTILE
        g = cstart + (jnp.int32(MTILE - 1) - lane)
        inspan = (g >= blo_ref[i]) & (g < bhi_ref[i])
        bk_hi = jnp.where(inspan, bhi_rev_ref[0, :] + _BIAS, sent)
        bk_lo = jnp.where(inspan, blo_rev_ref[0, :] + _BIAS, sent)
        bpay = jnp.where(jnp.broadcast_to(inspan, (9, MTILE)),
                         bpay_rev_ref[:9, :], 0)
        pre = jnp.clip(blo_ref[i] - cstart, 0, MTILE)
        bk_hi = pltpu.roll(bk_hi, pre, axis=1)
        bk_lo = pltpu.roll(bk_lo, pre, axis=1)
        bpay = pltpu.roll(bpay, pre, axis=1)
        inspan_i = jnp.where(inspan, jnp.int32(1), jnp.int32(0))
        live_b = pltpu.roll(inspan_i, pre, axis=1) > 0

        # the visit's emission bound: the chunk's max REAL key
        neg = jnp.int32(_BIAS)
        bhix = jnp.max(jnp.where(live_b, bk_hi, neg))
        blox = jnp.max(jnp.where(live_b & (bk_hi == bhix), bk_lo, neg))
        is_last = j == nch_ref[i] - 1

        # [11, n2] = [W | reversed B chunk] -> bitonic merge network
        brows = jnp.concatenate([bk_hi, bk_lo, bpay], axis=0)
        rows = jnp.concatenate([w_ref[:, :], brows], axis=1)
        khi = rows[0:1]
        klo = rows[1:2]
        pay = rows[2:11]
        d = 0 if "b" in _MDBG else MTILE
        while d >= 1:
            f_hi = pltpu.roll(khi, n2 - d, axis=1)
            f_lo = pltpu.roll(klo, n2 - d, axis=1)
            b_hi = pltpu.roll(khi, d, axis=1)
            b_lo = pltpu.roll(klo, d, axis=1)
            f_pl = pltpu.roll(pay, n2 - d, axis=1)
            b_pl = pltpu.roll(pay, d, axis=1)
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1)
            lo_pos = (lane2 % (2 * d)) < d
            take_f = lo_pos & _key_lt(f_hi, f_lo, khi, klo)
            take_b = (~lo_pos) & _key_lt(khi, klo, b_hi, b_lo)
            khi = jnp.where(take_f, f_hi, jnp.where(take_b, b_hi, khi))
            klo = jnp.where(take_f, f_lo, jnp.where(take_b, b_lo, klo))
            tf9 = jnp.broadcast_to(take_f, (9, n2))
            tb9 = jnp.broadcast_to(take_b, (9, n2))
            pay = jnp.where(tf9, f_pl, jnp.where(tb9, b_pl, pay))
            d //= 2

        # emission split BEFORE dedup marking: sorted prefix <= bound
        le_bound = _key_lt(khi, klo, jnp.full_like(khi, bhix),
                           jnp.full_like(klo, blox)) \
            | ((khi == bhix) & (klo == blox))
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1)
        e_pos = jnp.sum(le_bound.astype(jnp.float32)).astype(jnp.int32)
        e_pos = jnp.where(is_last, jnp.int32(n2), e_pos)
        in_emit = pos < e_pos

        # dedup adjacent equals: saturating-add into the LATER lane,
        # sentinel the earlier (dup pairs never straddle the bound)
        if "d" not in _MDBG:
            p_hi = pltpu.roll(khi, 1, axis=1)
            p_lo = pltpu.roll(klo, 1, axis=1)
            p_pl = pltpu.roll(pay, 1, axis=1)
            eq_prev = (pos > 0) & (khi == p_hi) & (klo == p_lo) & \
                ((khi != sent) | (klo != sent))
            pay = _satadd_u32(pay, p_pl,
                              jnp.broadcast_to(eq_prev, (9, n2)))
            eq_i = jnp.where(eq_prev, jnp.int32(1), jnp.int32(0))
            nxt_eq = pltpu.roll(eq_i, n2 - 1, axis=1) > 0
            khi = jnp.where(nxt_eq, sent, khi)
            klo = jnp.where(nxt_eq, sent, klo)

        live = (khi != sent) | (klo != sent)
        rows11 = jnp.concatenate([khi, klo, pay], axis=0)
        flush(rows11, live & in_emit)

        # keep side: [e_pos:) is live W survivors then sentinels only —
        # rebuild W with one dynamic roll + tail mask, no compaction
        if "k" in _MDBG:
            w_ref[0:1, :] = jnp.full((1, MTILE), sent, jnp.int32)
            w_ref[1:2, :] = jnp.full((1, MTILE), sent, jnp.int32)
        else:
            kroll = pltpu.roll(rows11, (jnp.int32(n2) - e_pos)
                               % jnp.int32(n2), axis=1)
            wlane = jax.lax.broadcasted_iota(jnp.int32, (1, MTILE), 1)
            dead = wlane >= (jnp.int32(n2) - e_pos)
            wk = kroll[:, :MTILE]
            w_ref[0:1, :] = jnp.where(dead, sent, wk[0:1])
            w_ref[1:2, :] = jnp.where(dead, sent, wk[1:2])
            w_ref[2:11, :] = jnp.where(
                jnp.broadcast_to(dead, (9, MTILE)), 0, wk[2:11])

    # span-less tiles still hold their A rows: flush W on their one
    # visit (prep gives every tile at least one)
    @pl.when((j == 0) & (nch_ref[i] == 0))
    def _():
        rows11 = jnp.concatenate(
            [w_ref[:, :],
             jnp.concatenate(
                 [jnp.full((2, MTILE), _SENT_BIASED, jnp.int32),
                  jnp.zeros((9, MTILE), jnp.int32)], axis=0)], axis=1)
        live = (rows11[0:1] != sent) | (rows11[1:2] != sent)
        flush(rows11, live)

    @pl.when(s == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0, 0] = carry_ref[0] + carry_ref[1]


@partial(jax.jit, static_argnums=(12,))
def _merge_run2(tv, jv, first, nch, blo, bhi, ahi, alo, apay, bhir,
                blor, bpayr, na_t: int):
    with jax.enable_x64(False):
        return _merge_run2_x32(tv, jv, first, nch, blo, bhi, ahi, alo,
                               apay, bhir, blor, bpayr, na_t)


def _merge_run2_x32(tv, jv, first, nch, blo, bhi, ahi, alo, apay, bhir,
                    blor, bpayr, na_t):
    nbt = bhir.shape[1] // MTILE
    n2 = 2 * MTILE
    cap = (na_t + nbt + 2) * MTILE + n2 + 384
    nsteps = tv.shape[0]

    def amap(s, tv, jv, f, n, lo, hi):
        del jv, f, n, lo, hi
        return (0, tv[s])

    def bmap(s, tv, jv, f, n, lo, hi):
        del lo, hi
        i = tv[s]
        c = f[i] + jnp.minimum(jv[s], jnp.maximum(n[i] - 1, 0))
        c = jnp.clip(c, 0, nbt - 1)
        return (0, nbt - 1 - c)  # reversed array chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, MTILE), amap),
            pl.BlockSpec((1, MTILE), amap),
            pl.BlockSpec((PCOL, MTILE), amap),
            pl.BlockSpec((1, MTILE), bmap),
            pl.BlockSpec((1, MTILE), bmap),
            pl.BlockSpec((PCOL, MTILE), bmap),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((11, MTILE), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((MROW, n2 + 128), jnp.float32),
            pltpu.VMEM((n2, n2), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, cnt = pl.pallas_call(
        _merge_kernel2,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((MROW, cap), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1",
    )(tv, jv, first, nch, blo, bhi, ahi, alo, apay, bhir, blor, bpayr)
    return out, cnt


@partial(jax.jit, static_argnums=(2,))
def _merge_prep_t(keys_a, keys_b, tile: int):
    """_merge_prep with a parameterized tile width.

    B spans are clamped to B's REAL rows: production tables carry
    SENTINEL tails (pow2 bucket padding), and a run of equal sentinel
    keys all lands in ONE A-tile's span — a 3M-row sentinel tail made
    dmax ~8192 and exploded the grid to ~1M mostly-predicated-off
    steps (the round-3 kernel's entire on-chip loss, ~2 s per 8M-row
    merge, was this).  Sentinel B rows contribute nothing to the
    output (merge_sorted drops them), so the clamp is exact."""
    na = keys_a.shape[0]
    apad = (-na) % tile + tile  # extra sentinel tile swallows B's tail
    ka = jnp.concatenate(
        [keys_a, jnp.full((apad,), 0xFFFFFFFFFFFFFFFF, jnp.uint64)])
    nb = keys_b.shape[0]
    bpad = (-nb) % tile if nb else tile  # at least one B chunk
    kb = jnp.concatenate(
        [keys_b, jnp.full((bpad,), 0xFFFFFFFFFFFFFFFF, jnp.uint64)])
    nb_real = jnp.searchsorted(
        kb, jnp.uint64(0xFFFFFFFFFFFFFFFF)).astype(jnp.int32)
    tile_max = ka[tile - 1::tile]
    b_hi = jnp.searchsorted(kb, tile_max, side="right").astype(jnp.int32)
    b_hi = jnp.minimum(b_hi, nb_real)
    b_lo = jnp.concatenate([jnp.zeros((1,), jnp.int32), b_hi[:-1]])
    nbt = kb.shape[0] // tile
    first = jnp.minimum(b_lo // tile, max(nbt - 1, 0)).astype(jnp.int32)
    last = jnp.clip((b_hi - 1) // tile, first, max(nbt - 1, 0)) \
        .astype(jnp.int32)
    nch = jnp.where(b_hi > b_lo, last - first + 1, 0).astype(jnp.int32)

    # flatten the variable per-tile spans into a 1-D visit list:
    # visit v works (tile tv[v], span chunk jv[v]); every tile gets at
    # least one visit (span-less tiles flush their W rows on it); pad
    # steps carry jv = 2^30 and are fully predicated off.  The length
    # bound is static (sum of span chunks <= nbt + na_t boundary
    # spills, plus one visit per span-less tile), so NO max-span
    # readback is needed and skew costs nothing.
    na_t = ka.shape[0] // tile
    nbt = kb.shape[0] // tile
    cap = 2 * na_t + nbt + 1
    visits = jnp.maximum(nch, 1)
    ends = jnp.cumsum(visits)
    starts = ends - visits
    v = jnp.arange(cap, dtype=jnp.int32)
    tv = jnp.searchsorted(ends.astype(jnp.int32), v,
                          side="right").astype(jnp.int32)
    pad = v >= ends[-1].astype(jnp.int32)
    tv = jnp.clip(tv, 0, na_t - 1)
    jv = v - starts[tv].astype(jnp.int32)
    jv = jnp.where(pad, jnp.int32(1 << 30), jv)
    return ka, kb, first, nch, b_lo, b_hi, tv, jv


def merge_sorted_pallas(keys_a, cov_a, fw_a, bw_a, keys_b, cov_b,
                         fw_b, bw_b):
    """v2 streaming drop-in for ops.kmers.merge_sorted (same contract:
    merged sorted-unique table of length len(a)+len(b), saturating u32
    adds, SENTINEL tail, plus the real count).  Fully async: no
    blocking readback anywhere (the visit-list grid replaces the
    round-3 max-span readback).

    Size guard: the visit/span arrays ride scalar prefetch, i.e. SMEM,
    whose capacity is ~1 MB on v5e — a 16.7M+16.7M merge (level-2 of a
    big build tree) needs ~1.3 MB of prefetch operands and fails
    Mosaic allocation.  Above the budget
    (KREEQ_TPU_MERGE_SMEM_BUDGET, default 700 KB, which admits the
    8.4M+8.4M level-1 shape) the XLA merge takes over."""
    na = keys_a.shape[0]
    nb = keys_b.shape[0]
    na_t = (na + (-na) % MTILE + MTILE) // MTILE
    nbt = max((nb + ((-nb) % MTILE if nb else MTILE)) // MTILE, 1)
    cap = 2 * na_t + nbt + 1
    smem_bytes = (2 * cap + 4 * na_t) * 4
    budget = int(os.environ.get("KREEQ_TPU_MERGE_SMEM_BUDGET",
                                "700000"))
    if smem_bytes > budget:
        from .kmers import merge_sorted

        return merge_sorted(keys_a, cov_a, fw_a, bw_a, keys_b, cov_b,
                            fw_b, bw_b)
    p = keys_a.shape[0] + keys_b.shape[0]
    (ka, kb, first, nch, b_lo, b_hi, tv,
     jv) = _merge_prep_t(keys_a, keys_b, MTILE)
    ahi, alo, apay = _merge_pack(ka, cov_a, fw_a, bw_a)
    bhir, blor, bpayr = _merge_pack(kb, cov_b, fw_b, bw_b, reverse=True)
    na_t = ka.shape[0] // MTILE
    out, cnt = _merge_run2(tv, jv, first, nch, b_lo, b_hi, ahi, alo,
                           apay, bhir, blor, bpayr, na_t)
    keys, cov, fw, bw, n = _merge_post(out, cnt)
    return keys[:p], cov[:p], fw[:p], bw[:p], n


def count_sorted_split(keys, edges, valid, nsplit: int):
    """count_sorted as nsplit independent sub-sorts reduced by the
    streaming merge kernel.  (No 2^24 cap here: the XLA sub-sorts are
    exact at any size, and merge v2 is exact for all u32 counter
    values — payloads ride the bitonic network as packed i32 rows,
    dedup adds are i32 sign-bias saturating adds, and the flush
    compaction is a u8-limb single-pass bf16 one-hot matmul, exact
    for 0/1 one-hots times values <= 255.)

    XLA's TPU sort is superlinear past VMEM-friendly sizes (measured:
    2x8M-base steps = 614 ms vs 1169 ms for one 16M step), so S small
    sorts + S-1 sequential-pass merges can beat one monolithic sort.
    Same contract as ops.kmers.count_sorted; the split count is an
    on-chip tuning knob (KREEQ_TPU_COUNT_SPLIT).
    """
    from .kmers import count_sorted

    p = keys.shape[0]
    m = -(-p // nsplit)
    parts = []
    for i in range(nsplit):
        lo = i * m
        hi = min(p, lo + m)
        if lo >= hi:
            break
        parts.append(count_sorted(keys[lo:hi], edges[lo:hi],
                                  valid[lo:hi]))
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            a, b = parts[i], parts[i + 1]
            nxt.append(merge_sorted_pallas(a[0], a[1], a[2], a[3],
                                           b[0], b[1], b[2], b[3]))
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    # part lengths always sum to p (count_sorted returns slice-length
    # arrays; each merge returns len(a)+len(b)), matching count_sorted's
    # one-row-per-record contract exactly
    k, c, f, b, n = parts[0]
    return k[:p], c[:p], f[:p], b[:p], n
