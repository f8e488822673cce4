"""Fused assembly-validation kernel: probe + per-base QV classification.

Vectorized re-expression of the reference's evaluateSegment
(reference: src/kreeq.cpp:110-229): for every k-mer position of a
segment, look its canonical key up in the table, then classify it as
missing (cov == 0 or cov < covCutOff) or edge-missing (both the left
and right edge counters for the actual neighbour bases are zero).

Output per position: cov, isFw, right-edge count, left-edge count —
the right/left orientation-normalized pair is what the reference stores
as DBGbase.fw/bw after its isFw shuffle (reference:
src/kreeq.cpp:177-210 with the printTable swap at
src/kreeq-output.cpp:197-207).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kmers import kmer_positions, probe_bucketed, probe_merge


def _classify(codes, k: int, cutoff: int, isfw, valid, found, cov, fw,
              bw):
    """Per-base QV classification given probe results (traced inside
    both the fused XLA path and the Pallas-probe path)."""
    n = codes.shape[0]
    p = n - k + 1
    found = found & valid

    nxt = jnp.concatenate([codes[k:], jnp.full((1,), 4, jnp.uint8)])
    prv = jnp.concatenate([jnp.full((1,), 4, jnp.uint8), codes[: p - 1]])
    has_next = nxt <= 3
    has_prev = prv <= 3
    nc = (nxt & 3).astype(jnp.int32)
    pc = (prv & 3).astype(jnp.int32)

    # column selection by one-hot select+reduce: take_along_axis lowers
    # to a per-row HBM gather on TPU, while these are pure VPU ops
    lanes = jnp.arange(4, dtype=jnp.int32)[None, :]

    def pick(mat, idx):
        return jnp.where(lanes == idx[:, None], mat, jnp.uint32(0)).sum(
            axis=1, dtype=jnp.uint32)

    right = pick(jnp.where(isfw[:, None], fw, bw),
                 jnp.where(isfw, nc, 3 - nc))
    left = pick(jnp.where(isfw[:, None], bw, fw),
                jnp.where(isfw, pc, 3 - pc))
    right = jnp.where(found & has_next, right, 0)
    left = jnp.where(found & has_prev, left, 0)

    cov = jnp.where(found, cov, 0)
    # no `valid` guard: windows containing non-ACGT bases (IUPAC codes;
    # N runs are split into segments upstream) have found=False, so
    # cov==0 marks them missing — matching the reference, whose garbage
    # hash for such windows can only miss the DB
    missing = (cov == 0) | (cov < jnp.uint32(cutoff))
    no_right = has_next & (right == 0)
    no_left = has_prev & (left == 0)
    edge_missing = valid & ~missing & no_left & no_right
    # the reference fills edge tracks only on the non-missing branch
    # (src/kreeq.cpp:176-210)
    right = jnp.where(missing, 0, right)
    left = jnp.where(missing, 0, left)
    return valid, missing, edge_missing, cov, isfw, right, left


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def validate_positions(tkeys, tcov, tfw, tbw, starts, codes, k: int,
                       cutoff: int, bits: int, rounds: int,
                       use_merge: bool = False):
    """codes: uint8[N] one segment (BAD-padded to a bucket size).

    Returns per-position arrays of length P = N - k + 1:
      valid, missing, edge_missing (bool), cov u32, isfw bool,
      right u32, left u32.

    use_merge selects the gather-free sort-merge probe, which wins
    whenever the table is not much larger than the window (the caller
    decides — see KmerTable.probe for the heuristic).
    """
    keys, isfw, _edges, valid = kmer_positions(codes, k)
    if use_merge:
        found, cov, fw, bw = probe_merge(tkeys, tcov, tfw, tbw, keys)
    else:
        found, cov, fw, bw = probe_bucketed(tkeys, tcov, tfw, tbw,
                                            starts, keys, k, bits,
                                            rounds)
    return _classify(codes, k, cutoff, isfw, valid, found, cov, fw, bw)


@partial(jax.jit, static_argnums=(1,))
def _extract(codes, k: int):
    return kmer_positions(codes, k)


@partial(jax.jit, static_argnums=(2, 3))
def _classify_jit(codes, probe, k: int, cutoff: int, isfw=None,
                  valid=None):
    found, cov, fw, bw = probe
    return _classify(codes, k, cutoff, isfw, valid, found, cov, fw, bw)


@jax.jit
def qv_window_sums(missing, edge_missing, lead, hi):
    """Window-masked QV sums of a full classification result (the
    sums-only path for the XLA probe).  Returns i64[3] with the same
    layout as validate_qv_sums_pallas (depth_ok always 1)."""
    idx = jnp.arange(missing.shape[0], dtype=jnp.uint32)
    inwin = (idx >= lead) & (idx < hi)
    return jnp.stack(
        [jnp.sum((missing & inwin).astype(jnp.int64)),
         jnp.sum((edge_missing & inwin).astype(jnp.int64)),
         jnp.int64(1)])


def validate_positions_table(table, codes, k: int, cutoff: int):
    """validate_positions with the probe routed through
    KmerTable.probe_device — transparently pages table windows when
    the table exceeds the device cap (reference analog: the map-range
    rescan loop, src/kreeq.cpp:59-76)."""
    keys, isfw, _edges, valid = _extract(codes, k)
    probe = table.probe_device(keys)
    return _classify_jit(codes, probe, k, cutoff, isfw=isfw, valid=valid)


@partial(jax.jit, static_argnums=(1,))
def _extract_ctx(codes, k: int):
    """Extraction + the per-position selection context for the
    select-probe: ctx bits 0-3 = right vals-row (1-4 fw, 5-8 bw),
    bits 4-7 = left vals-row — the same column choice _classify's
    pick() makes (right = isfw ? fw[nc] : bw[3-nc], left = isfw ?
    bw[pc] : fw[3-pc], reference: src/kreeq.cpp:177-210)."""
    keys, isfw, _edges, valid = kmer_positions(codes, k)
    p = keys.shape[0]
    nxt = jnp.concatenate([codes[k:], jnp.full((1,), 4, jnp.uint8)])
    prv = jnp.concatenate([jnp.full((1,), 4, jnp.uint8), codes[: p - 1]])
    nc = (nxt & 3).astype(jnp.int32)
    pc = (prv & 3).astype(jnp.int32)
    row_r = jnp.where(isfw, 1 + nc, 5 + (3 - nc))
    row_l = jnp.where(isfw, 5 + pc, 1 + (3 - pc))
    ctx = (row_r | (row_l << 4)).astype(jnp.uint32)
    return keys, isfw, valid, ctx


@partial(jax.jit, static_argnums=(2, 3))
def _classify_sel(codes, sel, k: int, cutoff: int, isfw=None, valid=None):
    """_classify semantics over a context-selected probe result
    (found, cov, right, left already column-selected)."""
    found, cov, right, left = sel
    n = codes.shape[0]
    p = n - k + 1
    found = found & valid
    nxt = jnp.concatenate([codes[k:], jnp.full((1,), 4, jnp.uint8)])
    prv = jnp.concatenate([jnp.full((1,), 4, jnp.uint8), codes[: p - 1]])
    has_next = nxt <= 3
    has_prev = prv <= 3
    right = jnp.where(found & has_next, right, 0)
    left = jnp.where(found & has_prev, left, 0)
    cov = jnp.where(found, cov, 0)
    missing = (cov == 0) | (cov < jnp.uint32(cutoff))
    no_right = has_next & (right == 0)
    no_left = has_prev & (left == 0)
    edge_missing = valid & ~missing & no_left & no_right
    right = jnp.where(missing, 0, right)
    left = jnp.where(missing, 0, left)
    return valid, missing, edge_missing, cov, isfw, right, left


@partial(jax.jit, static_argnums=(2,))
def _prep_sel_fused(tkeys, codes, k: int):
    """ONE dispatch: extraction + selection context + query sort +
    per-tile table spans (the nested jitted callees inline)."""
    from .pallas_kernels import _probe_prep_sel

    keys, isfw, valid, ctx = _extract_ctx(codes, k)
    sidx, sctx, qhi, qlo, base, nch = _probe_prep_sel(tkeys, keys, ctx)
    return sidx, sctx, qhi, qlo, base, nch, isfw, valid


@partial(jax.jit, static_argnums=(5, 6))
def _post_sel_fused(out, sidx, sctx, isfw, valid, k: int, cutoff: int,
                    codes=None):
    """ONE dispatch: limb unpack + column select + keyed-sort restore +
    QV classification."""
    from .pallas_kernels import _probe_post_sel

    p = codes.shape[0] - k + 1
    found, cov, right, left = (a[:p] for a in
                               _probe_post_sel(out, sidx, sctx))
    return _classify_sel(codes, (found, cov, right, left), k, cutoff,
                         isfw=isfw, valid=valid)


@partial(jax.jit, static_argnums=(4, 5))
def _post_sel_fused2(out, sidx, isfw, valid, k: int, cutoff: int,
                     codes=None):
    """ONE dispatch over the 8-row pre-selected kernel output:
    keyed-sort restore + QV classification (the column select already
    ran in kernel)."""
    from .pallas_kernels import _probe_post_sel2

    p = codes.shape[0] - k + 1
    found, cov, right, left = (a[:p] for a in
                               _probe_post_sel2(out, sidx))
    return _classify_sel(codes, (found, cov, right, left), k, cutoff,
                         isfw=isfw, valid=valid)


@partial(jax.jit, static_argnums=(1,))
def _extract_ctx_qv(codes, k: int):
    """_extract_ctx with the QV encoding: a row selector of 0 means
    that side has no neighbour base (has_next/has_prev false), so the
    sums-only post never needs codes in sorted order."""
    keys, isfw, _edges, valid = kmer_positions(codes, k)
    from .kmers import SENTINEL

    # invalid windows (non-ACGT base) carry raw garbage keys plus the
    # valid flag; the sums path has no position-order classify to apply
    # it, so mask them to SENTINEL (can never match the table)
    keys = jnp.where(valid, keys, SENTINEL)
    p = keys.shape[0]
    nxt = jnp.concatenate([codes[k:], jnp.full((1,), 4, jnp.uint8)])
    prv = jnp.concatenate([jnp.full((1,), 4, jnp.uint8), codes[: p - 1]])
    nc = (nxt & 3).astype(jnp.int32)
    pc = (prv & 3).astype(jnp.int32)
    row_r = jnp.where(nxt <= 3,
                      jnp.where(isfw, 1 + nc, 5 + (3 - nc)), 0)
    row_l = jnp.where(prv <= 3,
                      jnp.where(isfw, 5 + pc, 1 + (3 - pc)), 0)
    ctx = (row_r | (row_l << 4)).astype(jnp.uint32)
    return keys, ctx


@partial(jax.jit, static_argnums=(2,))
def _prep_qv_fused(tkeys, codes, k: int):
    """ONE dispatch: extraction + QV selection context + query sort +
    per-tile table spans."""
    from .pallas_kernels import _probe_prep_sel

    keys, ctx = _extract_ctx_qv(codes, k)
    return _probe_prep_sel(tkeys, keys, ctx)


@jax.jit
def _pack3(mn, en):
    return jnp.stack([mn.astype(jnp.int64), en.astype(jnp.int64),
                      jnp.int64(1)])


def validate_qv_sums_pallas(tkeys, tcov, tfw, tbw, codes, k: int,
                            cutoff: int, lead, hi, sync: bool = False):
    """Sums-only validate fast path — all plain `validate` consumes
    (reference: the evaluateSegment tracks feed only the QV totals,
    src/kreeq.cpp:78-106, unless a track writer runs).  No query-order
    restore; the kernel contracts indicator rows only.

    Returns a device i64[3] = (#missing, #edge-missing, depth_ok) over
    positions lead <= i < hi.  The kernel grid depth comes from a
    cached per-shape hint so no blocking readback serializes the
    window pipeline; depth_ok == 0 means the hint was too small (rare
    key skew) and the caller must re-run the window with sync=True,
    which reads back the true depth.  lead/hi must be jnp.uint32
    scalars."""
    from . import pallas_kernels as PK

    q = codes.shape[0] - k + 1
    if q <= 0:
        # no k-mer positions at all: the [lead, hi) window is empty
        # (_extract_ctx_qv cannot even run — kmer_positions requires
        # codes of length >= k)
        return jnp.asarray([0, 0, 1], jnp.int64)
    if tkeys.shape[0] == 0 or q > (1 << 24) - PK.QT:
        keys, ctx = _extract_ctx_qv(codes, k)
        mn, en = PK.probe_qv_pallas(tkeys, tcov, tfw, tbw, keys, ctx,
                                    lead, hi, cutoff)
        return _pack3(mn, en)
    sidx, sctx, qhi, qlo, base, nch = _prep_qv_fused(tkeys, codes, k)
    thi, tlo, pay = PK._cached_pack_table(tkeys, tcov, tfw, tbw)
    nq_tiles = qhi.shape[0] // PK.QT
    hkey = (thi.shape[1] // PK.TT, nq_tiles)
    dmax = None if sync else PK.get_dmax_hint(tkeys, hkey)
    if dmax is None:
        dmax = PK._grid_depth(nch)  # one blocking readback per shape
        PK.set_dmax_hint(tkeys, hkey, dmax)
    out = PK._probe_run_ind(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                            max(int(cutoff), 1), base=base, nch=nch)
    return PK._post_qv(out, sidx, sctx, lead, hi, nch, jnp.int32(dmax))


@jax.jit
def _depth_ok(nch, dmax):
    return (jnp.max(nch) <= dmax).astype(jnp.int64)


def validate_positions_pallas(tkeys, tcov, tfw, tbw, codes, k: int,
                              cutoff: int, sync: bool = True,
                              with_depth_ok: bool = False):
    """validate_positions with the probe running through the Pallas
    streaming merge kernel + context selection + keyed-sort restore —
    the row-gather-free fast path, 2 XLA dispatches + the kernel.
    Same outputs as validate_positions.

    With sync=True (default) the wrapper reads back the max
    table-chunk span per query tile to pick its static grid depth —
    a blocking ~26 ms pipeline bubble through the tunnel, but outputs
    are unconditionally correct.  sync=False uses the cached per-shape
    depth hint instead (same scheme as validate_qv_sums_pallas) —
    callers MUST then pass with_depth_ok=True and check the appended
    depth_ok device scalar when consuming the outputs (0 = hint too
    small, re-run the window with sync=True).
    """
    from . import pallas_kernels as PK

    q = codes.shape[0] - k + 1
    if q <= 0 or tkeys.shape[0] == 0 or q > (1 << 24) - PK.QT:
        from .pallas_kernels import probe_select_pallas

        keys, isfw, valid, ctx = _extract_ctx(codes, k)
        sel = probe_select_pallas(tkeys, tcov, tfw, tbw, keys, ctx)
        res = _classify_sel(codes, sel, k, cutoff, isfw=isfw,
                            valid=valid)
        return (*res, jnp.int64(1)) if with_depth_ok else res
    (sidx, sctx, qhi, qlo, base, nch, isfw,
     valid) = _prep_sel_fused(tkeys, codes, k)
    thi, tlo, pay = PK._cached_pack_table(tkeys, tcov, tfw, tbw)
    nq_tiles = qhi.shape[0] // PK.QT
    hkey = (thi.shape[1] // PK.TT, nq_tiles)
    dmax = None if sync else PK.get_dmax_hint(tkeys, hkey)
    if dmax is None:
        dmax = PK._grid_depth(nch)  # blocking readback
        PK.set_dmax_hint(tkeys, hkey, dmax)
    out = PK._probe_run_sel2(qhi, qlo, sctx, thi, tlo, pay, nq_tiles,
                             dmax, base=base, nch=nch)
    res = _post_sel_fused2(out, sidx, isfw, valid, k, cutoff,
                           codes=codes)
    return (*res, _depth_ok(nch, jnp.int32(dmax))) \
        if with_depth_ok else res
