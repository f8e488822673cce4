"""Ablate count_sorted internals + probe stages on the real chip.

All big arrays are passed as jit ARGUMENTS — captured concrete arrays
get embedded as HLO constants and blow the remote-compile request
limit (HTTP 413).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=5, mutate=0):
    """Chained-dep timing: perturb args[mutate] from the output scalar."""
    carry = list(args)
    out = fn(*carry)
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(first.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*carry)
        first = out[0] if isinstance(out, tuple) else out
        a = carry[mutate]
        carry[mutate] = a.at[0].set((first.ravel()[0] & 1).astype(a.dtype))
    _ = np.asarray(first.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import (SENTINEL, build_bucket_index,
                                     count_sorted, kmer_positions,
                                     probe_bucketed)

    k = 31
    chunk = 1 << 23
    p = chunk - k + 1
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, chunk).astype(np.uint8))

    keys, _isfw, edges, valid = kmer_positions(codes, k)
    tkeys, cov, fw, bw, n = map(jnp.asarray, count_sorted(keys, edges, valid))
    print("table n =", int(n), flush=True)

    # ---- count internals -------------------------------------------------
    skeys = jnp.sort(jnp.where(valid, keys, SENTINEL))
    m9 = jnp.concatenate(
        [jnp.ones((p, 1), jnp.uint32)] +
        [((jnp.where(valid, edges, 0).astype(jnp.uint32) >> w) & 1)[:, None]
         for w in range(8)], axis=1)

    timed("cumsum [8M,9] u32 axis0", jax.jit(lambda m: jnp.cumsum(m, axis=0)),
          m9)
    timed("cumsum [8M,9] i32 axis0",
          jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32), axis=0)), m9)

    def cumsum_blocked(m):
        B = 512
        n0 = m.shape[0]
        pad = (-n0) % B
        mp = jnp.pad(m, ((0, pad), (0, 0)))
        nb = mp.shape[0] // B
        x = mp.reshape(nb, B, 9).astype(jnp.float32)
        tri = jnp.tril(jnp.ones((B, B), jnp.float32))
        within = jnp.einsum("ij,bjc->bic", tri, x,
                            preferred_element_type=jnp.float32)
        bsums = mp.reshape(nb, B, 9).astype(jnp.int32).sum(axis=1)
        offs = jnp.cumsum(bsums, axis=0) - bsums  # exclusive, tiny
        out = within.astype(jnp.int32) + offs[:, None, :]
        return out.reshape(nb * B, 9)[:n0].astype(jnp.uint32)

    cb = jax.jit(cumsum_blocked)
    timed("cumsum blocked-matmul [8M,9]", cb, m9)
    ref = jnp.cumsum(m9, axis=0)
    print("blocked == cumsum:", bool(jnp.array_equal(cb(m9), ref)),
          flush=True)

    # compaction: row scatter (current) vs flag-sort + row gather
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    ends = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    real = skeys != SENTINEL
    run_id = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    payload = jnp.concatenate(
        [ref, (skeys & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)[:, None],
         (skeys >> jnp.uint64(32)).astype(jnp.uint32)[:, None]], axis=1)

    def compact_scatter(payload, out_idx):
        init = jnp.concatenate(
            [jnp.zeros((p + 1, 9), jnp.uint32),
             jnp.full((p + 1, 2), 0xFFFFFFFF, jnp.uint32)], axis=1)
        return init.at[out_idx].set(payload, mode="drop")[:p]

    out_idx = jnp.where(ends & real, run_id, p)
    timed("compact row-scatter [8M,11]", jax.jit(compact_scatter),
          payload, out_idx, mutate=1)

    def compact_flagsort(payload, flag):
        # run-end rows first, in position (= run_id) order; non-end rows
        # have their key columns pre-masked to SENTINEL
        masked = payload.at[:, 9:].set(
            jnp.where(flag[:, None], payload[:, 9:],
                      jnp.uint32(0xFFFFFFFF)))
        iota = jnp.arange(p, dtype=jnp.int32)
        _, order = jax.lax.sort(((~flag).astype(jnp.uint8), iota),
                                num_keys=1)
        return masked[order]

    flag = ends & real
    timed("compact flag-sort+gather [8M,11]", jax.jit(compact_flagsort),
          payload, flag, mutate=1)

    # ---- probe stages (args, not closures) -------------------------------
    pchunk = 1 << 22
    asm = jnp.asarray(rng.integers(0, 4, pchunk).astype(np.uint8))
    qkeys = kmer_positions(asm, k)[0]
    bits = 22
    starts = build_bucket_index(tkeys, k, bits)
    rounds = max(1, int(np.ceil(np.log2(
        np.diff(np.asarray(starts)).max() + 1))))
    print("rounds =", rounds, flush=True)

    from functools import partial

    probe_j = jax.jit(partial(probe_bucketed, k=k, bits=bits,
                              rounds=rounds))
    timed("probe_bucketed (4M keys)", probe_j, tkeys, cov, fw, bw, starts,
          qkeys, mutate=5)

    def bisect(tkeys, starts, q):
        shift = jnp.uint64(2 * k - bits)
        b = jnp.clip((q >> shift).astype(jnp.int32), 0, (1 << bits) - 1)
        lo = starts[b]
        hi = starts[b + 1]
        for _ in range(rounds):
            mid = (lo + hi) >> 1
            take = tkeys[jnp.minimum(mid, tkeys.shape[0] - 1)] < q
            lo = jnp.where(take & (lo < hi), mid + 1, lo)
            hi = jnp.where(take | (lo >= hi), hi, mid)
        return jnp.minimum(lo, tkeys.shape[0] - 1)

    bisect_j = jax.jit(bisect)
    timed("bisection only (4M)", bisect_j, tkeys, starts, qkeys, mutate=2)

    idx = bisect_j(tkeys, starts, qkeys)

    def payload_sep(tkeys, cov, fw, bw, q, ix):
        found = tkeys[ix] == q
        z = jnp.uint32(0)
        return (jnp.where(found, cov[ix], z),
                jnp.where(found[:, None], fw[ix], z),
                jnp.where(found[:, None], bw[ix], z))

    timed("payload 3 gathers (4M)", jax.jit(payload_sep), tkeys, cov, fw,
          bw, qkeys, idx, mutate=5)

    pay9 = jnp.concatenate([cov[:, None], fw, bw], axis=1)

    def payload_one(tkeys, pay9, q, ix):
        found = tkeys[ix] == q
        row = jnp.where(found[:, None], pay9[ix], jnp.uint32(0))
        return row[:, 0], row[:, 1:5], row[:, 5:9]

    timed("payload fused [T,9] (4M)", jax.jit(payload_one), tkeys, pay9,
          qkeys, idx, mutate=3)


if __name__ == "__main__":
    main()
