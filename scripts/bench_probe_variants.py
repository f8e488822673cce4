"""Probe design A/B on-chip (round 2, item 3): bisect row-gather width,
slab dynamic-slice fetch.  Tables passed as jit ARGS (closure constants
blow up the remote-compile request body)."""

import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import build_bucket_index, probe_bucketed

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    P = 1 << 23
    Q = 1 << 22
    k = 31

    keys0 = jnp.asarray(rng.integers(0, 1 << 62, P, dtype=np.uint64))
    mask = jnp.uint64((1 << (2 * k)) - 1)
    tkeys = jnp.sort(keys0 & mask)
    cov = jnp.asarray(rng.integers(1, 100, P).astype(np.uint32))
    fw = jnp.asarray(rng.integers(0, 100, (P, 4)).astype(np.uint32))
    bw = jnp.asarray(rng.integers(0, 100, (P, 4)).astype(np.uint32))
    qkeys0 = jnp.asarray(
        np.asarray(tkeys)[rng.integers(0, P, Q).astype(np.int64)])
    bits = min(int(np.ceil(np.log2(P))) + 1, 24, 2 * k)
    starts = build_bucket_index(tkeys, k, bits)
    counts = np.diff(np.asarray(starts))
    rounds = max(1, int(np.ceil(np.log2(counts.max() + 1))))
    print(f"bucket index: bits={bits} rounds={rounds} "
          f"max_bucket={int(counts.max())}", flush=True)

    rows16 = jnp.concatenate(
        [(tkeys & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)[:, None],
         (tkeys >> jnp.uint64(32)).astype(jnp.uint32)[:, None],
         cov[:, None], fw, bw,
         jnp.zeros((P, 5), jnp.uint32)], axis=1)

    def timed(name, stepfn, args, iters=5, warm=3):
        step = jax.jit(stepfn)
        qk = qkeys0
        out = step(qk, *args)
        _ = float(np.asarray(out[1]))
        for _ in range(warm):
            out = step(qk, *args)
            qk = jnp.roll(qk, 1) ^ out[1].astype(jnp.uint64)
        _ = float(np.asarray(out[1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(qk, *args)
            qk = jnp.roll(qk, 1) ^ out[1].astype(jnp.uint64)
        _ = float(np.asarray(out[1]))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:46s} {dt * 1e3:9.1f} ms ({Q / dt / 1e6:.1f} M/s)",
              flush=True)
        return dt

    def e_cur(qk, tkeys, cov, fw, bw, starts):
        f, c, _f4, _b4 = probe_bucketed(tkeys, cov, fw, bw, starts, qk,
                                        k, bits, rounds)
        return qk, c[0].astype(jnp.uint64)

    timed("bucketed bisection (current)", e_cur,
          (tkeys, cov, fw, bw, starts))

    def e_bisect16(qk, tkeys, rows16, starts):
        shift = jnp.uint64(2 * k - bits)
        b = jnp.clip((qk >> shift).astype(jnp.int32), 0, (1 << bits) - 1)
        lo = starts[b]
        hi = starts[b + 1]
        for _ in range(rounds):
            mid = (lo + hi) >> 1
            take = tkeys[jnp.minimum(mid, tkeys.shape[0] - 1)] < qk
            lo = jnp.where(take & (lo < hi), mid + 1, lo)
            hi = jnp.where(take | (lo >= hi), hi, mid)
        idx = jnp.minimum(lo, tkeys.shape[0] - 1)
        r = rows16[idx]
        qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
        found = (r[:, 0] == qlo) & (r[:, 1] == qhi)
        return qk, jnp.where(found, r[:, 2], 0)[0].astype(jnp.uint64)

    timed("bisect + [T,16] row gather", e_bisect16,
          (tkeys, rows16, starts))

    # bisect on rows16's own key columns (no separate tkeys gathers):
    # each round gathers the [T,16] row and compares the embedded key
    def e_bisect16_fused(qk, rows16, starts):
        shift = jnp.uint64(2 * k - bits)
        b = jnp.clip((qk >> shift).astype(jnp.int32), 0, (1 << bits) - 1)
        lo = starts[b]
        hi = starts[b + 1]
        lim = rows16.shape[0] - 1
        klo = rows16[:, 0]
        khi = rows16[:, 1]
        qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
        for _ in range(rounds):
            mid = (lo + hi) >> 1
            m = jnp.minimum(mid, lim)
            mk = (khi[m].astype(jnp.uint64) << jnp.uint64(32)) \
                | klo[m].astype(jnp.uint64)
            take = mk < qk
            lo = jnp.where(take & (lo < hi), mid + 1, lo)
            hi = jnp.where(take | (lo >= hi), hi, mid)
        idx = jnp.minimum(lo, lim)
        r = rows16[idx]
        found = (r[:, 0] == qlo) & (r[:, 1] == qhi)
        return qk, jnp.where(found, r[:, 2], 0)[0].astype(jnp.uint64)

    timed("bisect via u32-col keys + [T,16] gather", e_bisect16_fused,
          (rows16, starts))

    for S in (8, 16):
        rows_pad = jnp.concatenate(
            [rows16, jnp.full((S, 16), 0xFFFFFFFF, jnp.uint32)], axis=0)

        def e_slab(qk, rows_pad, starts, S=S):
            shift = jnp.uint64(2 * k - bits)
            b = jnp.clip((qk >> shift).astype(jnp.int32), 0,
                         (1 << bits) - 1)
            lo = starts[b]
            blk = jax.vmap(lambda s: jax.lax.dynamic_slice(
                rows_pad, (s, jnp.zeros((), s.dtype)), (S, 16)))(lo)
            qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
            hit = ((blk[:, :, 0] == qlo[:, None])
                   & (blk[:, :, 1] == qhi[:, None]))
            c = jnp.where(hit, blk[:, :, 2], 0).max(axis=1)
            return qk, c[0].astype(jnp.uint64)

        timed(f"slab dyn-slice ({S}x16)", e_slab, (rows_pad, starts))

    # gather-free sort-merge join with the fast 2-key representation:
    # one (hi24, lo38|tag|src23) sort of [table ++ queries], cummax
    # carries the last table row, one u64 sort restores query order,
    # one wide row gather fetches payloads
    def e_merge2(qk, tkeys, rows16):
        t = tkeys.shape[0]
        q = qk.shape[0]
        m38 = jnp.uint64((1 << 38) - 1)
        allk = jnp.concatenate([tkeys, qk])
        tag = jnp.concatenate([jnp.zeros((t,), jnp.uint64),
                               jnp.ones((q,), jnp.uint64)])
        src = jnp.concatenate([jnp.arange(t, dtype=jnp.uint64),
                               jnp.arange(q, dtype=jnp.uint64)])
        hi = (allk >> jnp.uint64(38)).astype(jnp.uint32)
        lo = ((allk & m38) << jnp.uint64(26)) | (tag << jnp.uint64(25)) \
            | src
        shi, slo = jax.lax.sort((hi, lo), num_keys=2)
        skey = (shi.astype(jnp.uint64) << jnp.uint64(38)) \
            | (slo >> jnp.uint64(26))
        is_t = (slo & jnp.uint64(1 << 25)) == 0
        ssrc = (slo & jnp.uint64((1 << 25) - 1)).astype(jnp.int32)
        last_tbl = jax.lax.cummax(jnp.where(is_t, ssrc, -1))
        carried = jax.lax.cummax(jnp.where(is_t, skey, 0))
        found = (~is_t) & (last_tbl >= 0) & (carried == skey)
        # restore query order: single u64 sort keyed by query src
        v = jnp.where(
            is_t, jnp.uint64(0xFFFFFFFFFFFFFFFF),
            (ssrc.astype(jnp.uint64) << jnp.uint64(25))
            | (jnp.maximum(last_tbl, 0).astype(jnp.uint64)
               << jnp.uint64(1))
            | found.astype(jnp.uint64))
        sv = jax.lax.sort(v)[:q]
        idx = ((sv >> jnp.uint64(1))
               & jnp.uint64((1 << 24) - 1)).astype(jnp.int32)
        fnd = (sv & jnp.uint64(1)).astype(bool)
        r = rows16[idx]
        c = jnp.where(fnd, r[:, 2], 0)
        return qk, c[0].astype(jnp.uint64)

    timed("sort-merge join (2-key rep)", e_merge2, (tkeys, rows16))

    # deeper bucket index (fewer bisect rounds): bits+2 -> max_bucket/4
    bits2 = min(bits + 2, 24, 2 * k)
    starts2 = build_bucket_index(tkeys, k, bits2)
    counts2 = np.diff(np.asarray(starts2))
    rounds2 = max(1, int(np.ceil(np.log2(counts2.max() + 1))))
    print(f"deep index: bits={bits2} rounds={rounds2} "
          f"max_bucket={int(counts2.max())}", flush=True)

    def e_cur2(qk, tkeys, cov, fw, bw, starts2):
        f, c, _f4, _b4 = probe_bucketed(tkeys, cov, fw, bw, starts2, qk,
                                        k, bits2, rounds2)
        return qk, c[0].astype(jnp.uint64)

    timed(f"bucketed bisection bits={bits2}", e_cur2,
          (tkeys, cov, fw, bw, starts2))


if __name__ == "__main__":
    main()
