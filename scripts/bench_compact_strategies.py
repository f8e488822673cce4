"""Compare strategies for compacting run-end rows to the front.

Baseline: u32 sort -> [P,16] row gather (228 ms marginal on v5e).
Variants: payload carried through a variadic sort; per-column 1-D
gathers; u64-packed payload through the sort.
Run: python scripts/bench_compact_strategies.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import (SENTINEL, _compact_order,
                                     _prefix_sum01, _sort_keys_edges,
                                     kmer_positions)

    k = 31
    chunk = 1 << 23
    p = chunk - k + 1
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 4, chunk).astype(np.uint8)

    def common(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        skeys = jnp.where(valid, keys, SENTINEL)
        e32 = jnp.where(valid, edges, 0).astype(jnp.uint64)
        skeys, sedges = _sort_keys_edges(skeys, e32)
        boundary = skeys[1:] != skeys[:-1]
        ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        real = skeys != SENTINEL
        flag = ends & real
        cols = [jnp.ones((p, 1), jnp.int32)]
        se = sedges.astype(jnp.int32)
        cols += [((se >> w) & 1)[:, None] for w in range(8)]
        c = _prefix_sum01(jnp.concatenate(cols, axis=1)).astype(jnp.uint32)
        ffff = jnp.uint32(0xFFFFFFFF)
        key_lo = jnp.where(flag, (skeys & jnp.uint64(0xFFFFFFFF))
                           .astype(jnp.uint32), ffff)
        key_hi = jnp.where(flag, (skeys >> jnp.uint64(32))
                           .astype(jnp.uint32), ffff)
        return flag, c, key_lo, key_hi

    def baseline(codes):
        flag, c, key_lo, key_hi = common(codes)
        payload = jnp.concatenate(
            [c, key_lo[:, None], key_hi[:, None],
             jnp.zeros((p, 5), jnp.uint32)], axis=1)
        out = jnp.take(payload, _compact_order(flag), axis=0,
                       unique_indices=True)
        return out[:, 0], out[:, 1], out[:, 9], out[:, 10]

    def variadic_sort(codes):
        flag, c, key_lo, key_hi = common(codes)
        iota = jnp.arange(p, dtype=jnp.uint32)
        sk = jnp.where(flag, iota, iota | jnp.uint32(0x80000000))
        ops = (sk,) + tuple(c[:, i] for i in range(9)) + (key_lo, key_hi)
        out = jax.lax.sort(ops, num_keys=1)
        return out[1], out[2], out[10], out[11]

    def variadic_sort_u64(codes):
        flag, c, key_lo, key_hi = common(codes)
        iota = jnp.arange(p, dtype=jnp.uint32)
        sk = jnp.where(flag, iota, iota | jnp.uint32(0x80000000))
        # pack 9 u32 counts (<=2^24 each) + 2 key halves into 5 u64s:
        # [c0|c1] [c2|c3] [c4|c5] [c6|c7] [c8] [key]
        u = c.astype(jnp.uint64)
        packed = [u[:, i] | (u[:, i + 1] << jnp.uint64(32))
                  for i in range(0, 8, 2)]
        packed.append(u[:, 8])
        packed.append(key_lo.astype(jnp.uint64)
                      | (key_hi.astype(jnp.uint64) << jnp.uint64(32)))
        out = jax.lax.sort((sk,) + tuple(packed), num_keys=1)
        c0 = (out[1] & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        c1 = (out[1] >> jnp.uint64(32)).astype(jnp.uint32)
        key = out[6]
        return c0, c1, (key & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), \
            (key >> jnp.uint64(32)).astype(jnp.uint32)

    def col_gathers(codes):
        flag, c, key_lo, key_hi = common(codes)
        order = _compact_order(flag)
        outs = [jnp.take(c[:, i], order, unique_indices=True)
                for i in range(9)]
        outs.append(jnp.take(key_lo, order, unique_indices=True))
        outs.append(jnp.take(key_hi, order, unique_indices=True))
        return outs[0], outs[1], outs[9], outs[10]

    variants = [("baseline row-gather", baseline),
                ("variadic u32 sort x12", variadic_sort),
                ("variadic u64 sort x6", variadic_sort_u64),
                ("11x 1-D gathers", col_gathers)]
    if len(sys.argv) > 1:
        pick = [int(a) for a in sys.argv[1:]]
        variants = [variants[i] for i in pick]

    ref = None
    for name, fn in variants:
        step = jax.jit(fn)
        codes = jnp.asarray(codes_np)
        out = step(codes)
        jax.block_until_ready(out)
        vals = [np.asarray(o) for o in out]
        if ref is None:
            ref = vals
        else:
            for a, b in zip(ref, vals):
                assert np.array_equal(a, b), f"mismatch in {name}"
        carry = codes
        for _ in range(3):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (out[0][0] & 3).astype(jnp.uint8)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (out[0][0] & 3).astype(jnp.uint8)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>24}: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
