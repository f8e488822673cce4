"""Compare fused count_step with 16- vs 12- vs 11-column gather payloads.

Round-1 profiling found padded-to-16 row gathers beat [P,11]; the r2
ablation (scripts/profile_count_r2.py) shows the opposite on the current
toolchain.  This times the FULL fused step per variant.
Run: python scripts/bench_gather_width.py
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

    def make_step(pad_cols):
        def count_sorted_w(keys, edges, valid):
            p = keys.shape[0]
            skeys = jnp.where(valid, keys, SENTINEL)
            e32 = jnp.where(valid, edges, 0).astype(jnp.uint64)
            skeys, sedges = _sort_keys_edges(skeys, e32)
            boundary = skeys[1:] != skeys[:-1]
            starts = jnp.concatenate([jnp.ones((1,), bool), boundary])
            ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
            real = skeys != SENTINEL
            n = jnp.sum((starts & real).astype(jnp.uint32))
            flag = ends & real
            cols = [jnp.ones((p, 1), jnp.int32)]
            se = sedges.astype(jnp.int32)
            cols += [((se >> w) & 1)[:, None] for w in range(8)]
            c = _prefix_sum01(jnp.concatenate(cols, axis=1)) \
                .astype(jnp.uint32)
            ffff = jnp.uint32(0xFFFFFFFF)
            key_lo = jnp.where(flag, (skeys & jnp.uint64(0xFFFFFFFF))
                               .astype(jnp.uint32), ffff)
            key_hi = jnp.where(flag, (skeys >> jnp.uint64(32))
                               .astype(jnp.uint32), ffff)
            parts = [c, key_lo[:, None], key_hi[:, None]]
            if pad_cols:
                parts.append(jnp.zeros((p, pad_cols), jnp.uint32))
            payload = jnp.concatenate(parts, axis=1)
            out = jnp.take(payload, _compact_order(flag), axis=0,
                           unique_indices=True)
            ukeys = (out[:, 9].astype(jnp.uint64)
                     | (out[:, 10].astype(jnp.uint64) << jnp.uint64(32)))
            cc = out[:, :9]
            totals = cc - jnp.concatenate(
                [jnp.zeros((1, 9), jnp.uint32), cc[:-1]], axis=0)
            totals = jnp.where((ukeys != SENTINEL)[:, None], totals, 0)
            return ukeys, totals[:, 0], totals[:, 1:5], totals[:, 5:9], n

        @jax.jit
        def step(codes):
            keys, _isfw, edges, valid = kmer_positions(codes, 31)
            return count_sorted_w(keys, edges, valid)

        return step

    chunk = 1 << 23
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 4, chunk).astype(np.uint8)

    ref = None
    for pad in (0, 5, 1, 5, 0):
        step = make_step(pad)
        codes = jnp.asarray(codes_np)
        out = step(codes)
        jax.block_until_ready(out)
        if ref is None:
            ref = [np.asarray(o) for o in out]
        else:
            for a, b in zip(ref, out):
                assert np.array_equal(a, np.asarray(b)), "mismatch!"
        # chained warm-up (bench.py methodology: relay pipelining warms
        # up over the first few chained dispatches)
        carry = codes
        for _ in range(3):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (out[0][0] & 3).astype(jnp.uint8)
        _ = int(out[4])
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (out[0][0] & 3).astype(jnp.uint8)
        _ = int(out[4])
        dt = (time.perf_counter() - t0) / iters
        print(f"payload [P,{11 + pad}]: {dt*1e3:.1f} ms "
              f"({chunk / dt / 1e6:.1f} M/s)", flush=True)


if __name__ == "__main__":
    main()
