"""Honest A/B: old vs new count_sorted with ALL outputs live.

Both steps return the full table arrays (ukeys/cov/fw/bw/n) exactly as
bench.py consumes them, so XLA cannot dead-code-eliminate any stage.
"""

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import (SENTINEL, _compact_order,
                                     _prefix_sum01, count_sorted,
                                     kmer_positions)

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    P = 1 << 23
    k = 31
    codes0 = jnp.asarray(rng.integers(0, 4, P).astype(np.uint8))

    def count_sorted_old(keys, edges, valid):
        p = keys.shape[0]
        skeys = jnp.where(valid, keys, SENTINEL)
        sedges = jnp.where(valid, edges, 0).astype(jnp.uint32)
        skeys, sedges = jax.lax.sort((skeys, sedges), num_keys=1)
        boundary = skeys[1:] != skeys[:-1]
        starts = jnp.concatenate([jnp.ones((1,), bool), boundary])
        ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        real = skeys != SENTINEL
        n = jnp.sum((starts & real).astype(jnp.uint32))
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
        payload = jnp.concatenate(
            [c, key_lo[:, None], key_hi[:, None]], axis=1)
        out = payload[_compact_order(flag)]
        ukeys = (out[:, 9].astype(jnp.uint64)
                 | (out[:, 10].astype(jnp.uint64) << jnp.uint64(32)))
        cc = out[:, :9]
        totals = cc - jnp.concatenate([jnp.zeros((1, 9), jnp.uint32),
                                       cc[:-1]], axis=0)
        totals = jnp.where((ukeys != SENTINEL)[:, None], totals, 0)
        return ukeys, totals[:, 0], totals[:, 1:5], totals[:, 5:9], n

    def bench(name, csort, iters=5):
        @jax.jit
        def step(codes):
            keys, _isfw, edges, valid = kmer_positions(codes, k)
            return csort(keys, edges, valid), codes

        (tkeys, cov, fw, bw, n), _ = step(codes0)
        _ = int(n)
        t0 = time.perf_counter()
        carry = codes0
        for _ in range(iters):
            (tkeys, cov, fw, bw, n), _ = step(carry)
            carry = jnp.roll(carry, 1) ^ (tkeys[0] & 3).astype(jnp.uint8)
        _ = int(n)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt * 1e3:9.1f} ms "
              f"({(P - k + 1) / dt / 1e6:.1f} M kmers/s)", flush=True)
        return dt

    bench("count_sorted OLD (full outputs)", count_sorted_old)
    bench("count_sorted NEW (full outputs)", count_sorted)
    bench("count_sorted NEW again", count_sorted)


if __name__ == "__main__":
    main()
