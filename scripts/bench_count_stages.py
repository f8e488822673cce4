"""Cumulative fused-stage timing of count_step on the real chip.

Each variant jits the pipeline truncated after stage i, with chained
warm-up per bench.py methodology.  Marginal cost of a stage = diff of
adjacent rows (fusion-aware, unlike standalone stage timing).
Run: python scripts/bench_count_stages.py
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
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 4, chunk).astype(np.uint8)

    def pipeline(codes, upto):
        p = chunk - k + 1
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        if upto == 0:
            return keys
        skeys = jnp.where(valid, keys, SENTINEL)
        e32 = jnp.where(valid, edges, 0).astype(jnp.uint64)
        skeys, sedges = _sort_keys_edges(skeys, e32)
        if upto == 1:
            return skeys
        boundary = skeys[1:] != skeys[:-1]
        ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        real = skeys != SENTINEL
        flag = ends & real
        cols = [jnp.ones((p, 1), jnp.int32)]
        se = sedges.astype(jnp.int32)
        cols += [((se >> w) & 1)[:, None] for w in range(8)]
        c = _prefix_sum01(jnp.concatenate(cols, axis=1)).astype(jnp.uint32)
        if upto == 2:
            return c[:, 0]
        order = _compact_order(flag)
        if upto == 3:
            return order + c[:, 0].astype(jnp.int32)
        ffff = jnp.uint32(0xFFFFFFFF)
        key_lo = jnp.where(flag, (skeys & jnp.uint64(0xFFFFFFFF))
                           .astype(jnp.uint32), ffff)
        key_hi = jnp.where(flag, (skeys >> jnp.uint64(32))
                           .astype(jnp.uint32), ffff)
        payload = jnp.concatenate(
            [c, key_lo[:, None], key_hi[:, None],
             jnp.zeros((p, 5), jnp.uint32)], axis=1)
        out = jnp.take(payload, order, axis=0, unique_indices=True)
        return out[:, 0]

    names = ["kmer_positions", "+sort", "+prefix_sum", "+compact_order",
             "+gather"]
    for upto in range(5):
        step = jax.jit(lambda c, u=upto: pipeline(c, u))
        codes = jnp.asarray(codes_np)
        out = step(codes)
        jax.block_until_ready(out)
        carry = codes
        for _ in range(3):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (out[0] & 3).astype(jnp.uint8)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (out[0] & 3).astype(jnp.uint8)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{names[upto]:>16}: {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
