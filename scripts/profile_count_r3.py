"""Round-3 count-path stage decomposition with chained (data-fresh)
timing — where do the 104 ms go?  Stages: extraction, the 2-key sort,
the Pallas streaming aggregation (vs its XLA equivalent).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import SENTINEL, count_sorted, kmer_positions
from kreeq_tpu.ops import pallas_kernels as PK

CHUNK = 1 << 23
K = 31
P = CHUNK - K + 1


def chain_codes(codes, scalar):
    return jnp.roll(codes, 1) ^ (scalar & 1).astype(jnp.uint8)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    codes = jnp.asarray(rng.integers(0, 4, CHUNK).astype(np.uint8))

    # full steps
    @jax.jit
    def full_xla(codes):
        keys, _i, edges, valid = kmer_positions(codes, K)
        return count_sorted(keys, edges, valid)

    @jax.jit
    def full_pallas(codes):
        keys, _i, edges, valid = kmer_positions(codes, K)
        return PK.count_sorted_pallas(keys, edges, valid)

    @jax.jit
    def extract(codes):
        return kmer_positions(codes, K)

    @jax.jit
    def sort_stage(keys, edges, valid):
        skeys = jnp.where(valid, keys, SENTINEL)
        sedges = jnp.where(valid, edges, 0).astype(jnp.uint32)
        hi = (skeys >> jnp.uint64(32)).astype(jnp.uint32)
        lo = skeys.astype(jnp.uint32)
        return jax.lax.sort((hi, lo, sedges), num_keys=2)

    def time_chained(fn, mkargs, scalar_of, iters=4):
        c = codes
        out = fn(*mkargs(c))
        jax.block_until_ready(out)
        for _ in range(2):
            c = chain_codes(c, scalar_of(out))
            out = fn(*mkargs(c))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            c = chain_codes(c, scalar_of(out))
            out = fn(*mkargs(c))
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    dt = time_chained(full_xla, lambda c: (c,),
                      lambda o: o[0][0].astype(jnp.uint8))
    print(f"count full XLA:      {dt*1e3:8.2f} ms  ({P/dt/1e6:6.1f} M/s)",
          flush=True)
    dt = time_chained(full_pallas, lambda c: (c,),
                      lambda o: o[0][0].astype(jnp.uint8))
    print(f"count full Pallas:   {dt*1e3:8.2f} ms  ({P/dt/1e6:6.1f} M/s)",
          flush=True)
    dt = time_chained(extract, lambda c: (c,),
                      lambda o: o[0][0].astype(jnp.uint8))
    print(f"  extract:           {dt*1e3:8.2f} ms", flush=True)

    def mk_sort_args(c):
        keys, _i, edges, valid = extract(c)
        return keys, edges, valid

    dt = time_chained(sort_stage, mk_sort_args,
                      lambda o: o[0][0].astype(jnp.uint8))
    print(f"  extract+sort:      {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
