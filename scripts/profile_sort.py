"""Measure key-sort representations on the real chip.

Informs the u32-pair-keys roadmap item: is a (hi, lo) u32-pair sort
faster than the x64-emulated u64 sort that dominates count_sorted's
remaining cost?
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=5, mutate=0):
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
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import kmer_positions

    k = 31
    chunk = 1 << 23
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, chunk).astype(np.uint8))
    keys, _isfw, edges, _valid = kmer_positions(codes, k)
    e32 = jnp.asarray(np.asarray(edges), jnp.uint32)
    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (keys & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)

    timed("sort u64 keys only", jax.jit(lambda kk: jnp.sort(kk)), keys)
    timed("sort (u64, u32 edges) pair",
          jax.jit(lambda kk, e: jax.lax.sort((kk, e), num_keys=1)),
          keys, e32)
    timed("sort (u32 hi, u32 lo) num_keys=2",
          jax.jit(lambda h, l: jax.lax.sort((h, l), num_keys=2)), hi, lo)
    timed("sort (u32 hi, u32 lo, u32 edges) num_keys=2",
          jax.jit(lambda h, l, e: jax.lax.sort((h, l, e), num_keys=2)),
          hi, lo, e32)
    timed("argsort u64 (merge path)",
          jax.jit(lambda kk: jnp.argsort(kk)), keys)


if __name__ == "__main__":
    main()
