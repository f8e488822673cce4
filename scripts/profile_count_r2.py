"""Stage ablation of the current count_step on the real chip.

Chained-dep timing per TIMING.md methodology (the relay elides repeated
identical dispatches).  Run: PYTHONPATH=. python scripts/profile_count_r2.py
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
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import (SENTINEL, _compact_order,
                                     _prefix_sum01, _sort_keys_edges,
                                     count_sorted, kmer_positions)

    k = 31
    chunk = 1 << 23
    p = chunk - k + 1
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, chunk).astype(np.uint8))

    # full step
    @jax.jit
    def step(c):
        keys, _isfw, edges, valid = kmer_positions(c, k)
        return count_sorted(keys, edges, valid)

    timed("full count_step", step, codes)

    # extraction alone
    timed("kmer_positions", jax.jit(lambda c: kmer_positions(c, k)), codes)

    keys, _isfw, edges, valid = kmer_positions(codes, k)
    keys = jnp.asarray(keys)
    e32 = jnp.where(valid, edges, 0).astype(jnp.uint64)
    skeys_in = jnp.where(valid, keys, SENTINEL)

    timed("_sort_keys_edges", jax.jit(_sort_keys_edges), skeys_in, e32)

    skeys, sedges = _sort_keys_edges(skeys_in, e32)
    skeys = jnp.asarray(skeys)
    m9 = jnp.concatenate(
        [jnp.ones((p, 1), jnp.int32)] +
        [((sedges.astype(jnp.int32) >> w) & 1)[:, None] for w in range(8)],
        axis=1)
    timed("_prefix_sum01 [8M,9]", jax.jit(_prefix_sum01), m9)

    boundary = skeys[1:] != skeys[:-1]
    ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
    flag = jnp.asarray(ends & (skeys != SENTINEL))
    timed("_compact_order (u32 sort)", jax.jit(_compact_order), flag)

    order = _compact_order(flag)
    c9 = _prefix_sum01(m9).astype(jnp.uint32)
    payload = jnp.concatenate(
        [c9, jnp.zeros((p, 7), jnp.uint32)], axis=1)

    timed("wide gather [8M,16]",
          jax.jit(lambda pl, o: jnp.take(pl, o, axis=0,
                                         unique_indices=True)),
          payload, order, mutate=1)
    timed("gather [8M,12]",
          jax.jit(lambda pl, o: jnp.take(pl[:, :12], o, axis=0,
                                         unique_indices=True)),
          payload, order, mutate=1)
    timed("gather [8M,11]",
          jax.jit(lambda pl, o: jnp.take(pl[:, :11], o, axis=0,
                                         unique_indices=True)),
          payload, order, mutate=1)
    timed("gather [8M,8]",
          jax.jit(lambda pl, o: jnp.take(pl[:, :8], o, axis=0,
                                         unique_indices=True)),
          payload, order, mutate=1)


if __name__ == "__main__":
    main()
