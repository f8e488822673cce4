"""Round-3 probe redesign: on-chip timings of candidate primitives.

The round-2 probe (validate_positions, sort-merge join) runs 225 ms per
4M-position window vs the 63 ms CPU-oracle budget.  Every candidate
composition is built from a handful of primitives (sorts of various
operand shapes, gathers, cummax, the Pallas streaming kernels); this
script times each on the real chip so the redesign is chosen on data.

Usage: python scripts/bench_probe_r3.py [name ...]
  (no args = run all; names = subset, so a Mosaic fault can't take the
   whole sweep down)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401  (x64 + cache)

Q = 1 << 22  # probe window positions (bench.py pchunk)
CHUNK = 1 << 23  # count chunk


def timeit(fn, args, chain, iters=5, warm=3):
    """Chained timing (same methodology as bench.py)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warm):
        args = chain(out, *args)
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        args = chain(out, *args)
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    # shared inputs
    qk = jnp.asarray(rng.integers(0, 1 << 62, Q, dtype=np.uint64))
    qhi = (qk >> jnp.uint64(38)).astype(jnp.uint32)
    qlo = ((qk & jnp.uint64((1 << 38) - 1)) << jnp.uint64(26)) \
        | jnp.arange(Q, dtype=jnp.uint64)
    q32a = qhi
    q32b = qk.astype(jnp.uint32)

    def report(name, dt, per=Q):
        print(f"{name:28s} {dt*1e3:9.2f} ms   "
              f"{per/dt/1e6:8.1f} M/s", flush=True)

    def chain_rot(out, *args):
        # rotate first arg by 1 (cheap, breaks relay elision)
        first = jax.tree.leaves(out)[0]
        a0 = jnp.roll(args[0], 1) ^ first.ravel()[0].astype(args[0].dtype)
        return (a0, *args[1:])

    if want("sort2key"):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
        report("sort (u32,u64) 2key @4M", timeit(f, (qhi, qlo), chain_rot))
    if want("sortpay64"):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        report("sort u32 key + u64 pay @4M",
               timeit(f, (qhi, qlo), chain_rot))
    if want("sortpay64u32"):
        f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
        report("sort u32 + (u64,u32) pay @4M",
               timeit(f, (qhi, qlo, q32b), chain_rot))
    if want("sort2u32"):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        report("sort u32 key + u32 pay @4M",
               timeit(f, (q32a, q32b), chain_rot))
    if want("sort1u64"):
        f = jax.jit(lambda a: jax.lax.sort(qlo ^ a[0]))
        report("sort u64 1op @4M", timeit(f, (qlo,), chain_rot))
    if want("sortbatch"):
        S = 16
        a2 = qhi.reshape(S, Q // S)
        b2 = qlo.reshape(S, Q // S)
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                              dimension=1))
        report(f"sort batched [{S},{Q//S}] 2key",
               timeit(f, (a2, b2), chain_rot))
    if want("cummax"):
        x = jnp.asarray(rng.integers(0, 1 << 31, 3 * Q, dtype=np.int32))
        f = jax.jit(jax.lax.cummax)
        report("cummax i32 @12M", timeit(f, (x,), chain_rot), per=3 * Q)

    # table for probe-shaped measurements
    need_tbl = (not names) or (names & {
        "gather16", "gatheru64", "probe_xla", "probe_pallas",
        "validate_now", "merge_xla", "merge_pallas"})
    if need_tbl:
        from kreeq_tpu.ops.kmers import (count_sorted, kmer_positions,
                                         merge_sorted, probe_merge)

        genome = rng.integers(0, 4, CHUNK).astype(np.uint8)
        k = 31

        @jax.jit
        def count_step(codes):
            keys, _isfw, edges, valid = kmer_positions(codes, k)
            return count_sorted(keys, edges, valid)

        tkeys, cov, fw, bw, n = count_step(jnp.asarray(genome))
        n = int(n)
        print("table rows:", tkeys.shape[0], "distinct:", n, flush=True)
        asm = jnp.asarray(genome[:Q])
        qkeys = kmer_positions(asm, k)[0]

    if want("gather16"):
        rows = jnp.concatenate(
            [cov[:, None], fw, bw, jnp.zeros((tkeys.shape[0], 7),
                                             jnp.uint32)], axis=1)
        idx = jnp.asarray(rng.integers(0, n, Q, dtype=np.int32))

        def g(rows, idx):
            return jnp.take(rows, idx, axis=0, unique_indices=True)

        f = jax.jit(g)

        def chain_idx(out, rows, idx):
            return rows, (idx + out[0, 0].astype(jnp.int32)) % n
        report("gather [4M,16]u32 of 8M", timeit(f, (rows, idx),
                                                 chain_idx))
    if want("gatheru64"):
        idx = jnp.asarray(rng.integers(0, n, Q, dtype=np.int32))

        def g(tk, idx):
            return jnp.take(tk, idx, unique_indices=True)

        f = jax.jit(g)

        def chain_idx(out, tk, idx):
            return tk, (idx + out[0].astype(jnp.int32)) % n
        report("gather u64 4M of 8M", timeit(f, (tkeys, idx), chain_idx))
    if want("probe_xla"):
        f = jax.jit(probe_merge)

        def chain_q(out, *args):
            q = jnp.roll(args[4], 1) ^ out[1][0].astype(jnp.uint64)
            return (*args[:4], q)
        report("probe_merge XLA t8M q4M",
               timeit(f, (tkeys, cov, fw, bw, qkeys), chain_q))
    if want("probe_pallas"):
        from kreeq_tpu.ops.pallas_kernels import probe_merge_pallas

        def chain_q(out, *args):
            q = jnp.roll(args[4], 1) ^ out[1][0].astype(jnp.uint64)
            return (*args[:4], q)
        report("probe_merge_pallas t8M q4M",
               timeit(probe_merge_pallas, (tkeys, cov, fw, bw, qkeys),
                      chain_q))
    if want("validate_now"):
        from kreeq_tpu.ops.kmers import build_bucket_index
        from kreeq_tpu.ops.validate import validate_positions

        bits = min(int(np.ceil(np.log2(n))) + 1, 24, 2 * k)
        starts = build_bucket_index(tkeys, k, bits)
        counts = np.diff(np.asarray(starts))
        rounds = max(1, int(np.ceil(np.log2(counts.max() + 1))))
        use_merge = int(tkeys.shape[0]) <= 6 * Q

        @jax.jit
        def step(tk, cov, fw, bw, codes):
            return validate_positions(tk, cov, fw, bw, starts, codes, k,
                                      0, bits, rounds, use_merge)

        def chain_c(out, *args):
            c = jnp.roll(args[4], 1) ^ (out[3][0] & 1).astype(jnp.uint8)
            return (*args[:4], c)
        report("validate_positions r2 @4M",
               timeit(step, (tkeys, cov, fw, bw, asm), chain_c))
    if want("merge_xla"):
        h = tkeys.shape[0] // 2
        f = jax.jit(merge_sorted)
        args = (tkeys[:h], cov[:h], fw[:h], bw[:h],
                tkeys[h:2 * h], cov[h:2 * h], fw[h:2 * h], bw[h:2 * h])

        def chain_n(out, *a):
            return a
        report("merge_sorted XLA 4M+4M", timeit(f, args, chain_n),
               per=2 * h)
    if want("merge_pallas"):
        from kreeq_tpu.ops.pallas_kernels import merge_sorted_pallas

        h = tkeys.shape[0] // 2
        args = (tkeys[:h], cov[:h], fw[:h], bw[:h],
                tkeys[h:2 * h], cov[h:2 * h], fw[h:2 * h], bw[h:2 * h])

        def chain_n(out, *a):
            return a
        report("merge_sorted_pallas 4M+4M",
               timeit(merge_sorted_pallas, args, chain_n), per=2 * h)


if __name__ == "__main__":
    main()
