"""One-off breakdown of the bench probe/count steps on the real chip.

Times each stage separately (chained deps + scalar readback per the
relay-elision gotcha) to find where probe_step_ms goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, carry, iters=5):
    import jax.numpy as jnp

    out = fn(carry)
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(first.ravel()[0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(carry)
        first = out[0] if isinstance(out, tuple) else out
        carry = (carry.at[0].set(
            (first.ravel()[0] & 1).astype(carry.dtype)))
    _ = np.asarray(first.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import (build_bucket_index, count_sorted,
                                     kmer_positions, probe_bucketed)
    from kreeq_tpu.ops.validate import validate_positions

    k = 31
    chunk = 1 << 23
    pchunk = 1 << 22
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, chunk).astype(np.uint8))
    asm = jnp.asarray(rng.integers(0, 4, pchunk).astype(np.uint8))

    @jax.jit
    def count_step(c):
        keys, _isfw, edges, valid = kmer_positions(c, k)
        return count_sorted(keys, edges, valid)

    tkeys, cov, fw, bw, n = map(jnp.asarray, count_step(codes))
    print("table n =", int(n), flush=True)

    bits = 22
    starts = build_bucket_index(tkeys, k, bits)
    rounds = max(1, int(np.ceil(np.log2(
        np.diff(np.asarray(starts)).max() + 1))))
    print("rounds =", rounds, flush=True)

    # --- count-side breakdown
    timed("count_step (8M bases)", count_step, codes)
    extract8 = jax.jit(lambda c: kmer_positions(c, k))
    timed("extract only (8M)", extract8, codes)
    sort_only = jax.jit(lambda kk: jnp.sort(kk))
    keys8 = kmer_positions(codes, k)[0]
    timed("u64 sort only (8M)", sort_only, keys8)

    # --- probe-side breakdown
    @jax.jit
    def probe_full(c):
        return validate_positions(tkeys, cov, fw, bw, starts, c, k, 0,
                                  bits, rounds)

    timed("validate_positions (4M)", probe_full, asm)

    extract4 = jax.jit(lambda c: kmer_positions(c, k))
    timed("extract only (4M)", extract4, asm)

    qkeys = kmer_positions(asm, k)[0]

    @jax.jit
    def probe_only(q):
        return probe_bucketed(tkeys, cov, fw, bw, starts, q, k, bits,
                              rounds)

    timed("probe_bucketed only (4M keys)", probe_only, qkeys)

    @jax.jit
    def bisect_only(q):
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

    timed("bisection only (4M keys)", bisect_only, qkeys)

    idx = bisect_only(qkeys)

    @jax.jit
    def payload_only(ix):
        found = tkeys[ix] == qkeys
        z = jnp.uint32(0)
        return (jnp.where(found, cov[ix], z),
                jnp.where(found[:, None], fw[ix], z),
                jnp.where(found[:, None], bw[ix], z))

    timed("payload gathers only (4M)", payload_only, idx)

    # fused payload: single [T, 9] row gather
    payload9 = jnp.concatenate([cov[:, None], fw, bw], axis=1)

    @jax.jit
    def payload_fused(ix):
        found = tkeys[ix] == qkeys
        row = jnp.where(found[:, None], payload9[ix], jnp.uint32(0))
        return row[:, 0], row[:, 1:5], row[:, 5:9]

    timed("payload fused [T,9] (4M)", payload_fused, idx)


if __name__ == "__main__":
    main()
