"""On-chip timing: sums-only QV probe path vs the track-filling
select-probe path, chained data-dependent methodology (bench.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import count_sorted, kmer_positions
from kreeq_tpu.ops.validate import (validate_positions_pallas,
                                    validate_qv_sums_pallas)

K = 31
CHUNK = 1 << 23
PCHUNK = 1 << 22
ITERS = 5


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, CHUNK).astype(np.uint8)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, K)
        return count_sorted(keys, edges, valid)

    tkeys, cov, fw, bw, n = count_step(jnp.asarray(genome))
    print("distinct:", int(n), flush=True)
    asm = jnp.asarray(genome[:PCHUNK])

    def time_qv(step, chain):
        out = step(asm)
        _ = int(chain(out))
        carry = asm
        for _ in range(3):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (chain(out) & 1).astype(jnp.uint8)
        _ = int(chain(out))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(carry)
            carry = jnp.roll(carry, 1) ^ (chain(out) & 1).astype(jnp.uint8)
        _ = int(chain(out))
        return (time.perf_counter() - t0) / ITERS

    p = PCHUNK - K + 1

    def qv_step(codes):
        return validate_qv_sums_pallas(tkeys, cov, fw, bw, codes, K, 0,
                                       jnp.uint32(0), jnp.uint32(p))

    def track_step(codes):
        return validate_positions_pallas(tkeys, cov, fw, bw, codes, K, 0)

    dt = time_qv(qv_step, lambda o: o[0])
    print(f"qv sums path   : {dt*1e3:8.2f} ms  {p/dt/1e6:7.1f} M/s",
          flush=True)
    dt2 = time_qv(track_step, lambda o: o[3][0])
    print(f"track path     : {dt2*1e3:8.2f} ms  {p/dt2/1e6:7.1f} M/s",
          flush=True)


if __name__ == "__main__":
    main()
