"""Time ONE kernel pair (XLA vs Pallas) at bench shapes, one process
per kernel so HBM is clean.  Usage: python scripts/time_kernel_onchip.py
{count|probe|merge} [log2n]"""

import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import (count_sorted, kmer_positions,
                                 merge_sorted, probe_merge)
from kreeq_tpu.ops.pallas_kernels import (count_sorted_pallas,
                                          merge_sorted_pallas,
                                          probe_merge_pallas)


def timeit(fn, args, chain, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(2):
        args = chain(out, *args)
        prev, out = out, fn(*args)
        del prev
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        args = chain(out, *args)
        prev, out = out, fn(*args)
        del prev
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1]
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 23
    n = 1 << log2n
    k = 31
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, n).astype(np.uint8))
    keys, _isfw, edges, valid = kmer_positions(codes, k)
    print("device:", jax.devices()[0], "n:", n, flush=True)

    if which == "count":
        def chain(out, ckeys, cedges, cvalid):
            bit = (out[0].ravel()[0] & jnp.uint64(1))
            return ckeys + bit, cedges, cvalid  # order-preserving (keys < 2^62)
        tx = timeit(count_sorted, (keys, edges, valid), chain)
        tp = timeit(count_sorted_pallas, (keys, edges, valid), chain)
    else:
        ref = count_sorted(keys, edges, valid)
        jax.block_until_ready(ref)
        if which == "probe":
            q = n // 2
            qk = keys[:q]
            del keys, edges, valid

            def chain(out, t0_, t1_, t2_, t3_, q_):
                s = (out[1].ravel()[0] & jnp.uint32(1)).astype(jnp.int32)
                return t0_, t1_, t2_, t3_, jnp.roll(q_, s + 1)
            pargs = (ref[0], ref[1], ref[2], ref[3], qk)
            tx = timeit(probe_merge, pargs, chain)
            tp = timeit(probe_merge_pallas, pargs, chain)
        else:
            nr = int(ref[4])
            half = nr // 2
            A = tuple(r[:half] for r in ref[:4])
            B = tuple(r[half:nr] for r in ref[:4])
            del ref, keys, edges, valid

            def chain(out, a0, a1, a2, a3, b0, b1, b2, b3):
                bit = out[1].ravel()[0] & jnp.uint32(1)
                return a0, a1 ^ bit, a2, a3, b0, b1, b2, b3
            tx = timeit(merge_sorted, A + B, chain)
            tp = timeit(merge_sorted_pallas, A + B, chain)
    print(f"{which}: XLA {tx*1e3:.1f} ms  pallas {tp*1e3:.1f} ms "
          f"({tx/tp:.2f}x)")


if __name__ == "__main__":
    main()
